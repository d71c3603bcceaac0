"""Instruction-mix census (tools/op_census.py): the roofline audit's
op-class counter must find the Pallas bounce loop and classify sanely.

The census is the measured backing for BASELINE.md's "the kernel is at
its instruction-mix roofline" claim, so its mechanics get a regression
test: the kernel/bounce-body discovery, the class partition, and the
rough agreement with bench.py's hand FLOP model on cornell_box.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "op_census.py",
)
spec = importlib.util.spec_from_file_location("op_census", _TOOL)
op_census = importlib.util.module_from_spec(spec)
spec.loader.exec_module(op_census)


def _bounce_body_census(scene_name, depth=4, size=16, spp=4):
    from zig_weekend_raytracer_tpu.models import load_scene
    from zig_weekend_raytracer_tpu.render.camera import camera_consts
    from zig_weekend_raytracer_tpu.render.renderer import (
        Renderer, _render_band_regen,
    )

    scene = load_scene(scene_name)
    r = Renderer(samples_per_pixel=spp, max_ray_bounce_depth=depth)
    s_par, band_rows = r.regen_geometry(
        size, size, spp, image_scene=scene.compiled.has_image_textures
    )
    cam_c = camera_consts(scene.camera, size, size)

    def band(seed, y0, x0):
        return _render_band_regen(
            scene.compiled, seed, y0, x0,
            width=size, height=size, band_rows=band_rows,
            s_par=s_par, spp=spp, sample_limit=spp,
            max_depth=depth, sampler=r.sampler, has_dof=False,
            cam_consts=cam_c, rr=0, clamp=0.0,
        )

    jaxpr = jax.make_jaxpr(band)(
        jnp.uint32(0), jnp.int32(0), jnp.int32(0)
    )
    got = op_census.find_pallas_bounce_loop(jaxpr.jaxpr)
    assert got is not None
    _, body = got
    agg = {}
    op_census.census(body, agg)
    return agg


def test_census_finds_bounce_loop_and_classifies():
    agg = _bounce_body_census("cornell_box")
    lanes = 8 * 128
    per_class = {
        cls: sum(d.values()) / lanes for cls, d in agg.items()
    }
    # the integrator's heavy classes must all be present and substantial
    assert per_class["float-arith"] > 500
    assert per_class["select"] > 50
    assert per_class["compare"] > 50
    assert per_class["int-arith"] > 50  # RNG multiplies
    # nothing significant may fall through to "other" (an unclassified
    # primitive would silently skew the shares)
    assert per_class.get("other", 0) < 0.02 * sum(per_class.values())


def test_census_matches_hand_flop_model_roughly():
    """The census float-FLOP estimate must agree with bench.py's static
    hand model within 25% on cornell_box (measured round 4: within 7%)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    agg = _bounce_body_census("cornell_box")
    lanes = 8 * 128
    per_class = {
        cls: sum(d.values()) / lanes for cls, d in agg.items()
    }
    est = (
        per_class.get("float-arith", 0)
        + 4 * per_class.get("div/sqrt", 0)
        + 8 * per_class.get("transcendental", 0)
    )
    hand = (
        8 * bench.FLOPS_SPHERE_PRIM
        + 24 * bench.FLOPS_QUAD_PRIM
        + bench.FLOPS_SHADE_TAIL
    )
    assert abs(est - hand) / hand < 0.25, (est, hand)
