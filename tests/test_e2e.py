"""End-to-end render smoke tests + physical sanity checks."""

import numpy as np
import pytest

import zig_weekend_raytracer_tpu as zwrt
from zig_weekend_raytracer_tpu.render import Renderer
from zig_weekend_raytracer_tpu.sampling.sampler import SamplerKind


@pytest.fixture(scope="module")
def cornell():
    return zwrt.models.load_scene("cornell_box")


def test_cornell_small_render(cornell):
    fb = Renderer(samples_per_pixel=8, max_ray_bounce_depth=6).render(
        cornell, 48, 48
    )
    assert fb.shape == (48, 48, 3)
    assert not np.isnan(fb).any()
    assert fb.max() > 1.0  # light source visible (emits 15,15,15)
    assert 0.01 < fb.mean() < 2.0


def test_cornell_deterministic(cornell):
    r = Renderer(samples_per_pixel=4, max_ray_bounce_depth=4, seed=7)
    fb1 = r.render(cornell, 24, 24)
    fb2 = r.render(cornell, 24, 24)
    np.testing.assert_array_equal(fb1, fb2)


def test_all_samplers_run(cornell):
    for kind in SamplerKind:
        fb = Renderer(
            samples_per_pixel=4, max_ray_bounce_depth=3, sampler=kind
        ).render(cornell, 16, 16)
        assert not np.isnan(fb).any()


def test_background_scene():
    # shrek_quads has sky background; rays that miss must return it
    scene = zwrt.models.load_scene("shrek_quads")
    fb = Renderer(samples_per_pixel=2, max_ray_bounce_depth=3).render(
        scene, 32, 32
    )
    # top corners see pure background (linear space, before gamma)
    corner = fb[0, 0]
    np.testing.assert_allclose(corner, [0.5, 0.7, 1.0], atol=0.2)


def test_chunking_invariance(cornell):
    """The content-addressed RNG makes the render independent of the chunk
    decomposition (up to f32 accumulation order)."""
    r_big = Renderer(samples_per_pixel=16, max_ray_bounce_depth=4, seed=3)
    r_small = Renderer(
        samples_per_pixel=16, max_ray_bounce_depth=4, seed=3,
        max_rays_per_chunk=16 * 16,  # force many chunks
    )
    fb1 = r_big.render(cornell, 16, 16)
    fb2 = r_small.render(cornell, 16, 16)
    np.testing.assert_allclose(fb1, fb2, rtol=1e-4, atol=1e-6)


def test_cli_shard_end_to_end(tmp_path):
    """--shard=rows drives the full CLI stack over the virtual CPU mesh
    (scene -> render_sharded -> PPM); the image matches the unsharded CLI
    render after u8 quantization (content-addressed RNG invariance)."""
    from PIL import Image

    from zig_weekend_raytracer_tpu.cli import main

    common = [
        "--image_width=16", "--image_height=16", "--samples_per_pixel=4",
        "--ray_bounce_max_depth=3", "--scene=cornell_box",
    ]
    p0, p1 = str(tmp_path / "a.ppm"), str(tmp_path / "b.ppm")
    assert main(common + [f"--image_out_path={p0}"]) == 0
    assert main(common + ["--shard=rows", f"--image_out_path={p1}"]) == 0
    a = np.asarray(Image.open(p0), np.int16)
    b = np.asarray(Image.open(p1), np.int16)
    assert a.shape == (16, 16, 3)
    # float-noise can flip a u8 by 1 on quantization boundaries
    assert np.abs(a - b).max() <= 1
