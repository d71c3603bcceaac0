"""Pallas kernel correctness on CPU via interpreter mode.

``ZWRT_PALLAS_INTERPRET=1`` forces the production kernel path
(ops/pallas_trace.py + ops/pallas_bounce.py) with ``interpret=True``, so the
exact kernels every TPU render uses are validated against the portable XLA
formulations — this is what makes the suite fail if a kernel regresses
(round-1 gap: the kernels had zero automated coverage)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import zig_weekend_raytracer_tpu as zwrt
from zig_weekend_raytracer_tpu.math.v3 import V3
from zig_weekend_raytracer_tpu.render import Renderer
from zig_weekend_raytracer_tpu.scene import Camera, SceneBuilder


# pallas_interpret fixture: shared in tests/conftest.py


def _random_scene(seed, n_spheres, n_quads, moving=False, bvh=True):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = b.lambertian(b.solid_color((0.5, 0.5, 0.5)))
    for i in range(n_spheres):
        c = rng.uniform(-10, 10, 3)
        r = rng.uniform(0.2, 1.5)
        if moving and i % 3 == 0:
            b.add(b.moving_sphere(c, c + rng.uniform(-1, 1, 3), r, mat))
        else:
            b.add(b.sphere(c, r, mat))
    for _ in range(n_quads):
        b.add(b.quad(
            rng.uniform(-10, 10, 3), rng.uniform(-2, 2, 3),
            rng.uniform(-2, 2, 3), mat,
        ))
    if bvh:
        b.use_bvh(True, min_prims=2)
    b.set_camera(Camera(look_from=(0, 0, 30), look_at=(0, 0, 0)))
    return b.compile().compiled, rng


def _random_rays(rng, n):
    org = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return (
        V3(*(jnp.asarray(org[:, i]) for i in range(3))),
        V3(*(jnp.asarray(d[:, i]) for i in range(3))),
    )


@pytest.mark.parametrize(
    "seed,n_s,n_q,moving",
    [
        (0, 100, 70, False),   # both kinds above the tree threshold
        (1, 100, 70, True),    # moving spheres in the tree
        (2, 70, 10, False),    # sphere tree + quad brute
        (3, 5, 70, False),     # sphere brute + quad tree
        (4, 40, 20, False),    # both brute (below tree threshold)
        (5, 9, 0, False),      # padding edge: non-multiple-of-8 spheres
    ],
)
def test_trace_kernels_match_xla_brute(pallas_interpret, seed, n_s, n_q, moving):
    from zig_weekend_raytracer_tpu.ops.pallas_trace import closest_hit_pallas
    from zig_weekend_raytracer_tpu.ops.trace import _closest_hit_brute

    scene, rng = _random_scene(seed, n_s, n_q, moving=moving)
    n = 640  # not a BLK multiple: exercises ray padding
    org, d = _random_rays(rng, n)
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))

    t, kind, idx = closest_hit_pallas(scene, org, d, time, 1e-3)
    ref = _closest_hit_brute(scene, org, d, time, 1e-3, jnp.inf)

    np.testing.assert_array_equal(np.asarray(kind), np.asarray(ref.kind))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.idx))
    tt, rt = np.asarray(t), np.asarray(ref.t)
    finite = np.isfinite(rt)
    assert (np.isfinite(tt) == finite).all()
    # near-tangent hits amplify f32 cancellation in disc = h^2 - a*c by
    # ~100 ulps between differently-fused compilations; the prim identity
    # asserts above are the strict check
    np.testing.assert_allclose(tt[finite], rt[finite], rtol=3e-4, atol=1e-3)


def test_trace_kernel_dead_rays_skipped(pallas_interpret):
    """All-dead tiles are retired by the alive short-circuit; dead rays
    report no hit."""
    from zig_weekend_raytracer_tpu.ops.pallas_trace import closest_hit_pallas

    scene, rng = _random_scene(6, 40, 0)
    n = 2048
    org, d = _random_rays(rng, n)
    active = jnp.zeros((n,), bool).at[:1024].set(True)
    t, kind, idx = closest_hit_pallas(
        scene, org, d, jnp.zeros(n), 1e-3, active=active
    )
    assert (np.asarray(kind)[1024:] == -1).all()
    assert np.isinf(np.asarray(t)[1024:]).all()


@pytest.mark.parametrize("name", ["cornell_box", "emissive", "balls", "shrek_quads"])
def test_bounce_kernel_matches_xla_integrator(pallas_interpret, name):
    """Full renders through the fused bounce kernel are bitwise-equal to the
    XLA integrator (identical RNG streams and math)."""
    scene = zwrt.models.load_scene(name)
    r = Renderer(samples_per_pixel=2, max_ray_bounce_depth=3, seed=0)
    fb_kernel = r.render(scene, 16, 16)

    os.environ["ZWRT_NO_PALLAS"] = "1"
    from zig_weekend_raytracer_tpu.ops.trace import _use_pallas_backend

    _use_pallas_backend.cache_clear()
    try:
        fb_ref = r.render(scene, 16, 16)
    finally:
        del os.environ["ZWRT_NO_PALLAS"]
        _use_pallas_backend.cache_clear()

    assert np.isfinite(fb_kernel).all()
    np.testing.assert_allclose(fb_kernel, fb_ref, rtol=1e-6, atol=1e-7)


def test_bounce_kernel_matches_xla_integrator_earth(pallas_interpret):
    """earth is the scene that puts SPHERE image UVs through the kernel:
    its polynomial acos/atan2 (max err ~2e-7 rad) can pick the neighboring
    texel exactly at nearest-texel boundaries, so kernel == XLA holds
    bitwise everywhere EXCEPT a bounded set of isolated texel-boundary
    pixels (observed: 2/256 pixels, |d| <= 0.035 — a one-texel color step,
    never a wrong path)."""
    scene = zwrt.models.load_scene("earth")
    r = Renderer(samples_per_pixel=2, max_ray_bounce_depth=3, seed=0)
    fb_kernel = np.asarray(r.render(scene, 16, 16))

    os.environ["ZWRT_NO_PALLAS"] = "1"
    from zig_weekend_raytracer_tpu.ops.trace import _use_pallas_backend

    _use_pallas_backend.cache_clear()
    try:
        fb_ref = np.asarray(r.render(scene, 16, 16))
    finally:
        del os.environ["ZWRT_NO_PALLAS"]
        _use_pallas_backend.cache_clear()

    assert np.isfinite(fb_kernel).all()
    d = np.abs(fb_kernel - fb_ref).max(-1)
    assert (d > 1e-6).mean() < 0.02, (d > 1e-6).sum()  # isolated pixels
    assert d.max() < 0.1, d.max()  # a texel step, not a divergent path
    np.testing.assert_allclose(fb_kernel.mean(), fb_ref.mean(), rtol=1e-3)


def test_balanced_render_matches_plain(pallas_interpret):
    """The profile-guided balanced driver (estimation pass + split lane
    plan) produces the same image as the plain fused render — the
    content-addressed RNG makes the result invariant to how samples are
    assigned to lanes."""
    scene = zwrt.models.load_scene("cornell_box")
    r_bal = Renderer(
        samples_per_pixel=32, max_ray_bounce_depth=4, balance_min_spp=32
    )
    fb_bal = r_bal.render(scene, 24, 24)

    r_plain = Renderer(samples_per_pixel=32, max_ray_bounce_depth=4)
    fb_plain = r_plain.render(scene, 24, 24)

    assert np.isfinite(fb_bal).all()
    np.testing.assert_allclose(fb_bal, fb_plain, rtol=2e-5, atol=2e-6)


def test_balanced_render_matches_plain_image_scene(pallas_interpret):
    """Same invariance on an IMAGE scene, which runs the per-bounce kernel
    (the fused megakernel cannot apply image textures in-kernel) — the
    balanced driver measured slower there too (renderer.py policy note)
    but remains a supported configuration."""
    scene = zwrt.models.load_scene("shrek_quads")
    r_bal = Renderer(
        samples_per_pixel=32, max_ray_bounce_depth=4, balance_min_spp=32
    )
    fb_bal = r_bal.render(scene, 24, 24)

    r_plain = Renderer(samples_per_pixel=32, max_ray_bounce_depth=4)
    fb_plain = r_plain.render(scene, 24, 24)

    assert np.isfinite(fb_bal).all()
    np.testing.assert_allclose(fb_bal, fb_plain, rtol=2e-5, atol=2e-6)


def test_balance_plan_covers_each_sample_once():
    """Every (pixel, sample) pair in [spp_est, spp) is owned by exactly one
    lane of the plan; surplus lanes are dead."""
    from zig_weekend_raytracer_tpu.render.renderer import build_balance_plan

    rng = np.random.default_rng(0)
    rows, width, spp_est, spp = 8, 16, 4, 64
    work = rng.integers(1, 50, (rows, width))
    budget = 256
    px, py, s0, s1 = build_balance_plan(work, 2, spp_est, spp, budget, None)
    assert len(px) == budget
    counts = np.zeros((rows, width, spp), np.int32)
    for x, y, a, b in zip(px, py, s0, s1):
        if b > a:
            counts[y - 2, x, a:b] += 1
    assert (counts[:, :, spp_est:] == 1).all()
    assert (counts[:, :, :spp_est] == 0).all()


def test_fused_work_counter(pallas_interpret):
    """want_work returns per-lane traced-call counts consistent with the
    sample budget (>= one call per sample, <= max_depth per sample)."""
    import jax

    from zig_weekend_raytracer_tpu.render.camera import camera_consts
    from zig_weekend_raytracer_tpu.render.integrator import trace_paths_regen
    from zig_weekend_raytracer_tpu.sampling.sampler import SamplerKind

    scene = zwrt.models.load_scene("cornell_box")
    W = H = 8
    spp, depth = 4, 5
    cam_c = camera_consts(scene.camera, W, H)
    BLK = scene.compiled.rows * 128  # scene wavefront block
    n = -(-W * H // BLK) * BLK
    ys, xs = np.divmod(np.arange(n) % (W * H), W)
    px = jnp.asarray(xs.astype(np.int32))
    py = jnp.asarray(ys.astype(np.int32))
    s0 = jnp.zeros((n,), jnp.int32)
    limit = jnp.where(jnp.arange(n) < W * H, spp, 0).astype(jnp.int32)
    rad, work = trace_paths_regen(
        scene.compiled, cam_c, jnp.uint32(0), px, py, s0, limit,
        sampler=SamplerKind.SOBOL, width=W, height=H, spp=spp, stride=1,
        max_depth=depth, has_dof=False, want_work=True,
    )
    w = np.asarray(work)
    assert (w[: W * H] >= spp).all()
    assert (w[: W * H] <= spp * depth).all()
    assert (w[W * H :] == 0).all()


def test_unified_tree_render_matches_xla(pallas_interpret):
    """Scenes where BOTH kinds are tree-sized walk the unified kind-pure
    tree (ops/pallas_bounce.py:_uni_tree_pass) — renders must stay
    bit-comparable to the XLA integrator, and the unified walk must agree
    with the two per-kind walks (the default; the unified walk measured
    slower on hardware and is opt-in via ZWRT_UNI_TREE).  A small forced
    leaf span keeps interpret mode fast AND forces a real multi-leaf tree
    (mixed-kind splits included)."""
    from zig_weekend_raytracer_tpu.ops.trace import _use_pallas_backend

    prior_span = os.environ.get("ZWRT_LEAF_GROUPS")
    os.environ["ZWRT_LEAF_GROUPS"] = "4"
    os.environ["ZWRT_UNI_TREE"] = "1"
    try:
        rng = np.random.default_rng(11)
        bb = SceneBuilder()
        mat = bb.lambertian(bb.solid_color((0.5, 0.5, 0.5)))
        for _ in range(70):
            bb.add(
                bb.sphere(rng.uniform(-10, 10, 3), rng.uniform(0.2, 1.5), mat)
            )
        for _ in range(70):
            bb.add(bb.quad(
                rng.uniform(-10, 10, 3), rng.uniform(-2, 2, 3),
                rng.uniform(-2, 2, 3), mat,
            ))
        bb.use_bvh(True, min_prims=2)
        bb.set_camera(Camera(look_from=(0, 0, 30), look_at=(0, 0, 0)))
        bb.set_background((0.6, 0.7, 0.9))
        full = bb.compile()
        assert full.compiled.has_uni_tree
        assert full.compiled.uni_tree_box.shape[0] > 3  # real tree

        r = Renderer(samples_per_pixel=1, max_ray_bounce_depth=3, seed=0)
        fb_uni = r.render(full, 12, 12)

        del os.environ["ZWRT_UNI_TREE"]
        per_kind = bb.compile()
        assert not per_kind.compiled.has_uni_tree
        fb_kind = r.render(per_kind, 12, 12)

        os.environ["ZWRT_NO_PALLAS"] = "1"
        _use_pallas_backend.cache_clear()
        try:
            fb_ref = r.render(full, 12, 12)
        finally:
            del os.environ["ZWRT_NO_PALLAS"]
            _use_pallas_backend.cache_clear()
    finally:
        if prior_span is None:
            del os.environ["ZWRT_LEAF_GROUPS"]
        else:
            os.environ["ZWRT_LEAF_GROUPS"] = prior_span
        os.environ.pop("ZWRT_UNI_TREE", None)

    assert np.isfinite(fb_uni).all()
    np.testing.assert_allclose(fb_uni, fb_kind, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(fb_uni, fb_ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("trav", ["queue", "rowqueue", "spec"])
def test_queue_traversal_matches_default(pallas_interpret, trav):
    """The alternative traversals — branchless SMEM queues
    (ops/pallas_bounce.py:_tree_pass_queue) and the speculative
    two-successor walk (_tree_pass_spec), all opt-in via ZWRT_TRAV — must
    render bit-identically to the default lax.cond walk.  Both modes
    measured NEGATIVE on a v5e (BASELINE.md round-3 sweeps) and stay
    opt-in for A/B; a small forced leaf span makes a real multi-leaf tree
    so the queue actually fills."""
    prior_span = os.environ.get("ZWRT_LEAF_GROUPS")
    os.environ["ZWRT_LEAF_GROUPS"] = "2"
    try:
        scene = zwrt.models.load_scene("balls")
        assert scene.compiled.has_sph_tree
        r = Renderer(samples_per_pixel=2, max_ray_bounce_depth=3, seed=0)
        os.environ["ZWRT_TRAV"] = trav
        try:
            fb_queue = r.render(scene, 12, 12)
        finally:
            del os.environ["ZWRT_TRAV"]
        # ZWRT_TRAV is read at trace time but is not part of the jit cache
        # key (it is a fresh-process sweep flag); drop the cached traces so
        # the default walk really recompiles
        import jax

        jax.clear_caches()
        fb_cond = r.render(scene, 12, 12)
    finally:
        if prior_span is None:
            del os.environ["ZWRT_LEAF_GROUPS"]
        else:
            os.environ["ZWRT_LEAF_GROUPS"] = prior_span

    assert np.isfinite(fb_queue).all()
    np.testing.assert_allclose(fb_queue, fb_cond, rtol=1e-6, atol=1e-7)


def test_atlas_chain_kernel_matches_xla(pallas_interpret):
    """The K-slot atlas-event chain (buffered events + radiance segments +
    reset sentinels, ops/pallas_bounce.py regen loop) only engages for
    scenes with BOTH a group tree and image textures — none of the
    reference scenes small enough for interpret mode have both, so this
    synthetic one pins it: 80 spheres (tree) around two image-textured
    spheres, renders bit-comparable to the XLA integrator."""
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    img = np.zeros((4, 4, 3), np.uint8)
    img[::2, ::2] = (200, 40, 40)
    img[1::2, 1::2] = (40, 200, 40)
    m_img = b.lambertian(b.image_texture(img))
    m_gray = b.lambertian(b.solid_color((0.6, 0.6, 0.6)))
    # two big image spheres in front: most paths hit an atlas event
    b.add(b.sphere((-3, 0, 0), 3.0, m_img))
    b.add(b.sphere((4, 0, -2), 2.5, m_img))
    for _ in range(80):
        b.add(b.sphere(rng.uniform(-12, 12, 3), rng.uniform(0.3, 1.0), m_gray))
    b.use_bvh(True, min_prims=2)
    b.set_camera(Camera(look_from=(0, 0, 25), look_at=(0, 0, 0)))
    b.set_background((0.7, 0.8, 1.0))
    scene = b.compile()
    assert scene.compiled.has_sph_tree and scene.compiled.has_image_textures

    r = Renderer(samples_per_pixel=4, max_ray_bounce_depth=5, seed=0)
    fb_kernel = r.render(scene, 16, 16)

    os.environ["ZWRT_NO_PALLAS"] = "1"
    from zig_weekend_raytracer_tpu.ops.trace import _use_pallas_backend

    _use_pallas_backend.cache_clear()
    try:
        fb_ref = r.render(scene, 16, 16)
    finally:
        del os.environ["ZWRT_NO_PALLAS"]
        _use_pallas_backend.cache_clear()

    assert np.isfinite(fb_kernel).all()
    # the chain reassociates the tex-factor multiplies (segment sums scaled
    # afterwards), so allow a few ULP beyond the usual bitwise match
    np.testing.assert_allclose(fb_kernel, fb_ref, rtol=3e-5, atol=3e-6)

    # the driver's COMPACTED chain fold (integrator.py, opt-in via
    # ZWRT_CHAIN_CAP_DIV — measured slower, default off) must agree with
    # the default full-wavefront fold up to reassociation (compaction
    # sums the K slot contributions before the scatter-add).  div=1 makes
    # cap = nn so the compact branch is always taken; clear_caches so the
    # same shape retraces with the flag applied.
    import jax

    os.environ["ZWRT_CHAIN_CAP_DIV"] = "1"
    jax.clear_caches()
    try:
        fb_compact = r.render(scene, 16, 16)
    finally:
        del os.environ["ZWRT_CHAIN_CAP_DIV"]
        jax.clear_caches()
    np.testing.assert_allclose(fb_kernel, fb_compact, rtol=2e-6, atol=1e-7)


def test_pick_rows_and_with_rows():
    """Per-scene wavefront width selection (round-4 tile-width landing):
    CPU backends always get the narrow default, the env override wins,
    and with_rows round-trips as a cheap static-field copy."""
    import os
    from unittest import mock

    import zig_weekend_raytracer_tpu as zwrt
    from zig_weekend_raytracer_tpu.ops.pallas_trace import (
        ROWS_DEFAULT, pick_rows,
    )

    # this suite runs on the CPU backend -> narrow everywhere
    sc = zwrt.models.load_scene("cornell_box").compiled
    assert sc.rows == ROWS_DEFAULT

    assert pick_rows(has_tree=True, has_image_textures=False) == ROWS_DEFAULT
    with mock.patch.dict(os.environ, {"ZWRT_ROWS": "32"}):
        assert pick_rows(has_tree=True, has_image_textures=False) == 32
    with mock.patch.dict(os.environ, {"ZWRT_ROWS": "12"}):
        import pytest

        with pytest.raises(ValueError):
            pick_rows(has_tree=False, has_image_textures=False)

    wide = sc.with_rows(64)
    assert wide.rows == 64 and sc.rows == ROWS_DEFAULT
    assert wide.with_rows(64) is wide
    assert sc.with_rows(sc.rows) is sc
    # array leaves are shared, not copied
    assert wide.shade_lut is sc.shade_lut


def test_wide_rows_render_matches_narrow(pallas_interpret):
    """Kernel-path agreement: the same scene rendered with a widened
    wavefront tile is BITWISE identical (per-lane math is row-count
    invariant; only the tile partitioning changes).  Device-scale check:
    the rows 8/16/32/64 sweep produced identical image means on the v5e
    (BASELINE.md round 4)."""
    import dataclasses

    import numpy as np

    import zig_weekend_raytracer_tpu as zwrt
    from zig_weekend_raytracer_tpu.render import Renderer

    scene = zwrt.models.load_scene("cornell_box")
    r = Renderer(samples_per_pixel=2, max_ray_bounce_depth=3, seed=0)
    fb8 = np.asarray(r.render(scene, 40, 24))

    wide = dataclasses.replace(scene, compiled=scene.compiled.with_rows(16))
    fb16 = np.asarray(r.render(wide, 40, 24))
    np.testing.assert_array_equal(fb8, fb16)
