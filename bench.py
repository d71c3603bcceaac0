"""Benchmark harness: renders the north-star config on real TPU hardware and
prints ONE JSON line for the driver.

North-star config (BASELINE.json): Cornell box 400x400 @ 1024 spp (nearest
power of two to the stated 1k; Sobol wants pow2), depth 10, < 1 s on one
v5e chip = ~160 Mpaths/s.  vs_baseline = achieved Mpaths/s / 160, i.e.
>= 1.0 means the north star is met.  Steady-state: the first (warmup)
render also measures the per-pixel cost map that later renders use for
cost-sorted tile packing (render/renderer.py:_render_band_sorted_driver).

Besides timing, the JSON line carries:
  * ``correctness``: the TPU framebuffer is compared against committed
    CPU/XLA region statistics (tests/golden/bench_cornell_regions.json,
    regenerate with tools/gen_bench_golden.py) — a compiled-Mosaic
    miscompile that shifted brightness or broke a region fails the bench,
    not just eyeballs.  "fail:..." AND a nonzero exit on divergence.
  * ``vpu_util_est``: achieved VPU utilization from a measured bounce-
    iteration count (the kernel's work counter) x a static per-iteration
    FLOP model, against an assumed v5e VPU peak of 3.1 TFLOP/s (1024
    lanes x 2 FLOP FMA x ~1.5 GHz, single issue).  Path tracing here
    never touches the MXU, so the VPU roofline is the honest ceiling;
    see BASELINE.md for the per-scene bound analysis.
"""

import json
import os
import sys
import time

import numpy as np

WIDTH = HEIGHT = 400
SPP = 1024
DEPTH = 10
GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tests", "golden", "bench_cornell_regions.json",
)

# Per-bounce-iteration FLOP model for cornell_box (brute trace: 1 sphere
# group of 8 + 3 quad groups of 8 per lane-iteration; counts from the
# kernel math in ops/pallas_trace.py:_sphere_group_hits/_quad_group_hits
# and the shade/RNG/light-mixture tail of ops/pallas_bounce.py:_bounce_core).
FLOPS_SPHERE_PRIM = 23
FLOPS_QUAD_PRIM = 30
FLOPS_SHADE_TAIL = 550
VPU_PEAK_FLOPS = 1024 * 2 * 1.5e9  # 3.07 TFLOP/s (assumed v5e VPU peak)


def check_regions(fb: np.ndarray) -> str:
    """Compare the TPU framebuffer against the committed CPU reference
    statistics with the calibrated two-tier gate (global mean 1%, hard
    per-region 10%+5e-3, soft count >5 regions past 2%+1e-3 — measured
    justification in utils/goldengate.py).  Returns 'pass (...)' or
    'fail:<detail>'."""
    if not os.path.exists(GOLDEN):
        return "skip:no-golden"
    from zig_weekend_raytracer_tpu.utils.goldengate import check_framebuffer

    with open(GOLDEN) as f:
        ref = json.load(f)
    return check_framebuffer(fb, ref["mean"], np.asarray(ref["region_means"]))


def measure_iterations_per_path(scene, spp_probe: int = 64) -> float:
    """Mean bounce-kernel iterations per path from the production work
    counter (the same counter the profile-guided balancer uses)."""
    import jax.numpy as jnp

    from zig_weekend_raytracer_tpu.ops.pallas_trace import BLK
    from zig_weekend_raytracer_tpu.render.camera import camera_consts
    from zig_weekend_raytracer_tpu.render.integrator import trace_paths_regen
    from zig_weekend_raytracer_tpu.sampling.sampler import SamplerKind

    cam_c = camera_consts(scene.camera, WIDTH, HEIGHT)
    n_pix = WIDTH * HEIGHT
    n = -(-n_pix // BLK) * BLK
    idx = np.arange(n) % n_pix
    ys, xs = np.divmod(idx, WIDTH)
    px = jnp.asarray(xs.astype(np.int32))
    py = jnp.asarray(ys.astype(np.int32))
    limit = jnp.where(jnp.arange(n) < n_pix, spp_probe, 0).astype(jnp.int32)
    _, work = trace_paths_regen(
        scene.compiled, cam_c, jnp.uint32(0), px, py,
        jnp.zeros((n,), jnp.int32), limit,
        sampler=SamplerKind.SOBOL, width=WIDTH, height=HEIGHT,
        spp=spp_probe, stride=1, max_depth=DEPTH, has_dof=False,
        want_work=True,
    )
    w = np.asarray(work)[:n_pix]
    return float(w.sum()) / (n_pix * spp_probe)


def main() -> None:
    import zig_weekend_raytracer_tpu as zwrt

    scene = zwrt.models.load_scene("cornell_box")
    renderer = zwrt.render.Renderer(
        samples_per_pixel=SPP, max_ray_bounce_depth=DEPTH
    )

    # warmup / compile (persistent cache makes this cheap on reruns).
    # NOTE: timing forces a host read — on the tunneled TPU backend,
    # block_until_ready() returns before the device work completes.
    fb = renderer.render_device(scene, WIDTH, HEIGHT)
    float(fb.sum())

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fb = renderer.render_device(scene, WIDTH, HEIGHT)
        float(fb.sum())
        best = min(best, time.time() - t0)

    fb_host = np.asarray(fb)
    assert not np.isnan(fb_host).any()
    assert fb_host.max() > 1.0  # light visible => render is sane
    correctness = check_regions(fb_host)

    # VPU roofline: measured iterations x static per-iteration FLOP model.
    compiled = scene.compiled
    groups_s = -(-max(compiled.n_spheres, 1) // 8)
    groups_q = -(-max(compiled.n_quads, 1) // 8)
    flops_per_iter = (
        groups_s * 8 * FLOPS_SPHERE_PRIM
        + groups_q * 8 * FLOPS_QUAD_PRIM
        + FLOPS_SHADE_TAIL
    )
    try:
        iters_per_path = measure_iterations_per_path(scene)
    except Exception:
        iters_per_path = None  # json null, NOT NaN (invalid JSON)

    paths = WIDTH * HEIGHT * SPP
    mpaths_per_s = paths / best / 1e6
    achieved_flops = (
        paths * iters_per_path * flops_per_iter / best
        if iters_per_path is not None
        else None
    )
    north_star_mpaths_per_s = 400 * 400 * 1000 / 1.0 / 1e6  # 160
    out = {
        "metric": "cornell_box 400x400 @1024spp depth10 path throughput (1 v5e chip; north-star config)",
        "value": round(mpaths_per_s, 2),
        "unit": "Mpaths/s",
        "vs_baseline": round(mpaths_per_s / north_star_mpaths_per_s, 4),
        "correctness": correctness,
        "iters_per_path": (
            round(iters_per_path, 3) if iters_per_path is not None else None
        ),
        "flops_per_iter_est": flops_per_iter,
        "achieved_tflops_est": (
            round(achieved_flops / 1e12, 3) if achieved_flops is not None
            else None
        ),
        "vpu_util_est": (
            round(achieved_flops / VPU_PEAK_FLOPS, 3)
            if achieved_flops is not None else None
        ),
    }
    print(json.dumps(out))
    if correctness.startswith("fail"):
        sys.exit(1)


if __name__ == "__main__":
    sys.exit(main())
