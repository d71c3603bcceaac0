"""Measure shard_map overhead on ONE chip (VERDICT r3 #6).

No multi-chip hardware exists in this environment, so the multi-chip story
is bounded from the single-chip side: run the production megakernel path
through ``parallel.render_sharded`` with a 1-device mesh and compare
against the direct ``Renderer.render_device`` at the bench config.  The
delta prices the shard_map plumbing (shard_map tracing, psum on the
'samples' mode, out-spec reassembly) with zero actual communication --
any gap beyond ~5% means the sharded path costs more than the collectives
it exists to ride, and must be diagnosed.

Usage: python tools/shard_overhead.py [w] [h] [spp] [depth] [reps]
Prints one JSON line with the three timings + overhead ratios.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_best(fn, reps):
    out = fn()
    float(np.asarray(out).sum())  # force completion (tunneled backend)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        float(np.asarray(out).sum())
        best = min(best, time.time() - t0)
    return best, np.asarray(out)


def main() -> None:
    import zig_weekend_raytracer_tpu as zwrt
    from zig_weekend_raytracer_tpu.parallel.mesh import make_mesh
    from zig_weekend_raytracer_tpu.parallel.render import render_sharded

    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 400
    height = int(args[1]) if len(args) > 1 else 400
    spp = int(args[2]) if len(args) > 2 else 1024
    depth = int(args[3]) if len(args) > 3 else 10
    reps = int(args[4]) if len(args) > 4 else 3

    scene = zwrt.models.load_scene("cornell_box")
    renderer = zwrt.render.Renderer(
        samples_per_pixel=spp, max_ray_bounce_depth=depth
    )
    mesh = make_mesh(1)

    t_direct, fb_direct = _time_best(
        lambda: renderer.render_device(scene, width, height), reps)
    t_samples, fb_samples = _time_best(
        lambda: render_sharded(scene, width, height, spp, max_depth=depth,
                               mesh=mesh, shard="samples"), reps)
    t_rows, fb_rows = _time_best(
        lambda: render_sharded(scene, width, height, spp, max_depth=depth,
                               mesh=mesh, shard="rows"), reps)

    # The sharded paths are bitwise-identical by design (content-addressed
    # RNG); a mismatch here means the sharded path diverged from production.
    agree_samples = bool(np.allclose(fb_direct, fb_samples, atol=1e-5))
    agree_rows = bool(np.allclose(fb_direct, fb_rows, atol=1e-5))

    print(json.dumps({
        "config": f"cornell_box {width}x{height}@{spp}spp d{depth} (1-dev mesh)",
        "direct_s": round(t_direct, 4),
        "sharded_samples_s": round(t_samples, 4),
        "sharded_rows_s": round(t_rows, 4),
        "overhead_samples": round(t_samples / t_direct - 1.0, 4),
        "overhead_rows": round(t_rows / t_direct - 1.0, 4),
        "agree_samples": agree_samples,
        "agree_rows": agree_rows,
    }))
    if not (agree_samples and agree_rows):
        sys.exit(1)


if __name__ == "__main__":
    main()
