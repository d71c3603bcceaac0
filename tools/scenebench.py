"""Per-scene steady-state throughput microbench (experiment harness).

Usage: python tools/scenebench.py <scene> [w] [h] [spp] [depth] [reps]

Forces a host read per rep (the tunneled backend's block_until_ready
returns early — same methodology as bench.py).
"""

import sys
import time

import numpy as np


def main() -> None:
    import zig_weekend_raytracer_tpu as zwrt

    scene_name = sys.argv[1] if len(sys.argv) > 1 else "cornell_box"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    depth = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    reps = int(sys.argv[6]) if len(sys.argv) > 6 else 3

    scene = zwrt.models.load_scene(scene_name)
    renderer = zwrt.render.Renderer(
        samples_per_pixel=spp, max_ray_bounce_depth=depth
    )

    t0 = time.time()
    fb = renderer.render_device(scene, width, height)
    float(fb.sum())
    warm = time.time() - t0

    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fb = renderer.render_device(scene, width, height)
        float(fb.sum())
        best = min(best, time.time() - t0)

    fb_host = np.asarray(fb)
    nan = bool(np.isnan(fb_host).any())
    mpaths = width * height * spp / best / 1e6
    print(
        f"{scene_name} {width}x{height}@{spp}spp d{depth}: "
        f"best {best:.3f}s ({mpaths:.1f} Mpaths/s), warm {warm:.1f}s, "
        f"nan={nan}, mean={fb_host.mean():.4f}"
    )


if __name__ == "__main__":
    sys.exit(main())
