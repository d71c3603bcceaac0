"""Benchmark harness: renders the north-star config on real TPU hardware and
prints ONE JSON line for the driver.

North-star config (BASELINE.json): Cornell box 400x400 @ 1024 spp (nearest
power of two to the stated 1k; Sobol wants pow2), depth 10, < 1 s on one
v5e chip = ~160 Mpaths/s.  vs_baseline = achieved Mpaths/s / 160, i.e.
>= 1.0 means the north star is met.  Steady-state: the first (warmup)
render also measures the per-pixel cost map that later renders use for
cost-sorted tile packing (render/renderer.py:_render_band_sorted_driver).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import zig_weekend_raytracer_tpu as zwrt

    width = height = 400
    spp = 1024
    depth = 10
    scene = zwrt.models.load_scene("cornell_box")
    renderer = zwrt.render.Renderer(
        samples_per_pixel=spp, max_ray_bounce_depth=depth
    )

    # warmup / compile (persistent cache makes this cheap on reruns).
    # NOTE: timing forces a host read — on the tunneled TPU backend,
    # block_until_ready() returns before the device work completes.
    fb = renderer.render_device(scene, width, height)
    float(fb.sum())

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fb = renderer.render_device(scene, width, height)
        float(fb.sum())
        best = min(best, time.time() - t0)

    fb_host = np.asarray(fb)
    assert not np.isnan(fb_host).any()
    assert fb_host.max() > 1.0  # light visible => render is sane

    paths = width * height * spp
    mpaths_per_s = paths / best / 1e6
    north_star_mpaths_per_s = 400 * 400 * 1000 / 1.0 / 1e6  # 160
    print(
        json.dumps(
            {
                "metric": "cornell_box 400x400 @1024spp depth10 path throughput (1 v5e chip; north-star config)",
                "value": round(mpaths_per_s, 2),
                "unit": "Mpaths/s",
                "vs_baseline": round(mpaths_per_s / north_star_mpaths_per_s, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
