"""Texture-LUT quality delta: render a scene with the exact atlas-chain
path and with the in-kernel LUT at one or more texel budgets, and print
the framebuffer difference stats (VERDICT r4 #5: publish the image delta
next to the throughput A/B).

The comparison is in LINEAR space on the raw framebuffers (no writer
gamma round trip).  The reported MSE is against the exact render of the
SAME sample count/seed, so the delta isolates the texture downsampling
bias from Monte-Carlo noise.

Usage: python tools/lut_quality.py <scene> [budget ...] [--spp=N]
       (defaults: budgets 8192 32768; spp 64; 400x400 depth 10)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render(scene_name: str, budget: int, spp: int, size: int, depth: int):
    """Build + render in a fresh scene compile under the given LUT budget
    (0 = exact atlas path)."""
    if budget:
        os.environ["ZWRT_TEX_LUT"] = str(budget)
    else:
        os.environ.pop("ZWRT_TEX_LUT", None)
    try:
        import zig_weekend_raytracer_tpu as zwrt

        scene = zwrt.models.load_scene(scene_name)
        r = zwrt.render.Renderer(
            samples_per_pixel=spp, max_ray_bounce_depth=depth
        )
        fb = np.asarray(r.render_device(scene, size, size))
        return fb, bool(scene.compiled.tex_lut_dims)
    finally:
        os.environ.pop("ZWRT_TEX_LUT", None)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = dict(
        a.lstrip("-").split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    scene = args[0] if args else "shrek_quads"
    budgets = [int(a) for a in args[1:]] or [8192, 32768]
    spp = int(flags.get("spp", 64))
    size = int(flags.get("size", 400))
    depth = int(flags.get("depth", 10))

    exact, had_lut = render(scene, 0, spp, size, depth)
    assert not had_lut
    rows = []
    for budget in budgets:
        fb, got_lut = render(scene, budget, spp, size, depth)
        d = fb - exact
        mse = float((d * d).mean())
        rows.append({
            "budget": budget,
            "lut_active": got_lut,
            "mse_vs_exact": round(mse, 8),
            "psnr_db": round(
                10 * np.log10(max(float(exact.max()), 1.0) ** 2 / mse), 2
            ) if mse > 0 else None,
            "max_abs": round(float(np.abs(d).max()), 6),
            "mean_exact": round(float(exact.mean()), 6),
            "mean_lut": round(float(fb.mean()), 6),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
    print(json.dumps({"scene": scene, "spp": spp, "size": size,
                      "depth": depth, "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
