"""Image comparison: MSE / PSNR / mean stats between two renders.

Usage:  python tools/imgdiff.py a.ppm b.png [ref.png]

With two images, prints their difference stats.  With three, prints each
image's error AGAINST the reference — the workflow for judging the
adaptive sampler or the indirect clamp at equal budget:

    python tools/imgdiff.py uniform.png adaptive.png ref_4096spp.png

Accepts anything PIL opens (PPM/PNG/JPEG); compares in linear space by
inverting the writer's gamma-2 (io/ppm.py:encode_pixels)."""

import sys

import numpy as np


def load_linear(path: str) -> np.ndarray:
    from PIL import Image

    srgb = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return srgb * srgb  # invert gamma-2


def stats(a: np.ndarray, b: np.ndarray) -> dict:
    if a.shape != b.shape:
        raise SystemExit(f"shape mismatch: {a.shape} vs {b.shape}")
    d = a - b
    mse = float((d * d).mean())
    peak = max(float(a.max()), float(b.max()), 1e-20)
    return {
        "mse": mse,
        "rmse": mse ** 0.5,
        "psnr_db": float("inf") if mse == 0 else
        10.0 * np.log10(peak * peak / mse),
        "mean_a": float(a.mean()),
        "mean_b": float(b.mean()),
        "max_abs": float(np.abs(d).max()),
    }


def _fmt(s: dict) -> str:
    return (
        f"mse={s['mse']:.3e} rmse={s['rmse']:.3e} psnr={s['psnr_db']:.2f}dB "
        f"max|d|={s['max_abs']:.4f} means={s['mean_a']:.4f}/{s['mean_b']:.4f}"
    )


def main(argv) -> int:
    if len(argv) not in (2, 3):
        print(__doc__, file=sys.stderr)
        return 2
    imgs = [load_linear(p) for p in argv]
    if len(argv) == 2:
        print(f"{argv[0]} vs {argv[1]}: {_fmt(stats(imgs[0], imgs[1]))}")
    else:
        ref = imgs[2]
        for path, im in zip(argv[:2], imgs[:2]):
            print(f"{path} vs ref: {_fmt(stats(im, ref))}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
