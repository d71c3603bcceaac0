"""PPM (P3) output, byte-compatible with the reference writer.

Encoding parity (reference: src/writer/writer.zig:68-94):
  * NaN scrub to 0      (:83-94)
  * gamma-2 sqrt        (math.zig:177-179)
  * clamp to [0, 0.999] then * 256, truncate to u8
  * one "r g b\n" line per pixel, variable-width decimals (:96-123)

The hot path (float framebuffer -> decimal text) is delegated to the native
C++ writer (``native/ppm_writer.cpp`` — mmap + threads, mirroring the
reference's mmap'd parallel writer, src/writer/writer.zig:16-51 and
src/writer/mmap.zig); this module is the API and the pure-numpy fallback.
"""

from __future__ import annotations

import numpy as np


def encode_pixels(fb: np.ndarray) -> np.ndarray:
    """Linear f32 (H, W, 3) -> u8 (H, W, 3), matching encodeColor."""
    color = np.asarray(fb, np.float32)
    color = np.where(np.isnan(color), 0.0, color)
    color = np.sqrt(np.maximum(color, 0.0))
    color = np.clip(color, 0.0, 0.999)
    return (color * 256.0).astype(np.uint8)


def _write_ppm_numpy(path: str, pixels_u8: np.ndarray) -> None:
    h, w, _ = pixels_u8.shape
    header = f"P3\n{w} {h}\n255\n".encode()
    flat = pixels_u8.reshape(-1, 3)
    # Vectorized decimal formatting via a 256-entry byte LUT.
    lut = np.array([str(i).encode() for i in range(256)], dtype=object)
    lines = lut[flat[:, 0]] + b" " + lut[flat[:, 1]] + b" " + lut[flat[:, 2]] + b"\n"
    with open(path, "wb") as f:
        f.write(header)
        f.write(b"".join(lines.tolist()))


def write_ppm(path: str, fb: np.ndarray, n_threads: int = 0) -> None:
    """Write a linear-space framebuffer to a P3 PPM file.

    ``n_threads`` sizes the native writer's pool (0 = hardware concurrency),
    the analog of the reference's --thread_pool_size for its writer
    (src/writer/writer.zig:29-50)."""
    pixels = encode_pixels(fb)
    from . import native

    if native.available():
        native.write_ppm(path, pixels, n_threads=n_threads)
    else:
        _write_ppm_numpy(path, pixels)


def write_image(path: str, fb: np.ndarray, n_threads: int = 0) -> None:
    """Write a linear-space framebuffer, format chosen by extension.

    ``.ppm`` (and anything unrecognized) takes the reference-parity P3
    path above; ``.png`` / ``.jpg`` / ``.jpeg`` / ``.bmp`` encode the SAME
    pixel bytes (encode_pixels — gamma-2, NaN scrub, [0, 0.999] clamp)
    via PIL.  An extension convenience beyond the reference, which writes
    PPM only and converts externally (README.md shows PNG examples)."""
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if ext in ("png", "jpg", "jpeg", "bmp"):
        from PIL import Image

        Image.fromarray(encode_pixels(fb), "RGB").save(path)
    else:
        write_ppm(path, fb, n_threads=n_threads)
