"""Texture image loading (cold path: decode happens once at scene build; the
pixels live in the device atlas afterwards).

Primary path: the native stb_image decoder (the same library the reference
vendors, libs/zstbi); fallback: PIL.  Missing files resolve to the magenta
1x1 debug image, matching the reference's null-object fake
(src/image.zig:5,35; src/texture.zig:53-55).
"""

from __future__ import annotations

import logging
import os

import numpy as np

log = logging.getLogger("zwrt")

DEBUG_MAGENTA = np.full((1, 1, 3), (255, 0, 255), np.uint8)


def load_image(path: str) -> np.ndarray:
    """Returns (H, W, 3) uint8; magenta debug image when missing/undecodable."""
    if not os.path.exists(path):
        log.warning("image not found, using debug color: %s", path)
        return DEBUG_MAGENTA.copy()

    data = open(path, "rb").read()

    from . import native

    img = native.decode_image(data) if native.available() else None
    if img is None:
        try:
            import io as _io

            from PIL import Image

            with Image.open(_io.BytesIO(data)) as im:
                img = np.asarray(im.convert("RGB"), np.uint8)
        except Exception as e:  # noqa: BLE001
            log.warning("failed to decode %s (%s), using debug color", path, e)
            return DEBUG_MAGENTA.copy()
    log.debug("Loaded %s (%dx%d)", path, img.shape[1], img.shape[0])
    return img
