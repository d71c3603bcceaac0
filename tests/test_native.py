"""Native C++ component tests: stb image decode and the ctypes boundary."""

import numpy as np
import pytest

from zig_weekend_raytracer_tpu.io import native
from zig_weekend_raytracer_tpu.io.image import load_image
from zig_weekend_raytracer_tpu.models import DEFAULT_ASSET_DIR

import os


@pytest.mark.skipif(not native.available(), reason="native lib not built")
class TestNativeDecode:
    def test_decode_matches_pil(self):
        path = os.path.join(DEFAULT_ASSET_DIR, "wap.jpg")
        if not os.path.exists(path):
            pytest.skip("asset missing")
        data = open(path, "rb").read()
        img_native = native.decode_image(data)
        assert img_native is not None

        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(data)) as im:
            img_pil = np.asarray(im.convert("RGB"), np.uint8)
        assert img_native.shape == img_pil.shape
        # JPEG decoders may differ by a few LSBs (IDCT variants)
        diff = np.abs(
            img_native.astype(np.int16) - img_pil.astype(np.int16)
        )
        assert diff.mean() < 2.0
        assert (diff <= 16).mean() > 0.999

    def test_decode_png_exact(self):
        path = os.path.join(DEFAULT_ASSET_DIR, "earth.png")
        if not os.path.exists(path):
            pytest.skip("asset missing")
        data = open(path, "rb").read()
        img_native = native.decode_image(data)

        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(data)) as im:
            img_pil = np.asarray(im.convert("RGB"), np.uint8)
        # PNG is lossless: decoders must agree exactly
        np.testing.assert_array_equal(img_native, img_pil)

    def test_decode_garbage_returns_none(self):
        assert native.decode_image(b"not an image at all") is None


def test_load_image_uses_native_or_fallback(tmp_path):
    img = load_image(os.path.join(DEFAULT_ASSET_DIR, "wap.jpg"))
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.dtype == np.uint8
    assert img.shape[0] > 100 and img.shape[1] > 100
