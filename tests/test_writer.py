"""PPM writer tests: byte-exact encode semantics
(reference: src/writer/writer.zig:68-123)."""

import numpy as np
import pytest

from zig_weekend_raytracer_tpu.io import ppm
from zig_weekend_raytracer_tpu.io import native


class TestEncode:
    def test_gamma_clamp_scale(self):
        fb = np.asarray([[[0.25, 1.0, 2.0]]], np.float32)
        px = ppm.encode_pixels(fb)
        # sqrt(0.25)=0.5 -> 128; 1.0 and 2.0 clamp to 0.999 -> 255
        assert tuple(px[0, 0]) == (128, 255, 255)

    def test_nan_scrub(self):
        fb = np.asarray([[[np.nan, 0.5, np.nan]]], np.float32)
        px = ppm.encode_pixels(fb)
        assert px[0, 0, 0] == 0 and px[0, 0, 2] == 0

    def test_negative_clamps_to_zero(self):
        fb = np.asarray([[[-1.0, -0.001, 0.0]]], np.float32)
        assert tuple(ppm.encode_pixels(fb)[0, 0]) == (0, 0, 0)

    def test_max_byte_is_255(self):
        fb = np.full((1, 1, 3), 1e9, np.float32)
        assert tuple(ppm.encode_pixels(fb)[0, 0]) == (255, 255, 255)


class TestWrite:
    def _file_bytes(self, tmp_path, writer):
        fb = np.linspace(0, 2, 5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
        fb[0, 0, 0] = np.nan
        path = str(tmp_path / "out.ppm")
        writer(path, fb)
        return open(path, "rb").read()

    def test_header_and_line_format(self, tmp_path):
        data = self._file_bytes(tmp_path, ppm.write_ppm)
        lines = data.split(b"\n")
        assert lines[0] == b"P3"
        assert lines[1] == b"7 5"
        assert lines[2] == b"255"
        assert len(lines) == 3 + 5 * 7 + 1  # header + one line per pixel + EOF
        first = lines[3].split(b" ")
        assert len(first) == 3

    def test_native_matches_numpy(self, tmp_path):
        if not native.available():
            pytest.skip("native library not built")
        fb = np.random.default_rng(0).random((16, 9, 3)).astype(np.float32) * 2
        px = ppm.encode_pixels(fb)
        p1 = str(tmp_path / "numpy.ppm")
        p2 = str(tmp_path / "native.ppm")
        ppm._write_ppm_numpy(p1, px)
        native.write_ppm(p2, px)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_variable_width_decimals(self, tmp_path):
        """Each byte value is written at its minimal decimal width (no
        zero padding), matching the reference writer's %d formatting
        (src/writer/writer.zig)."""
        fb = np.zeros((1, 3, 3), np.float32)
        # chosen so the encoded bytes span 1-, 2-, and 3-digit widths
        fb[0, 0] = (0.0, 0.25, 0.999)
        fb[0, 1] = (1.0, 0.0001, 0.01)
        path = str(tmp_path / "w.ppm")
        ppm.write_ppm(path, fb)
        body = open(path, "rb").read().split(b"\n", 3)[3]
        toks = body.split()
        assert len(toks) == 9
        expected = ppm.encode_pixels(fb).reshape(-1)
        # exact round-trip: every token IS the decimal of its byte value,
        # written with minimal width (str() has no padding by definition)
        assert [int(t) for t in toks] == list(expected)
        assert all(t == str(int(t)).encode() for t in toks)
        # the chosen pixels genuinely exercise 1-, 2-, and 3-digit widths
        widths = {len(t) for t in toks}
        assert {1, 2, 3} <= widths


class TestWriteImage:
    """write_image: extension-dispatched output (PNG/JPEG beyond the
    reference's PPM-only writer; .ppm stays byte-identical)."""

    def test_png_roundtrip_matches_encode(self, tmp_path):
        rng = np.random.RandomState(3)
        fb = rng.rand(5, 7, 3).astype(np.float32) * 1.5
        path = str(tmp_path / "img.png")
        ppm.write_image(path, fb)
        from PIL import Image

        got = np.asarray(Image.open(path))
        np.testing.assert_array_equal(got, ppm.encode_pixels(fb))

    def test_ppm_path_unchanged(self, tmp_path):
        fb = np.linspace(0, 1, 2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
        p1 = str(tmp_path / "a.ppm")
        p2 = str(tmp_path / "b.ppm")
        ppm.write_ppm(p1, fb)
        ppm.write_image(p2, fb)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_unknown_extension_falls_back_to_ppm(self, tmp_path):
        fb = np.zeros((1, 1, 3), np.float32)
        path = str(tmp_path / "noext")
        ppm.write_image(path, fb)
        assert open(path, "rb").read().startswith(b"P3\n")
