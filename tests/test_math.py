"""Math core tests, mirroring the reference's inline tests
(src/math/math.zig:124-295), against the production SoA ``V3`` API
(math/v3.py — the lane-major layout every kernel uses)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zig_weekend_raytracer_tpu.math import v3
from zig_weekend_raytracer_tpu.math.v3 import V3


def sv(x, y, z):
    """Single-lane V3 (shape (1,)) for scalar-style checks."""
    return V3(
        jnp.asarray([x], jnp.float32),
        jnp.asarray([y], jnp.float32),
        jnp.asarray([z], jnp.float32),
    )


def as_np(v: V3) -> np.ndarray:
    return np.asarray(v.to_array())[0]


class TestV3:
    def test_cross(self):
        u = sv(1, 0, 0)
        np.testing.assert_allclose(
            as_np(v3.cross(u, sv(0, 1, 0))), [0, 0, 1], atol=1e-6
        )
        np.testing.assert_allclose(
            as_np(v3.cross(u, sv(0, -1, 0))), [0, 0, -1], atol=1e-6
        )

    def test_dot(self):
        got = float(v3.dot(sv(1, 1, 1), sv(2, 2, 2))[0])
        assert got == pytest.approx(6.0)

    def test_length(self):
        assert float(v3.length(sv(1, 1, 1))[0]) == pytest.approx(np.sqrt(3.0))

    def test_normalize(self):
        n = v3.normalize(sv(1, 2, 3))
        assert float(v3.length(n)[0]) == pytest.approx(1.0, rel=1e-5)

    def test_reflect(self):
        # 45-degree incidence on a z-plane
        out = v3.reflect(sv(1, 0, -1), sv(0, 0, 1))
        np.testing.assert_allclose(as_np(out), [1, 0, 1], atol=1e-6)

    def test_refract_straight_through(self):
        # index 1.0 => direction unchanged
        vin = v3.normalize(sv(0.3, -0.2, -1.0))
        out = v3.refract(vin, sv(0, 0, 1), 1.0)
        np.testing.assert_allclose(as_np(out), as_np(vin), atol=1e-6)

    def test_refract_snell(self):
        # 45 degrees into index 1.5 medium: sin(theta_t) = sin(45)/1.5
        vin = v3.normalize(sv(1, 0, -1))
        out = v3.normalize(v3.refract(vin, sv(0, 0, 1), 1.0 / 1.5))
        sin_t = float(jnp.abs(out.x)[0])
        assert sin_t == pytest.approx(np.sin(np.pi / 4) / 1.5, rel=1e-5)

    def test_lerp(self):
        out = v3.lerp(sv(0, 0, 0), sv(2, 4, 6), 0.5)
        np.testing.assert_allclose(as_np(out), [1, 2, 3], atol=1e-6)

    def test_batched_shapes(self):
        u = V3.full((128,), 1.0, 1.0, 1.0)
        v = V3.full((128,), 1.0, 1.0, 1.0)
        assert v3.dot(u, v).shape == (128,)
        assert v3.cross(u, v).shape == (128,)
        assert v3.normalize(u).shape == (128,)

    def test_array_roundtrip(self):
        a = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], jnp.float32)
        np.testing.assert_allclose(V3.from_array(a).to_array(), a)


class TestOrthoBasis:
    def test_orthonormal(self):
        n = sv(0.3, -0.8, 0.5)
        b = v3.ortho_basis(n)
        assert float(v3.dot(b.u, b.v)[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(v3.dot(b.u, b.w)[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(v3.dot(b.v, b.w)[0]) == pytest.approx(0.0, abs=1e-6)
        for a in b:
            assert float(v3.length(a)[0]) == pytest.approx(1.0, rel=1e-5)

    def test_w_aligned(self):
        b = v3.ortho_basis(sv(0, 10, 0))
        np.testing.assert_allclose(as_np(b.w), [0, 1, 0], atol=1e-6)

    def test_transform_z_is_w(self):
        b = v3.ortho_basis(sv(1, 2, -1))
        out = v3.onb_transform(b, sv(0, 0, 1))
        np.testing.assert_allclose(as_np(out), as_np(b.w), atol=1e-6)


class TestColorSpace:
    """The gamma-2 pair: byte -> linear squares (textures.py:79, covered by
    tests/test_textures.py:test_gamma_linearization); linear -> display is
    encode_pixels' sqrt (io/ppm.py) — the reference's math.zig:172-179."""

    def test_gamma2_byte_roundtrip_exact(self):
        # Every byte value, linearized with the texture convention
        # ((b/255)^2), must encode back to exactly itself: sqrt recovers
        # b/255, and floor(b * 256/255) == b for all b in [0, 255].
        from zig_weekend_raytracer_tpu.io.ppm import encode_pixels

        b = np.arange(256, dtype=np.float32)
        linear = (b / 255.0) ** 2
        fb = np.repeat(linear, 3).reshape(16, 16, 3)
        out = encode_pixels(fb)
        np.testing.assert_array_equal(
            out, np.repeat(b.astype(np.uint8), 3).reshape(16, 16, 3)
        )

    def test_encode_scrubs_nan_and_clamps(self):
        from zig_weekend_raytracer_tpu.io.ppm import encode_pixels

        fb = np.array([[[np.nan, -0.5, 9.0]]], np.float32)
        out = encode_pixels(fb)
        # NaN -> 0, negative -> 0, >1 radiance clamps to 255 (0.999 * 256)
        np.testing.assert_array_equal(out, [[[0, 0, 255]]])
