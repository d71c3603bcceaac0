"""Math core tests, mirroring the reference's inline tests
(src/math/math.zig:124-295) plus batched variants."""

import jax.numpy as jnp
import numpy as np
import pytest

from zig_weekend_raytracer_tpu.math import vec


def a3(*xs):
    return jnp.asarray(xs, jnp.float32)


class TestVec:
    def test_cross(self):
        u = a3(1, 0, 0)
        v = a3(0, 1, 0)
        np.testing.assert_allclose(vec.cross(u, v), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(
            vec.cross(u, a3(0, -1, 0)), [0, 0, -1], atol=1e-6
        )

    def test_dot(self):
        assert float(vec.dot(a3(1, 1, 1), a3(2, 2, 2))) == pytest.approx(6.0)

    def test_length(self):
        assert float(vec.length(a3(1, 1, 1))) == pytest.approx(np.sqrt(3.0))

    def test_normalize(self):
        n = vec.normalize(a3(1, 2, 3))
        assert float(vec.length(n)) == pytest.approx(1.0, rel=1e-5)

    def test_near_zero(self):
        assert bool(vec.near_zero(a3(0, 0, 0)))
        assert not bool(vec.near_zero(a3(0, 1, 0)))

    def test_reflect(self):
        # 45-degree incidence on a z-plane
        v = a3(1, 0, -1)
        n = a3(0, 0, 1)
        np.testing.assert_allclose(vec.reflect(v, n), [1, 0, 1], atol=1e-6)

    def test_refract_straight_through(self):
        # index 1.0 => direction unchanged
        v = vec.normalize(a3(0.3, -0.2, -1.0))
        n = a3(0, 0, 1)
        out = vec.refract(v, n, 1.0)
        np.testing.assert_allclose(out, v, atol=1e-6)

    def test_refract_snell(self):
        # 45 degrees into index 1.5 medium: sin(theta_t) = sin(45)/1.5
        v = vec.normalize(a3(1, 0, -1))
        n = a3(0, 0, 1)
        out = vec.refract(v, n, 1.0 / 1.5)
        out = vec.normalize(out)
        sin_t = float(jnp.abs(out[0]))
        assert sin_t == pytest.approx(np.sin(np.pi / 4) / 1.5, rel=1e-5)

    def test_batched_shapes(self):
        u = jnp.ones((128, 3), jnp.float32)
        v = jnp.ones((128, 3), jnp.float32)
        assert vec.dot(u, v).shape == (128,)
        assert vec.cross(u, v).shape == (128, 3)
        assert vec.normalize(u).shape == (128, 3)


class TestOrthoBasis:
    def test_orthonormal(self):
        n = a3(0.3, -0.8, 0.5)
        b = vec.ortho_basis(n)
        assert float(vec.dot(b.u, b.v)) == pytest.approx(0.0, abs=1e-6)
        assert float(vec.dot(b.u, b.w)) == pytest.approx(0.0, abs=1e-6)
        assert float(vec.dot(b.v, b.w)) == pytest.approx(0.0, abs=1e-6)
        for a in b:
            assert float(vec.length(a)) == pytest.approx(1.0, rel=1e-5)

    def test_w_aligned(self):
        n = a3(0, 10, 0)
        b = vec.ortho_basis(n)
        np.testing.assert_allclose(b.w, [0, 1, 0], atol=1e-6)

    def test_transform_z_is_w(self):
        b = vec.ortho_basis(a3(1, 2, -1))
        out = vec.onb_transform(b, a3(0, 0, 1))
        np.testing.assert_allclose(out, b.w, atol=1e-6)


class TestColorSpace:
    def test_roundtrip(self):
        c = a3(0.1, 0.5, 0.9)
        np.testing.assert_allclose(
            vec.gamma_correction(vec.linearize_color_space(c)), c, rtol=1e-6
        )
