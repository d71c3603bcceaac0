"""Texture evaluation tests (reference: src/texture.zig)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zig_weekend_raytracer_tpu.math.v3 import V3
from zig_weekend_raytracer_tpu.scene import SceneBuilder
from zig_weekend_raytracer_tpu.textures import texture_value


def _point(x, y, z, n=1):
    return V3(jnp.full((n,), x), jnp.full((n,), y), jnp.full((n,), z))


def _tex_scene(build):
    b = SceneBuilder()
    tid = build(b)
    m = b.lambertian(tid)
    b.add(b.sphere((0, 0, 0), 1, m))
    return b.compile().compiled, tid


class TestSolid:
    def test_returns_rgb(self):
        c, tid = _tex_scene(lambda b: b.solid_color((0.2, 0.4, 0.8)))
        t = texture_value(c, jnp.full((1,), tid, jnp.int32), jnp.zeros(1), jnp.zeros(1), _point(0, 0, 0))
        assert float(t.x[0]) == pytest.approx(0.2)
        assert float(t.z[0]) == pytest.approx(0.8)


class TestChecker:
    def _scene(self):
        b = SceneBuilder()
        even = b.solid_color((1, 0, 0))
        odd = b.solid_color((0, 1, 0))
        ch = b.checkerboard(1.0, even, odd)  # inv_scale 1 => unit lattice
        m = b.lambertian(ch)
        b.add(b.sphere((0, 0, 0), 1, m))
        return b.compile().compiled, ch

    def test_lattice_parity(self):
        """floor(x)+floor(y)+floor(z) parity selects even/odd
        (src/texture.zig:111-118)."""
        c, ch = self._scene()
        tid = jnp.full((4,), ch, jnp.int32)
        pts = V3(
            jnp.asarray([0.5, 1.5, 1.5, -0.5]),
            jnp.asarray([0.5, 0.5, 1.5, 0.5]),
            jnp.asarray([0.5, 0.5, 0.5, 0.5]),
        )
        t = texture_value(c, tid, jnp.zeros(4), jnp.zeros(4), pts)
        r = np.asarray(t.x)
        # parities: 0 even, 1 odd, 2 even, (-1+0+0) odd
        np.testing.assert_allclose(r, [1, 0, 1, 0], atol=1e-6)

    def test_scene_scale(self):
        """The reference uses inv_scale=0.32 for ground checkers."""
        b = SceneBuilder()
        even = b.solid_color((1, 0, 0))
        odd = b.solid_color((0, 1, 0))
        ch = b.checkerboard(0.32, even, odd)
        b.add(b.sphere((0, 0, 0), 1, b.lambertian(ch)))
        c = b.compile().compiled
        tid = jnp.full((2,), ch, jnp.int32)
        pts = V3(jnp.asarray([0.0, 3.2]), jnp.zeros(2), jnp.zeros(2))
        t = texture_value(c, tid, jnp.zeros(2), jnp.zeros(2), pts)
        assert float(t.x[0]) == 1.0  # floor(0)=0 even
        assert float(t.x[1]) == 0.0  # floor(1.024)=1 odd


class TestImage:
    def _scene(self):
        img = np.zeros((2, 4, 3), np.uint8)
        img[0, 0] = (255, 0, 0)    # top-left red
        img[1, 3] = (0, 255, 0)    # bottom-right green
        b = SceneBuilder()
        tid = b.image_texture(img)
        b.add(b.sphere((0, 0, 0), 1, b.lambertian(tid)))
        return b.compile().compiled, tid

    def test_uv_lookup_with_v_flip_and_gamma(self):
        c, tid = self._scene()
        t4 = jnp.full((2,), tid, jnp.int32)
        # v=1 -> image row 0 (flip); u=0 -> col 0
        u = jnp.asarray([0.0, 0.999])
        v = jnp.asarray([0.999, 0.0])
        t = texture_value(c, t4, u, v, _point(0, 0, 0, 2))
        # byte 255 -> 1.0 -> linearized 1.0
        assert float(t.x[0]) == pytest.approx(1.0, abs=1e-3)
        assert float(t.y[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(t.y[1]) == pytest.approx(1.0, abs=1e-3)

    def test_uv_clamped(self):
        c, tid = self._scene()
        t1 = jnp.full((1,), tid, jnp.int32)
        t = texture_value(
            c, t1, jnp.asarray([5.0]), jnp.asarray([-3.0]), _point(0, 0, 0)
        )
        # u clamps to 1 -> last col; v clamps to 0 -> flipped to bottom row
        assert float(t.y[0]) == pytest.approx(1.0, abs=1e-3)

    def test_gamma_linearization(self):
        img = np.full((1, 1, 3), 128, np.uint8)
        b = SceneBuilder()
        tid = b.image_texture(img)
        b.add(b.sphere((0, 0, 0), 1, b.lambertian(tid)))
        c = b.compile().compiled
        t = texture_value(
            c, jnp.full((1,), tid, jnp.int32), jnp.zeros(1), jnp.zeros(1),
            _point(0, 0, 0),
        )
        assert float(t.x[0]) == pytest.approx((128 / 255) ** 2, rel=1e-4)


class TestDebugFallback:
    def test_missing_image_is_magenta(self):
        from zig_weekend_raytracer_tpu.io.image import load_image

        img = load_image("/nonexistent/nope.png")
        assert img.shape == (1, 1, 3)
        assert tuple(img[0, 0]) == (255, 0, 255)
