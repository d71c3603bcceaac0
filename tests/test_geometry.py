"""Primitive intersection tests against closed-form values — coverage the
reference never had (its geometry core is untested, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zig_weekend_raytracer_tpu.geometry import quad as quad_g
from zig_weekend_raytracer_tpu.geometry import sphere as sphere_g
from zig_weekend_raytracer_tpu.math.aabb import aabb_hit

INF = jnp.inf


def a3(*xs):
    return jnp.asarray(xs, jnp.float32)


class TestSphere:
    def test_head_on(self):
        t, ok = sphere_g.hit_t(
            a3(0, 0, -5), jnp.float32(1.0), a3(0, 0, 0), a3(0, 0, -1),
            1e-3, INF,
        )
        assert bool(ok)
        assert float(t) == pytest.approx(4.0, rel=1e-5)

    def test_inside_hits_far_root(self):
        t, ok = sphere_g.hit_t(
            a3(0, 0, 0), jnp.float32(2.0), a3(0, 0, 0), a3(0, 0, 1),
            1e-3, INF,
        )
        assert bool(ok)
        assert float(t) == pytest.approx(2.0, rel=1e-5)

    def test_miss(self):
        t, ok = sphere_g.hit_t(
            a3(0, 5, -5), jnp.float32(1.0), a3(0, 0, 0), a3(0, 0, -1),
            1e-3, INF,
        )
        assert not bool(ok)
        assert np.isinf(float(t))

    def test_unnormalized_direction_scales_t(self):
        # direction length 2 halves t (reference never normalizes ray dirs)
        t, ok = sphere_g.hit_t(
            a3(0, 0, -5), jnp.float32(1.0), a3(0, 0, 0), a3(0, 0, -2),
            1e-3, INF,
        )
        assert bool(ok)
        assert float(t) == pytest.approx(2.0, rel=1e-5)

    def test_uv_poles_and_equator(self):
        # (reference: getSphereUv, src/entity.zig:659-666)
        u, v = sphere_g.uv(a3(0, -1, 0))  # south pole
        assert float(v) == pytest.approx(0.0, abs=1e-6)
        u, v = sphere_g.uv(a3(0, 1, 0))  # north pole
        assert float(v) == pytest.approx(1.0, abs=1e-6)
        u, v = sphere_g.uv(a3(-1, 0, 0))
        assert float(u) == pytest.approx(0.0, abs=1e-6)
        assert float(v) == pytest.approx(0.5, abs=1e-6)

    def test_pdf_matches_solid_angle(self):
        # sphere r=1 at distance 2: cos_max = sqrt(1 - 1/4)
        center, radius = a3(0, 0, 2), jnp.float32(1.0)
        origin = a3(0, 0, 0)
        direction = a3(0, 0, 1)
        _, ok = sphere_g.hit_t(center, radius, origin, direction, 1e-3, INF)
        p = sphere_g.pdf_value(center, radius, origin, direction, ok)
        cos_max = np.sqrt(1 - 1 / 4)
        expected = 1.0 / (2 * np.pi * (1 - cos_max))
        assert float(p) == pytest.approx(expected, rel=1e-4)


def _mk_quad(start, eu, ev):
    start, eu, ev = a3(*start), a3(*eu), a3(*ev)
    n_raw = jnp.cross(eu, ev)
    nn = jnp.dot(n_raw, n_raw)
    n = n_raw / jnp.sqrt(nn)
    w = n_raw / nn
    offset = jnp.dot(n, start)
    area = jnp.sqrt(nn)
    return start, n, w, eu, ev, offset, area


class TestQuad:
    def test_center_hit_uv(self):
        s, n, w, eu, ev, off, _ = _mk_quad((-1, -1, -3), (2, 0, 0), (0, 2, 0))
        t, alpha, beta, ok = quad_g.hit_t(
            s, n, w, eu, ev, off, a3(0, 0, 0), a3(0, 0, -1), 1e-3, INF
        )
        assert bool(ok)
        assert float(t) == pytest.approx(3.0, rel=1e-5)
        assert float(alpha) == pytest.approx(0.5, abs=1e-5)
        assert float(beta) == pytest.approx(0.5, abs=1e-5)

    def test_outside_misses(self):
        s, n, w, eu, ev, off, _ = _mk_quad((-1, -1, -3), (2, 0, 0), (0, 2, 0))
        _, _, _, ok = quad_g.hit_t(
            s, n, w, eu, ev, off, a3(5, 0, 0), a3(0, 0, -1), 1e-3, INF
        )
        assert not bool(ok)

    def test_parallel_misses(self):
        s, n, w, eu, ev, off, _ = _mk_quad((-1, -1, -3), (2, 0, 0), (0, 2, 0))
        _, _, _, ok = quad_g.hit_t(
            s, n, w, eu, ev, off, a3(0, 0, 0), a3(1, 0, 0), 1e-3, INF
        )
        assert not bool(ok)

    def test_pdf(self):
        # unit quad at distance 3, perpendicular view: pdf = d^2/(cos*A)
        s, n, w, eu, ev, off, area = _mk_quad(
            (-0.5, -0.5, -3), (1, 0, 0), (0, 1, 0)
        )
        p = quad_g.pdf_value(
            s, n, w, eu, ev, off, area, a3(0, 0, 0), a3(0, 0, -1), 1e-3
        )
        assert float(p) == pytest.approx(9.0, rel=1e-4)


class TestAABB:
    def test_hit_and_miss(self):
        bmin, bmax = a3(-1, -1, -1), a3(1, 1, 1)
        origin = a3(0, 0, -5)
        inv = 1.0 / a3(0, 0, 1)  # inf lanes handled by slab test
        assert bool(aabb_hit(bmin, bmax, origin, inv, 1e-3, jnp.inf))
        origin2 = a3(5, 0, -5)
        assert not bool(aabb_hit(bmin, bmax, origin2, inv, 1e-3, jnp.inf))

    def test_tmax_clips(self):
        bmin, bmax = a3(-1, -1, -1), a3(1, 1, 1)
        origin = a3(0, 0, -5)
        inv = 1.0 / a3(0, 0, 1)
        assert not bool(aabb_hit(bmin, bmax, origin, inv, 1e-3, 3.0))
        assert bool(aabb_hit(bmin, bmax, origin, inv, 1e-3, 5.0))
