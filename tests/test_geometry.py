"""Primitive intersection tests against closed-form values — coverage the
reference never had (its geometry core is untested, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zig_weekend_raytracer_tpu.geometry import quad as quad_g
from zig_weekend_raytracer_tpu.geometry import sphere as sphere_g
from zig_weekend_raytracer_tpu.math.aabb import aabb_hit
from zig_weekend_raytracer_tpu.math.v3 import V3

INF = jnp.inf


def v(x, y, z):
    return V3(
        jnp.asarray([float(x)], jnp.float32),
        jnp.asarray([float(y)], jnp.float32),
        jnp.asarray([float(z)], jnp.float32),
    )


def s(x):
    return jnp.asarray([float(x)], jnp.float32)


class TestSphere:
    def test_head_on(self):
        t, ok = sphere_g.hit_t(v(0, 0, -5), s(1.0), v(0, 0, 0), v(0, 0, -1), 1e-3, INF)
        assert bool(ok[0])
        assert float(t[0]) == pytest.approx(4.0, rel=1e-5)

    def test_inside_hits_far_root(self):
        t, ok = sphere_g.hit_t(v(0, 0, 0), s(2.0), v(0, 0, 0), v(0, 0, 1), 1e-3, INF)
        assert bool(ok[0])
        assert float(t[0]) == pytest.approx(2.0, rel=1e-5)

    def test_miss(self):
        t, ok = sphere_g.hit_t(v(0, 5, -5), s(1.0), v(0, 0, 0), v(0, 0, -1), 1e-3, INF)
        assert not bool(ok[0])
        assert np.isinf(float(t[0]))

    def test_unnormalized_direction_scales_t(self):
        # direction length 2 halves t (reference never normalizes ray dirs)
        t, ok = sphere_g.hit_t(v(0, 0, -5), s(1.0), v(0, 0, 0), v(0, 0, -2), 1e-3, INF)
        assert bool(ok[0])
        assert float(t[0]) == pytest.approx(2.0, rel=1e-5)

    def test_t_range_respected(self):
        # hit at t=4 rejected when t_max=3; far root at t=6 beyond t_max too
        t, ok = sphere_g.hit_t(v(0, 0, -5), s(1.0), v(0, 0, 0), v(0, 0, -1), 1e-3, 3.0)
        assert not bool(ok[0])

    def test_uv_poles_and_equator(self):
        # (reference: getSphereUv, src/entity.zig:659-666)
        u, vv = sphere_g.uv(v(0, -1, 0))  # south pole
        assert float(vv[0]) == pytest.approx(0.0, abs=1e-6)
        u, vv = sphere_g.uv(v(0, 1, 0))  # north pole
        assert float(vv[0]) == pytest.approx(1.0, abs=1e-6)
        u, vv = sphere_g.uv(v(-1, 0, 0))
        assert float(u[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(vv[0]) == pytest.approx(0.5, abs=1e-6)

    def test_pdf_matches_solid_angle(self):
        # sphere r=1 at distance 2: cos_max = sqrt(1 - 1/4)
        center, radius = v(0, 0, 2), s(1.0)
        origin, direction = v(0, 0, 0), v(0, 0, 1)
        _, ok = sphere_g.hit_t(center, radius, origin, direction, 1e-3, INF)
        p = sphere_g.pdf_value(center, radius, origin, direction, ok)
        cos_max = np.sqrt(1 - 1 / 4)
        expected = 1.0 / (2 * np.pi * (1 - cos_max))
        assert float(p[0]) == pytest.approx(expected, rel=1e-4)

    def test_sample_direction_inside_cone(self):
        n = 1024
        center = V3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, 5.0))
        origin = V3(jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
        rid = jnp.arange(n, dtype=jnp.uint32)
        from zig_weekend_raytracer_tpu.sampling import hashrng

        u1, u2, _, _ = hashrng.uniform4(jnp.uint32(0), rid, 0)
        d = sphere_g.sample_direction(center, jnp.full(n, 1.0), origin, u1, u2)
        # every sampled direction must intersect the sphere
        _, ok = sphere_g.hit_t(center, jnp.full(n, 1.0), origin, d, 1e-3, INF)
        assert bool(jnp.all(ok))


def _mk_quad(start, eu, ev):
    start, eu, ev = v(*start), v(*eu), v(*ev)
    from zig_weekend_raytracer_tpu.math import v3 as v3m

    n_raw = v3m.cross(eu, ev)
    nn = v3m.dot(n_raw, n_raw)
    n = n_raw * (1.0 / jnp.sqrt(nn))
    w = n_raw * (1.0 / nn)
    offset = v3m.dot(n, start)
    area = jnp.sqrt(nn)
    return start, n, w, eu, ev, offset, area


class TestQuad:
    def test_center_hit_uv(self):
        sq, n, w, eu, ev, off, _ = _mk_quad((-1, -1, -3), (2, 0, 0), (0, 2, 0))
        t, alpha, beta, ok = quad_g.hit_t(
            sq, n, w, eu, ev, off, v(0, 0, 0), v(0, 0, -1), 1e-3, INF
        )
        assert bool(ok[0])
        assert float(t[0]) == pytest.approx(3.0, rel=1e-5)
        assert float(alpha[0]) == pytest.approx(0.5, abs=1e-5)
        assert float(beta[0]) == pytest.approx(0.5, abs=1e-5)

    def test_outside_misses(self):
        sq, n, w, eu, ev, off, _ = _mk_quad((-1, -1, -3), (2, 0, 0), (0, 2, 0))
        _, _, _, ok = quad_g.hit_t(
            sq, n, w, eu, ev, off, v(5, 0, 0), v(0, 0, -1), 1e-3, INF
        )
        assert not bool(ok[0])

    def test_parallel_misses(self):
        sq, n, w, eu, ev, off, _ = _mk_quad((-1, -1, -3), (2, 0, 0), (0, 2, 0))
        _, _, _, ok = quad_g.hit_t(
            sq, n, w, eu, ev, off, v(0, 0, 0), v(1, 0, 0), 1e-3, INF
        )
        assert not bool(ok[0])

    def test_pdf(self):
        # unit quad at distance 3, perpendicular view: pdf = d^2/(cos*A)
        sq, n, w, eu, ev, off, area = _mk_quad(
            (-0.5, -0.5, -3), (1, 0, 0), (0, 1, 0)
        )
        p = quad_g.pdf_value(
            sq, n, w, eu, ev, off, area, v(0, 0, 0), v(0, 0, -1), 1e-3
        )
        assert float(p[0]) == pytest.approx(9.0, rel=1e-4)

    def test_sample_direction_lands_on_quad(self):
        sq, n, w, eu, ev, off, _ = _mk_quad((-1, -1, -3), (2, 0, 0), (0, 2, 0))
        d = quad_g.sample_direction(
            sq, eu, ev, v(0, 0, 0), jnp.asarray([0.25]), jnp.asarray([0.75])
        )
        t, a, b, ok = quad_g.hit_t(
            sq, n, w, eu, ev, off, v(0, 0, 0), d, 1e-3, INF
        )
        assert bool(ok[0])
        assert float(a[0]) == pytest.approx(0.25, abs=1e-5)
        assert float(b[0]) == pytest.approx(0.75, abs=1e-5)


class TestAABB:
    def test_hit_and_miss(self):
        bmin, bmax = v(-1, -1, -1), v(1, 1, 1)
        origin = v(0, 0, -5)
        inv = V3(
            1.0 / jnp.asarray([0.0]), 1.0 / jnp.asarray([0.0]),
            1.0 / jnp.asarray([1.0]),
        )  # inf lanes exercise slab-test robustness
        assert bool(aabb_hit(bmin, bmax, origin, inv, 1e-3, jnp.inf)[0])
        origin2 = v(5, 0, -5)
        assert not bool(aabb_hit(bmin, bmax, origin2, inv, 1e-3, jnp.inf)[0])

    def test_tmax_clips(self):
        bmin, bmax = v(-1, -1, -1), v(1, 1, 1)
        origin = v(0, 0, -5)
        inv = V3(
            1.0 / jnp.asarray([0.0]), 1.0 / jnp.asarray([0.0]),
            1.0 / jnp.asarray([1.0]),
        )
        assert not bool(aabb_hit(bmin, bmax, origin, inv, 1e-3, 3.0)[0])
        assert bool(aabb_hit(bmin, bmax, origin, inv, 1e-3, 5.0)[0])

    def test_ray_starting_inside(self):
        bmin, bmax = v(-1, -1, -1), v(1, 1, 1)
        origin = v(0, 0, 0)
        inv = V3(
            1.0 / jnp.asarray([1.0]), 1.0 / jnp.asarray([1.0]),
            1.0 / jnp.asarray([1.0]),
        )
        assert bool(aabb_hit(bmin, bmax, origin, inv, 1e-3, jnp.inf)[0])
