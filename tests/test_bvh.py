"""BVH correctness: the stackless skip-link traversal must agree with the
brute-force scan on randomized scenes — a property test replacing the
reference's untested BVH (SURVEY.md §4)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from zig_weekend_raytracer_tpu.math.v3 import V3
from zig_weekend_raytracer_tpu.ops.trace import closest_hit
from zig_weekend_raytracer_tpu.scene import Camera, SceneBuilder


def _random_scene(seed, n_spheres=40, n_quads=20):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = b.lambertian(b.solid_color((0.5, 0.5, 0.5)))
    for _ in range(n_spheres):
        b.add(b.sphere(rng.uniform(-10, 10, 3), rng.uniform(0.2, 1.5), mat))
    for _ in range(n_quads):
        b.add(
            b.quad(
                rng.uniform(-10, 10, 3),
                rng.uniform(-2, 2, 3),
                rng.uniform(-2, 2, 3),
                mat,
            )
        )
    b.set_camera(Camera(look_from=(0, 0, 30), look_at=(0, 0, 0)))
    return b, rng


def _random_rays(rng, n):
    org = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return (
        V3(jnp.asarray(org[:, 0]), jnp.asarray(org[:, 1]), jnp.asarray(org[:, 2])),
        V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bvh_matches_brute_force(seed):
    b, rng = _random_scene(seed)
    b.use_bvh(False)
    brute = b.compile().compiled
    b.use_bvh(True, min_prims=2)
    bvh = b.compile().compiled
    assert bvh.has_bvh and not brute.has_bvh

    n = 512
    org, d = _random_rays(rng, n)
    time = jnp.zeros(n)
    h_brute = closest_hit(brute, org, d, time, 1e-3, jnp.inf)
    h_bvh = closest_hit(bvh, org, d, time, 1e-3, jnp.inf)

    np.testing.assert_array_equal(
        np.asarray(h_bvh.kind), np.asarray(h_brute.kind)
    )
    np.testing.assert_array_equal(np.asarray(h_bvh.idx), np.asarray(h_brute.idx))
    np.testing.assert_allclose(
        np.asarray(h_bvh.t), np.asarray(h_brute.t), rtol=1e-5, atol=1e-5
    )


def test_bvh_arrays_well_formed():
    b, _ = _random_scene(7, n_spheres=30, n_quads=10)
    b.use_bvh(True, min_prims=2)
    c = b.compile().compiled
    n_nodes = int(c.bvh_miss.shape[0])
    miss = np.asarray(c.bvh_miss)
    count = np.asarray(c.bvh_leaf_count)
    start = np.asarray(c.bvh_leaf_start)
    # miss links always jump forward (DFS preorder skip links)
    assert (miss > np.arange(n_nodes)).all()
    assert (miss <= n_nodes).all()
    # every primitive appears exactly once across leaves
    total = count.sum()
    assert total == 40
    spans = []
    for i in range(n_nodes):
        if count[i]:
            spans.extend(range(start[i], start[i] + count[i]))
    assert sorted(spans) == list(range(40))


def test_moving_sphere_bbox_covers_path():
    """Motion-blurred spheres must be found by the BVH at any time in [0,1)
    (the union-of-endpoint-boxes rule, src/entity.zig:578-581)."""
    b = SceneBuilder()
    mat = b.lambertian(b.solid_color((0.5, 0.5, 0.5)))
    b.add(b.moving_sphere((0, 0, 0), (5, 0, 0), 0.5, mat))
    # decoys so a BVH actually builds
    for i in range(8):
        b.add(b.sphere((0, 10 + i, 0), 0.4, mat))
    b.use_bvh(True, min_prims=2)
    c = b.compile().compiled
    assert c.has_bvh and c.has_moving

    n = 8
    t_values = jnp.linspace(0.0, 0.99, n)
    # rays aimed at where the sphere is at each time
    org = V3(5.0 * t_values, jnp.full((n,), -10.0), jnp.zeros(n))
    d = V3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n))
    h = closest_hit(c, org, d, t_values, 1e-3, jnp.inf)
    assert (np.asarray(h.kind) == 0).all()
    np.testing.assert_allclose(np.asarray(h.t), 9.5, rtol=1e-4)
