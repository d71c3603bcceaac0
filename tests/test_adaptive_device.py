"""Device-side adaptive planner (render/adaptive_device.py) must match the
host reference implementation (render/adaptive.py) lane-for-lane."""

import numpy as np
import jax.numpy as jnp

from zig_weekend_raytracer_tpu.render import adaptive as host
from zig_weekend_raytracer_tpu.render import adaptive_device as dev
from zig_weekend_raytracer_tpu.render.renderer import tile_order_lane_index


def test_variance_weights_dev_matches_host():
    rng = np.random.RandomState(0)
    a = rng.rand(12, 16, 3).astype(np.float32)
    b = rng.rand(12, 16, 3).astype(np.float32)
    w_host = host.variance_weights(a, b)
    w_dev = np.asarray(dev.variance_weights_dev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(w_dev, w_host, rtol=2e-5, atol=1e-7)


def test_allocate_extra_dev_conserves_and_caps():
    rng = np.random.RandomState(1)
    w = rng.rand(8, 16).astype(np.float32)
    total, cap = 1000, 40
    n = np.asarray(dev.allocate_extra_dev(jnp.asarray(w), total, cap))
    assert n.min() >= 0 and n.max() <= cap
    assert n.sum() == total  # exact conservation


def test_allocate_extra_dev_cap_binds():
    w = np.ones((4, 4), np.float32)
    # cap*pixels < total: everything saturates, remainder unallocated
    n = np.asarray(dev.allocate_extra_dev(jnp.asarray(w), 1000, 10))
    assert (n == 10).all()


def test_build_plan_dev_matches_host_lane_for_lane():
    rng = np.random.RandomState(2)
    rows, width = 8, 16
    band_y0, pilot, lane_cap, blk = 3, 4, 12, 64
    n_extra = rng.randint(0, 40, size=(rows, width)).astype(np.int64)
    n_extra[rng.rand(rows, width) < 0.3] = 0

    tile = None  # small shapes stay flat (pick_tile)
    for sort_lanes in (False, True):
        px_h, py_h, s0_h, s1_h = host.build_adaptive_plan(
            n_extra, band_y0, pilot, tile, lane_cap,
            sort_lanes=sort_lanes, blk=blk,
        )
        lane_idx = tile_order_lane_index(width, rows, tile).reshape(-1)
        order = np.argsort(lane_idx, kind="stable").astype(np.int32)
        m = dev.plan_lane_budget(rows * width, blk)
        px_d, py_d, s0_d, s1_d = (
            np.asarray(a) for a in dev.build_adaptive_plan_dev(
                jnp.asarray(n_extra.astype(np.int32)), jnp.asarray(order),
                band_y0=band_y0, pilot=pilot, lane_cap=lane_cap,
                sort_lanes=sort_lanes, m_lanes=m, width=width,
            )
        )
        live_h = s1_h > s0_h
        live_d = s1_d > s0_d
        assert live_h.sum() == live_d.sum()
        k = int(live_h.sum())
        # identical decomposition: same live lanes in the same order
        np.testing.assert_array_equal(px_d[:k], px_h[:k])
        np.testing.assert_array_equal(py_d[:k], py_h[:k])
        np.testing.assert_array_equal(s0_d[:k], s0_h[:k])
        np.testing.assert_array_equal(s1_d[:k], s1_h[:k])
        # dead lanes are dead in both
        assert not live_d[k:].any() and not live_h[k:].any()


def test_plan_lane_budget_bounds():
    # M is a power of two, >= blk, and >= the worst-case lane count
    for pixels, blk in ((160000, 1024), (256, 64), (1, 1024)):
        m = dev.plan_lane_budget(pixels, blk)
        assert m >= blk and (m & (m - 1)) == 0
        assert m >= -(-3 * pixels // 2)
