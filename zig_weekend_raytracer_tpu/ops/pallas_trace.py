"""Pallas TPU kernels: fused brute-force closest-hit over the scene tables.

Why a kernel: the XLA formulations of the primitive loop either unroll into
huge HLO programs (minutes of compile time) or carry per-ray best-hit state
through HBM on every step (measured ~100x slower than compute).

Why this shape: a first version read primitive attributes as SMEM scalars
inside the loop — the scalar->vector broadcast latency serialized the VPU at
~6% efficiency.  Here primitives ride the *sublane* axis instead: attributes
are stored `(blocks, PB/8, 8, 1)` so each group of 8 primitives loads as one
aligned `(8, 1)` vector and broadcasts across 128 ray lanes; every VPU op
tests 8 primitives x 128 rays with zero scalar traffic.

Structure: two kernels (spheres, then quads seeded with the sphere result),
each on a grid of (ray blocks x primitive blocks).  The output block's index
depends only on the ray axis, so Pallas keeps the running best-hit resident
in VMEM across all primitive steps ("revisiting" accumulation); primitive
blocks stream through double-buffered DMA.  HBM sees each ray O(1) times
regardless of scene size.

This replaces the reference's `EntityCollection.hit` linear scan
(src/entity.zig:342-368); sphere/quad math matches geometry/sphere.py and
geometry/quad.py (and thus src/entity.zig:585-623 / :477-501).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import QUAD_PARALLEL_EPS, real
from ..math.v3 import V3
from ..scene import PRIM_QUAD, PRIM_SPHERE, CompiledScene

LANE = 128
ROWS = 8           # ray rows per block: BLK = ROWS * LANE rays
BLK = ROWS * LANE
MAX_PRIM_BLOCK = 256  # max primitives per grid step (8 prims per sublane group)


def _prim_block(n_prims: int) -> int:
    """Primitives per grid step: small tables shrink the block so tiny
    scenes don't burn cycles on padding groups."""
    return min(MAX_PRIM_BLOCK, max(8, -(-n_prims // 8) * 8))

_BIG = np.float32(3.0e38)
_BIG_IDX = np.int32(2**30)


def _bcast(v):
    """(8, 1) attribute tile -> (8, LANE)."""
    return jnp.broadcast_to(v, (8, LANE))


def _sphere_kernel(
    alive_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, time_ref, tmin_ref,
    scx_ref, scy_ref, scz_ref, sr_ref, smx_ref, smy_ref, smz_ref,
    t_ref, kind_ref, idx_ref,
    *, has_moving: bool, n_prims: int, prim_block: int,
):
    groups = prim_block // 8
    pj = pl.program_id(1)
    base = pj * prim_block
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)

    @pl.when(pj == 0)
    def _init():
        t_ref[0] = jnp.full((ROWS, LANE), _BIG, real)
        kind_ref[0] = jnp.full((ROWS, LANE), -1, jnp.int32)
        idx_ref[0] = jnp.zeros((ROWS, LANE), jnp.int32)

    # Tile skip: compaction clusters dead paths into all-dead tail tiles;
    # a single scalar test retires them without touching the VPU.
    @pl.when(jnp.max(alive_ref[0]) > 0)
    def _run():
        _sphere_tile_body(
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, time_ref,
            tmin_ref, scx_ref, scy_ref, scz_ref, sr_ref, smx_ref, smy_ref,
            smz_ref, t_ref, kind_ref, idx_ref,
            has_moving=has_moving, n_prims=n_prims, prim_block=prim_block,
            base=base, sub=sub, groups=groups,
        )


def _sphere_tile_body(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, time_ref, tmin_ref,
    scx_ref, scy_ref, scz_ref, sr_ref, smx_ref, smy_ref, smz_ref,
    t_ref, kind_ref, idx_ref,
    *, has_moving, n_prims, prim_block, base, sub, groups,
):
    for r in range(ROWS):
        ox = ox_ref[0, r].reshape(1, LANE)
        oy = oy_ref[0, r].reshape(1, LANE)
        oz = oz_ref[0, r].reshape(1, LANE)
        dx = dx_ref[0, r].reshape(1, LANE)
        dy = dy_ref[0, r].reshape(1, LANE)
        dz = dz_ref[0, r].reshape(1, LANE)
        t_min = tmin_ref[0, r].reshape(1, LANE)
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a

        t8 = jnp.full((8, LANE), _BIG, real)
        i8 = jnp.full((8, LANE), _BIG_IDX, jnp.int32)

        for k in range(groups):
            gidx = base + k * 8 + sub
            cx = _bcast(scx_ref[0, k])
            cy = _bcast(scy_ref[0, k])
            cz = _bcast(scz_ref[0, k])
            rr = _bcast(sr_ref[0, k])
            if has_moving:
                tm = time_ref[0, r].reshape(1, LANE)
                cx = cx + _bcast(smx_ref[0, k]) * tm
                cy = cy + _bcast(smy_ref[0, k]) * tm
                cz = cz + _bcast(smz_ref[0, k]) * tm
            ocx = cx - ox
            ocy = cy - oy
            ocz = cz - oz
            h = dx * ocx + dy * ocy + dz * ocz
            c = ocx * ocx + ocy * ocy + ocz * ocz - rr * rr
            disc = h * h - a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            root1 = (h - sq) * inv_a
            root2 = (h + sq) * inv_a
            in1 = (root1 > t_min) & (root1 < t8)
            in2 = (root2 > t_min) & (root2 < t8)
            root = jnp.where(in1, root1, root2)
            hit = (disc >= 0.0) & (in1 | in2) & (gidx < n_prims)
            t8 = jnp.where(hit, root, t8)
            i8 = jnp.where(hit, gidx, i8)

        # reduce 8 sublanes -> per-ray best (smallest idx breaks t ties)
        t_row = jnp.min(t8, axis=0, keepdims=True)
        i_row = jnp.min(
            jnp.where(t8 <= t_row, i8, _BIG_IDX), axis=0, keepdims=True
        )
        t_old = t_ref[0, r].reshape(1, LANE)
        better = t_row < t_old
        t_ref[0, r] = jnp.where(better, t_row, t_old).reshape(LANE)
        kind_ref[0, r] = jnp.where(
            better, PRIM_SPHERE, kind_ref[0, r].reshape(1, LANE)
        ).reshape(LANE)
        idx_ref[0, r] = jnp.where(
            better, i_row, idx_ref[0, r].reshape(1, LANE)
        ).reshape(LANE)


def _quad_kernel(
    alive_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
    t0_ref, k0_ref, i0_ref,
    qsx_ref, qsy_ref, qsz_ref,
    qnx_ref, qny_ref, qnz_ref,
    qwx_ref, qwy_ref, qwz_ref,
    qux_ref, quy_ref, quz_ref,
    qvx_ref, qvy_ref, qvz_ref,
    qoff_ref,
    t_ref, kind_ref, idx_ref,
    *, n_prims: int, prim_block: int,
):
    groups = prim_block // 8
    pj = pl.program_id(1)
    base = pj * prim_block
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)

    @pl.when(pj == 0)
    def _init():
        t_ref[0] = t0_ref[0]
        kind_ref[0] = k0_ref[0]
        idx_ref[0] = i0_ref[0]

    @pl.when(jnp.max(alive_ref[0]) > 0)
    def _run():
        _quad_tile_body(
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
            qsx_ref, qsy_ref, qsz_ref, qnx_ref, qny_ref, qnz_ref,
            qwx_ref, qwy_ref, qwz_ref, qux_ref, quy_ref, quz_ref,
            qvx_ref, qvy_ref, qvz_ref, qoff_ref,
            t_ref, kind_ref, idx_ref,
            n_prims=n_prims, base=base, sub=sub, groups=groups,
        )


def _quad_tile_body(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
    qsx_ref, qsy_ref, qsz_ref,
    qnx_ref, qny_ref, qnz_ref,
    qwx_ref, qwy_ref, qwz_ref,
    qux_ref, quy_ref, quz_ref,
    qvx_ref, qvy_ref, qvz_ref,
    qoff_ref,
    t_ref, kind_ref, idx_ref,
    *, n_prims, base, sub, groups,
):
    for r in range(ROWS):
        ox = ox_ref[0, r].reshape(1, LANE)
        oy = oy_ref[0, r].reshape(1, LANE)
        oz = oz_ref[0, r].reshape(1, LANE)
        dx = dx_ref[0, r].reshape(1, LANE)
        dy = dy_ref[0, r].reshape(1, LANE)
        dz = dz_ref[0, r].reshape(1, LANE)
        t_min = tmin_ref[0, r].reshape(1, LANE)

        t8 = jnp.full((8, LANE), _BIG, real)
        i8 = jnp.full((8, LANE), _BIG_IDX, jnp.int32)

        for k in range(groups):
            gidx = base + k * 8 + sub
            nx = _bcast(qnx_ref[0, k])
            ny = _bcast(qny_ref[0, k])
            nz = _bcast(qnz_ref[0, k])
            denom = nx * dx + ny * dy + nz * dz
            not_par = jnp.abs(denom) >= QUAD_PARALLEL_EPS
            t = (_bcast(qoff_ref[0, k]) - (nx * ox + ny * oy + nz * oz)) / jnp.where(
                not_par, denom, 1.0
            )
            in_range = (t >= t_min) & (t < t8)
            px = ox + dx * t - _bcast(qsx_ref[0, k])
            py = oy + dy * t - _bcast(qsy_ref[0, k])
            pz = oz + dz * t - _bcast(qsz_ref[0, k])
            ux = _bcast(qux_ref[0, k])
            uy = _bcast(quy_ref[0, k])
            uz = _bcast(quz_ref[0, k])
            vx = _bcast(qvx_ref[0, k])
            vy = _bcast(qvy_ref[0, k])
            vz = _bcast(qvz_ref[0, k])
            wx = _bcast(qwx_ref[0, k])
            wy = _bcast(qwy_ref[0, k])
            wz = _bcast(qwz_ref[0, k])
            alpha = (
                wx * (py * vz - pz * vy)
                + wy * (pz * vx - px * vz)
                + wz * (px * vy - py * vx)
            )
            beta = (
                wx * (uy * pz - uz * py)
                + wy * (uz * px - ux * pz)
                + wz * (ux * py - uy * px)
            )
            interior = (
                (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
            )
            hit = not_par & in_range & interior & (gidx < n_prims)
            t8 = jnp.where(hit, t, t8)
            i8 = jnp.where(hit, gidx, i8)

        t_row = jnp.min(t8, axis=0, keepdims=True)
        i_row = jnp.min(
            jnp.where(t8 <= t_row, i8, _BIG_IDX), axis=0, keepdims=True
        )
        t_old = t_ref[0, r].reshape(1, LANE)
        better = t_row < t_old
        t_ref[0, r] = jnp.where(better, t_row, t_old).reshape(LANE)
        kind_ref[0, r] = jnp.where(
            better, PRIM_QUAD, kind_ref[0, r].reshape(1, LANE)
        ).reshape(LANE)
        idx_ref[0, r] = jnp.where(
            better, i_row, idx_ref[0, r].reshape(1, LANE)
        ).reshape(LANE)


def _prim_layout(attr: jnp.ndarray, prim_block: int) -> jnp.ndarray:
    """(S,) attribute -> (blocks, prim_block/8, 8, 1) sublane-major tiles."""
    s = attr.shape[0]
    blocks = max(1, -(-s // prim_block))
    pad = blocks * prim_block - s
    if pad:
        attr = jnp.concatenate([attr, jnp.zeros((pad,), attr.dtype)])
    return attr.reshape(blocks, prim_block // 8, 8, 1)


@functools.partial(
    jax.jit, static_argnames=("has_moving", "n_spheres", "n_quads")
)
def _trace_call(alive, rays, sph, quad, *, has_moving, n_spheres, n_quads):
    n = rays[0].shape[0]
    alive_tiles = alive.reshape(n // BLK, ROWS, LANE)
    g = n // BLK
    tiles = tuple(r.reshape(g, ROWS, LANE) for r in rays)

    def ray_spec():
        return pl.BlockSpec(
            (1, ROWS, LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def table_spec(prim_block):
        return pl.BlockSpec(
            (1, prim_block // 8, 8, 1), lambda i, j: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_specs = [ray_spec(), ray_spec(), ray_spec()]
    out_shape = [
        jax.ShapeDtypeStruct((g, ROWS, LANE), real),
        jax.ShapeDtypeStruct((g, ROWS, LANE), jnp.int32),
        jax.ShapeDtypeStruct((g, ROWS, LANE), jnp.int32),
    ]

    # -- sphere pass --
    s_pb = _prim_block(max(n_spheres, 1))
    sph_tiles = tuple(_prim_layout(a, s_pb) for a in sph)
    s_blocks = sph_tiles[0].shape[0]
    t, kind, idx = pl.pallas_call(
        functools.partial(
            _sphere_kernel, has_moving=has_moving, n_prims=n_spheres,
            prim_block=s_pb,
        ),
        grid_spec=pl.GridSpec(
            grid=(g, s_blocks),
            in_specs=[ray_spec()] * 9 + [table_spec(s_pb)] * 7,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
    )(alive_tiles, *tiles, *sph_tiles)

    if n_quads == 0:
        big = jnp.float32(_BIG)
        t = jnp.where(kind < 0, jnp.float32(np.inf), t)
        return t.reshape(n), kind.reshape(n), idx.reshape(n)

    # -- quad pass (seeded with the sphere result) --
    q_pb = _prim_block(max(n_quads, 1))
    quad_tiles = tuple(_prim_layout(a, q_pb) for a in quad)
    q_blocks = quad_tiles[0].shape[0]
    ray_in = tiles[:6] + (tiles[7],)  # no time needed for quads
    t, kind, idx = pl.pallas_call(
        functools.partial(_quad_kernel, n_prims=n_quads, prim_block=q_pb),
        grid_spec=pl.GridSpec(
            grid=(g, q_blocks),
            in_specs=[ray_spec()] * 8
            + [ray_spec()] * 3
            + [table_spec(q_pb)] * 16,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
    )(alive_tiles, *ray_in, t, kind, idx, *quad_tiles)

    t = jnp.where(kind < 0, jnp.float32(np.inf), t)
    return t.reshape(n), kind.reshape(n), idx.reshape(n)


def closest_hit_pallas(
    scene: CompiledScene,
    origin: V3,
    direction: V3,
    time: jnp.ndarray,
    t_min,
    active=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Brute-force closest hit via the fused kernels.  Returns (t, kind, idx)
    with t=+inf on miss.  Rays are padded to a BLK multiple internally."""
    n = origin.shape[0]
    n_pad = -(-n // BLK) * BLK

    def pad(x, fill=0.0):
        if n_pad == n:
            return x
        return jnp.concatenate([x, jnp.full((n_pad - n,), fill, x.dtype)])

    t_min_arr = jnp.broadcast_to(jnp.asarray(t_min, real), (n,))
    if active is None:
        alive = jnp.ones((n_pad,), jnp.int32)
    else:
        alive = pad(active.astype(jnp.int32), 0)
    rays = (
        pad(origin.x), pad(origin.y), pad(origin.z),
        pad(direction.x), pad(direction.y), pad(direction.z, 1.0),
        pad(time), pad(t_min_arr),
    )
    sph = (
        scene.sph_center.x, scene.sph_center.y, scene.sph_center.z,
        scene.sph_radius,
        scene.sph_move.x, scene.sph_move.y, scene.sph_move.z,
    )
    quad = (
        scene.quad_start.x, scene.quad_start.y, scene.quad_start.z,
        scene.quad_normal.x, scene.quad_normal.y, scene.quad_normal.z,
        scene.quad_w.x, scene.quad_w.y, scene.quad_w.z,
        scene.quad_u.x, scene.quad_u.y, scene.quad_u.z,
        scene.quad_v.x, scene.quad_v.y, scene.quad_v.z,
        scene.quad_offset,
    )
    t, kind, idx = _trace_call(
        alive, rays, sph, quad, has_moving=scene.has_moving,
        n_spheres=scene.n_spheres, n_quads=scene.n_quads,
    )
    return t[:n], kind[:n], idx[:n]
