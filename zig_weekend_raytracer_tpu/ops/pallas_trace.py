"""Pallas TPU kernels: fused closest-hit over the scene tables.

Why a kernel: the XLA formulations of the primitive loop either unroll into
huge HLO programs (minutes of compile time) or carry per-ray best-hit state
through HBM on every step (measured ~100x slower than compute).

Why this shape: a first version read primitive attributes as SMEM scalars
inside the loop — the scalar->vector broadcast latency serialized the VPU at
~6% efficiency.  Here primitives ride the *sublane* axis instead: attributes
are stored `(blocks, PB/8, 8, 1)` so each group of 8 primitives loads as one
aligned `(8, 1)` vector and broadcasts across 128 ray lanes; every VPU op
tests 8 primitives x 128 rays with zero scalar traffic.

Two strategies per primitive kind, chosen at scene compile:

  * **Brute streaming** (small tables): grid of (ray tiles x primitive
    blocks); the output block's index depends only on the ray axis, so
    Pallas keeps the running best-hit resident in VMEM across all primitive
    steps while primitive blocks stream through double-buffered DMA.
    Replaces `EntityCollection.hit` (src/entity.zig:342-368).
  * **Group-tree traversal** (big tables): a preorder skip-link tree whose
    leaves each hold ONE sublane group of 8 primitives
    (geometry/bvh.py:build_group_tree).  Node boxes/links live in SMEM and
    drive scalar control flow; each ray tile walks the tree in lockstep
    inside one `lax.while_loop`, descending when ANY ray in the tile hits
    the node AABB (a child box is contained in its parent's, so per-ray
    masking is unnecessary for correctness — a ray that misses an ancestor
    box cannot hit any primitive inside it).  A leaf visit costs exactly
    one brute group step, so traversal wins as soon as whole subtrees are
    skipped.  Replaces the recursive `BVHNodeEntity.hit`
    (src/entity.zig:286-303).

Sphere/quad math matches geometry/sphere.py and geometry/quad.py (and thus
src/entity.zig:585-623 / :477-501).  Set ``ZWRT_PALLAS_INTERPRET=1`` to run
every kernel in the Pallas interpreter (CPU-testable; see tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import AABB_MAX_MULT, QUAD_PARALLEL_EPS, real
from ..math.v3 import V3
from ..scene import PRIM_QUAD, PRIM_SPHERE, CompiledScene

LANE = 128
# Ray rows per block: BLK = ROWS * LANE rays per kernel tile.  8 = one
# native (8, 128) f32 vreg per tile-wide op.  The round-4 VPU peak
# measurement (tools/vpu_peak.py, BASELINE.md) showed the pipeline is
# latency-bound until ~64 independent vreg-ops are in flight: at one
# vreg per op it retires ~2.15 T element-ops/s vs 17 T at 8 vregs/op —
# so wider tiles multiply the available issue rate (each tile-wide op
# becomes ROWS/8 back-to-back independent vregs, and the per-row trace
# loop gains ROWS independent chains) at the price of divergence
# granularity (tree scenes walk the union of nodes any of BLK rays
# needs) and ROWS/8 x the wavefront VMEM.  ZWRT_ROWS overrides for
# sweeps — read per SCENE COMPILE by pick_rows (a post-import change
# takes effect on the next compile_scene); the import-time module value
# below only serves as the default for scene-less helpers and tests.
ROWS_DEFAULT = 8


def _validated_rows(rows: int) -> int:
    if rows % 8 != 0 or not 8 <= rows <= 128:
        raise ValueError(
            f"rows must be a multiple of 8 in [8, 128], got {rows}"
        )
    return rows


_IMPORT_ROWS = _validated_rows(int(os.environ.get("ZWRT_ROWS", ROWS_DEFAULT)))
_tls = threading.local()


def rows() -> int:
    """Wavefront rows currently bound on THIS thread (kernel construction
    reads this dynamically; entry points bind it to the scene's compiled
    choice via with_scene_rows).  Falls back to the import-time
    ZWRT_ROWS/default for scene-less helpers and tests."""
    return getattr(_tls, "rows", _IMPORT_ROWS)


def blk() -> int:
    """Rays per kernel tile for the currently bound row count."""
    return rows() * LANE


def pick_rows(*, has_tree: bool, has_image_textures: bool) -> int:
    """Wavefront rows for a scene, chosen at scene compile (recorded on
    CompiledScene.rows, a static field, so every jitted driver re-traces
    per choice).  Measured on one v5e (BASELINE.md round-4 tile-width
    experiment, cornell 400x400@1024spp): 8 -> 244.6, 16 -> 282.6,
    32 -> 285.0, 64 -> 296.8 Mpaths/s for brute-trace scenes (+21% at 64);
    tree scenes REGRESS (balls 38.0 -> 29.0 at 64: the tile-lockstep walk
    visits the union of nodes any of the tile's rays needs, and 8x granularity
    loses more culling than the vreg ILP buys).  Brute image-atlas scenes
    WIN too (measured on a degraded-tunnel session, so conservative:
    earth 12.8 -> 13.3, shrek 33.0 -> 35.4; the K-slot chain's extra
    (rows, 128) carries fit VMEM fine) — only the TREE gate remains.
    ZWRT_ROWS overrides for sweeps.  On non-TPU backends the win does
    not apply (and interpret-mode tests want small tiles): 8."""
    del has_image_textures  # kept in the signature for call-site clarity
    env = os.environ.get("ZWRT_ROWS")
    if env:
        return _validated_rows(int(env))
    if has_tree or _interpret():
        return ROWS_DEFAULT
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        return ROWS_DEFAULT
    return 64 if platform == "tpu" else ROWS_DEFAULT


class _RowsCtx:
    """Bind the THREAD-LOCAL row count while a kernel entry point traces.

    rows()/blk() are read dynamically by every kernel helper; the public
    entry points (closest_hit_pallas, bounce_pallas, bounce_pallas_regen,
    render_fused) bind them to the scene's compiled choice for the
    duration of kernel construction.  Sound under jit caching because
    ``rows`` is a static CompiledScene field (part of every cache key)
    and wavefront shapes differ per choice.  Thread-local storage (round 5,
    VERDICT r4 #8 — previously module globals under an RLock) means
    concurrent renders of different-width scenes no longer serialize on a
    lock and cannot observe each other's binding; same-thread nesting
    restores the previous value."""

    def __init__(self, rows: int):
        self.rows = _validated_rows(rows)

    def __enter__(self):
        self._old = getattr(_tls, "rows", None)
        _tls.rows = self.rows

    def __exit__(self, *exc):
        if self._old is None:
            del _tls.rows
        else:
            _tls.rows = self._old
        return False


def with_scene_rows(fn):
    """Decorator for kernel entry points taking ``scene`` first: binds
    the thread-local rows()/blk() to ``scene.rows`` while the entry runs."""
    @functools.wraps(fn)
    def wrapped(scene, *args, **kwargs):
        with _RowsCtx(getattr(scene, "rows", rows())):
            return fn(scene, *args, **kwargs)
    return wrapped


MAX_PRIM_BLOCK = 256  # max primitives per grid step (8 prims per sublane group)


def _interpret() -> bool:
    return bool(os.environ.get("ZWRT_PALLAS_INTERPRET"))


def pick_leaf_span(n_prims: int) -> int:
    """Sublane groups (x8 prims) per tree leaf for a kind with ``n_prims``
    primitives — chosen PER SCENE at compile and recorded on the
    CompiledScene (sph_leaf_span / quad_leaf_span) so tree layout and
    kernel traversal always agree.  ``ZWRT_LEAF_GROUPS`` overrides for
    sweeps.

    Fatter leaves cut traversal steps (scalar-latency bound) at the price
    of culling granularity.  Round-2 sweeps (tile-lockstep leaves, one
    v5e, 400x400):
      balls@128spp:     23.5 / 26.7 / 31.2 / 34.2 / 37.4 / 21.5 Mpaths/s
      rtw_final@64spp:   4.7 /  5.0 /  5.3 /  7.4* / 6.8* / —
    for spans 4 / 8 / 16 / 32 / 64 / 128 — balls (488 prims) peaks at 64
    and collapses at 128 (a single leaf = zero culling); rtw (1005 sph +
    2401 quads) prefers 16-32.  (Round 3 also measured per-ROW leaf
    masking, which shifts the optimum down — but masking itself was a
    uniform loss and was reverted; sweep in BASELINE.md.)"""
    env = os.environ.get("ZWRT_LEAF_GROUPS")
    if env:
        return int(env)
    if n_prims <= 512:
        return 64
    return 32


def _vmem_params():
    """Big scenes spill past the default 16M scoped-vmem budget; v5e has
    headroom above it (the bounce megakernel uses the same limit)."""
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _prim_block(n_prims: int) -> int:
    """Primitives per grid step: small tables shrink the block so tiny
    scenes don't burn cycles on padding groups."""
    return min(MAX_PRIM_BLOCK, max(8, -(-n_prims // 8) * 8))

_BIG = np.float32(3.0e38)
_BIG_IDX = np.int32(2**30)


def _bcast(v):
    """(8, 1) attribute tile -> (8, LANE)."""
    return jnp.broadcast_to(v, (8, LANE))


# ---------------------------------------------------------------------------
# Shared per-row group test bodies (used by both brute and tree kernels)
# ---------------------------------------------------------------------------

def _sphere_group_hits(ray_row, group, t8, i8):
    """Test one group of 8 spheres against one ray row, accumulating into
    the (8, LANE) per-sublane best (t8, i8).

    ``ray_row`` = (ox..tmin etc, each (1, LANE)); ``group`` = dict of
    (8, LANE) broadcast attribute tiles + (8, LANE) i32 identity ``gid``
    (reference two-root selection: src/entity.zig:585-623)."""
    ox, oy, oz, dx, dy, dz, t_min, a, inv_a, tm = ray_row
    cx, cy, cz = group["cx"], group["cy"], group["cz"]
    if tm is not None:
        cx = cx + group["mx"] * tm
        cy = cy + group["my"] * tm
        cz = cz + group["mz"] * tm
    r2 = group["r2"]
    ocx = cx - ox
    ocy = cy - oy
    ocz = cz - oz
    h = dx * ocx + dy * ocy + dz * ocz
    c = ocx * ocx + ocy * ocy + ocz * ocz - r2
    disc = h * h - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    root1 = (h - sq) * inv_a
    root2 = (h + sq) * inv_a
    in1 = (root1 > t_min) & (root1 < t8)
    in2 = (root2 > t_min) & (root2 < t8)
    root = jnp.where(in1, root1, root2)
    hit = (disc >= 0.0) & (in1 | in2) & group["valid"]
    return jnp.where(hit, root, t8), jnp.where(hit, group["gid"], i8)


def _quad_group_hits(ray_row, group, t8, i8):
    """Test one group of 8 quads against one ray row (plane intersect +
    interior test, reference: src/entity.zig:477-501)."""
    ox, oy, oz, dx, dy, dz, t_min, _a, _inv_a, _tm = ray_row
    nx, ny, nz = group["nx"], group["ny"], group["nz"]
    denom = nx * dx + ny * dy + nz * dz
    not_par = jnp.abs(denom) >= QUAD_PARALLEL_EPS
    t = (group["off"] - (nx * ox + ny * oy + nz * oz)) / jnp.where(
        not_par, denom, 1.0
    )
    in_range = (t >= t_min) & (t < t8)
    px = ox + dx * t - group["sx"]
    py = oy + dy * t - group["sy"]
    pz = oz + dz * t - group["sz"]
    # precomputed triple-product constants A = v x w, B = w x u
    # (geometry/quad.py:hit_t): the reference's in-loop cross products
    # become two dot products against per-quad table columns
    alpha = px * group["ax"] + py * group["ay"] + pz * group["az"]
    beta = px * group["bx"] + py * group["by"] + pz * group["bz"]
    interior = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
    hit = not_par & in_range & interior & group["valid"]
    return jnp.where(hit, t, t8), jnp.where(hit, group["gid"], i8)


def _fresh_group_best():
    return (
        jnp.full((8, LANE), _BIG, real),
        jnp.full((8, LANE), _BIG_IDX, jnp.int32),
    )


def _reduce_group(t8, i8, kind_code, t_old, kind_old, idx_old):
    """Reduce 8 sublanes -> per-ray best (smallest identity breaks t ties),
    then merge with the running best row."""
    t_row = jnp.min(t8, axis=0, keepdims=True)
    i_row = jnp.min(
        jnp.where(t8 <= t_row, i8, _BIG_IDX), axis=0, keepdims=True
    )
    better = t_row < t_old
    return (
        jnp.where(better, t_row, t_old),
        jnp.where(better, kind_code, kind_old),
        jnp.where(better, i_row, idx_old),
    )


# ---------------------------------------------------------------------------
# Brute streaming kernels
# ---------------------------------------------------------------------------

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
        t_ref[0] = jnp.full((rows(), LANE), _BIG, real)
        kind_ref[0] = jnp.full((rows(), LANE), -1, jnp.int32)
        idx_ref[0] = jnp.zeros((rows(), LANE), jnp.int32)

    # Tile skip: compaction clusters dead paths into all-dead tail tiles;
    # a single scalar test retires them without touching the VPU.
    @pl.when(jnp.max(alive_ref[0]) > 0)
    def _run():
        for r in range(rows()):
            ray_row = _load_ray_row(
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
                time_ref if has_moving else None, r, with_quadratic=True,
            )
            t8, i8 = _fresh_group_best()
            for k in range(groups):
                gidx = base + k * 8 + sub
                group = {
                    "cx": _bcast(scx_ref[0, k]), "cy": _bcast(scy_ref[0, k]),
                    "cz": _bcast(scz_ref[0, k]), "r2": _bcast(sr_ref[0, k]),
                    "gid": gidx, "valid": gidx < n_prims,
                }
                if has_moving:
                    group["mx"] = _bcast(smx_ref[0, k])
                    group["my"] = _bcast(smy_ref[0, k])
                    group["mz"] = _bcast(smz_ref[0, k])
                t8, i8 = _sphere_group_hits(ray_row, group, t8, i8)
            t_new, k_new, i_new = _reduce_group(
                t8, i8, PRIM_SPHERE,
                t_ref[0, r].reshape(1, LANE),
                kind_ref[0, r].reshape(1, LANE),
                idx_ref[0, r].reshape(1, LANE),
            )
            t_ref[0, r] = t_new.reshape(LANE)
            kind_ref[0, r] = k_new.reshape(LANE)
            idx_ref[0, r] = i_new.reshape(LANE)


def _load_ray_row(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, time_ref, r,
    *, with_quadratic: bool,
):
    ox = ox_ref[0, r].reshape(1, LANE)
    oy = oy_ref[0, r].reshape(1, LANE)
    oz = oz_ref[0, r].reshape(1, LANE)
    dx = dx_ref[0, r].reshape(1, LANE)
    dy = dy_ref[0, r].reshape(1, LANE)
    dz = dz_ref[0, r].reshape(1, LANE)
    t_min = tmin_ref[0, r].reshape(1, LANE)
    if with_quadratic:
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
    else:
        a = inv_a = None
    tm = time_ref[0, r].reshape(1, LANE) if time_ref is not None else None
    return (ox, oy, oz, dx, dy, dz, t_min, a, inv_a, tm)


def _quad_kernel(
    alive_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
    t0_ref, k0_ref, i0_ref,
    qsx_ref, qsy_ref, qsz_ref,
    qnx_ref, qny_ref, qnz_ref,
    qax_ref, qay_ref, qaz_ref,
    qbx_ref, qby_ref, qbz_ref,
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
        for r in range(rows()):
            ray_row = _load_ray_row(
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
                None, r, with_quadratic=False,
            )
            t8, i8 = _fresh_group_best()
            for k in range(groups):
                gidx = base + k * 8 + sub
                group = {
                    "sx": _bcast(qsx_ref[0, k]), "sy": _bcast(qsy_ref[0, k]),
                    "sz": _bcast(qsz_ref[0, k]),
                    "nx": _bcast(qnx_ref[0, k]), "ny": _bcast(qny_ref[0, k]),
                    "nz": _bcast(qnz_ref[0, k]),
                    "ax": _bcast(qax_ref[0, k]), "ay": _bcast(qay_ref[0, k]),
                    "az": _bcast(qaz_ref[0, k]),
                    "bx": _bcast(qbx_ref[0, k]), "by": _bcast(qby_ref[0, k]),
                    "bz": _bcast(qbz_ref[0, k]),
                    "off": _bcast(qoff_ref[0, k]),
                    "gid": gidx, "valid": gidx < n_prims,
                }
                t8, i8 = _quad_group_hits(ray_row, group, t8, i8)
            t_new, k_new, i_new = _reduce_group(
                t8, i8, PRIM_QUAD,
                t_ref[0, r].reshape(1, LANE),
                kind_ref[0, r].reshape(1, LANE),
                idx_ref[0, r].reshape(1, LANE),
            )
            t_ref[0, r] = t_new.reshape(LANE)
            kind_ref[0, r] = k_new.reshape(LANE)
            idx_ref[0, r] = i_new.reshape(LANE)


# ---------------------------------------------------------------------------
# Group-tree traversal kernels
# ---------------------------------------------------------------------------

def _tree_kernel(
    box_ref,    # SMEM (n_nodes, 6) f32: min xyz, max xyz
    link_ref,   # SMEM (n_nodes, 2) i32: miss link, leaf group (-1 interior)
    alive_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, time_ref, tmin_ref,
    *refs,
    kind_code: int, n_nodes: int, has_moving: bool, seeded: bool,
    leaf_groups: int,
):
    """Tile-lockstep skip-link traversal.  ``refs`` is
    (seed t/kind/idx refs if seeded) + leaf attribute tile refs (each
    (n_groups, 8, 1)) + the (t, kind, idx) output refs."""
    if seeded:
        t0_ref, k0_ref, i0_ref = refs[:3]
        refs = refs[3:]
    attr_refs = refs[:-3]
    t_ref, kind_ref, idx_ref = refs[-3:]

    if seeded:
        t_init = t0_ref[0]
        kind_init = k0_ref[0]
        idx_init = i0_ref[0]
    else:
        t_init = jnp.full((rows(), LANE), _BIG, real)
        kind_init = jnp.full((rows(), LANE), -1, jnp.int32)
        idx_init = jnp.zeros((rows(), LANE), jnp.int32)
    t_ref[0] = t_init
    kind_ref[0] = kind_init
    idx_ref[0] = idx_init

    @pl.when(jnp.max(alive_ref[0]) > 0)
    def _run():
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        t_min = tmin_ref[0]
        alive = alive_ref[0] > 0
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz

        def body(carry):
            node, t, kind, idx = carry
            b0 = box_ref[node, 0]
            b1 = box_ref[node, 1]
            b2 = box_ref[node, 2]
            b3 = box_ref[node, 3]
            b4 = box_ref[node, 4]
            b5 = box_ref[node, 5]
            # robust slab test vs the current per-ray best t
            # (reference: src/math/aabb.zig:80-101)
            tx0 = (b0 - ox) * inv_dx
            tx1 = (b3 - ox) * inv_dx
            ty0 = (b1 - oy) * inv_dy
            ty1 = (b4 - oy) * inv_dy
            tz0 = (b2 - oz) * inv_dz
            tz1 = (b5 - oz) * inv_dz
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), t_min),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), t),
            ) * AABB_MAX_MULT
            box_hit = (far > near) & alive
            any_hit = jnp.any(box_hit)
            miss_link = link_ref[node, 0]
            leaf_group = link_ref[node, 1]
            is_leaf = leaf_group >= 0

            def visit_leaf(args):
                t, kind, idx = args
                return _tree_leaf(
                    leaf_group, attr_refs,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    time_ref, tmin_ref, t, kind, idx,
                    kind_code=kind_code, has_moving=has_moving,
                    leaf_groups=leaf_groups,
                )

            t, kind, idx = jax.lax.cond(
                is_leaf & any_hit, visit_leaf, lambda args: args,
                (t, kind, idx),
            )
            nxt = jnp.where(any_hit & jnp.logical_not(is_leaf),
                            node + 1, miss_link)
            return nxt, t, kind, idx

        _, t, kind, idx = jax.lax.while_loop(
            lambda c: c[0] < n_nodes, body,
            (jnp.int32(0), t_init, kind_init, idx_init),
        )
        t_ref[0] = t
        kind_ref[0] = kind
        idx_ref[0] = idx


def _tree_leaf(
    g0, attr_refs,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, time_ref, tmin_ref,
    t, kind, idx, *, kind_code: int, has_moving: bool, leaf_groups: int,
):
    """Test the ``leaf_groups`` consecutive groups starting at ``g0`` against
    the whole tile.  Identity comes from the leaf-slot original-index tile,
    so results refer to the unsorted primitive tables.  (Per-row masking of
    the sweep was a measured NEGATIVE — see ops/pallas_bounce.py:_leaf_visit
    and BASELINE.md.)"""
    def make_group(g):
        bc = lambda ref: _bcast(ref[g])
        if kind_code == PRIM_SPHERE:
            (cx_ref, cy_ref, cz_ref, r_ref, mx_ref, my_ref, mz_ref,
             oi_ref) = attr_refs
            group = {
                "cx": bc(cx_ref), "cy": bc(cy_ref), "cz": bc(cz_ref),
                "r2": bc(r_ref), "gid": bc(oi_ref),
                "valid": jnp.full((8, LANE), True),
            }
            if has_moving:
                group["mx"] = bc(mx_ref)
                group["my"] = bc(my_ref)
                group["mz"] = bc(mz_ref)
        else:
            (sx_ref, sy_ref, sz_ref, nx_ref, ny_ref, nz_ref,
             ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref,
             off_ref, oi_ref) = attr_refs
            group = {
                "sx": bc(sx_ref), "sy": bc(sy_ref), "sz": bc(sz_ref),
                "nx": bc(nx_ref), "ny": bc(ny_ref), "nz": bc(nz_ref),
                "ax": bc(ax_ref), "ay": bc(ay_ref), "az": bc(az_ref),
                "bx": bc(bx_ref), "by": bc(by_ref), "bz": bc(bz_ref),
                "off": bc(off_ref), "gid": bc(oi_ref),
                "valid": jnp.full((8, LANE), True),
            }
        return group

    row_fn = (
        _sphere_group_hits if kind_code == PRIM_SPHERE else _quad_group_hits
    )
    groups = [make_group(g0 + j) for j in range(leaf_groups)]

    rows_t, rows_k, rows_i = [], [], []
    for r in range(rows()):
        ray_row = _load_ray_row(
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
            time_ref if (kind_code == PRIM_SPHERE and has_moving) else None,
            r, with_quadratic=kind_code == PRIM_SPHERE,
        )
        t8, i8 = _fresh_group_best()
        for group in groups:
            t8, i8 = row_fn(ray_row, group, t8, i8)
        t_new, k_new, i_new = _reduce_group(
            t8, i8, kind_code,
            t[r].reshape(1, LANE),
            kind[r].reshape(1, LANE),
            idx[r].reshape(1, LANE),
        )
        rows_t.append(t_new)
        rows_k.append(k_new)
        rows_i.append(i_new)
    return (
        jnp.concatenate(rows_t, axis=0),
        jnp.concatenate(rows_k, axis=0),
        jnp.concatenate(rows_i, axis=0),
    )


# ---------------------------------------------------------------------------
# Stage drivers
# ---------------------------------------------------------------------------

def _prim_layout(attr: jnp.ndarray, prim_block: int) -> jnp.ndarray:
    """(S,) attribute -> (blocks, prim_block/8, 8, 1) sublane-major tiles."""
    s = attr.shape[0]
    blocks = max(1, -(-s // prim_block))
    pad = blocks * prim_block - s
    if pad:
        attr = jnp.concatenate([attr, jnp.zeros((pad,), attr.dtype)])
    return attr.reshape(blocks, prim_block // 8, 8, 1)


def _ray_spec():
    return pl.BlockSpec(
        (1, rows(), LANE), lambda *g: (g[0], 0, 0), memory_space=pltpu.VMEM
    )


def _out_shapes(g):
    return [
        jax.ShapeDtypeStruct((g, rows(), LANE), real),
        jax.ShapeDtypeStruct((g, rows(), LANE), jnp.int32),
        jax.ShapeDtypeStruct((g, rows(), LANE), jnp.int32),
    ]


def _sphere_brute_stage(alive_tiles, tiles, sph, *, has_moving, n_spheres):
    g = alive_tiles.shape[0]
    pb = _prim_block(max(n_spheres, 1))
    sph_tiles = tuple(_prim_layout(a, pb) for a in sph)
    blocks = sph_tiles[0].shape[0]

    def table_spec():
        return pl.BlockSpec(
            (1, pb // 8, 8, 1), lambda i, j: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(
            _sphere_kernel, has_moving=has_moving, n_prims=n_spheres,
            prim_block=pb,
        ),
        grid_spec=pl.GridSpec(
            grid=(g, blocks),
            in_specs=[_ray_spec()] * 9 + [table_spec()] * 7,
            out_specs=[_ray_spec()] * 3,
        ),
        out_shape=_out_shapes(g),
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(alive_tiles, *tiles, *sph_tiles)


def _quad_brute_stage(alive_tiles, tiles, seed, quad, *, n_quads):
    g = alive_tiles.shape[0]
    pb = _prim_block(max(n_quads, 1))
    quad_tiles = tuple(_prim_layout(a, pb) for a in quad)
    blocks = quad_tiles[0].shape[0]

    def table_spec():
        return pl.BlockSpec(
            (1, pb // 8, 8, 1), lambda i, j: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    ray_in = tiles[:6] + (tiles[7],)  # no time needed for quads
    return pl.pallas_call(
        functools.partial(_quad_kernel, n_prims=n_quads, prim_block=pb),
        grid_spec=pl.GridSpec(
            grid=(g, blocks),
            in_specs=[_ray_spec()] * 8
            + [_ray_spec()] * 3
            + [table_spec()] * 13,
            out_specs=[_ray_spec()] * 3,
        ),
        out_shape=_out_shapes(g),
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(alive_tiles, *ray_in, *seed, *quad_tiles)


def _tree_stage(
    alive_tiles, tiles, seed, box, link, attrs, *,
    kind_code, has_moving, leaf_groups,
):
    g = alive_tiles.shape[0]
    n_nodes = box.shape[0]
    n_groups = attrs[0].shape[0] // 8
    attr_tiles = tuple(a.reshape(n_groups, 8, 1) for a in attrs)

    def smem_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.SMEM,
        )

    def attr_spec():
        return pl.BlockSpec(
            (n_groups, 8, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )

    seeded = seed is not None
    seed_in = list(seed) if seeded else []
    return pl.pallas_call(
        functools.partial(
            _tree_kernel, kind_code=kind_code, n_nodes=n_nodes,
            has_moving=has_moving, seeded=seeded,
            leaf_groups=leaf_groups,
        ),
        grid_spec=pl.GridSpec(
            grid=(g,),
            in_specs=[smem_spec((n_nodes, 6)), smem_spec((n_nodes, 2))]
            + [_ray_spec()] * 9
            + [_ray_spec()] * (3 if seeded else 0)
            + [attr_spec()] * len(attr_tiles),
            out_specs=[_ray_spec()] * 3,
        ),
        out_shape=_out_shapes(g),
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(box, link, alive_tiles, *tiles, *seed_in, *attr_tiles)


@functools.partial(
    jax.jit,
    static_argnames=(
        "has_moving", "n_spheres", "n_quads", "use_sph_tree", "use_quad_tree",
        "sph_span", "quad_span",
    ),
)
def _trace_call(
    alive, rays, sph, quad, sph_tree, quad_tree, *,
    has_moving, n_spheres, n_quads, use_sph_tree, use_quad_tree,
    sph_span, quad_span,
):
    n = rays[0].shape[0]
    g = n // blk()
    alive_tiles = alive.reshape(g, rows(), LANE)
    tiles = tuple(r.reshape(g, rows(), LANE) for r in rays)

    # -- sphere stage --
    if use_sph_tree:
        box, link, attrs = sph_tree
        t, kind, idx = _tree_stage(
            alive_tiles, tiles, None, box, link, attrs,
            kind_code=PRIM_SPHERE, has_moving=has_moving,
            leaf_groups=sph_span,
        )
    else:
        t, kind, idx = _sphere_brute_stage(
            alive_tiles, tiles, sph, has_moving=has_moving,
            n_spheres=n_spheres,
        )

    # -- quad stage (seeded with the sphere result) --
    if n_quads > 0:
        if use_quad_tree:
            box, link, attrs = quad_tree
            t, kind, idx = _tree_stage(
                alive_tiles, tiles, (t, kind, idx), box, link, attrs,
                kind_code=PRIM_QUAD, has_moving=False,
                leaf_groups=quad_span,
            )
        else:
            t, kind, idx = _quad_brute_stage(
                alive_tiles, tiles, (t, kind, idx), quad, n_quads=n_quads
            )

    t = jnp.where(kind < 0, jnp.float32(np.inf), t)
    return t.reshape(n), kind.reshape(n), idx.reshape(n)


@with_scene_rows
def closest_hit_pallas(
    scene: CompiledScene,
    origin: V3,
    direction: V3,
    time: jnp.ndarray,
    t_min,
    active=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused closest hit (brute or group-tree per kind).  Returns
    (t, kind, idx) with t=+inf on miss.  Rays are padded to a tile-size multiple
    internally."""
    n = origin.shape[0]
    n_pad = -(-n // blk()) * blk()

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
        scene.sph_radius * scene.sph_radius,
        scene.sph_move.x, scene.sph_move.y, scene.sph_move.z,
    )
    qu, qv, qw = scene.quad_u, scene.quad_v, scene.quad_w
    quad = (
        scene.quad_start.x, scene.quad_start.y, scene.quad_start.z,
        scene.quad_normal.x, scene.quad_normal.y, scene.quad_normal.z,
        # A = v x w, B = w x u (see _quad_group_hits)
        qv.y * qw.z - qv.z * qw.y,
        qv.z * qw.x - qv.x * qw.z,
        qv.x * qw.y - qv.y * qw.x,
        qw.y * qu.z - qw.z * qu.y,
        qw.z * qu.x - qw.x * qu.z,
        qw.x * qu.y - qw.y * qu.x,
        scene.quad_offset,
    )
    sph_tree = (scene.sph_tree_box, scene.sph_tree_link, scene.sph_tree_attrs)
    quad_tree = (
        scene.quad_tree_box, scene.quad_tree_link, scene.quad_tree_attrs
    )
    t, kind, idx = _trace_call(
        alive, rays, sph, quad, sph_tree, quad_tree,
        has_moving=scene.has_moving,
        n_spheres=scene.n_spheres, n_quads=scene.n_quads,
        use_sph_tree=scene.has_sph_tree, use_quad_tree=scene.has_quad_tree,
        sph_span=scene.sph_leaf_span, quad_span=scene.quad_leaf_span,
    )
    return t[:n], kind[:n], idx[:n]
