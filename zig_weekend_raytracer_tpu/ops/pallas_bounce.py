"""Pallas TPU bounce megakernels: closest-hit trace, shade-record fetch,
RNG, material scatter, and the light-mixture PDF, fused — and, in the
whole-render and regenerating variants, the bounce/sample LOOP itself.

Why: the XLA formulation of the per-bounce work (ops/shade.py +
render/integrator.py) round-trips path state through HBM across dozens of
unfused elementwise passes and pays a serialized gather for the shade
records — measured ~18x the cost of the trace itself on one v5e.  Fusing
keeps every intermediate in VMEM/registers; the whole-render kernel
(``render_fused``) additionally removes the global bounce barrier: each
ray tile drains its entire (pixel, sample-window) work list in one
in-kernel ``while_loop``, respawning dead lanes with their pixel's next
sample.

Per tile of rows*128 rays a bounce:
  1. traces against the scene tables, brute (streamed sublane groups, small
     tables) or group-tree (SMEM skip-link traversal, big tables) per
     primitive kind — same math as ops/pallas_trace.py;
  2. gathers the winning primitive's denormalized shade record with a
     lane-LUT gather: per-prim GEOMETRY columns from the (32, R, 128)
     shade LUT (R row-selects + lane shuffles each) and the 14 SHADING
     columns from the deduplicated per-material table (scene.mat_lut,
     usually one chunk);
  3. reconstructs hit attrs (point/normal/uv) — ops/shade.py math;
  4. draws RNG with the same content-addressed PCG4D streams as
     sampling/hashrng.py (bitwise-identical to the XLA integrator);
  5. evaluates all five materials masked + the 50/50 light mixture with the
     light list baked in as compile-time constants (scene.light_params),
     mirroring render/integrator.py bounce-for-bounce (and thus the
     reference's rayColor, src/render.zig:188-289).

Image textures are the one thing NOT fused (Mosaic has no per-lane dynamic
VMEM gather for the atlas): image scenes run the regenerating kernel under
an XLA while_loop with suspend-on-atlas draining — each lane buffers up to
K pending (u, v, img) events plus per-chain-segment radiance sums, the
tile exits when a lane's chain overflows, and one XLA pass resolves every
buffered event (valid because image textures only modulate
multiplicatively — lambertian / isotropic albedo).  Scenes with
image-textured *emissive* materials or checker-in-checker nesting fall
back to the XLA integrator (no reference scene has either).

Sphere UVs need acos/atan2, which Mosaic does not provide; `_atan2`/`_acos`
are polynomial implementations (max abs err ~2e-7 rad — sub-texel for any
realistic texture).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import AABB_MAX_MULT, LUM_B, LUM_G, LUM_R, T_MIN_PDF, real
from ..materials import schlick_reflectance, scattering_pdf
from ..math import v3
from ..math.v3 import V3
from ..scene import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_METAL,
    PRIM_QUAD,
    PRIM_SPHERE,
    CompiledScene,
)
from ..sampling import hashrng
from ..sampling.hashrng import RR_P_MIN
from ..textures import atlas_flat_index
from ..textures import checker_parity
from ..textures import lut_flat_index
from ..geometry import quad as quad_g
from ..geometry import sphere as sphere_g
from .shade import (
    _C_FUZZ,
    _C_IMG,
    _C_IMG2,
    _C_INVSCALE,
    _C_MAT,
    _C_MATID,
    _C_REFRACT,
    _C_RGB,
    _C_RGB2,
    _C_TEXKIND,
)
from . import pallas_trace as _pt
from .pallas_trace import (
    LANE,
    _BIG,
    _BIG_IDX,
    _bcast,
    _fresh_group_best,
    _interpret,
    _quad_group_hits,
    _reduce_group,
    _sphere_group_hits,
    with_scene_rows,
)

# RNG stream-site layout — MUST match render/integrator.py.
_BOUNCE_BASE = 8
_SITES_PER_BOUNCE = 4

# Unroll the brute group loop below this many groups; larger tables run a
# fori_loop with dynamically indexed group tiles (identical math).
_BRUTE_UNROLL_GROUPS = 32

# trace strategy codes (static per scene+kind)
TR_NONE = 0
TR_BRUTE = 1
TR_TREE = 2


# ---------------------------------------------------------------------------
# Kernel-safe inverse trig (Mosaic has no acos/atan2)
# ---------------------------------------------------------------------------

# minimax coefficients for atan(x), x in [-1, 1] (odd polynomial, degree 17;
# max abs err ~2e-7 rad)
_ATAN_C = (
    0.99999344, -0.33329856, 0.19977912, -0.14223677,
    0.10574801, -0.07218857, 0.04257684, -0.01616793, 0.00286623,
)


def _atan_unit(x):
    """atan for |x| <= 1."""
    z = x * x
    acc = jnp.full_like(x, _ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        acc = acc * z + c
    return x * acc


def _atan2(y, x):
    """Full-quadrant atan2 built from the unit-range polynomial."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), 1e-30)
    r = _atan_unit(num / den)
    r = jnp.where(swap, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos(x):
    x = jnp.clip(x, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


def _sphere_uv(n_obj: V3):
    """Spherical UVs (kernel-safe twin of geometry/sphere.py:uv)."""
    theta = _acos(jnp.clip(-n_obj.y, -1.0, 1.0))
    phi = _atan2(-n_obj.z, n_obj.x) + np.float32(np.pi)
    return phi * np.float32(0.5 / np.pi), theta * np.float32(1.0 / np.pi)


# ---------------------------------------------------------------------------
# Lane-LUT gather
# ---------------------------------------------------------------------------

def _lut_column(lut_ref, c: int, row, lane, n_rows: int):
    """Gather column ``c`` of the (32, R, 128) LUT at per-lane flat indices
    ``row * 128 + lane``: R lane-shuffles + R selects."""
    out = jnp.zeros((_pt.rows(), LANE), real)
    for rr in range(n_rows):
        tab = jnp.broadcast_to(lut_ref[c, rr].reshape(1, LANE), (_pt.rows(), LANE))
        shuffled = jnp.take_along_axis(tab, lane, axis=1)
        out = jnp.where(row == rr, shuffled, out) if n_rows > 1 else shuffled
    return out


def _gather_lut_cols(lut_ref, cols, row, lane, n_rows: int):
    """Batched record gather: several columns at the same per-lane
    (row, lane) indices.  Dense over row-chunks — a data-dependent
    chunk-skip was measured slower (the regenerating wavefront decoheres
    lane states, so tiles touch most chunks anyway and the per-chunk
    scalar branch costs more than it saves).  Returns {col: (ROWS, LANE)}.
    """
    return {c: _lut_column(lut_ref, c, row, lane, n_rows) for c in cols}


def _texlut_fetch(texlut_ref, flat, n_rows: int):
    """Per-lane packed-texel fetch from the (R, 128) i32 texture LUT
    (CompiledScene.tex_lut_tab): R lane-shuffles + selects (the
    _lut_column pattern), then byte unpack + gamma-2 linearize — the
    in-kernel replacement for the suspend/XLA-atlas round trip
    (VERDICT r4 #5; reference: src/texture.zig:49-68)."""
    row = flat // LANE
    lane = flat % LANE
    out = jnp.zeros((_pt.rows(), LANE), jnp.int32)
    for rr in range(n_rows):
        tab = jnp.broadcast_to(
            texlut_ref[rr].reshape(1, LANE), (_pt.rows(), LANE)
        )
        sh = jnp.take_along_axis(tab, lane, axis=1)
        out = jnp.where(row == rr, sh, out) if n_rows > 1 else sh
    # i32 unpack (NOT textures._unpack_texel): Mosaic has no u32 -> f32
    # cast (found on hardware, tpu_runs/r5b/10); texel bytes are < 2^24
    # so i32 shifts/masks are exact and i32 -> f32 casts are supported.
    scale = np.float32(1.0 / 255.0)
    texel = V3(
        (out & 0xFF).astype(real) * scale,
        ((out >> 8) & 0xFF).astype(real) * scale,
        ((out >> 16) & 0xFF).astype(real) * scale,
    )
    return texel * texel  # gamma-2 linearize (math.zig:172-174)


# ---------------------------------------------------------------------------
# Static light-list helpers (geometry baked in as constants)
# ---------------------------------------------------------------------------

def _static_light_pdf(light_params, origin: V3, direction: V3):
    """EntityPdf.value with compile-time light geometry
    (render/pdfs.py:light_pdf_value)."""
    total = jnp.zeros(origin.shape, real)
    for kind, p in light_params:
        if kind == PRIM_SPHERE:
            center = V3(*(np.float32(v) for v in p[:3]))
            radius = np.float32(p[3])
            _, valid = sphere_g.hit_t(
                center, radius, origin, direction, T_MIN_PDF, jnp.inf
            )
            total = total + sphere_g.pdf_value(
                center, radius, origin, direction, valid
            )
        else:
            start = V3(*(np.float32(v) for v in p[0:3]))
            eu = V3(*(np.float32(v) for v in p[3:6]))
            ev = V3(*(np.float32(v) for v in p[6:9]))
            nrm = V3(*(np.float32(v) for v in p[9:12]))
            w = V3(*(np.float32(v) for v in p[12:15]))
            total = total + quad_g.pdf_value(
                start, nrm, w, eu, ev, np.float32(p[15]), np.float32(p[16]),
                origin, direction, T_MIN_PDF,
            )
    return total / len(light_params)


def _static_light_sample(light_params, origin: V3, u_choice, u1, u2) -> V3:
    """EntityPdf.generate with compile-time light geometry
    (render/pdfs.py:sample_light_direction)."""
    n_l = len(light_params)
    chosen = jnp.minimum((u_choice * n_l).astype(jnp.int32), n_l - 1)
    out = V3.zeros(origin.shape)
    for l, (kind, p) in enumerate(light_params):
        if kind == PRIM_SPHERE:
            d = sphere_g.sample_direction(
                V3(*(np.float32(v) for v in p[:3])), np.float32(p[3]),
                origin, u1, u2,
            )
        else:
            d = quad_g.sample_direction(
                V3(*(np.float32(v) for v in p[0:3])),
                V3(*(np.float32(v) for v in p[3:6])),
                V3(*(np.float32(v) for v in p[6:9])),
                origin, u1, u2,
            )
        out = V3.where(chosen == l, d, out) if n_l > 1 else d
    return out


# ---------------------------------------------------------------------------
# In-kernel trace (values in, values out)
# ---------------------------------------------------------------------------

def _make_ray_row(origin, direction, tmin, tm, r, *, with_quadratic):
    ox = origin.x[r].reshape(1, LANE)
    oy = origin.y[r].reshape(1, LANE)
    oz = origin.z[r].reshape(1, LANE)
    dx = direction.x[r].reshape(1, LANE)
    dy = direction.y[r].reshape(1, LANE)
    dz = direction.z[r].reshape(1, LANE)
    t_min = tmin[r].reshape(1, LANE)
    if with_quadratic:
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
    else:
        a = inv_a = None
    tmr = tm[r].reshape(1, LANE) if tm is not None else None
    return (ox, oy, oz, dx, dy, dz, t_min, a, inv_a, tmr)


def _tab_group_sphere(tab_ref, oi_ref, g, gid, *, has_moving):
    """Build a sphere group dict from the packed (7, G, 8, 1) table.  ``gid``
    None means identity = original index from ``oi_ref``."""
    group = {
        "cx": _bcast(tab_ref[0, g]), "cy": _bcast(tab_ref[1, g]),
        "cz": _bcast(tab_ref[2, g]), "r2": _bcast(tab_ref[3, g]),
    }
    if has_moving:
        group["mx"] = _bcast(tab_ref[4, g])
        group["my"] = _bcast(tab_ref[5, g])
        group["mz"] = _bcast(tab_ref[6, g])
    if gid is None:
        group["gid"] = _bcast(oi_ref[g])
        group["valid"] = jnp.full((8, LANE), True)
    else:
        group["gid"] = gid[0]
        group["valid"] = gid[1]
    return group


def _tab_group_quad(tab_ref, oi_ref, g, gid):
    group = {
        "sx": _bcast(tab_ref[0, g]), "sy": _bcast(tab_ref[1, g]),
        "sz": _bcast(tab_ref[2, g]),
        "nx": _bcast(tab_ref[3, g]), "ny": _bcast(tab_ref[4, g]),
        "nz": _bcast(tab_ref[5, g]),
        "ax": _bcast(tab_ref[6, g]), "ay": _bcast(tab_ref[7, g]),
        "az": _bcast(tab_ref[8, g]),
        "bx": _bcast(tab_ref[9, g]), "by": _bcast(tab_ref[10, g]),
        "bz": _bcast(tab_ref[11, g]),
        "off": _bcast(tab_ref[12, g]),
    }
    if gid is None:
        group["gid"] = _bcast(oi_ref[g])
        group["valid"] = jnp.full((8, LANE), True)
    else:
        group["gid"] = gid[0]
        group["valid"] = gid[1]
    return group


def _brute_pass(
    kind_code, tab_ref, origin, direction, tmin, tm, t, kind, idx,
    *, n_prims, has_moving,
):
    """Linear scan over the full VMEM-resident table (the fused twin of the
    streamed kernels in ops/pallas_trace.py)."""
    n_groups = tab_ref.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    is_sphere = kind_code == PRIM_SPHERE
    row_fn = _sphere_group_hits if is_sphere else _quad_group_hits

    rows_t, rows_k, rows_i = [], [], []
    for r in range(_pt.rows()):
        ray_row = _make_ray_row(
            origin, direction, tmin, tm if (is_sphere and has_moving) else
            None, r, with_quadratic=is_sphere,
        )
        t8, i8 = _fresh_group_best()

        def group_step(k, t8, i8):
            gidx = k * 8 + sub
            gid = (gidx, gidx < n_prims)
            if is_sphere:
                group = _tab_group_sphere(
                    tab_ref, None, k, gid, has_moving=has_moving
                )
            else:
                group = _tab_group_quad(tab_ref, None, k, gid)
            return row_fn(ray_row, group, t8, i8)

        if n_groups <= _BRUTE_UNROLL_GROUPS:
            for k in range(n_groups):
                t8, i8 = group_step(k, t8, i8)
        else:
            t8, i8 = jax.lax.fori_loop(
                0, n_groups,
                lambda k, c: group_step(k, c[0], c[1]),
                (t8, i8),
            )
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


def _leaf_visit(
    kind_code, tab_ref, oi_ref, g0,
    origin, direction, tmin, tm, t, kind, idx,
    *, has_moving, leaf_groups,
):
    """Leaf sweep: test ``leaf_groups`` consecutive groups starting at
    ``g0`` against every row of the tile.

    MEASURED NEGATIVE (round 3, do not re-add): guarding each row's sweep
    with ``lax.cond(any(box_hit[row]))`` — per-ROW leaf masking, divergence
    granularity 128 — made every measured config SLOWER on a v5e (balls
    spans 8/16/32/64: 15.1/19.8/26.8/33.8 vs 26.7/31.2/34.2/37.4 Mpaths/s
    unmasked).  A Mosaic scalar branch inside the traversal while_loop
    costs more than the span x ~20 VPU ops it can skip, and the branches
    also serialize the otherwise-independent row chains.  Full writeup in
    BASELINE.md."""
    is_sphere = kind_code == PRIM_SPHERE
    row_fn = _sphere_group_hits if is_sphere else _quad_group_hits
    groups = []
    for j in range(leaf_groups):
        if is_sphere:
            groups.append(_tab_group_sphere(
                tab_ref, oi_ref, g0 + j, None, has_moving=has_moving
            ))
        else:
            groups.append(_tab_group_quad(tab_ref, oi_ref, g0 + j, None))
    rows_t, rows_k, rows_i = [], [], []
    for r in range(_pt.rows()):
        ray_row = _make_ray_row(
            origin, direction, tmin,
            tm if (is_sphere and has_moving) else None, r,
            with_quadratic=is_sphere,
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


def _node_slab_test(box_ref, node, origin, inv_d, tmin, t, alive):
    """Robust slab test of one SMEM node box against the whole tile
    (reference: src/math/aabb.zig:80-101)."""
    b0 = box_ref[node, 0]
    b1 = box_ref[node, 1]
    b2 = box_ref[node, 2]
    b3 = box_ref[node, 3]
    b4 = box_ref[node, 4]
    b5 = box_ref[node, 5]
    inv_dx, inv_dy, inv_dz = inv_d
    tx0 = (b0 - origin.x) * inv_dx
    tx1 = (b3 - origin.x) * inv_dx
    ty0 = (b1 - origin.y) * inv_dy
    ty1 = (b4 - origin.y) * inv_dy
    tz0 = (b2 - origin.z) * inv_dz
    tz1 = (b5 - origin.z) * inv_dz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), tmin),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t),
    ) * AABB_MAX_MULT
    return (far > near) & alive


def _tree_pass_queue(
    kind_code, box_ref, link_ref, tab_ref, oi_ref, q_ref,
    origin, direction, tmin, tm, alive, t, kind, idx,
    *, n_nodes, has_moving, leaf_groups, per_row,
):
    """Branchless deferred-leaf-queue traversal (opt-in via ZWRT_TRAV).

    The round-3 answer to the 'wide nodes / SMEM stack' design family: the
    measured per-node cost of the default walk is dominated by the Mosaic
    scalar BRANCH of its ``lax.cond`` leaf visit (~250 ns class, see
    ``_leaf_visit``), not by the slab test.  Here the walk carries only two
    scalars (node pointer, queue cursor) and pushes hit leaves into an SMEM
    queue with an UNCONDITIONAL store + conditional cursor advance — zero
    branches — then a second loop drains the queue with unconditional leaf
    sweeps (the dynamic leaf-group index is already supported by the table
    layout).  Trade-off vs the default: t does not tighten during the walk
    (queued-leaf culling uses the seed t), so slightly more leaves are
    swept.

    ``per_row`` additionally queues (leaf, ROW) pairs — divergence
    granularity 128 instead of 1024: a sublane row whose 128 rays all miss
    a leaf's box never pays that leaf's sweep.  The per-row hit mask is one
    extra two-stage reduction per node (max over lanes of a
    power-of-two row weight, then a summing OR), not 8 scalar branches —
    exactly the cost the measured-negative per-ROW masking design could
    not avoid."""
    inv_d = (1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)
    is_sphere = kind_code == PRIM_SPHERE
    use_tm = is_sphere and has_moving
    row_w = jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (_pt.rows(), LANE), 0)
    )

    def walk_body(carry):
        node, sp = carry
        box_hit = _node_slab_test(
            box_ref, node, origin, inv_d, tmin, t, alive
        )
        miss_link = link_ref[node, 0]
        leaf_group = link_ref[node, 1]
        is_leaf = leaf_group >= 0
        if per_row:
            # bits r set iff any lane of row r hit: per-row max of a
            # power-of-two weight, then sum = OR (rows are distinct bits)
            m = jnp.max(
                jnp.where(box_hit, row_w, 0), axis=1, keepdims=True
            )
            bits = jnp.sum(m)
            any_hit = bits > 0
            hit_leaf = is_leaf & any_hit
            for r in range(_pt.rows()):
                q_ref[sp] = leaf_group * _pt.rows() + r
                sp = sp + jnp.where(
                    hit_leaf & (((bits >> r) & 1) > 0), 1, 0
                )
        else:
            any_hit = jnp.any(box_hit)
            q_ref[sp] = leaf_group
            sp = sp + jnp.where(is_leaf & any_hit, 1, 0)
        nxt = jnp.where(any_hit & jnp.logical_not(is_leaf),
                        node + 1, miss_link)
        return nxt, sp

    _, sp = jax.lax.while_loop(
        lambda c: c[0] < n_nodes, walk_body, (jnp.int32(0), jnp.int32(0))
    )

    if not per_row:
        def drain_tile(i, carry):
            t, kind, idx = carry
            return _leaf_visit(
                kind_code, tab_ref, oi_ref, q_ref[i],
                origin, direction, tmin, tm, t, kind, idx,
                has_moving=has_moving, leaf_groups=leaf_groups,
            )

        return jax.lax.fori_loop(0, sp, drain_tile, (t, kind, idx))

    sub = jax.lax.broadcasted_iota(jnp.int32, (_pt.rows(), LANE), 0)
    row_fn = _sphere_group_hits if is_sphere else _quad_group_hits

    def drain_row(i, carry):
        t, kind, idx = carry
        v = q_ref[i]
        g0 = v // _pt.rows()
        r = v - g0 * _pt.rows()
        sel = sub == r

        def gather(x):
            return jnp.sum(
                jnp.where(sel, x, 0.0), axis=0, keepdims=True
            )

        ox = gather(origin.x)
        oy = gather(origin.y)
        oz = gather(origin.z)
        dx = gather(direction.x)
        dy = gather(direction.y)
        dz = gather(direction.z)
        t_min_row = gather(tmin)
        if is_sphere:
            a = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / a
        else:
            a = inv_a = None
        tm_row = gather(tm) if use_tm else None
        ray_row = (ox, oy, oz, dx, dy, dz, t_min_row, a, inv_a, tm_row)
        t8, i8 = _fresh_group_best()
        for j in range(leaf_groups):
            if is_sphere:
                group = _tab_group_sphere(
                    tab_ref, oi_ref, g0 + j, None, has_moving=has_moving
                )
            else:
                group = _tab_group_quad(tab_ref, oi_ref, g0 + j, None)
            t8, i8 = row_fn(ray_row, group, t8, i8)
        t_row = jnp.min(t8, axis=0, keepdims=True)
        i_row = jnp.min(
            jnp.where(t8 <= t_row, i8, _BIG_IDX), axis=0, keepdims=True
        )
        t_cur = gather(t)
        better = sel & jnp.broadcast_to(t_row < t_cur, (_pt.rows(), LANE))
        return (
            jnp.where(better, jnp.broadcast_to(t_row, (_pt.rows(), LANE)), t),
            jnp.where(better, kind_code, kind),
            jnp.where(better, jnp.broadcast_to(i_row, (_pt.rows(), LANE)), idx),
        )

    return jax.lax.fori_loop(0, sp, drain_row, (t, kind, idx))


def _tree_pass(
    kind_code, box_ref, link_ref, tab_ref, oi_ref,
    origin, direction, tmin, tm, alive, t, kind, idx,
    *, n_nodes, has_moving, leaf_groups,
):
    """Tile-lockstep skip-link traversal (the fused twin of
    ops/pallas_trace.py:_tree_kernel; reference: src/entity.zig:286-303).

    The walk is tile-lockstep: one scalar node pointer per 1024-ray tile,
    descending when any ray hits (see ``_leaf_visit`` for the measured
    negative on per-row divergence masking)."""
    inv_d = (1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)

    def body(carry):
        node, t, kind, idx = carry
        box_hit = _node_slab_test(
            box_ref, node, origin, inv_d, tmin, t, alive
        )
        any_hit = jnp.any(box_hit)
        miss_link = link_ref[node, 0]
        leaf_group = link_ref[node, 1]
        is_leaf = leaf_group >= 0

        t, kind, idx = jax.lax.cond(
            is_leaf & any_hit,
            lambda args: _leaf_visit(
                kind_code, tab_ref, oi_ref, leaf_group,
                origin, direction, tmin, tm, *args,
                has_moving=has_moving, leaf_groups=leaf_groups,
            ),
            lambda args: args,
            (t, kind, idx),
        )
        nxt = jnp.where(any_hit & jnp.logical_not(is_leaf),
                        node + 1, miss_link)
        return nxt, t, kind, idx

    _, t, kind, idx = jax.lax.while_loop(
        lambda c: c[0] < n_nodes, body, (jnp.int32(0), t, kind, idx)
    )
    return t, kind, idx


def _tree_pass_spec(
    kind_code, box_ref, link_ref, tab_ref, oi_ref,
    origin, direction, tmin, tm, alive, t, kind, idx,
    *, n_nodes, has_moving, leaf_groups,
):
    """Speculative two-successor traversal (opt-in ZWRT_TRAV=spec).

    The round-3 queue experiment located the per-node cost in the SERIAL
    scalar chain: SMEM box load -> slab test -> vector-to-scalar ``any``
    -> next-pointer select, each stage waiting on the previous.  This
    walk breaks the chain by evaluating BOTH possible successors
    (descend ``node+1`` / skip ``miss_link``) in iteration i — their
    loads and slab tests depend only on ``node``, not on this step's
    reduction, so the VLIW scheduler can run them while ``any`` of the
    CARRIED hit vector is in flight — then iteration i+1 just selects
    the precomputed vector.  Costs: 2x slab vector work per node (cheap:
    the queue sweep showed vector work is not the bound) + one carried
    (ROWS, LANE) bool.

    Correctness of the stale far-clip: the speculative test uses ``t``
    BEFORE any leaf visit this iteration, and ``t`` only ever shrinks —
    a stale (larger) ``t`` admits every box the fresh value would and
    possibly more, so the walk may visit a node it could have culled but
    never skips a needed one; leaf primitive tests always use fresh
    ``t``.  Out-of-range speculative indices (exit sentinel n_nodes) are
    clamped for the load only; the loop condition uses the unclamped
    pointer."""
    inv_d = (1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)

    def slab(node_idx, t_cur):
        return _node_slab_test(
            box_ref, node_idx, origin, inv_d, tmin, t_cur, alive
        )

    def body(carry):
        node, box_hit, t, kind, idx = carry
        miss_link = link_ref[node, 0]
        leaf_group = link_ref[node, 1]
        # the carried hit mask is i32, not bool: Mosaic cannot legalize
        # arith.select on vector<8x128xi1> operands (found on hardware in
        # round 5 — interpret mode accepted it)
        hit_desc = slab(jnp.minimum(node + 1, n_nodes - 1), t).astype(
            jnp.int32
        )
        hit_miss = slab(jnp.minimum(miss_link, n_nodes - 1), t).astype(
            jnp.int32
        )

        any_hit = jnp.any(box_hit > 0)
        is_leaf = leaf_group >= 0
        t, kind, idx = jax.lax.cond(
            is_leaf & any_hit,
            lambda args: _leaf_visit(
                kind_code, tab_ref, oi_ref, leaf_group,
                origin, direction, tmin, tm, *args,
                has_moving=has_moving, leaf_groups=leaf_groups,
            ),
            lambda args: args,
            (t, kind, idx),
        )
        go_desc = any_hit & jnp.logical_not(is_leaf)
        nxt = jnp.where(go_desc, node + 1, miss_link)
        nxt_hit = jnp.where(go_desc, hit_desc, hit_miss)
        return nxt, nxt_hit, t, kind, idx

    root_hit = slab(jnp.int32(0), t).astype(jnp.int32)
    _, _, t, kind, idx = jax.lax.while_loop(
        lambda c: c[0] < n_nodes, body,
        (jnp.int32(0), root_hit, t, kind, idx),
    )
    return t, kind, idx


def _uni_tree_pass(
    box_ref, link_ref, s_tab_ref, s_oi_ref, q_tab_ref, q_oi_ref,
    origin, direction, tmin, tm, alive, t, kind, idx,
    *, n_nodes, has_moving, leaf_groups,
):
    """Unified-tree traversal: ONE skip-link walk over a spatial tree whose
    kind-pure leaves hold either spheres or quads
    (geometry/bvh.py:build_group_tree_unified) — replaces the two
    sequential per-kind walks, so a bounce pays root-to-miss overhead once
    and visits only the kinds its rays' neighborhoods contain (the TPU
    analog of the reference's single BVH over IEntity,
    src/entity.zig:226-259)."""
    inv_d = (1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)

    def body(carry):
        node, t, kind, idx = carry
        box_hit = _node_slab_test(
            box_ref, node, origin, inv_d, tmin, t, alive
        )
        any_hit = jnp.any(box_hit)
        miss_link = link_ref[node, 0]
        leaf_group = link_ref[node, 1]
        leaf_kind = link_ref[node, 2]
        is_leaf = leaf_group >= 0

        def visit(args):
            return jax.lax.cond(
                leaf_kind == PRIM_SPHERE,
                lambda a: _leaf_visit(
                    PRIM_SPHERE, s_tab_ref, s_oi_ref, leaf_group,
                    origin, direction, tmin, tm, *a,
                    has_moving=has_moving, leaf_groups=leaf_groups,
                ),
                lambda a: _leaf_visit(
                    PRIM_QUAD, q_tab_ref, q_oi_ref, leaf_group,
                    origin, direction, tmin, None, *a,
                    has_moving=False, leaf_groups=leaf_groups,
                ),
                args,
            )

        t, kind, idx = jax.lax.cond(
            is_leaf & any_hit, visit, lambda args: args, (t, kind, idx)
        )
        nxt = jnp.where(any_hit & jnp.logical_not(is_leaf),
                        node + 1, miss_link)
        return nxt, t, kind, idx

    _, t, kind, idx = jax.lax.while_loop(
        lambda c: c[0] < n_nodes, body, (jnp.int32(0), t, kind, idx)
    )
    return t, kind, idx


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------

def _unpack_trace_refs(cfg, nxt):
    """Pull the per-kind trace-table refs off the kernel argument list into a
    dict keyed like _trace_values expects."""
    tr = {}
    if cfg["uni_mode"]:
        (tr["u_box"], tr["u_link"], tr["us_tab"], tr["us_oi"],
         tr["uq_tab"], tr["uq_oi"]) = (nxt() for _ in range(6))
        tr["texlut"] = nxt() if cfg["tex_lut"] else None
        return tr
    if cfg["sph_mode"] == TR_BRUTE:
        tr["s_tab"] = nxt()
        tr["s_box"] = tr["s_link"] = tr["s_oi"] = None
    elif cfg["sph_mode"] == TR_TREE:
        tr["s_box"], tr["s_link"], tr["s_tab"], tr["s_oi"] = (
            nxt(), nxt(), nxt(), nxt()
        )
    else:
        tr["s_tab"] = tr["s_box"] = tr["s_link"] = tr["s_oi"] = None
    if cfg["quad_mode"] == TR_BRUTE:
        tr["q_tab"] = nxt()
        tr["q_box"] = tr["q_link"] = tr["q_oi"] = None
    elif cfg["quad_mode"] == TR_TREE:
        tr["q_box"], tr["q_link"], tr["q_tab"], tr["q_oi"] = (
            nxt(), nxt(), nxt(), nxt()
        )
    else:
        tr["q_tab"] = tr["q_box"] = tr["q_link"] = tr["q_oi"] = None
    tr["texlut"] = nxt() if cfg["tex_lut"] else None
    return tr


def _respawn_values(
    cfg, seed, pxv, pyv, limit,
    origin, direction, tm, rid, throughput, sample, bounce_ct, alive,
):
    """Path regeneration on in-register values: dead lanes take their
    pixel's next sample and generate a fresh camera ray in-kernel (the
    "wavefront with regeneration" design; RNG stays content-addressed by
    (sample, pixel, path-bounce), so images are bit-identical to the
    non-regenerating integrator)."""
    from ..render.camera import camera_params_from_consts, generate_rays

    regen = cfg["regen"]
    shape = origin.shape
    next_sample = sample + regen["stride"]
    respawn = jnp.logical_not(alive) & (next_sample < limit)
    sample = jnp.where(respawn, next_sample, sample)
    new_rid = (
        sample.astype(jnp.uint32) * jnp.uint32(regen["height"])
        + pyv.astype(jnp.uint32)
    ) * jnp.uint32(regen["width"]) + pxv.astype(jnp.uint32)
    rid = jnp.where(respawn, new_rid, rid)
    camp = camera_params_from_consts(regen["camera"])
    o_new, d_new, t_new = generate_rays(
        camp, regen["has_dof"], regen["sampler"], seed, new_rid,
        pxv, pyv, sample, regen["spp"], regen["width"], regen["height"],
    )
    origin = V3.where(respawn, o_new, origin)
    direction = V3.where(respawn, d_new, direction)
    tm = jnp.where(respawn, t_new, tm)
    throughput = V3.where(
        respawn, V3.full(shape, 1.0, 1.0, 1.0, real), throughput
    )
    bounce_ct = jnp.where(respawn, 0, bounce_ct)
    alive = alive | respawn
    return (
        origin, direction, tm, rid, throughput, sample, bounce_ct, alive,
        respawn,
    )


def _bounce_kernel(
    seed_ref, depth_ref,
    *refs,
    cfg,
):
    """One full integrator bounce for one ray tile.  Mirrors
    render/integrator.py:bounce line-for-line (reference semantics:
    src/render.zig:188-289).  ``cfg`` is the static scene configuration
    (see _fused_call)."""
    regen = cfg["regen"]
    n_refs = len(refs) - (1 if _queue_cap(cfg) else 0)
    it = iter(range(n_refs))
    nxt = lambda: refs[next(it)]
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, time_ref, rid_ref,
     thx_ref, thy_ref, thz_ref, rax_ref, ray_ref, raz_ref, alive_ref) = (
        nxt() for _ in range(15)
    )
    if regen:
        px_ref, py_ref, sample_ref, bounce_ref, limit_ref = (
            nxt() for _ in range(5)
        )
        work_ref = nxt() if regen["work"] else None
    lut_ref = nxt()
    mat_ref = nxt()
    trace = _unpack_trace_refs(cfg, nxt)
    if _queue_cap(cfg):
        trace["q_queue"] = refs[-1]
    (nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
     nthx_ref, nthy_ref, nthz_ref, nrax_ref, nray_ref, nraz_ref,
     nalive_ref) = (nxt() for _ in range(13))
    if regen:
        ntime_ref, nsample_ref, nbounce_ref, nrid_ref = (
            nxt() for _ in range(4)
        )
        nwork_ref = nxt() if regen["work"] else None
    if regen:
        # packed interruption record: one i32 per lane (-1 none, -2 blocked
        # respawn, >= 0 flat atlas texel index) — the (u, v, img) triple is
        # folded into the index IN-KERNEL (textures.atlas_flat_index)
        to_ref = nxt()
    else:
        uo_ref, vo_ref, io_ref = (nxt() for _ in range(3))
    if regen and regen.get("atlas_slots"):
        _K = regen["atlas_slots"]
        seg_refs = [tuple(nxt() for _ in range(3)) for _ in range(_K)]
        buft_refs = [nxt() for _ in range(_K)]

    shape = (_pt.rows(), LANE)
    alive_i = alive_ref[0]
    if regen:
        # a tile is live if any lane is alive OR can still respawn a sample
        # (the per-lane limit makes sample budgets lane-local, which is what
        # the profile-guided load balancer needs)
        respawnable = sample_ref[0] + regen["stride"] < limit_ref[0]
        any_alive = jnp.any((alive_i > 0) | respawnable)
    else:
        any_alive = jnp.max(alive_i) > 0

    @pl.when(jnp.logical_not(any_alive))
    def _passthrough():
        nox_ref[0] = ox_ref[0]
        noy_ref[0] = oy_ref[0]
        noz_ref[0] = oz_ref[0]
        ndx_ref[0] = dx_ref[0]
        ndy_ref[0] = dy_ref[0]
        ndz_ref[0] = dz_ref[0]
        nthx_ref[0] = thx_ref[0]
        nthy_ref[0] = thy_ref[0]
        nthz_ref[0] = thz_ref[0]
        nrax_ref[0] = rax_ref[0]
        nray_ref[0] = ray_ref[0]
        nraz_ref[0] = raz_ref[0]
        nalive_ref[0] = alive_i
        if regen:
            ntime_ref[0] = time_ref[0]
            nsample_ref[0] = sample_ref[0]
            nbounce_ref[0] = bounce_ref[0]
            nrid_ref[0] = rid_ref[0]
            if regen["work"]:
                nwork_ref[0] = work_ref[0]
        if regen:
            to_ref[0] = jnp.full(shape, -1, jnp.int32)
        else:
            uo_ref[0] = jnp.zeros(shape, real)
            vo_ref[0] = jnp.zeros(shape, real)
            io_ref[0] = jnp.full(shape, -1, jnp.int32)
        if regen and regen.get("atlas_slots"):
            for _j in range(regen["atlas_slots"]):
                for _c in range(3):
                    seg_refs[_j][_c][0] = jnp.zeros(shape, real)
                buft_refs[_j][0] = jnp.full(shape, -1, jnp.int32)

    if regen:
        # Suspend-on-atlas drain: loop bounces IN-KERNEL until the tile
        # runs out of work or an atlas interruption forces an exit, so the
        # XLA driver's per-launch cost is paid once per interruption
        # instead of once per bounce.  With K = regen["atlas_slots"] > 0,
        # each lane BUFFERS up to K pending atlas events before forcing an
        # exit: radiance is accumulated into per-chain-segment sums (the
        # tex factor of an event multiplies every contribution after it,
        # so segment k is later scaled by the product of chain entries
        # 0..k — exact, just reassociated), and a lane that respawns a new
        # sample with pending factors records a RESET sentinel (img = -2)
        # so the driver restarts the factor product for the new path.
        # Per-lane stalling (freezing event lanes while others drain) was
        # measured SLOWER — frozen lanes waste whole-tile trace
        # iterations — as was s_par event-chain splitting.
        K = regen.get("atlas_slots") or 0

        @pl.when(any_alive)
        def _run_regen():
            seed = seed_ref[0, 0]
            px_v = px_ref[0]
            py_v = py_ref[0]
            limit_v = limit_ref[0]
            stride = regen["stride"]
            shp = (_pt.rows(), LANE)
            zero = jnp.zeros(shp, real)
            zero3 = V3.zeros(shp, real)

            def body(carry):
                c = list(carry)
                (ox, oy, oz, dx, dy, dz, tm, rid, thx, thy, thz,
                 rx, ry, rz, alive_c, sample, bounce, work) = c[:18]
                to_c = c[18]
                if K:
                    rest = c[19:]
                    segs = [
                        V3(*rest[3 * j: 3 * j + 3]) for j in range(K)
                    ]
                    buft = list(rest[3 * K: 4 * K])
                    segidx = rest[4 * K]
                    dirty = rest[4 * K + 1]
                origin = V3(ox, oy, oz)
                direction = V3(dx, dy, dz)
                throughput = V3(thx, thy, thz)
                radiance = V3(rx, ry, rz)
                alive0 = alive_c > 0

                if K:
                    # a dead lane that WOULD respawn but has a full chain
                    # cannot record the reset sentinel: suppress the
                    # respawn (pretend alive) and flag an exit (io = -2)
                    want_respawn = (
                        jnp.logical_not(alive0)
                        & (sample + stride < limit_v)
                    )
                    blocked = want_respawn & (dirty > 0) & (segidx >= K)
                else:
                    blocked = jnp.zeros(shp, bool)

                (origin, direction, tm, rid, throughput, sample, bounce_ct,
                 alive, respawned) = _respawn_values(
                    cfg, seed, px_v, py_v, limit_v,
                    origin, direction, tm, rid, throughput,
                    sample, bounce, alive0 | blocked,
                )
                step = alive & jnp.logical_not(blocked)

                if K:
                    # reset sentinel for respawns with pending factors
                    need_sent = respawned & (dirty > 0)
                    for k in range(K):
                        sel = need_sent & (segidx == k)
                        buft[k] = jnp.where(sel, jnp.int32(-2), buft[k])
                    segidx = segidx + need_sent.astype(jnp.int32)
                    dirty = jnp.where(need_sent, 0, dirty)

                # lanes that trace this step did one unit of work — the
                # per-pixel cost signal for profile-guided balancing
                work = work + step.astype(jnp.int32)
                (new_origin, new_direction, new_throughput, rad_out,
                 survives, (uo, vo, io)) = _bounce_core(
                    cfg, trace, lut_ref, mat_ref, seed, bounce_ct,
                    origin, direction, tm, rid, throughput,
                    zero3 if K else radiance, step,
                )
                # depth cutoff per path (reference: src/render.zig:199)
                bounce_next = bounce_ct + 1
                survives = survives & (bounce_next < regen["max_depth"])

                if K or (cfg["has_images"] and not cfg["tex_lut"]):
                    # pack the event into one i32 flat atlas texel index
                    # in-kernel (same arithmetic the XLA fold used to run
                    # on the exported (u, v, img) triple — pure selects
                    # over the static image list + clip/mul/cast, bitwise
                    # identical)
                    tv = atlas_flat_index(
                        cfg["image_dims"], cfg["atlas_hw"],
                        jnp.maximum(io, 0), uo, vo,
                    )
                if K:
                    # route this bounce's radiance delta to the segment of
                    # the lane's current chain position
                    d = rad_out
                    radiance = radiance + V3.where(segidx == 0, d, zero3)
                    for j in range(K):
                        segs[j] = segs[j] + V3.where(
                            segidx == j + 1, d, zero3
                        )
                    ev = io >= 0
                    can_buf = segidx < K
                    buffered = ev & can_buf
                    for k in range(K):
                        sel = buffered & (segidx == k)
                        buft[k] = jnp.where(sel, tv, buft[k])
                    segidx = segidx + buffered.astype(jnp.int32)
                    dirty = jnp.where(buffered, 1, dirty)
                    overflow = ev & jnp.logical_not(can_buf)
                    to_c = jnp.where(overflow, tv, to_c)
                    to_c = jnp.where(blocked, jnp.int32(-2), to_c)
                else:
                    radiance = rad_out
                    if cfg["has_images"] and not cfg["tex_lut"]:
                        to_c = jnp.where(io >= 0, tv, io)
                    else:
                        to_c = io

                out = [
                    new_origin.x, new_origin.y, new_origin.z,
                    new_direction.x, new_direction.y, new_direction.z,
                    tm, rid,
                    new_throughput.x, new_throughput.y, new_throughput.z,
                    radiance.x, radiance.y, radiance.z,
                    survives.astype(jnp.int32), sample, bounce_next, work,
                    to_c,
                ]
                if K:
                    for s in segs:
                        out += [s.x, s.y, s.z]
                    out += buft + [segidx, dirty]
                return tuple(out)

            def cond(carry):
                # exit when nothing can progress or some lane raised the
                # interruption flag (atlas overflow to>=0, blocked
                # respawn to=-2); buffered events do NOT exit
                alive_c, sample, to = carry[14], carry[15], carry[18]
                can_work = jnp.any(
                    (alive_c > 0) | (sample + stride < limit_v)
                )
                return can_work & jnp.logical_not(jnp.any(to != -1))

            init = [
                ox_ref[0], oy_ref[0], oz_ref[0],
                dx_ref[0], dy_ref[0], dz_ref[0],
                time_ref[0], rid_ref[0],
                thx_ref[0], thy_ref[0], thz_ref[0],
                rax_ref[0], ray_ref[0], raz_ref[0],
                alive_i, sample_ref[0], bounce_ref[0],
                work_ref[0] if regen["work"] else jnp.zeros(shp, jnp.int32),
                jnp.full(shp, -1, jnp.int32),
            ]
            if K:
                init += [zero] * (3 * K)              # segments
                init += [jnp.full(shp, -1, jnp.int32)] * K  # buft
                init += [jnp.zeros(shp, jnp.int32)] * 2     # segidx, dirty
            out = jax.lax.while_loop(cond, body, tuple(init))
            (nox_ref[0], noy_ref[0], noz_ref[0],
             ndx_ref[0], ndy_ref[0], ndz_ref[0],
             ntime_ref[0], nrid_ref[0],
             nthx_ref[0], nthy_ref[0], nthz_ref[0],
             nrax_ref[0], nray_ref[0], nraz_ref[0],
             nalive_ref[0], nsample_ref[0], nbounce_ref[0]) = out[:17]
            if regen["work"]:
                nwork_ref[0] = out[17]
            to_ref[0] = out[18]
            if K:
                rest = out[19:]
                for j in range(K):
                    seg_refs[j][0][0] = rest[3 * j]
                    seg_refs[j][1][0] = rest[3 * j + 1]
                    seg_refs[j][2][0] = rest[3 * j + 2]
                for k in range(K):
                    buft_refs[k][0] = rest[3 * K + k]
    else:
        @pl.when(any_alive)
        def _run():
            seed = seed_ref[0, 0]
            origin = V3(ox_ref[0], oy_ref[0], oz_ref[0])
            direction = V3(dx_ref[0], dy_ref[0], dz_ref[0])
            tm = time_ref[0]
            rid = rid_ref[0]
            throughput = V3(thx_ref[0], thy_ref[0], thz_ref[0])
            radiance = V3(rax_ref[0], ray_ref[0], raz_ref[0])
            alive = alive_i > 0
            depth = depth_ref[0, 0]

            (new_origin, new_direction, new_throughput, radiance, survives,
             uvio) = _bounce_core(
                cfg, trace, lut_ref, mat_ref, seed, depth,
                origin, direction, tm, rid, throughput, radiance, alive,
            )
            nox_ref[0] = new_origin.x
            noy_ref[0] = new_origin.y
            noz_ref[0] = new_origin.z
            ndx_ref[0] = new_direction.x
            ndy_ref[0] = new_direction.y
            ndz_ref[0] = new_direction.z
            nthx_ref[0] = new_throughput.x
            nthy_ref[0] = new_throughput.y
            nthz_ref[0] = new_throughput.z
            nrax_ref[0] = radiance.x
            nray_ref[0] = radiance.y
            nraz_ref[0] = radiance.z
            nalive_ref[0] = survives.astype(jnp.int32)
            uo_ref[0], vo_ref[0], io_ref[0] = uvio


def _trace_values(cfg, trace, origin, direction, tmin_tile, tm, alive):
    """Closest hit over the scene tables on in-register values."""
    shape = origin.shape
    ht = jnp.full(shape, _BIG, real)
    hk = jnp.full(shape, -1, jnp.int32)
    hi = jnp.zeros(shape, jnp.int32)
    has_moving = cfg["has_moving"]
    if cfg["uni_mode"]:
        return _uni_tree_pass(
            trace["u_box"], trace["u_link"],
            trace["us_tab"], trace["us_oi"],
            trace["uq_tab"], trace["uq_oi"],
            origin, direction, tmin_tile, tm, alive, ht, hk, hi,
            n_nodes=cfg["uni_nodes"], has_moving=has_moving,
            leaf_groups=cfg["uni_leaf_span"],
        )
    trav = cfg["trav"]

    def tree(kind_code, box, link, tab, oi, tmv, hs, n_nodes, span, c):
        if trav == "cond":
            return _tree_pass(
                kind_code, box, link, tab, oi,
                origin, direction, tmin_tile, tmv, alive, *c,
                n_nodes=n_nodes, has_moving=hs, leaf_groups=span,
            )
        if trav == "spec":
            return _tree_pass_spec(
                kind_code, box, link, tab, oi,
                origin, direction, tmin_tile, tmv, alive, *c,
                n_nodes=n_nodes, has_moving=hs, leaf_groups=span,
            )
        return _tree_pass_queue(
            kind_code, box, link, tab, oi, trace["q_queue"],
            origin, direction, tmin_tile, tmv, alive, *c,
            n_nodes=n_nodes, has_moving=hs, leaf_groups=span,
            per_row=trav == "rowqueue",
        )

    if cfg["sph_mode"] == TR_BRUTE:
        ht, hk, hi = _brute_pass(
            PRIM_SPHERE, trace["s_tab"], origin, direction, tmin_tile, tm,
            ht, hk, hi, n_prims=cfg["n_sph"], has_moving=has_moving,
        )
    elif cfg["sph_mode"] == TR_TREE:
        ht, hk, hi = tree(
            PRIM_SPHERE, trace["s_box"], trace["s_link"], trace["s_tab"],
            trace["s_oi"], tm, has_moving,
            cfg["sph_nodes"], cfg["sph_leaf_span"], (ht, hk, hi),
        )
    if cfg["quad_mode"] == TR_BRUTE:
        ht, hk, hi = _brute_pass(
            PRIM_QUAD, trace["q_tab"], origin, direction, tmin_tile, None,
            ht, hk, hi, n_prims=cfg["n_quad"], has_moving=False,
        )
    elif cfg["quad_mode"] == TR_TREE:
        ht, hk, hi = tree(
            PRIM_QUAD, trace["q_box"], trace["q_link"], trace["q_tab"],
            trace["q_oi"], None, False,
            cfg["quad_nodes"], cfg["quad_leaf_span"], (ht, hk, hi),
        )
    return ht, hk, hi


def _bounce_core(
    cfg, trace, lut_ref, mat_ref, seed, depth,
    origin, direction, tm, rid, throughput, radiance, alive,
):
    """One full integrator bounce on in-register values: trace, shade-record
    gather, RNG, masked materials, light mixture.  Returns
    (new_origin, new_direction, new_throughput, radiance', survives,
    (u, v, img)).  Mirrors render/integrator.py:bounce line-for-line
    (reference semantics: src/render.zig:188-289)."""
    shape = origin.shape
    tmin_tile = jnp.full(shape, cfg["t_min"], real)
    # image colors either DEFER to the XLA atlas pass (chain events) or
    # resolve in-kernel via the texture LUT (cfg["tex_lut"], VERDICT r4 #5)
    defer_img = cfg["has_images"] and not cfg["tex_lut"]

    # ---- trace ----
    ht, hk, hi = _trace_values(
        cfg, trace, origin, direction, tmin_tile, tm, alive
    )

    # ---- RNG (same streams as the XLA integrator) ----
    site = (_BOUNCE_BASE + depth * _SITES_PER_BOUNCE).astype(jnp.uint32)
    u0, u1, u2, u3 = hashrng.uniform4(seed, rid, site)
    light_params = cfg["light_params"]
    if light_params:
        u4, u5, u6, _ = hashrng.uniform4(seed, rid, site + jnp.uint32(1))
    # The gaussian triple feeds ONLY isotropic scatter and fuzzy metal; when
    # the scene has neither, skip the Box-Muller transcendentals (safe
    # because RNG draws are content-addressed per site, never sequential).
    if cfg["needs_gauss"]:
        gauss = hashrng.gauss3(seed, rid, site + jnp.uint32(2))
    if cfg["rr_start"]:
        u_rr = hashrng.uniform1(seed, rid, site + jnp.uint32(3))

    hit_any = hk >= 0
    hitmask = alive & hit_any
    missed = alive & jnp.logical_not(hit_any)

    # ---- shade record gather ----
    is_sphere = hk == PRIM_SPHERE
    lut_rows = cfg["lut_rows"]
    uidx = jnp.where(is_sphere, hi, cfg["n_sph"] + hi)
    uidx = jnp.clip(uidx, 0, lut_rows * LANE - 1)
    g_row = uidx // LANE
    g_lane = uidx % LANE

    # Split gather for big scenes: the 14 SHADING columns (SHADE_BLOCK)
    # come from the deduplicated material table (usually one 128-lane
    # chunk), so only the 7 geometry columns + _C_MATID pay the per-prim
    # R-row-chunk price
    # (measured >50% of a big-scene fused bounce at 18 dense columns).
    # The image-UV geometry columns (7-14) are gathered lazily below, only
    # when some lane in the tile actually needs an atlas fetch.
    split = lut_rows > 1 and cfg["mat_rows"] == 1
    if split:
        geo = _gather_lut_cols(
            lut_ref, list(range(7)) + [_C_MATID], g_row, g_lane, lut_rows
        )
        matid = geo[_C_MATID].astype(jnp.int32)
        mat = _gather_lut_cols(
            mat_ref, list(range(_C_MATID - _C_MAT)), matid, matid, 1
        )

        def col(c):
            return geo[c] if c < _C_MAT else mat[c - _C_MAT]
    else:
        needed = list(range(7)) + list(range(_C_MAT, _C_IMG2 + 1))
        if cfg["has_images"]:
            needed += list(range(7, 15))
        gathered = _gather_lut_cols(
            lut_ref, sorted(set(needed)), g_row, g_lane, lut_rows
        )

        def col(c):
            return gathered[c]

    # geometry reconstruction (ops/shade.py:_attrs_from_columns)
    safe_t = jnp.where(ht < _BIG, ht, 0.0)
    point = origin + direction * safe_t

    center = V3(col(0), col(1), col(2))
    if cfg["has_moving"]:
        center = center + V3(col(3), col(4), col(5)) * tm
    inv_r = col(6)
    n_sph_v = (point - center) * inv_r
    q_normal = V3(col(3), col(4), col(5))

    outward = V3.where(is_sphere, n_sph_v, q_normal)
    front = v3.dot(direction, outward) < 0.0
    normal = V3.where(front, outward, -outward)

    def _uv_from(cv):
        # sphere UVs with the object-space un-rotation (ops/shade.py)
        c_rot = cv(7)
        s_rot = cv(8)
        n_obj = V3(
            c_rot * n_sph_v.x - s_rot * n_sph_v.z,
            n_sph_v.y,
            s_rot * n_sph_v.x + c_rot * n_sph_v.z,
        )
        u_sph, v_sph = _sphere_uv(n_obj)
        # quad UVs = plane coordinates (alpha, beta)
        q_w = V3(cv(6), cv(7), cv(8))
        q_u = V3(cv(9), cv(10), cv(11))
        q_v = V3(cv(12), cv(13), cv(14))
        planar = point - V3(cv(0), cv(1), cv(2))
        alpha = v3.dot(q_w, v3.cross(planar, q_v))
        beta = v3.dot(q_w, v3.cross(q_u, planar))
        uo = jnp.where(is_sphere, u_sph, alpha)
        vo = jnp.where(is_sphere, v_sph, beta)
        return uo, vo

    def _lazy_uv(need):
        # UVs for lanes in ``need``; in split mode the UV geometry
        # columns ride the expensive per-prim gather, but only tiles
        # with a lane that actually needs them pay for it
        if not split:
            return _uv_from(col)

        def _compute_uv(_):
            extra = _gather_lut_cols(
                lut_ref, list(range(7, 15)), g_row, g_lane, lut_rows
            )
            return _uv_from(lambda c: geo[c] if c < 7 else extra[c])

        def _skip_uv(_):
            z = jnp.zeros(shape, real)
            return z, z

        return jax.lax.cond(jnp.any(need), _compute_uv, _skip_uv, 0)

    mat_type = col(_C_MAT).astype(jnp.int32)
    tex_kind = col(_C_TEXKIND).astype(jnp.int32)
    rgb = V3(col(_C_RGB), col(_C_RGB + 1), col(_C_RGB + 2))
    rgb2 = V3(col(_C_RGB2), col(_C_RGB2 + 1), col(_C_RGB2 + 2))
    inv_scale = col(_C_INVSCALE)
    fuzz_c = col(_C_FUZZ)
    refract_c = col(_C_REFRACT)

    if cfg["clamp"]:
        # Cycles-style indirect clamp (mirrors render/integrator.py):
        # scale any bounce-d>=1 radiance contribution so its luminance
        # stays <= clamp — biased firefly control, default off.
        _cl = np.float32(cfg["clamp"])

        def _clamp_contrib(c: V3) -> V3:
            lum = LUM_R * c.x + LUM_G * c.y + LUM_B * c.z
            s = jnp.where(
                (depth >= 1) & (lum > _cl),
                _cl / jnp.maximum(lum, np.float32(1e-20)),
                np.float32(1.0),
            )
            return c * s
    else:
        def _clamp_contrib(c: V3) -> V3:
            return c

    background = cfg["background"]
    radiance = radiance + V3.where(
        missed,
        _clamp_contrib(throughput * V3(*(np.float32(b) for b in background))),
        V3.zeros(shape, real),
    )

    # ---- texture value (solid / checker; image children of a checker
    # carry a neutral rgb here, the atlas pass multiplies the color in) ----
    parity = checker_parity(inv_scale, point)
    odd = (tex_kind == 1) & (parity != 0)
    tex_rgb = V3.where(odd, rgb2, rgb)
    if cfg["has_images"]:
        # effective image: plain image texture (_C_IMG), or the
        # parity-selected checker child when that child is an image
        # (reference: src/texture.zig:117 — child sampled at the hit's u,v)
        img_id = jnp.where(
            odd, col(_C_IMG2).astype(jnp.int32), col(_C_IMG).astype(jnp.int32)
        )
        is_img = img_id >= 0
        if cfg["tex_lut"]:
            # in-kernel LUT fetch: the image color resolves NOW; nothing
            # defers (no atlas events, whole-render fused path)
            uo_l, vo_l = _lazy_uv(hitmask & is_img)
            flat = lut_flat_index(
                cfg["tex_lut"], jnp.maximum(img_id, 0), uo_l, vo_l
            )
            img_rgb = _texlut_fetch(
                trace["texlut"], flat, cfg["tex_lut_rows"]
            )
            tex_rgb = V3.where(is_img, img_rgb, tex_rgb)
    else:
        is_img = tex_kind == 2

    # ---- emission (src/render.zig:232-240) ----
    is_emissive = mat_type == MAT_DIFFUSE_LIGHT
    emits = hitmask & is_emissive & front
    radiance = V3.where(
        emits, radiance + _clamp_contrib(throughput * tex_rgb), radiance
    )

    # ---- metal (src/material.zig:163-178) ----
    reflected = v3.reflect(direction, normal)
    if cfg["needs_gauss"]:
        fuzz = jnp.clip(fuzz_c, 0.0, 1.0)
        metal_dir = reflected + hashrng.unit_sphere(gauss) * fuzz
    else:
        metal_dir = reflected
    metal_ok = v3.dot(metal_dir, normal) > 0.0

    # ---- dielectric (src/material.zig:190-218) ----
    index = jnp.where(front, 1.0 / refract_c, refract_c)
    unit_in = v3.normalize(direction)
    cos_theta = jnp.minimum(v3.dot(-unit_in, normal), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    must_reflect = (index * sin_theta > 1.0) | (
        schlick_reflectance(cos_theta, refract_c) > u0
    )
    diel_dir = V3.where(
        must_reflect,
        v3.reflect(unit_in, normal),
        v3.refract(unit_in, normal, index),
    )

    # ---- diffuse sampling ----
    basis = v3.ortho_basis(normal)
    cosine_dir = v3.onb_transform(
        basis, hashrng.cosine_direction_z(u1, u2)
    )
    if cfg["needs_gauss"]:
        is_iso = mat_type == MAT_ISOTROPIC
        sphere_dir = hashrng.unit_sphere(gauss)
        mat_sample_dir = V3.where(is_iso, sphere_dir, cosine_dir)
    else:
        mat_sample_dir = cosine_dir

    if light_params:
        light_dir = _static_light_sample(light_params, point, u4, u5, u6)
        use_light = u3 < 0.5
        diff_dir = V3.where(use_light, light_dir, mat_sample_dir)
        mat_pdf = scattering_pdf(mat_type, normal, diff_dir)
        l_pdf = _static_light_pdf(light_params, point, diff_dir)
        sample_pdf = 0.5 * l_pdf + 0.5 * mat_pdf
        scatter_pdf = mat_pdf
    else:
        diff_dir = mat_sample_dir
        scatter_pdf = scattering_pdf(mat_type, normal, diff_dir)
        sample_pdf = scatter_pdf

    # sample_pdf == 0 guard (integrator.py; src/render.zig:255-256)
    pdf_ok = sample_pdf > 0.0
    pdf_ratio = jnp.where(
        pdf_ok, scatter_pdf / jnp.where(pdf_ok, sample_pdf, 1.0), 0.0
    )
    if defer_img:
        # atlas color is multiplied in by the integrator afterwards
        diffuse_tex = V3.where(
            is_img, V3.full(shape, 1.0, 1.0, 1.0, real), tex_rgb
        )
    else:
        diffuse_tex = tex_rgb
    diffuse_mult = diffuse_tex * pdf_ratio

    # ---- combine by material type ----
    is_metal = mat_type == MAT_METAL
    is_diel = mat_type == MAT_DIELECTRIC
    is_spec = is_metal | is_diel

    new_dir = V3.where(
        is_spec, V3.where(is_metal, metal_dir, diel_dir), diff_dir
    )
    one = V3.full(shape, 1.0, 1.0, 1.0, real)
    mult = V3.where(is_metal, rgb, V3.where(is_diel, one, diffuse_mult))

    survives = hitmask & ~is_emissive & ~(is_metal & ~metal_ok)
    new_throughput = V3.where(survives, throughput * mult, throughput)
    if cfg["terminate_zero"]:
        nonzero = (
            (new_throughput.x != 0.0)
            | (new_throughput.y != 0.0)
            | (new_throughput.z != 0.0)
        )
        survives = survives & nonzero
    if cfg["rr_start"]:
        # Russian roulette (mirrors render/integrator.py:bounce): p from
        # the INCOMING throughput, kill the continuation with prob 1 - p
        # from bounce rr_start on, survivors carry the 1/p weight.
        p_rr = jnp.clip(
            jnp.maximum(
                throughput.x, jnp.maximum(throughput.y, throughput.z)
            ),
            RR_P_MIN, 1.0,
        )
        apply_rr = alive & (depth >= cfg["rr_start"])
        survives = survives & jnp.logical_not(apply_rr & (u_rr >= p_rr))
        new_throughput = new_throughput * jnp.where(
            apply_rr, 1.0 / p_rr, 1.0
        )

    new_origin = V3.where(hitmask, point, origin)
    new_direction = V3.where(hitmask, new_dir, direction)

    # ---- image-texture info for the XLA fix-up pass ----
    if defer_img:
        # image id where this bounce applied a neutral albedo, else -1
        # (img_id = the parity-resolved effective image, computed above;
        # io == -1 lanes never read uo/vo)
        apply_img = hitmask & is_img & ~is_spec & ~is_emissive
        io = jnp.where(apply_img, img_id, -1)
        uo, vo = _lazy_uv(io >= 0)
    else:
        uo = jnp.zeros(shape, real)
        vo = jnp.zeros(shape, real)
        io = jnp.full(shape, -1, jnp.int32)

    return new_origin, new_direction, new_throughput, radiance, survives, (
        uo, vo, io
    )


def _fused_render_kernel(seed_ref, *refs, cfg):
    """Whole-render megakernel: each ray tile drains its ENTIRE
    (pixel, sample-range) work list in one in-kernel ``while_loop`` over
    bounces — path state lives in registers/VMEM for the whole render, the
    scene tables are fetched once per tile, and no tile ever waits on
    another (the TPU analog of the reference's per-thread pixel-block queue,
    src/render.zig:55-73, and the production form of the regenerating
    wavefront).  Inputs per tile: pixel coords + per-lane sample window;
    outputs: radiance sums (+ work counts when profiling costs)."""
    regen = cfg["regen"]
    n_refs = len(refs) - (1 if _queue_cap(cfg) else 0)
    it = iter(range(n_refs))
    nxt = lambda: refs[next(it)]
    px_ref, py_ref, s0_ref, limit_ref = (nxt() for _ in range(4))
    lut_ref = nxt()
    mat_ref = nxt()
    trace = _unpack_trace_refs(cfg, nxt)
    if _queue_cap(cfg):
        trace["q_queue"] = refs[-1]
    rax_ref, ray_ref, raz_ref = (nxt() for _ in range(3))
    nwork_ref = nxt() if regen["work"] else None

    shape = (_pt.rows(), LANE)
    seed = seed_ref[0, 0]
    pxv = px_ref[0]
    pyv = py_ref[0]
    limit = limit_ref[0]
    stride = regen["stride"]

    init = (
        jnp.zeros(shape, real), jnp.zeros(shape, real),   # origin xy
        jnp.zeros(shape, real),                           # origin z
        jnp.zeros(shape, real), jnp.zeros(shape, real),   # dir xy
        jnp.ones(shape, real),                            # dir z
        jnp.zeros(shape, real),                           # time
        jnp.zeros(shape, jnp.uint32),                     # ray id
        jnp.ones(shape, real), jnp.ones(shape, real),     # throughput
        jnp.ones(shape, real),
        jnp.zeros(shape, real), jnp.zeros(shape, real),   # radiance
        jnp.zeros(shape, real),
        jnp.zeros(shape, jnp.int32),                      # alive (i32 mask)
        s0_ref[0] - stride,                               # sample (pre-first)
        jnp.zeros(shape, jnp.int32),                      # bounce
        jnp.zeros(shape, jnp.int32),                      # work
    )

    def cond(c):
        alive_i, sample = c[14], c[15]
        return jnp.any((alive_i > 0) | (sample + stride < limit))

    def body(c):
        (ox, oy, oz, dx, dy, dz, tm, rid, thx, thy, thz,
         rax, ray_, raz, alive_i, sample, bounce_ct, work) = c
        origin = V3(ox, oy, oz)
        direction = V3(dx, dy, dz)
        throughput = V3(thx, thy, thz)
        radiance = V3(rax, ray_, raz)
        alive = alive_i > 0

        (origin, direction, tm, rid, throughput, sample, bounce_ct,
         alive, _respawned) = _respawn_values(
            cfg, seed, pxv, pyv, limit,
            origin, direction, tm, rid, throughput, sample, bounce_ct,
            alive,
        )
        work = work + alive.astype(jnp.int32)

        (new_origin, new_direction, new_throughput, radiance, survives,
         _uvio) = _bounce_core(
            cfg, trace, lut_ref, mat_ref, seed, bounce_ct,
            origin, direction, tm, rid, throughput, radiance, alive,
        )
        bounce_next = bounce_ct + 1
        survives = survives & (bounce_next < regen["max_depth"])
        return (
            new_origin.x, new_origin.y, new_origin.z,
            new_direction.x, new_direction.y, new_direction.z,
            tm, rid,
            new_throughput.x, new_throughput.y, new_throughput.z,
            radiance.x, radiance.y, radiance.z,
            survives.astype(jnp.int32), sample, bounce_next, work,
        )

    final = jax.lax.while_loop(cond, body, init)
    rax_ref[0] = final[11]
    ray_ref[0] = final[12]
    raz_ref[0] = final[13]
    if regen["work"]:
        nwork_ref[0] = final[17]


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def supports_bounce_kernel(scene: CompiledScene) -> bool:
    """The kernel handles every reference feature except image-textured
    EMISSIVE materials (atlas emission needs in-kernel atlas access — the
    texture LUT provides exactly that, so the gate lifts when tex_lut_dims
    is set) and checker-in-checker nesting (un-flattenable into one shade
    record); the rest use the XLA integrator (no reference scene has
    either)."""
    return (
        not scene.has_emissive_image or bool(scene.tex_lut_dims)
    ) and not scene.has_nested_checker


def supports_fused_render(scene: CompiledScene) -> bool:
    """The whole-render megakernel needs everything in-kernel; image
    textures are applied by an XLA atlas pass BETWEEN bounce kernels, so
    image scenes use the per-bounce kernel instead."""
    return (
        not scene.has_image_textures or bool(scene.tex_lut_dims)
    ) and (not scene.has_emissive_image or bool(scene.tex_lut_dims))


def _freeze(d):
    return tuple(sorted(d.items()))


def _smem_spec(shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM
    )


def _tile_spec():
    return pl.BlockSpec(
        (1, _pt.rows(), LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )


def _const_spec(shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def _scene_trace_inputs(scene: CompiledScene, cfg, ins, in_specs):
    """Append the per-kind trace tables (brute or group-tree) to the kernel
    inputs and record the strategy in cfg."""

    def grouped(attrs):
        """tuple of flat (G8,) arrays -> (n_attr, G, 8, 1) stacked tiles
        (f32 attrs) + (G, 8, 1) identity (i32, last tuple entry)."""
        f32s = jnp.stack(
            [a.reshape(-1, 8, 1) for a in attrs[:-1]]
        )
        oi = attrs[-1].reshape(-1, 8, 1)
        return f32s, oi

    def brute_tab(flat_attrs):
        """tuple of (S,) table columns -> (n_attr, G, 8, 1), zero-padded."""
        s = flat_attrs[0].shape[0]
        gpad = -(-s // 8) * 8
        cols = []
        for a in flat_attrs:
            if gpad != s:
                a = jnp.concatenate([a, jnp.zeros((gpad - s,), a.dtype)])
            cols.append(a.reshape(-1, 8, 1))
        return jnp.stack(cols)

    if scene.has_uni_tree:
        cfg["uni_mode"] = True
        cfg["sph_mode"] = cfg["quad_mode"] = TR_NONE
        s_tab, s_oi = grouped(scene.uni_sph_attrs)
        q_tab, q_oi = grouped(scene.uni_quad_attrs)
        ins += [
            scene.uni_tree_box, scene.uni_tree_link,
            s_tab, s_oi, q_tab, q_oi,
        ]
        in_specs += [
            _smem_spec(scene.uni_tree_box.shape),
            _smem_spec(scene.uni_tree_link.shape),
            _const_spec(s_tab.shape), _const_spec(s_oi.shape),
            _const_spec(q_tab.shape), _const_spec(q_oi.shape),
        ]
        if cfg["tex_lut"]:
            ins.append(scene.tex_lut_tab)
            in_specs.append(_const_spec(scene.tex_lut_tab.shape))
        return
    cfg["uni_mode"] = False

    if scene.has_sph_tree:
        cfg["sph_mode"] = TR_TREE
        tab, oi = grouped(scene.sph_tree_attrs)
        ins += [scene.sph_tree_box, scene.sph_tree_link, tab, oi]
        in_specs += [
            _smem_spec(scene.sph_tree_box.shape),
            _smem_spec(scene.sph_tree_link.shape),
            _const_spec(tab.shape), _const_spec(oi.shape),
        ]
    elif scene.n_spheres > 0:
        cfg["sph_mode"] = TR_BRUTE
        tab = brute_tab((
            scene.sph_center.x, scene.sph_center.y, scene.sph_center.z,
            scene.sph_radius * scene.sph_radius,
            scene.sph_move.x, scene.sph_move.y, scene.sph_move.z,
        ))
        ins.append(tab)
        in_specs.append(_const_spec(tab.shape))
    else:
        cfg["sph_mode"] = TR_NONE

    if scene.has_quad_tree:
        cfg["quad_mode"] = TR_TREE
        tab, oi = grouped(scene.quad_tree_attrs)
        ins += [scene.quad_tree_box, scene.quad_tree_link, tab, oi]
        in_specs += [
            _smem_spec(scene.quad_tree_box.shape),
            _smem_spec(scene.quad_tree_link.shape),
            _const_spec(tab.shape), _const_spec(oi.shape),
        ]
    elif scene.n_quads > 0:
        cfg["quad_mode"] = TR_BRUTE
        qu, qv, qw = scene.quad_u, scene.quad_v, scene.quad_w
        tab = brute_tab((
            scene.quad_start.x, scene.quad_start.y, scene.quad_start.z,
            scene.quad_normal.x, scene.quad_normal.y, scene.quad_normal.z,
            # A = v x w, B = w x u (see pallas_trace._quad_group_hits)
            qv.y * qw.z - qv.z * qw.y,
            qv.z * qw.x - qv.x * qw.z,
            qv.x * qw.y - qv.y * qw.x,
            qw.y * qu.z - qw.z * qu.y,
            qw.z * qu.x - qw.x * qu.z,
            qw.x * qu.y - qw.y * qu.x,
            scene.quad_offset,
        ))
        ins.append(tab)
        in_specs.append(_const_spec(tab.shape))
    else:
        cfg["quad_mode"] = TR_NONE

    if cfg["tex_lut"]:
        ins.append(scene.tex_lut_tab)
        in_specs.append(_const_spec(scene.tex_lut_tab.shape))


def _base_cfg(
    scene: CompiledScene, t_min, terminate_zero, rr_start=0, clamp=0.0,
):
    return {
        "t_min": float(t_min),
        "has_moving": scene.has_moving,
        "has_images": scene.has_image_textures,
        # static atlas geometry: lets the kernel PACK an atlas event into
        # one i32 flat texel index (textures.atlas_flat_index) instead of
        # exporting the (u, v, img) triple per chain slot (round 4)
        "image_dims": tuple(scene.image_dims),
        "atlas_hw": (
            int(scene.atlas_packed.shape[1]), int(scene.atlas_packed.shape[2])
        ),
        "terminate_zero": terminate_zero,
        # Russian roulette from this bounce index (0 = off).  Gated off on
        # image scenes: the kernel's live throughput excludes deferred
        # atlas factors there, so adaptive p would diverge from the XLA
        # twin (render/integrator.py:trace_paths docstring).
        "rr_start": int(rr_start) if (
            not scene.has_image_textures or scene.tex_lut_dims
        ) else 0,
        # Indirect luminance clamp (0 = off); same image-scene gate — the
        # kernel's radiance deltas exclude deferred atlas factors, so a
        # pre-factor clamp would diverge from the XLA twin.
        "clamp": float(clamp) if (
            not scene.has_image_textures or scene.tex_lut_dims
        ) else 0.0,
        "n_sph": scene.n_spheres,
        "n_quad": scene.n_quads,
        "lut_rows": scene.shade_lut.shape[1],
        "mat_rows": scene.mat_lut.shape[1],
        "light_params": scene.light_params,
        "background": scene.background_rgb,
        "sph_leaf_span": scene.sph_leaf_span,
        "quad_leaf_span": scene.quad_leaf_span,
        "uni_leaf_span": scene.uni_leaf_span,
        "uni_nodes": scene.uni_tree_box.shape[0],
        "sph_nodes": scene.sph_tree_box.shape[0],
        "quad_nodes": scene.quad_tree_box.shape[0],
        "needs_gauss": scene.needs_gauss,
        # In-kernel texture LUT (empty = off): static (w, h, base) per
        # image + the (R, 128) table's row count.  When set, image colors
        # resolve inside the kernel and NOTHING defers (no atlas events,
        # no chain, whole-render fused path).
        "tex_lut": tuple(scene.tex_lut_dims or ()),
        "tex_lut_rows": (
            int(scene.tex_lut_tab.shape[0]) if scene.tex_lut_dims else 0
        ),
        # Traversal strategy for tree passes: "cond" (default lax.cond leaf
        # visits), "queue" (branchless SMEM leaf queue), "rowqueue" (queue of
        # (leaf, row) pairs — divergence granularity 128).  Experimental
        # sweeps only (set in a FRESH process: the flag is read at trace
        # time and is not part of the jit cache key); see _tree_pass_queue.
        "trav": os.environ.get("ZWRT_TRAV", "cond"),
        "regen": None,
    }


def _queue_cap(cfg) -> int:
    """SMEM leaf-queue capacity (0 = no queue scratch needed).  Leaves are
    at most (nodes+1)/2 in any skip-link tree; rowqueue multiplies by
    ROWS.  The uni-tree path keeps the default traversal, so only the
    per-kind node counts bound the queue."""
    if cfg["trav"] in ("cond", "spec") or cfg["uni_mode"]:
        return 0
    n = 0
    if cfg["sph_mode"] == TR_TREE:
        n = max(n, (cfg["sph_nodes"] + 1) // 2 + 1)
    if cfg["quad_mode"] == TR_TREE:
        n = max(n, (cfg["quad_nodes"] + 1) // 2 + 1)
    if n == 0:
        return 0
    return n * (_pt.rows() if cfg["trav"] == "rowqueue" else 1)


def _call_kernel(scene, cfg, ins, in_specs, g, n_outs):
    out_shape = (
        [jax.ShapeDtypeStruct((g, _pt.rows(), LANE), real) for _ in range(12)]
        + [jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.int32)]
    )
    if cfg["regen"]:
        out_shape += [
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), real),        # time
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.int32),   # sample
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.int32),   # bounce
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.uint32),  # ray id
        ]
        if cfg["regen"]["work"]:
            out_shape += [jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.int32)]
    if cfg["regen"]:
        # packed interruption record (flat atlas texel index / sentinel)
        out_shape += [jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.int32)]
    else:
        out_shape += [
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), real),
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), real),
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.int32),
        ]
    if cfg["regen"] and cfg["regen"].get("atlas_slots"):
        k = cfg["regen"]["atlas_slots"]
        out_shape += [
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), real)
        ] * (3 * k)  # 3k radiance segments
        out_shape += [
            jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.int32)
        ] * k        # buft (packed event indices)
    assert len(out_shape) == n_outs
    qcap = _queue_cap(cfg)
    return pl.pallas_call(
        functools.partial(_bounce_kernel, cfg=cfg),
        grid_spec=pl.GridSpec(
            grid=(g,),
            in_specs=in_specs,
            out_specs=[_tile_spec()] * n_outs,
            scratch_shapes=(
                [pltpu.SMEM((qcap,), jnp.int32)] if qcap else []
            ),
        ),
        out_shape=out_shape,
        # Big scenes (two trees + LUT + image-uv block) spill past the
        # default 16M scoped-vmem budget; v5e has headroom above it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(*ins)


@with_scene_rows
def bounce_pallas(
    scene: CompiledScene,
    origin: V3, direction: V3, time, ray_id,
    throughput: V3, radiance: V3, alive,
    seed, depth, t_min,
    terminate_zero: bool = True,
    rr_start: int = 0,
    clamp: float = 0.0,
):
    """Run the fused bounce (trace included) for a wavefront.  Returns
    (origin', direction', throughput', radiance', alive', (u, v, img))."""
    n = origin.shape[0]
    n_pad = -(-n // _pt.blk()) * _pt.blk()

    def pad(x, fill=0.0):
        if n_pad == n:
            return x
        return jnp.concatenate([x, jnp.full((n_pad - n,), fill, x.dtype)])

    g = n_pad // _pt.blk()

    def tile(x, fill=0.0):
        return pad(x, fill).reshape(g, _pt.rows(), LANE)

    ins = [
        jnp.asarray(seed, jnp.uint32).reshape(1, 1),
        jnp.asarray(depth, jnp.int32).reshape(1, 1),
        tile(origin.x), tile(origin.y), tile(origin.z),
        tile(direction.x), tile(direction.y), tile(direction.z, 1.0),
        tile(time), tile(ray_id),
        tile(throughput.x), tile(throughput.y), tile(throughput.z),
        tile(radiance.x), tile(radiance.y), tile(radiance.z),
        tile(alive.astype(jnp.int32)),
        scene.shade_lut,
        scene.mat_lut,
    ]
    in_specs = (
        [_smem_spec((1, 1)), _smem_spec((1, 1))]
        + [_tile_spec()] * 15
        + [_const_spec(scene.shade_lut.shape)]
        + [_const_spec(scene.mat_lut.shape)]
    )
    cfg = _base_cfg(scene, t_min, terminate_zero, rr_start, clamp)
    _scene_trace_inputs(scene, cfg, ins, in_specs)

    outs = _call_kernel(scene, cfg, ins, in_specs, g, 16)

    def untile(x):
        return x.reshape(n_pad)[:n]

    (nox, noy, noz, ndx, ndy, ndz, nthx, nthy, nthz,
     nrax, nray, nraz, nalive, uo, vo, io) = outs
    return (
        V3(untile(nox), untile(noy), untile(noz)),
        V3(untile(ndx), untile(ndy), untile(ndz)),
        V3(untile(nthx), untile(nthy), untile(nthz)),
        V3(untile(nrax), untile(nray), untile(nraz)),
        untile(nalive) > 0,
        (untile(uo), untile(vo), untile(io)),
    )


@with_scene_rows
def bounce_pallas_regen(
    scene: CompiledScene,
    origin: V3, direction: V3, time, ray_id,
    throughput: V3, radiance: V3, alive,
    px, py, sample, bounce, sample_limit,
    seed, t_min, *,
    camera_consts, sampler, width, height, spp, stride,
    max_depth, has_dof,
    terminate_zero: bool = True,
    work=None,
    rr_start: int = 0,
    clamp: float = 0.0,
):
    """One regenerating bounce: dead lanes respawn their pixel's next sample
    (camera ray generated in-kernel) before tracing.  All array args must
    already be BLK multiples (the regen driver keeps the whole wavefront
    padded).  ``sample_limit`` is PER-LANE (i32): the first sample index a
    lane will not render — the profile-guided balancer splits a pixel's
    samples across lanes via disjoint [first, limit) ranges.  Pass ``work``
    (per-lane i32) to additionally count the calls in which each lane traced
    (the balancer's cost signal).  Returns the full updated state tuple."""
    n = origin.shape[0]
    assert n % _pt.blk() == 0, "regen wavefronts are pre-padded"
    g = n // _pt.blk()
    want_work = work is not None

    def tile(x):
        return x.reshape(g, _pt.rows(), LANE)

    ins = [
        jnp.asarray(seed, jnp.uint32).reshape(1, 1),
        jnp.zeros((1, 1), jnp.int32),  # depth scalar unused in regen mode
        tile(origin.x), tile(origin.y), tile(origin.z),
        tile(direction.x), tile(direction.y), tile(direction.z),
        tile(time), tile(ray_id),
        tile(throughput.x), tile(throughput.y), tile(throughput.z),
        tile(radiance.x), tile(radiance.y), tile(radiance.z),
        tile(alive.astype(jnp.int32)),
        tile(px), tile(py), tile(sample), tile(bounce), tile(sample_limit),
    ]
    if want_work:
        ins.append(tile(work))
    ins.append(scene.shade_lut)
    ins.append(scene.mat_lut)
    n_tiles = 20 + (1 if want_work else 0)
    in_specs = (
        [_smem_spec((1, 1)), _smem_spec((1, 1))]
        + [_tile_spec()] * n_tiles
        + [_const_spec(scene.shade_lut.shape)]
        + [_const_spec(scene.mat_lut.shape)]
    )
    cfg = _base_cfg(scene, t_min, terminate_zero, rr_start, clamp)
    cfg["regen"] = {
        "camera": camera_consts,
        "sampler": sampler,
        "width": width,
        "height": height,
        "spp": spp,
        "stride": stride,
        "max_depth": max_depth,
        "has_dof": has_dof,
        "work": want_work,
        # K pending-atlas-event slots per lane (0 disables buffering and
        # restores exit-on-first-event); tunable via ZWRT_ATLAS_SLOTS.
        # Only pays off when the per-iteration trace is expensive (tree
        # scenes): the chain threads ~6K extra (8,128) carries through the
        # bounce loop, which dominates on small-prim scenes (measured:
        # rtw_final 5.3 -> 6.6 Mpaths/s, but shrek_quads 34.5 -> 27.0 —
        # so brute-trace image scenes keep exit-on-first-event).
        # default 12 from a measured K sweep on rtw_final (6.9/6.9/7.1/7.1
        # Mpaths/s for K = 4/8/12/16)
        "atlas_slots": (
            int(os.environ.get("ZWRT_ATLAS_SLOTS", "12"))
            if scene.has_image_textures
            and (scene.has_sph_tree or scene.has_quad_tree)
            else 0
        ),
    }
    K = cfg["regen"]["atlas_slots"]
    _scene_trace_inputs(scene, cfg, ins, in_specs)

    outs = _call_kernel(
        scene, cfg, ins, in_specs, g,
        18 + (1 if want_work else 0) + 4 * K,
    )

    def u(x):
        return x.reshape(n)

    (nox, noy, noz, ndx, ndy, ndz, nthx, nthy, nthz,
     nrax, nray, nraz, nalive, ntime, nsample, nbounce, nrid) = outs[:17]
    nwork = u(outs[17]) if want_work else None
    base = 18 if want_work else 17
    to = outs[base]
    chain = None
    if K:
        rest = outs[base + 1:]
        segs = [
            V3(u(rest[3 * j]), u(rest[3 * j + 1]), u(rest[3 * j + 2]))
            for j in range(K)
        ]
        buft = [u(x) for x in rest[3 * K: 4 * K]]
        chain = (segs, buft)
    return (
        V3(u(nox), u(noy), u(noz)),
        V3(u(ndx), u(ndy), u(ndz)),
        V3(u(nthx), u(nthy), u(nthz)),
        V3(u(nrax), u(nray), u(nraz)),
        u(nalive) > 0,
        u(ntime), u(nsample), u(nbounce), u(nrid), nwork,
        u(to),
        chain,
    )


@with_scene_rows
def render_fused(
    scene: CompiledScene,
    px, py, s0, s1,
    seed, t_min, *,
    camera_consts, sampler, width, height, spp, stride,
    max_depth, has_dof,
    terminate_zero: bool = True,
    want_work: bool = False,
    rr_start: int = 0,
    clamp: float = 0.0,
):
    """Whole-render megakernel driver: ONE pallas_call renders every
    (pixel, sample) work item — each ray tile loops over bounces in-kernel
    until its per-lane sample windows [s0, s1) are exhausted.  Compared to
    the per-bounce kernel inside an XLA while_loop this removes (a) the
    global bounce synchronization (no tile ever waits for a straggler tile),
    (b) the per-bounce HBM round-trip of ~20 state arrays, and (c) the
    per-bounce re-fetch of the scene tables.  Array args must be BLK
    multiples.  Returns the per-lane radiance sums as V3 (+ per-lane traced
    call counts when ``want_work``)."""
    assert supports_fused_render(scene), "image scenes use the bounce kernel"
    n = px.shape[0]
    assert n % _pt.blk() == 0, "fused wavefronts are pre-padded"
    g = n // _pt.blk()

    def tile(x):
        return x.reshape(g, _pt.rows(), LANE)

    ins = [
        jnp.asarray(seed, jnp.uint32).reshape(1, 1),
        tile(px), tile(py), tile(s0), tile(s1),
        scene.shade_lut,
        scene.mat_lut,
    ]
    in_specs = (
        [_smem_spec((1, 1))]
        + [_tile_spec()] * 4
        + [_const_spec(scene.shade_lut.shape)]
        + [_const_spec(scene.mat_lut.shape)]
    )
    cfg = _base_cfg(scene, t_min, terminate_zero, rr_start, clamp)
    cfg["regen"] = {
        "camera": camera_consts,
        "sampler": sampler,
        "width": width,
        "height": height,
        "spp": spp,
        "stride": stride,
        "max_depth": max_depth,
        "has_dof": has_dof,
        "work": want_work,
    }
    _scene_trace_inputs(scene, cfg, ins, in_specs)

    n_outs = 3 + (1 if want_work else 0)
    out_shape = [jax.ShapeDtypeStruct((g, _pt.rows(), LANE), real)] * 3
    if want_work:
        out_shape.append(jax.ShapeDtypeStruct((g, _pt.rows(), LANE), jnp.int32))
    qcap = _queue_cap(cfg)
    outs = pl.pallas_call(
        functools.partial(_fused_render_kernel, cfg=cfg),
        grid_spec=pl.GridSpec(
            grid=(g,),
            in_specs=in_specs,
            out_specs=[_tile_spec()] * n_outs,
            scratch_shapes=(
                [pltpu.SMEM((qcap,), jnp.int32)] if qcap else []
            ),
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(*ins)

    def u(x):
        return x.reshape(n)

    radiance = V3(u(outs[0]), u(outs[1]), u(outs[2]))
    if want_work:
        return radiance, u(outs[3])
    return radiance
