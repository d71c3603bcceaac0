"""Closest-hit tracing over the compiled scene tables (SoA wavefront form).

Two interchangeable strategies (selected by ``CompiledScene.has_bvh``):

  * **Brute force**: every ray tests every primitive, blocked over the
    primitive axis so transients stay bounded.  This is the TPU-native
    replacement of ``EntityCollection.hit``'s linear scan
    (reference: src/entity.zig:342-368) — on a vector machine testing a few
    hundred primitives per ray in SoA form beats divergent tree walking.
  * **Stackless BVH traversal**: per-ray node pointers walk the preorder
    skip-link layout built in ``geometry.bvh`` inside one
    ``lax.while_loop``; the loop exits when every ray in the wavefront has
    terminated.  This replaces the recursive ``BVHNodeEntity.hit``
    (reference: src/entity.zig:286-303).

Both return a compact ``Hit`` (t, prim kind, prim index); shading attributes
(point, normal, uv, material) are reconstructed once for the single winning
primitive in ``hit_details`` — the wavefront analog of the reference's
HitRecord (src/hitrecord.zig:6-21).

Ray vectors are ``math.v3.V3`` (separate x/y/z lanes).  During the
brute-force inner loop rays are broadcast against primitive blocks as
(N, B) matrices whose minor dim is the primitive block — fully
lane-utilized on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..dtypes import INF, real
from ..geometry import quad as quad_g
from ..geometry import sphere as sphere_g
from ..math import v3
from ..math.aabb import aabb_hit
from ..math.v3 import V3
from ..scene import PRIM_QUAD, PRIM_SPHERE, CompiledScene

_NO_HIT = jnp.int32(-1)

# Primitive-axis block size for the brute-force scan: transient (N, B)
# buffers; 512 keeps them in check while filling the 8x128 VPU tiles.
PRIM_BLOCK = 512


class Hit(NamedTuple):
    t: jnp.ndarray       # (N,) f32, +inf on miss
    kind: jnp.ndarray    # (N,) i32, PRIM_SPHERE / PRIM_QUAD / -1 miss
    idx: jnp.ndarray     # (N,) i32 primitive index within its table


class HitDetails(NamedTuple):
    point: V3
    normal: V3           # front-face oriented
    front: jnp.ndarray   # (N,) bool
    u: jnp.ndarray       # (N,)
    v: jnp.ndarray       # (N,)
    mat: jnp.ndarray     # (N,) i32


def _sphere_center_at(scene: CompiledScene, idx, time) -> V3:
    """Animated sphere center lerp (reference: src/entity.zig:653-656)."""
    center = scene.sph_center[idx]
    if scene.has_moving:
        center = center + scene.sph_move[idx] * time
    return center


def closest_hit(
    scene: CompiledScene,
    origin: V3,
    direction: V3,
    time: jnp.ndarray,
    t_min,
    t_max,
) -> Hit:
    if scene.has_bvh:
        return _closest_hit_bvh(scene, origin, direction, time, t_min, t_max)
    return _closest_hit_brute(scene, origin, direction, time, t_min, t_max)


# ---------------------------------------------------------------------------
# Brute force
# ---------------------------------------------------------------------------

def _bcol(a: jnp.ndarray) -> jnp.ndarray:
    """Ray-axis column: (N,) -> (N, 1) for broadcasting against prim blocks."""
    return a[:, None]


def _vcol(a: V3) -> V3:
    return V3(a.x[:, None], a.y[:, None], a.z[:, None])


def _slice_v3(a: V3, start: int, size: int) -> V3:
    sl = lambda c: jax.lax.dynamic_slice_in_dim(c, start, size)
    return V3(sl(a.x), sl(a.y), sl(a.z))


def _closest_hit_brute(scene, origin, direction, time, t_min, t_max) -> Hit:
    n = origin.shape[0]
    best = Hit(
        t=jnp.full((n,), INF, real),
        kind=jnp.full((n,), _NO_HIT),
        idx=jnp.zeros((n,), jnp.int32),
    )
    org_c = _vcol(origin)
    dir_c = _vcol(direction)
    t_min_c = jnp.broadcast_to(jnp.asarray(t_min, real), (n,))[:, None]

    s_pad = scene.sph_radius.shape[0]
    q_pad = scene.quad_offset.shape[0]

    def sphere_block(best: Hit, start: int) -> Hit:
        size = min(PRIM_BLOCK, s_pad - start)
        center = _slice_v3(scene.sph_center, start, size)  # (size,)
        radius = jax.lax.dynamic_slice_in_dim(scene.sph_radius, start, size)
        if scene.has_moving:
            move = _slice_v3(scene.sph_move, start, size)
            center = V3(
                center.x[None] + time[:, None] * move.x[None],
                center.y[None] + time[:, None] * move.y[None],
                center.z[None] + time[:, None] * move.z[None],
            )
        else:
            center = V3(center.x[None], center.y[None], center.z[None])
        t, _ = sphere_g.hit_t(
            center, radius[None], org_c, dir_c, t_min_c, _bcol(best.t)
        )  # (N, size)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        closer = tj < best.t
        return Hit(
            t=jnp.where(closer, tj, best.t),
            kind=jnp.where(closer, PRIM_SPHERE, best.kind),
            idx=jnp.where(closer, start + j.astype(jnp.int32), best.idx),
        )

    def quad_block(best: Hit, start: int) -> Hit:
        size = min(PRIM_BLOCK, q_pad - start)
        t, _, _, _ = quad_g.hit_t(
            _row(_slice_v3(scene.quad_start, start, size)),
            _row(_slice_v3(scene.quad_normal, start, size)),
            _row(_slice_v3(scene.quad_w, start, size)),
            _row(_slice_v3(scene.quad_u, start, size)),
            _row(_slice_v3(scene.quad_v, start, size)),
            jax.lax.dynamic_slice_in_dim(scene.quad_offset, start, size)[None],
            org_c, dir_c, t_min_c, _bcol(best.t),
        )
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        closer = tj < best.t
        return Hit(
            t=jnp.where(closer, tj, best.t),
            kind=jnp.where(closer, PRIM_QUAD, best.kind),
            idx=jnp.where(closer, start + j.astype(jnp.int32), best.idx),
        )

    if scene.n_spheres > 0:
        for start in range(0, s_pad, PRIM_BLOCK):
            if start < scene.n_spheres:
                best = sphere_block(best, start)
    if scene.n_quads > 0:
        for start in range(0, q_pad, PRIM_BLOCK):
            if start < scene.n_quads:
                best = quad_block(best, start)
    return best


def _row(a: V3) -> V3:
    """Prim-axis row: V3 of (B,) -> V3 of (1, B)."""
    return V3(a.x[None], a.y[None], a.z[None])


# ---------------------------------------------------------------------------
# Stackless BVH traversal
# ---------------------------------------------------------------------------

class _TraverseState(NamedTuple):
    node: jnp.ndarray
    t: jnp.ndarray
    kind: jnp.ndarray
    idx: jnp.ndarray


def _closest_hit_bvh(scene, origin, direction, time, t_min, t_max) -> Hit:
    n = origin.shape[0]
    n_nodes = scene.bvh_miss.shape[0]
    inv_dir = V3(1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)
    t_min_arr = jnp.broadcast_to(jnp.asarray(t_min, real), (n,))

    init = _TraverseState(
        node=jnp.zeros((n,), jnp.int32),
        t=jnp.broadcast_to(jnp.asarray(t_max, real), (n,)).astype(real),
        kind=jnp.full((n,), _NO_HIT),
        idx=jnp.zeros((n,), jnp.int32),
    )

    def cond(st: _TraverseState):
        return jnp.any(st.node < n_nodes)

    def body(st: _TraverseState):
        nd = jnp.minimum(st.node, n_nodes - 1)
        active = st.node < n_nodes
        box_ok = active & aabb_hit(
            scene.bvh_min[nd], scene.bvh_max[nd],
            origin, inv_dir, t_min_arr, st.t,
        )
        count = scene.bvh_leaf_count[nd]
        is_leaf = count > 0

        t_best, kind_best, idx_best = st.t, st.kind, st.idx
        test_leaf = box_ok & is_leaf
        leaf_start = scene.bvh_leaf_start[nd]
        for j in range(scene.max_leaf_size):
            slot_ok = test_leaf & (j < count)
            pi = jnp.minimum(leaf_start + j, scene.bvh_prim_kind.shape[0] - 1)
            kind = scene.bvh_prim_kind[pi]
            idx = scene.bvh_prim_idx[pi]

            center = _sphere_center_at(scene, idx, time)
            ts, _ = sphere_g.hit_t(
                center, scene.sph_radius[idx], origin, direction,
                t_min_arr, t_best,
            )
            tq, _, _, _ = quad_g.hit_t(
                scene.quad_start[idx], scene.quad_normal[idx],
                scene.quad_w[idx], scene.quad_u[idx], scene.quad_v[idx],
                scene.quad_offset[idx], origin, direction,
                t_min_arr, t_best,
            )
            t_hit = jnp.where(kind == PRIM_SPHERE, ts, tq)
            closer = slot_ok & (t_hit < t_best)
            t_best = jnp.where(closer, t_hit, t_best)
            kind_best = jnp.where(closer, kind, kind_best)
            idx_best = jnp.where(closer, idx, idx_best)

        next_node = jnp.where(box_ok & ~is_leaf, nd + 1, scene.bvh_miss[nd])
        next_node = jnp.where(active, next_node, st.node)
        return _TraverseState(
            node=next_node, t=t_best, kind=kind_best, idx=idx_best
        )

    final = jax.lax.while_loop(cond, body, init)
    missed = final.kind == _NO_HIT
    return Hit(
        t=jnp.where(missed, INF, final.t), kind=final.kind, idx=final.idx
    )


# ---------------------------------------------------------------------------
# Hit attribute reconstruction
# ---------------------------------------------------------------------------

def hit_details(
    scene: CompiledScene,
    hit: Hit,
    origin: V3,
    direction: V3,
    time: jnp.ndarray,
) -> HitDetails:
    """Reconstruct shading attributes for the winning primitive only.

    Sphere path: src/entity.zig:615-622 (+ UV from the object-space normal —
    the baked-instancing equivalent of RotateY.hit's normal rotation,
    src/entity.zig:185-186).  Quad path: src/entity.zig:487-499.
    """
    idx = hit.idx
    safe_t = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
    point = origin + direction * safe_t

    # -- sphere attributes --
    center = _sphere_center_at(scene, idx, time)
    inv_r = 1.0 / jnp.maximum(scene.sph_radius[idx], 1e-20)
    n_sph = (point - center) * inv_r
    # object-space normal for UV (undo baked Y rotation)
    c_rot = scene.sph_uv_cos[idx]
    s_rot = scene.sph_uv_sin[idx]
    n_obj = V3(
        c_rot * n_sph.x - s_rot * n_sph.z,
        n_sph.y,
        s_rot * n_sph.x + c_rot * n_sph.z,
    )
    u_sph, v_sph = sphere_g.uv(n_obj)
    mat_sph = scene.sph_mat[idx]

    # -- quad attributes --
    n_quad = scene.quad_normal[idx]
    planar = point - scene.quad_start[idx]
    alpha = v3.dot(scene.quad_w[idx], v3.cross(planar, scene.quad_v[idx]))
    beta = v3.dot(scene.quad_w[idx], v3.cross(scene.quad_u[idx], planar))
    mat_quad = scene.quad_mat[idx]

    is_sphere = hit.kind == PRIM_SPHERE
    outward = V3.where(is_sphere, n_sph, n_quad)
    u = jnp.where(is_sphere, u_sph, alpha)
    v = jnp.where(is_sphere, v_sph, beta)
    mat = jnp.where(is_sphere, mat_sph, mat_quad)

    # front-face flip (reference: src/hitrecord.zig:16-21)
    front = v3.dot(direction, outward) < 0.0
    normal = V3.where(front, outward, -outward)
    return HitDetails(point=point, normal=normal, front=front, u=u, v=v, mat=mat)
