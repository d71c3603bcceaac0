"""Light-list importance sampling: the batched equivalent of the reference's
PDF framework (src/pdf.zig), SoA form.

  * ``light_pdf_value``      — EntityPdf.value over an entity collection:
    the evenly weighted sum of per-light surface PDFs
    (src/pdf.zig:83-85 -> src/entity.zig:371-378), each of which re-traces
    the ray against that light's geometry (src/entity.zig:503-518, 626-644).
  * ``sample_light_direction`` — EntityPdf.generate: pick a uniformly random
    light, sample a direction toward its surface
    (src/entity.zig:381-386, 520-525, 646-679).

The light list is tiny (<= a handful of entities), so the per-slot loop is
unrolled statically; every slot evaluates both primitive kinds masked.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dtypes import T_MIN_PDF
from ..geometry import quad as quad_g
from ..geometry import sphere as sphere_g
from ..math.v3 import V3
from ..scene import PRIM_SPHERE, CompiledScene


def light_pdf_value(scene: CompiledScene, origin: V3, direction: V3) -> jnp.ndarray:
    """(N,) mixture-member PDF of the scene's light list.

    NOTE: sphere lights are assumed stationary, matching the reference's
    assert (src/entity.zig:627).
    """
    n_l = scene.n_lights
    total = jnp.zeros(origin.shape, dtype=origin.x.dtype)
    for l in range(n_l):
        kind = scene.light_kind[l]
        idx = scene.light_idx[l]

        center = scene.sph_center[idx]
        radius = scene.sph_radius[idx]
        _, sph_valid = sphere_g.hit_t(
            center, radius, origin, direction, T_MIN_PDF, jnp.inf
        )
        p_sph = sphere_g.pdf_value(center, radius, origin, direction, sph_valid)

        p_quad = quad_g.pdf_value(
            scene.quad_start[idx], scene.quad_normal[idx], scene.quad_w[idx],
            scene.quad_u[idx], scene.quad_v[idx], scene.quad_offset[idx],
            scene.quad_area[idx], origin, direction, T_MIN_PDF,
        )
        total = total + jnp.where(kind == PRIM_SPHERE, p_sph, p_quad)
    return total / n_l


def sample_light_direction(
    scene: CompiledScene, origin: V3, u_choice, u1, u2
) -> V3:
    """Direction toward a uniformly chosen light."""
    n_l = scene.n_lights
    chosen = jnp.minimum((u_choice * n_l).astype(jnp.int32), n_l - 1)
    out = V3.zeros(origin.shape)
    for l in range(n_l):
        kind = scene.light_kind[l]
        idx = scene.light_idx[l]
        d_sph = sphere_g.sample_direction(
            scene.sph_center[idx], scene.sph_radius[idx], origin, u1, u2
        )
        d_quad = quad_g.sample_direction(
            scene.quad_start[idx], scene.quad_u[idx], scene.quad_v[idx],
            origin, u1, u2,
        )
        d = V3.where(kind == PRIM_SPHERE, d_sph, d_quad)
        out = V3.where(chosen == l, d, out)
    return out
