"""Batched 3-vector operations over ``(..., 3)`` arrays.

Parity targets (formulas, not code) in the reference:
  * dot/cross/length/normalize/reflect/refract: src/math/math.zig:214-279
  * OrthoBasis (ONB from a normal):             src/math/math.zig:58-96
  * gamma-2 color space helpers:                src/math/math.zig:172-179
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..dtypes import real


def dot(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis; keeps no trailing axis."""
    return jnp.sum(u * v, axis=-1)


def cross(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(u, v)


def length_squared(u: jnp.ndarray) -> jnp.ndarray:
    return dot(u, u)


def length(u: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(u))


def normalize(u: jnp.ndarray) -> jnp.ndarray:
    # rsqrt keeps this a single fused VPU op; equals u / |u|.
    return u * jax.lax.rsqrt(length_squared(u))[..., None]


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """v - 2 (v.n) n  (reference: src/math/math.zig:270-272)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(vn: jnp.ndarray, n: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of a *unit* incoming direction ``vn``
    (reference: src/math/math.zig:274-279)."""
    cos_theta = jnp.minimum(dot(-vn, n), 1.0)
    index = jnp.asarray(index, dtype=real)
    if index.ndim > 0:
        index = index[..., None]  # broadcast per-ray index over xyz
    r_out_perp = index * (vn + cos_theta[..., None] * n)
    r_out_parallel = (
        -jnp.sqrt(jnp.abs(1.0 - length_squared(r_out_perp)))[..., None] * n
    )
    return r_out_perp + r_out_parallel


def lerp(x: jnp.ndarray, y: jnp.ndarray, alpha) -> jnp.ndarray:
    return x + alpha * (y - x)


def near_zero(v: jnp.ndarray, tol: float = 1e-8) -> jnp.ndarray:
    return jnp.all(jnp.abs(v) < tol, axis=-1)


def linearize_color_space(color: jnp.ndarray) -> jnp.ndarray:
    """Gamma-2 byte color -> linear (reference: src/math/math.zig:172-174)."""
    return color * color


def gamma_correction(color: jnp.ndarray) -> jnp.ndarray:
    """Linear -> gamma-2 for display (reference: src/math/math.zig:177-179)."""
    return jnp.sqrt(color)


class OrthoBasis(NamedTuple):
    """Batched orthonormal basis: u, v, w each ``(..., 3)``."""

    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray


def ortho_basis(n: jnp.ndarray) -> OrthoBasis:
    """ONB whose w-axis is ``normalize(n)``
    (reference: src/math/math.zig:65-73).

    Picks the helper axis (1,0,0) when |w_y| > 0.9 else (0,1,0), exactly like
    the reference, so generated sample directions agree in distribution.
    """
    w = normalize(n)
    cond = (jnp.abs(w[..., 1]) > 0.9)[..., None]
    a = jnp.where(
        cond,
        jnp.asarray([1.0, 0.0, 0.0], dtype=real),
        jnp.asarray([0.0, 1.0, 0.0], dtype=real),
    )
    u = normalize(cross(w, a))
    v = cross(w, u)
    return OrthoBasis(u=u, v=v, w=w)


def onb_transform(basis: OrthoBasis, v: jnp.ndarray) -> jnp.ndarray:
    """Local coords -> world: u*v_x + v*v_y + w*v_z
    (reference: src/math/math.zig:89-95)."""
    return (
        basis.u * v[..., 0:1] + basis.v * v[..., 1:2] + basis.w * v[..., 2:3]
    )
