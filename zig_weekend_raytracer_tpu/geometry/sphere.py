"""Batched ray/sphere intersection, UVs, and light-sampling PDFs (SoA form).

Parity targets in the reference (src/entity.zig:533-680):
  * quadratic two-root selection  :585-623
  * animated (lerped) centers     :653-656
  * spherical UVs                 :659-666
  * solid-angle PDF / cone sample :626-679

All vectors are ``math.v3.V3`` (separate x/y/z lanes — see v3.py for why).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..dtypes import INF
from ..math import v3
from ..math.v3 import V3
from ..sampling import hashrng


def hit_t(center: V3, radius, origin: V3, direction: V3, t_min, t_max):
    """Returns (t, valid); t is +inf where invalid.  Strict interval test
    (``surrounds``), matching src/entity.zig:596-613."""
    oc = center - origin
    a = v3.dot(direction, direction)
    h = v3.dot(direction, oc)
    c = v3.dot(oc, oc) - radius * radius
    disc = h * h - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / a
    root1 = (h - sq) * inv_a
    root2 = (h + sq) * inv_a
    in1 = (root1 > t_min) & (root1 < t_max)
    in2 = (root2 > t_min) & (root2 < t_max)
    root = jnp.where(in1, root1, root2)
    valid = (disc >= 0.0) & (in1 | in2)
    return jnp.where(valid, root, INF), valid


def uv(normal_obj: V3):
    """Spherical UVs from the object-space outward normal
    (src/entity.zig:659-666)."""
    theta = jnp.arccos(jnp.clip(-normal_obj.y, -1.0, 1.0))
    phi = jnp.arctan2(-normal_obj.z, normal_obj.x) + np.pi
    return phi * (0.5 / np.pi), theta * (1.0 / np.pi)


def pdf_value(center: V3, radius, origin: V3, direction: V3, hit_valid):
    """1 / cone solid angle, 0 on miss (src/entity.zig:626-644)."""
    diff = center - origin
    dist_sq = v3.dot(diff, diff)
    cos_theta_max = jnp.sqrt(jnp.maximum(1.0 - radius * radius / dist_sq, 0.0))
    solid_angle = 2.0 * np.pi * (1.0 - cos_theta_max)
    return jnp.where(hit_valid, 1.0 / jnp.maximum(solid_angle, 1e-20), 0.0)


def sample_direction(center: V3, radius, origin: V3, u1, u2) -> V3:
    """Uniform direction in the sphere's visible cone
    (src/entity.zig:646-679)."""
    direction = center - origin
    dist_sq = v3.dot(direction, direction)
    cos_theta_max = jnp.sqrt(jnp.maximum(1.0 - radius * radius / dist_sq, 0.0))
    local = hashrng.cone_direction_z(u1, u2, cos_theta_max)
    basis = v3.ortho_basis(direction)
    return v3.onb_transform(basis, local)
