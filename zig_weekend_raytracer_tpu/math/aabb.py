"""Axis-aligned bounding boxes, batched.

Host-side AABB construction happens in numpy inside the BVH builder
(``geometry/bvh.py``); this module holds the device-side slab test and the
numpy helpers shared with the builder.

Parity targets in the reference:
  * SIMD slab test with MaxMult ULP slack: src/math/aabb.zig:80-101
  * degenerate-axis padding:               src/math/aabb.zig:103-122
  * union / longest axis:                  src/math/aabb.zig:42-78
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..dtypes import AABB_MAX_MULT
from .v3 import V3


def aabb_hit(
    box_min: V3,
    box_max: V3,
    origin: V3,
    inv_dir: V3,
    t_min: jnp.ndarray,
    t_max: jnp.ndarray,
) -> jnp.ndarray:
    """Batched robust slab test over SoA vectors.

    ``inv_dir`` is the precomputed reciprocal ray direction.  Returns a bool
    array.  The 4-ULP MaxMult factor on tmax avoids false misses from f32
    rounding at AABB boundaries (reference: src/math/aabb.zig:94-98).
    """
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0.x, t1.x), jnp.minimum(t0.y, t1.y)),
        jnp.maximum(jnp.minimum(t0.z, t1.z), t_min),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t0.x, t1.x), jnp.maximum(t0.y, t1.y)),
        jnp.minimum(jnp.maximum(t0.z, t1.z), t_max),
    ) * AABB_MAX_MULT
    return tmax > tmin


# ---------------------------------------------------------------------------
# Host-side (numpy) helpers used by the scene compiler / BVH builder.
# ---------------------------------------------------------------------------

_PAD_DELTA = 1e-4  # degenerate-axis padding (reference: src/math/aabb.zig:104)


def aabb_pad_to_minimum(bmin: np.ndarray, bmax: np.ndarray):
    """Expand any axis thinner than delta so boxes never collapse to zero
    volume (reference: src/math/aabb.zig:103-122)."""
    bmin = np.array(bmin, dtype=np.float64, copy=True)
    bmax = np.array(bmax, dtype=np.float64, copy=True)
    thin = (bmax - bmin) < _PAD_DELTA
    bmin[thin] -= _PAD_DELTA / 2
    bmax[thin] += _PAD_DELTA / 2
    return bmin, bmax


def aabb_union(a_min, a_max, b_min, b_max):
    return np.minimum(a_min, b_min), np.maximum(a_max, b_max)


def aabb_longest_axis(bmin: np.ndarray, bmax: np.ndarray) -> int:
    """Index of the longest box axis (reference: src/math/aabb.zig:70-78)."""
    return int(np.argmax(bmax - bmin))
