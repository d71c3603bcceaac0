"""Batched math core: vector ops, orthonormal bases, intervals, AABBs.

The reference's math core is scalar/SIMD per-ray (reference: src/math/math.zig);
here every function operates on arrays with a trailing ``(..., 3)`` axis so the
whole ray wavefront is processed in one XLA op.
"""

from . import v3
from .v3 import V3
from .interval import INTERVAL_01, Interval
from .aabb import aabb_hit, aabb_union, aabb_pad_to_minimum, aabb_longest_axis
