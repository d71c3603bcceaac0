"""Geometry kernels: batched primitive intersection and BVH build/flatten.

The reference dispatches ``hit()`` through a tagged union per entity
(src/entity.zig:35-39); here each primitive family is one vectorized kernel
over its SoA table, and the closest-hit reduction happens in ``ops.trace``.
"""

from . import sphere
from . import quad
from . import bvh
