"""Batched interval arithmetic (reference: src/math/interval.zig).

The hot paths inline their own interval logic (strict ``surrounds`` in the
sphere kernel, inclusive ``contains`` in the quad kernel — matching the
reference's usage exactly); this module provides the general API for scene
construction and tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Interval(NamedTuple):
    min: jnp.ndarray
    max: jnp.ndarray

    def size(self):
        return self.max - self.min

    def union(self, other: "Interval") -> "Interval":
        return Interval(
            jnp.minimum(self.min, other.min), jnp.maximum(self.max, other.max)
        )

    def offset(self, displacement) -> "Interval":
        return Interval(self.min + displacement, self.max + displacement)

    def contains(self, x):
        """Inclusive membership (reference: contains)."""
        return (x >= self.min) & (x <= self.max)

    def surrounds(self, x):
        """Strict membership (reference: surrounds)."""
        return (x > self.min) & (x < self.max)

    def clamp(self, x):
        return jnp.clip(x, self.min, self.max)

    def expand(self, delta) -> "Interval":
        half = delta / 2
        return Interval(self.min - half, self.max + half)


INTERVAL_01 = Interval(jnp.float32(0.0), jnp.float32(1.0))
