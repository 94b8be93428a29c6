"""Axis-aligned bounding boxes (reference: ``Math/AABB.h``)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class AABB(NamedTuple):
    lo: Array  # (..., 3)
    hi: Array  # (..., 3)

    @staticmethod
    def empty(shape=()) -> "AABB":
        return AABB(jnp.full(shape + (3,), jnp.inf, jnp.float32),
                    jnp.full(shape + (3,), -jnp.inf, jnp.float32))

    def union(self, other: "AABB") -> "AABB":
        return AABB(jnp.minimum(self.lo, other.lo), jnp.maximum(self.hi, other.hi))

    def extend(self, p: Array) -> "AABB":
        return AABB(jnp.minimum(self.lo, p), jnp.maximum(self.hi, p))

    def center(self) -> Array:
        return 0.5 * (self.lo + self.hi)

    def extents(self) -> Array:
        return self.hi - self.lo

    def surface_area(self) -> Array:
        d = jnp.maximum(self.hi - self.lo, 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])

    def contains(self, p: Array) -> Array:
        return jnp.all((p >= self.lo) & (p <= self.hi), axis=-1)

    def radius(self) -> Array:
        return 0.5 * jnp.sqrt(jnp.sum(self.extents() ** 2, axis=-1))


def ray_aabb(lo: Array, hi: Array, o: Array, inv_d: Array, t_min, t_max):
    """Slab test. Returns (hit_mask, t_near). Shapes broadcast; inv_d = 1/d."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), t_max)
    return t_near <= t_far, t_near
