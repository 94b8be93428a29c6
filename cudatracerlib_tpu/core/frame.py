"""Shading frames (reference: ``Math/Frame.h``).

A Frame is a batched orthonormal basis stored as three ``(..., 3)`` arrays.
All BSDF math happens in the local frame where the normal is +z, following the
Mitsuba conventions the reference uses.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import vecmath as vm

Array = jax.Array


class Frame(NamedTuple):
    t: Array  # tangent    (..., 3)
    s: Array  # bitangent  (..., 3)
    n: Array  # normal     (..., 3)

    @staticmethod
    def from_normal(n: Array) -> "Frame":
        t, s = vm.coordinate_system(n)
        return Frame(t, s, n)

    @staticmethod
    def from_tn(t: Array, n: Array) -> "Frame":
        """Gram-Schmidt a tangent against the normal (dpdu-based shading frames)."""
        t = vm.normalize(t - n * vm.dot(t, n)[..., None])
        s = vm.cross(n, t)
        return Frame(t, s, n)

    def to_local(self, v: Array) -> Array:
        return jnp.stack([vm.dot(v, self.t), vm.dot(v, self.s), vm.dot(v, self.n)], axis=-1)

    def to_world(self, v: Array) -> Array:
        return (self.t * v[..., 0:1] + self.s * v[..., 1:2] + self.n * v[..., 2:3])


# Local-frame trig helpers (Frame::cosTheta etc.)

def cos_theta(v: Array) -> Array:
    return v[..., 2]


def abs_cos_theta(v: Array) -> Array:
    return jnp.abs(v[..., 2])


def cos_theta2(v: Array) -> Array:
    return v[..., 2] * v[..., 2]


def sin_theta2(v: Array) -> Array:
    return jnp.maximum(0.0, 1.0 - cos_theta2(v))


def sin_theta(v: Array) -> Array:
    return jnp.sqrt(sin_theta2(v))


def tan_theta(v: Array) -> Array:
    return sin_theta(v) / jnp.where(jnp.abs(v[..., 2]) < 1e-12, 1e-12, v[..., 2])


def tan_theta2(v: Array) -> Array:
    c2 = cos_theta2(v)
    return jnp.maximum(0.0, 1.0 - c2) / jnp.maximum(c2, 1e-20)


def sin_phi(v: Array) -> Array:
    st = sin_theta(v)
    return jnp.where(st < 1e-12, 0.0, jnp.clip(v[..., 1] / jnp.maximum(st, 1e-12), -1.0, 1.0))


def cos_phi(v: Array) -> Array:
    st = sin_theta(v)
    return jnp.where(st < 1e-12, 1.0, jnp.clip(v[..., 0] / jnp.maximum(st, 1e-12), -1.0, 1.0))


def same_hemisphere(a: Array, b: Array) -> Array:
    return a[..., 2] * b[..., 2] > 0.0
