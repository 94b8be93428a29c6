"""Density-estimation smoothing kernels (reference: ``Math/Kernel.h:40-110``).

k(t, r) gives the kernel weight for a point at distance t from the query center
with support radius r, normalized so the kernel integrates to 1 over the
`dim`-dimensional ball of radius r.
"""
from __future__ import annotations

import jax.numpy as jnp

UNIFORM, PERLIN = 0, 1

# Volume of the unit ball per dimension
_BALL_VOL = {1: 2.0, 2: float(jnp.pi), 3: 4.0 * float(jnp.pi) / 3.0}
# Integral of the Perlin smootherstep profile w(t)=1-(6t^5-15t^4+10t^3) over the
# unit ball: dim1 = 2*1/2, dim2 = 2*pi*1/7, dim3 = 4*pi*5/84
_PERLIN_NORM = {1: 1.0, 2: 2.0 * float(jnp.pi) / 7.0, 3: 5.0 * float(jnp.pi) / 21.0}


def _perlin_profile(t):
    t = jnp.clip(t, 0.0, 1.0)
    return 1.0 - (t * t * t * (t * (t * 6.0 - 15.0) + 10.0))


def k(kernel_type, t, r, dim: int = 3):
    """Kernel weight for distance t, radius r, normalized in `dim` dimensions."""
    x = jnp.clip(t / jnp.maximum(r, 1e-12), 0.0, 1.0)
    rd = jnp.maximum(r, 1e-12) ** dim
    w_uniform = jnp.where(x <= 1.0, 1.0, 0.0) / (_BALL_VOL[dim] * rd)
    w_perlin = _perlin_profile(x) / (_PERLIN_NORM[dim] * rd)
    return jnp.where(kernel_type == PERLIN, w_perlin, w_uniform)


def uniform_k(t, r, dim: int = 3):
    return k(UNIFORM, t, r, dim)


def perlin_k(t, r, dim: int = 3):
    return k(PERLIN, t, r, dim)
