"""Numerical quadrature (reference: ``Math/Integrator.h`` — Gauss-Lobatto /
Gauss-Legendre, used for heterogeneous-volume optical depth)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

# 7-point Gauss-Lobatto nodes/weights on [-1, 1] (weights sum to 2)
_GL7_X = np.array([-1.0, -0.830223896278567, -0.468848793470714, 0.0,
                   0.468848793470714, 0.830223896278567, 1.0])
_GL7_W = np.array([2.0 / 42, 0.276826047361566, 0.431745381209863,
                   0.487619047619048, 0.431745381209863, 0.276826047361566,
                   2.0 / 42])


def gauss_legendre(n: int):
    """(nodes, weights) on [-1, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def integrate(f, a, b, n: int = 16) -> Array:
    """Fixed-order Gauss-Legendre integral of a batched integrand f(t)."""
    x, w = gauss_legendre(n)
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    half = 0.5 * (b - a)
    mid = 0.5 * (a + b)
    total = 0.0
    for i in range(n):
        total = total + w[i] * f(mid + half * x[i])
    return total * half


def integrate_lobatto7(f, a, b) -> Array:
    """7-point Gauss-Lobatto (includes the endpoints, like the reference's
    adaptive Lobatto base rule)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    half = 0.5 * (b - a)
    mid = 0.5 * (a + b)
    total = 0.0
    for xi, wi in zip(_GL7_X, _GL7_W):
        total = total + wi * f(mid + half * xi)
    return total * half
