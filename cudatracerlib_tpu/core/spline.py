"""Cubic / Catmull-Rom spline evaluation (reference: ``Math/Spline.h`` —
used by RoughTransmittance 2D interpolation and function models)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def catmull_rom_weights(t: Array):
    """Weights for p_{-1}, p_0, p_1, p_2 at parameter t in [0,1]."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return w0, w1, w2, w3


def eval_1d(values: Array, x: Array) -> Array:
    """Catmull-Rom interpolate a uniformly-sampled 1D table at x in [0,1]."""
    n = values.shape[0]
    fx = jnp.clip(x, 0.0, 1.0) * (n - 1)
    i = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, n - 2)
    t = fx - i
    g = lambda k: jnp.take(values, jnp.clip(i + k, 0, n - 1), axis=0)
    w0, w1, w2, w3 = catmull_rom_weights(t)
    return w0 * g(-1) + w1 * g(0) + w2 * g(1) + w3 * g(2)


def eval_2d(table: Array, x: Array, y: Array) -> Array:
    """Separable bicubic Catmull-Rom over a (H, W) table, x/y in [0,1]
    (the reference's RoughTransmittance::Evaluate interpolation)."""
    h, w = table.shape
    fy = jnp.clip(y, 0.0, 1.0) * (h - 1)
    j = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 2)
    ty = fy - j
    wy = catmull_rom_weights(ty)
    rows = 0.0
    for k in range(-1, 3):
        row = jnp.take(table, jnp.clip(j + k, 0, h - 1), axis=0)
        # interpolate this row along x
        fx = jnp.clip(x, 0.0, 1.0) * (w - 1)
        i = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 2)
        tx = fx - i
        wx = catmull_rom_weights(tx)
        val = 0.0
        for m in range(-1, 3):
            col = jnp.take_along_axis(row, jnp.clip(i + m, 0, w - 1)[..., None],
                                      axis=-1)[..., 0] if row.ndim > 1 else \
                jnp.take(row, jnp.clip(i + m, 0, w - 1))
            val = val + wx[m + 1] * col
        rows = rows + wy[k + 1] * val
    return rows
