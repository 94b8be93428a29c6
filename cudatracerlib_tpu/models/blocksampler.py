"""Adaptive block sampling + per-pixel variance tracking.

Reference: ``Kernel/BlockSampler/*`` (UniformBlockSampler,
VarianceBlockSampler with std-of-estimator + intra-block weights,
DifferenceBlockSampler, SelectBlockSampler, MixedBlockIterate deterministic +
weighted scheduling over 128^2 blocks) and ``Kernel/PixelVarianceBuffer``
(online mean/variance + half-buffer error). TPU-native: block weights are
computed from the variance buffer with segment reductions; each pass renders a
FIXED number of block slots (static shapes) chosen as a deterministic
round-robin portion plus a weighted-sampled portion.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng as rngmod

Array = jax.Array

BLOCK = 16  # block edge in pixels

B_UNIFORM, B_VARIANCE, B_DIFFERENCE, B_SELECT = 0, 1, 2, 3


class VarianceBuffer(NamedTuple):
    """Online per-pixel statistics (Welford) + split-buffer error estimate."""
    mean: Array      # (H, W, 3)
    m2: Array        # (H, W, 3)
    count: Array     # (H, W)
    half: Array      # (H, W, 3) accumulation of even-indexed samples only

    @staticmethod
    def new(w: int, h: int) -> "VarianceBuffer":
        return VarianceBuffer(jnp.zeros((h, w, 3)), jnp.zeros((h, w, 3)),
                              jnp.zeros((h, w)), jnp.zeros((h, w, 3)))


def add_samples(vb: VarianceBuffer, px: Array, py: Array, value: Array,
                sample_parity: Array, mask: Array) -> VarianceBuffer:
    """Welford update at sample pixels (scatter-based)."""
    w = vb.mean.shape[1]
    flat = py * w + px
    msk = mask.astype(jnp.float32)
    cnt = vb.count.reshape(-1).at[flat].add(msk, mode="drop").reshape(vb.count.shape)
    n_at = jnp.maximum(cnt.reshape(-1)[flat], 1.0)
    old_mean = vb.mean.reshape(-1, 3)[flat]
    delta = (value - old_mean) * (msk / n_at)[:, None]
    mean = vb.mean.reshape(-1, 3).at[flat].add(delta, mode="drop").reshape(vb.mean.shape)
    new_mean = mean.reshape(-1, 3)[flat]
    m2_add = (value - old_mean) * (value - new_mean) * msk[:, None]
    m2 = vb.m2.reshape(-1, 3).at[flat].add(m2_add, mode="drop").reshape(vb.m2.shape)
    half_add = jnp.where(((sample_parity % 2) == 0) & mask, 1.0, 0.0)[:, None] * value
    half = vb.half.reshape(-1, 3).at[flat].add(half_add, mode="drop").reshape(vb.half.shape)
    return VarianceBuffer(mean=mean, m2=m2, count=cnt, half=half)


def pixel_variance(vb: VarianceBuffer) -> Array:
    """Per-pixel variance of the estimator (variance of the mean)."""
    n = jnp.maximum(vb.count, 1.0)
    var = vb.m2 / jnp.maximum(n - 1.0, 1.0)[..., None]
    return (var / n[..., None]).mean(-1)


def halfbuffer_error(vb: VarianceBuffer) -> Array:
    """Dammertz-style split-buffer error: |mean - 2*half_mean| luminance."""
    n = jnp.maximum(vb.count, 1.0)[..., None]
    half_mean = vb.half / jnp.maximum(n / 2.0, 1.0)
    d = jnp.abs(vb.mean - half_mean)
    denom = jnp.sqrt(jnp.maximum(vb.mean, 1e-4))
    return (d / denom).mean(-1)


def block_weights(vb: VarianceBuffer, w: int, h: int, mode: int,
                  select_rect: Optional[tuple] = None) -> Array:
    """Per-block scalar weights (Bh, Bw) for a sampling mode."""
    bh, bw = h // BLOCK, w // BLOCK
    if mode == B_UNIFORM:
        return jnp.ones((bh, bw))
    if mode == B_SELECT and select_rect is not None:
        x0, y0, x1, y1 = select_rect
        wts = np.zeros((bh, bw), np.float32)
        wts[y0 // BLOCK:max(y1 // BLOCK, 1), x0 // BLOCK:max(x1 // BLOCK, 1)] = 1.0
        return jnp.asarray(wts)
    if mode == B_DIFFERENCE:
        err = halfbuffer_error(vb)
    else:  # B_VARIANCE: std of estimator normalized by mean + intra-block var
        n = jnp.maximum(vb.count, 1.0)
        std_est = jnp.sqrt(pixel_variance(vb))
        lum = jnp.maximum(vb.mean.mean(-1), 1e-3)
        err = std_est / lum
    blocks = err[:bh * BLOCK, :bw * BLOCK].reshape(bh, BLOCK, bw, BLOCK).mean((1, 3))
    # intra-block variance of the error adds a second term (reference weights)
    bvar = err[:bh * BLOCK, :bw * BLOCK].reshape(bh, BLOCK, bw, BLOCK).var((1, 3))
    wts = blocks + jnp.sqrt(bvar)
    return wts / jnp.maximum(wts.mean(), 1e-9)


def choose_blocks(weights: Array, n_deterministic: int, n_weighted: int,
                  pass_idx, seed: Array) -> Array:
    """MixedBlockIterate: round-robin deterministic slots + weight-sampled
    slots. Returns (n_det + n_weighted,) flat block ids."""
    nb = weights.size
    flat_w = jnp.maximum(weights.reshape(-1), 1e-6)
    det = (jnp.arange(n_deterministic) * nb // max(n_deterministic, 1)
           + pass_idx) % nb
    cdf = jnp.cumsum(flat_w)
    cdf = cdf / cdf[-1]
    st = rngmod.seed(jnp.arange(n_weighted, dtype=jnp.int32), pass_idx, seed)
    _, u = rngmod.next_float(st)
    samp = jnp.clip(jnp.searchsorted(cdf, u), 0, nb - 1)
    return jnp.concatenate([det.astype(jnp.int32), samp.astype(jnp.int32)])


def block_pixels(block_ids: Array, w: int) -> Array:
    """Flat pixel indices (N_blocks * BLOCK^2,) of the chosen blocks."""
    bw = w // BLOCK
    by = block_ids // bw
    bx = block_ids % bw
    ox = jnp.tile(jnp.arange(BLOCK), BLOCK)
    oy = jnp.repeat(jnp.arange(BLOCK), BLOCK)
    px = (bx[:, None] * BLOCK + ox[None, :]).reshape(-1)
    py = (by[:, None] * BLOCK + oy[None, :]).reshape(-1)
    return py * w + px
