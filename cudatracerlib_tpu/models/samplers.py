"""Sample-sequence generators.

Reference: ``Kernel/Sampler_device.h`` (SequenceSamplerData with the
sum-of-two-sequences-mod-1 combiner, RandomSamplerData XORWOW state) and
``Kernel/Sampler.h`` (Independent / Stratified host generators; the enum also
lists LowDiscrepency/Sobol). TPU-native: all samplers are counter-based pure
functions of (pixel_id, sample_index, dimension) — no mutable state arrays.

- independent: PCG hash stream (core.rng)
- stratified: jittered strata in the first dimensions, hash-permuted per pixel
  so neighboring pixels decorrelate, combined with a rotation (the reference's
  sequence combiner adds two sequences mod 1)
- sobol: first 32 dims of a Sobol (0,2)-sequence with per-pixel Owen-style
  hash scrambling (replaces the unwired Sobol enum of the reference)
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import rng as rngmod

Array = jax.Array

INDEPENDENT, STRATIFIED, SOBOL = 0, 1, 2

# Sobol direction numbers (dims 0,1: van der Corput + Sobol' second dim)
_SOBOL_DIRS = None


def _sobol_directions(n_dims: int = 8) -> np.ndarray:
    """Direction-number matrices (n_dims, 32) uint32 (Joe-Kuo style, first dims)."""
    global _SOBOL_DIRS
    if _SOBOL_DIRS is not None and _SOBOL_DIRS.shape[0] >= n_dims:
        return _SOBOL_DIRS
    # primitive polynomials + initial m for dims 1..7 (Joe & Kuo tables);
    # dim 0 is the van der Corput sequence (m_i = 1 for all i)
    polys = [0, 1, 1, 2, 1, 4, 2]             # encoded poly interior bits (a)
    degs = [1, 2, 3, 3, 4, 4, 5]              # degrees s
    m_init = [[1], [1, 3], [1, 3, 1], [1, 1, 1], [1, 1, 3, 3],
              [1, 3, 5, 13], [1, 1, 5, 5, 17]]
    dirs = np.zeros((n_dims, 32), np.uint32)
    for i in range(32):
        dirs[0, i] = np.uint32(1) << np.uint32(31 - i)
    for d in range(1, n_dims):
        s = degs[d - 1]
        a = polys[d - 1]
        m = list(m_init[d - 1])
        for i in range(s, 32):
            val = m[i - s]
            val ^= (m[i - s] << s)
            for k in range(1, s):
                if (a >> (s - 1 - k)) & 1:
                    val ^= m[i - k] << k
            m.append(val)
        for i in range(32):
            dirs[d, i] = np.uint32(m[i]) << np.uint32(31 - i)
    _SOBOL_DIRS = dirs
    return dirs


def sobol_sample(index: Array, dim: int, scramble: Array) -> Array:
    """Sobol' value in [0,1) for sample `index`, dimension `dim` (static),
    with per-lane scramble keys (uint32)."""
    dirs = jnp.asarray(_sobol_directions(max(dim + 1, 2))[dim])
    idx = index.astype(jnp.uint32)
    result = jnp.zeros_like(idx)
    for bit in range(32):
        result = result ^ jnp.where((idx >> bit) & 1 != 0, dirs[bit], 0)
    result = result ^ scramble  # Owen-ish hash scramble (xor of hashed key)
    return (result >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def stratified_sample(pixel_id: Array, sample_idx: Array, dim: int,
                      n_strata: int = 16) -> Array:
    """Jittered stratified value: stratum from a per-pixel permutation of the
    sample index, jitter + per-pixel rotation combined mod 1 (the reference's
    two-sequence combiner)."""
    perm = rngmod.hash_combine(pixel_id, jnp.uint32(dim))
    stratum = (sample_idx.astype(jnp.uint32) + perm) % jnp.uint32(n_strata)
    st_j = rngmod.hash_combine(pixel_id, sample_idx, jnp.uint32(dim * 2 + 1))
    jitter = (st_j >> 8).astype(jnp.float32) / (1 << 24)
    rot = (perm >> 8).astype(jnp.float32) / (1 << 24)
    return ((stratum.astype(jnp.float32) + jitter) / n_strata + rot) % 1.0


def sample_1d(sampler_type: int, pixel_id: Array, sample_idx, dim: int) -> Array:
    """Counter-based sample for a static dimension index."""
    sample_idx = jnp.asarray(sample_idx)
    if sampler_type == STRATIFIED:
        return stratified_sample(pixel_id, jnp.broadcast_to(sample_idx, pixel_id.shape), dim)
    if sampler_type == SOBOL:
        scramble = rngmod.hash_combine(pixel_id, jnp.uint32(dim))
        return sobol_sample(jnp.broadcast_to(sample_idx, pixel_id.shape), min(dim, 7), scramble)
    st = rngmod.seed(pixel_id, sample_idx, jnp.uint32(dim))
    _, u = rngmod.next_float(st)
    return u


def sample_2d(sampler_type: int, pixel_id: Array, sample_idx, dim: int) -> Array:
    a = sample_1d(sampler_type, pixel_id, sample_idx, dim)
    b = sample_1d(sampler_type, pixel_id, sample_idx, dim + 1)
    return jnp.stack([a, b], axis=-1)


def sample_1d_dyn(sampler_type: int, pixel_id: Array, sample_idx, dim) -> Array:
    """Counter-based sample for a TRACED dimension index (e.g. 4 + 6*depth
    inside the bounce loop) — full-depth sequence coverage, matching the
    reference's per-dimension regenerated sequences + mod-1 combiner
    (`Kernel/Sampler_device.h:62-100`, `TraceHelper.cu:224-267`).

    Sobol dims beyond the direction table reuse rows mod 8 but with a
    per-(pixel, full-dim) Owen-style scramble, which decorrelates the reused
    rows (standard padded-dimension practice)."""
    sample_idx = jnp.asarray(sample_idx)
    dim = jnp.asarray(dim, jnp.uint32)
    if sampler_type == STRATIFIED:
        n_strata = 16
        perm = rngmod.hash_combine(pixel_id, dim)
        sidx = jnp.broadcast_to(sample_idx, pixel_id.shape).astype(jnp.uint32)
        stratum = (sidx + perm) % jnp.uint32(n_strata)
        st_j = rngmod.hash_combine(pixel_id, sidx, dim * 2 + 1)
        jitter = (st_j >> 8).astype(jnp.float32) / (1 << 24)
        rot = (perm >> 8).astype(jnp.float32) / (1 << 24)
        return ((stratum.astype(jnp.float32) + jitter) / n_strata + rot) % 1.0
    if sampler_type == SOBOL:
        dirs = jnp.asarray(_sobol_directions(8))          # (8, 32)
        row = jnp.take(dirs, (dim % 8).astype(jnp.int32), axis=0)  # (B?, 32)
        row = jnp.broadcast_to(row, pixel_id.shape + (32,))
        scramble = rngmod.hash_combine(pixel_id, dim)
        idx = jnp.broadcast_to(sample_idx, pixel_id.shape).astype(jnp.uint32)
        result = jnp.zeros_like(idx)
        for bit in range(32):
            result = result ^ jnp.where((idx >> bit) & 1 != 0, row[..., bit], 0)
        result = result ^ scramble
        return (result >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    st = rngmod.seed(pixel_id, sample_idx, dim)
    _, u = rngmod.next_float(st)
    return u
