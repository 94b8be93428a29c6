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
- sobol: 64 dims of a Sobol' sequence (Joe-Kuo initialization for the first
  dims, programmatically-derived primitive polynomials beyond) with hash-based
  Owen scrambling (Laine-Karras permutation of the reversed bits, Burley 2020)
  per (pixel, dimension) — the scramble is a true nested-uniform permutation,
  so padded/reused dimensions decorrelate while each dim keeps its 1D
  stratification. Replaces the unwired Sobol enum of the reference
  (`Kernel/Sampler_device.h:176-179`).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import rng as rngmod

Array = jax.Array

INDEPENDENT, STRATIFIED, SOBOL = 0, 1, 2

SOBOL_DIMS = 64          # PT draws dims 4+6d..9+6d; depth 9 tops out at 63
_SOBOL_DIRS = None


def _pmod(a: int, p: int) -> int:
    """a mod p over GF(2)[x] (ints as bit-packed polynomials)."""
    dp = p.bit_length() - 1
    while a.bit_length() - 1 >= dp and a:
        a ^= p << (a.bit_length() - 1 - dp)
    return a


def _pmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        b >>= 1
    return r


def _ppowmod(base: int, e: int, p: int) -> int:
    r, base = 1, _pmod(base, p)
    while e:
        if e & 1:
            r = _pmod(_pmul(r, base), p)
        base = _pmod(_pmul(base, base), p)
        e >>= 1
    return r


def _prime_factors(n: int):
    fac, d = set(), 2
    while d * d <= n:
        while n % d == 0:
            fac.add(d)
            n //= d
        d += 1
    if n > 1:
        fac.add(n)
    return fac


def _primitive_polys(count: int):
    """First `count` primitive polynomials over GF(2), ordered by degree.

    p is primitive iff ord(x) = 2^s - 1 in GF(2)[x]/(p): x^(2^s-1) == 1 and
    x^((2^s-1)/q) != 1 for every prime q | 2^s-1. A reducible p cannot pass
    (its unit group is strictly smaller than 2^s - 1), so no separate
    irreducibility test is needed.
    """
    found, s = [], 1
    while len(found) < count:
        mers = (1 << s) - 1
        fac = _prime_factors(mers) if mers > 1 else set()
        for p in range((1 << s) | 1, 1 << (s + 1), 2):
            if _ppowmod(2, mers, p) != 1:
                continue
            if any(_ppowmod(2, mers // q, p) == 1 for q in fac):
                continue
            found.append((s, p))
            if len(found) >= count:
                break
        s += 1
    return found


def _sobol_directions(n_dims: int = SOBOL_DIMS) -> np.ndarray:
    """Direction-number matrices (n_dims, 32) uint32.

    Dims 1..7 use the published Joe-Kuo initial m values (good 2D
    projections); higher dims use the next primitive polynomials with
    deterministic odd initial m_i in [1, 2^i) — any such choice yields a
    valid (t,s)-sequence in base 2, and the per-dimension Owen scrambling
    supplies the projection decorrelation beyond that.
    """
    global _SOBOL_DIRS
    if _SOBOL_DIRS is not None and _SOBOL_DIRS.shape[0] >= n_dims:
        return _SOBOL_DIRS
    n_dims = max(n_dims, SOBOL_DIMS)
    # Joe & Kuo table head: encoded interior bits (a) + degree + initial m
    jk_polys = [0, 1, 1, 2, 1, 4, 2]
    jk_degs = [1, 2, 3, 3, 4, 4, 5]
    jk_m = [[1], [1, 3], [1, 3, 1], [1, 1, 1], [1, 1, 3, 3],
            [1, 3, 5, 13], [1, 1, 5, 5, 17]]
    prims = _primitive_polys(n_dims - 1)
    rng = np.random.default_rng(20260819)
    degs, polys, m_inits = [], [], []
    for d in range(n_dims - 1):
        if d < len(jk_degs):
            degs.append(jk_degs[d])
            polys.append(jk_polys[d])
            m_inits.append(list(jk_m[d]))
        else:
            s, p = prims[d]
            degs.append(s)
            polys.append((p >> 1) & ((1 << (s - 1)) - 1))
            m_inits.append([int(rng.integers(0, 1 << i)) * 2 + 1
                            for i in range(s)])
    dirs = np.zeros((n_dims, 32), np.uint32)
    for i in range(32):
        dirs[0, i] = np.uint32(1) << np.uint32(31 - i)
    for d in range(1, n_dims):
        s, a, m = degs[d - 1], polys[d - 1], list(m_inits[d - 1])
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


def _reverse_bits32(x: Array) -> Array:
    x = (x >> 16) | (x << 16)
    x = ((x & 0x00ff00ff) << 8) | ((x >> 8) & 0x00ff00ff)
    x = ((x & 0x0f0f0f0f) << 4) | ((x >> 4) & 0x0f0f0f0f)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    return x


def _laine_karras(x: Array, seed: Array) -> Array:
    """Laine-Karras hash: a random base-2 nested uniform permutation of the
    bits of x (acts on the REVERSED bit order), keyed by seed. Constants from
    Burley, "Practical Hash-based Owen Scrambling" (JCGT 2020)."""
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def owen_scramble(x: Array, seed: Array) -> Array:
    """Hash-based Owen scramble of a 32-bit radical-inverse-oriented value."""
    return _reverse_bits32(_laine_karras(_reverse_bits32(x), seed))


def sobol_sample(index: Array, dim: int, scramble: Array) -> Array:
    """Owen-scrambled Sobol' value in [0,1) for sample `index`, dimension
    `dim` (static), with per-lane scramble keys (uint32)."""
    dirs = jnp.asarray(_sobol_directions()[min(dim, SOBOL_DIMS - 1)])
    idx = index.astype(jnp.uint32)
    result = jnp.zeros_like(idx)
    for bit in range(32):
        result = result ^ jnp.where((idx >> bit) & 1 != 0, dirs[bit], 0)
    result = owen_scramble(result, scramble)
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
    if sampler_type == SOBOL and dim < SOBOL_DIMS:
        scramble = rngmod.hash_combine(pixel_id, jnp.uint32(dim))
        return sobol_sample(jnp.broadcast_to(sample_idx, pixel_id.shape),
                            dim, scramble)
    # sobol dims past the table: independent draw (see sample_1d_dyn note)
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

    Sobol dims cover the full 64-dim direction table (PT depth 9 tops out at
    dim 63); dims PAST 64 fall back to an independent hash draw — reusing a
    direction row under a different Owen seed does NOT decorrelate the pair
    (the top output bits stay perfectly aligned; measured corr 0.89), and at
    path depth >= 10 stratification carries no variance benefit anyway."""
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
        dirs = jnp.asarray(_sobol_directions())           # (64, 32)
        row = jnp.take(dirs, (dim % SOBOL_DIMS).astype(jnp.int32), axis=0)
        row = jnp.broadcast_to(row, pixel_id.shape + (32,))
        scramble = rngmod.hash_combine(pixel_id, dim)
        idx = jnp.broadcast_to(sample_idx, pixel_id.shape).astype(jnp.uint32)
        result = jnp.zeros_like(idx)
        for bit in range(32):
            result = result ^ jnp.where((idx >> bit) & 1 != 0, row[..., bit], 0)
        result = owen_scramble(result, scramble)
        u_sob = (result >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
        st = rngmod.seed(pixel_id, idx, dim)
        _, u_ind = rngmod.next_float(st)
        return jnp.where(dim < SOBOL_DIMS, u_sob, u_ind)
    st = rngmod.seed(pixel_id, sample_idx, dim)
    _, u = rngmod.next_float(st)
    return u
