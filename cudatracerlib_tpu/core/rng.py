"""Counter-based vectorized RNG for the render loops.

TPU-native replacement for the reference's curand XORWOW/LCG/Tausworthe family
(``Base/CudaRandom.h``). Instead of per-thread mutable generator objects we keep a
per-lane uint32 state threaded functionally through the wavefront loop, advanced
with the PCG-style hash from Jarzynski & Olano, "Hash Functions for GPU
Rendering" (JCGT 2020). Seeding is a hash of (pixel_id, sample_id, pass_id) so
every (pixel, spp, pass) triple gets a decorrelated stream with no skip-ahead
matrices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_U32 = jnp.uint32


def _u32(x) -> Array:
    if isinstance(x, int):  # Python ints > 2^31 would overflow int32 weak-typing
        return jnp.asarray(np.uint32(x & 0xFFFFFFFF))
    return jnp.asarray(x).astype(_U32)


def pcg_hash(x: Array) -> Array:
    """One round of PCG-RXS-M-XS on a uint32."""
    x = _u32(x)
    state = x * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> 28) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> 22) ^ word


def hash_combine(*xs: Array) -> Array:
    h = _u32(0x9E3779B9)
    for x in xs:
        h = pcg_hash(h ^ _u32(x))
    return h


def seed(pixel_id: Array, sample_id, pass_id=0) -> Array:
    """Per-lane RNG state from identifying integers."""
    return hash_combine(pixel_id, sample_id, pass_id)


def next_uint(state: Array):
    """Advance state, return (new_state, uniform uint32)."""
    new_state = state * _U32(747796405) + _U32(2891336453)
    word = ((new_state >> ((new_state >> 28) + _U32(4))) ^ new_state) * _U32(277803737)
    return new_state, (word >> 22) ^ word


def next_float(state: Array):
    """Uniform float32 in [0, 1)."""
    state, u = next_uint(state)
    return state, (u >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def next_float2(state: Array):
    state, a = next_float(state)
    state, b = next_float(state)
    return state, jnp.stack([a, b], axis=-1)


def next_float3(state: Array):
    state, a = next_float(state)
    state, b = next_float(state)
    state, c = next_float(state)
    return state, jnp.stack([a, b, c], axis=-1)
