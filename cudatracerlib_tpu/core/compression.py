"""Bit-packing of normals / UVs for compact triangle shading data.

Reference: ``Math/Compression.h`` (normal <-> uint16 spherical encoding) and
``Math/half.h`` (half floats; here ``jnp.float16``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def normal_to_uint16(n: Array) -> Array:
    """Spherical encode: 8 bits theta, 8 bits phi."""
    theta = jnp.arccos(jnp.clip(n[..., 2], -1.0, 1.0))  # [0, pi]
    phi = jnp.arctan2(n[..., 1], n[..., 0])             # [-pi, pi]
    phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
    qt = jnp.clip(jnp.round(theta / jnp.pi * 255.0), 0, 255).astype(jnp.uint32)
    qp = jnp.clip(jnp.round(phi / (2.0 * jnp.pi) * 255.0), 0, 255).astype(jnp.uint32)
    return (qt | (qp << 8)).astype(jnp.uint16)


def uint16_to_normal(p: Array) -> Array:
    p = p.astype(jnp.uint32)
    theta = (p & 0xFF).astype(jnp.float32) / 255.0 * jnp.pi
    phi = ((p >> 8) & 0xFF).astype(jnp.float32) / 255.0 * (2.0 * jnp.pi)
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)


def f32_to_half(x: Array) -> Array:
    return x.astype(jnp.float16)


def half_to_f32(x: Array) -> Array:
    return x.astype(jnp.float32)


def uv_to_half2(uv: Array) -> Array:
    return uv.astype(jnp.float16)
