"""Sampling warps: [0,1)^2 -> distributions on spheres/disks/triangles.

Reference: ``Math/Warp.h`` (squareToUniformSphere/Hemisphere/Cosine/Cone/Disk/
Triangle/StdNormal, intervalToTent). All functions are batched over leading dims;
``u`` is a ``(..., 2)`` array of uniforms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import vecmath as vm

Array = jax.Array
INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_sphere(u: Array) -> Array:
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf() -> float:
    return INV_FOURPI


def square_to_uniform_hemisphere(u: Array) -> Array:
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf() -> float:
    return INV_TWOPI


def square_to_cosine_hemisphere(u: Array) -> Array:
    p = square_to_uniform_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(1e-12, 1.0 - p[..., 0] ** 2 - p[..., 1] ** 2))
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(d: Array) -> Array:
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(u: Array, cos_cutoff) -> Array:
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_cutoff
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def square_to_uniform_cone_pdf(cos_cutoff) -> Array:
    return INV_TWOPI / jnp.maximum(1.0 - cos_cutoff, 1e-12)


def square_to_uniform_disk(u: Array) -> Array:
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric(u: Array) -> Array:
    """Shirley-Chiu concentric disk mapping (lower distortion than polar)."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe = lambda a, b: a / jnp.where(jnp.abs(b) < 1e-12, jnp.where(b >= 0, 1e-12, -1e-12), b)
    theta = jnp.where(use_x, (jnp.pi / 4.0) * safe(oy, ox),
                      (jnp.pi / 2.0) - (jnp.pi / 4.0) * safe(ox, oy))
    zero = (jnp.abs(ox) < 1e-12) & (jnp.abs(oy) < 1e-12)
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return jnp.stack([x, y], axis=-1)


def square_to_uniform_disk_pdf() -> float:
    return INV_PI


def square_to_uniform_triangle(u: Array) -> Array:
    """Barycentric (b0, b1) uniform over the unit triangle."""
    a = jnp.sqrt(jnp.maximum(u[..., 0], 0.0))
    return jnp.stack([1.0 - a, a * u[..., 1]], axis=-1)


def square_to_std_normal(u: Array) -> Array:
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-12)))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def interval_to_tent(u: Array) -> Array:
    """[0,1) -> [-1,1] with tent density (used by tent reconstruction filters)."""
    sign = jnp.where(u < 0.5, 1.0, -1.0)
    t = jnp.where(u < 0.5, 2.0 * u, 2.0 * (1.0 - u))
    return sign * (1.0 - jnp.sqrt(jnp.maximum(t, 0.0)))


def square_to_tent(u: Array) -> Array:
    return jnp.stack([interval_to_tent(u[..., 0]), interval_to_tent(u[..., 1])], axis=-1)
