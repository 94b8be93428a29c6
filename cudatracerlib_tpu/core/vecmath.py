"""Vector math over jnp arrays with trailing dim 3.

TPU-native counterpart of the reference's Vec2/3/4f + float4x4 value types
(``Math/Vector.h``, ``Math/float4x4.h``). Instead of scalar structs we operate on
batched ``(..., 3)`` float32 arrays; XLA vectorizes the component math onto the
VPU, so there is no per-element class overhead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

EPS = 1e-6
INF = jnp.inf


def vec3(x, y, z, dtype=jnp.float32) -> Array:
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)), axis=-1)


def dot(a: Array, b: Array) -> Array:
    return jnp.sum(a * b, axis=-1)


def absdot(a: Array, b: Array) -> Array:
    return jnp.abs(dot(a, b))


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def length_sqr(a: Array) -> Array:
    return dot(a, a)


def length(a: Array) -> Array:
    return jnp.sqrt(length_sqr(a))


def distance(a: Array, b: Array) -> Array:
    return length(a - b)


def distance_sqr(a: Array, b: Array) -> Array:
    return length_sqr(a - b)


def normalize(a: Array) -> Array:
    return a * jax.lax.rsqrt(jnp.maximum(length_sqr(a), 1e-30))[..., None]


def lerp(a, b, t):
    return a + (b - a) * t


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def reflect(w: Array, n: Array) -> Array:
    """Reflect direction ``w`` (pointing away from surface) about normal ``n``."""
    return 2.0 * dot(w, n)[..., None] * n - w


def refract(w: Array, n: Array, eta: Array, cos_theta_t: Array) -> Array:
    """Refract direction ``w`` (pointing away from the surface) about ``n``.

    ``eta`` is the material's relative IOR (int/ext); ``cos_theta_t`` is the
    signed transmitted cosine from ``fresnel_dielectric_ext`` (opposite sign of
    ``dot(w, n)``). Derivation: wo = -eta_r*w + (eta_r*dot(w,n) + cos_theta_t)*n
    with eta_r = eta_i/eta_t for this crossing.
    """
    eta_r = jnp.where(cos_theta_t < 0, 1.0 / eta, eta)
    return n * (eta_r * dot(w, n) + cos_theta_t)[..., None] - w * eta_r[..., None]


def coordinate_system(n: Array):
    """Build an orthonormal basis around unit vector n (Duff et al. 2017 branchless)."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    s = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, s


def spherical_direction(sin_theta, cos_theta, phi):
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def spherical_theta(v: Array) -> Array:
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v: Array) -> Array:
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


def select(mask: Array, a, b):
    """Broadcasting where() that adds trailing dims of `a` to `mask` as needed."""
    extra = a.ndim - mask.ndim if hasattr(a, "ndim") else 0
    m = mask.reshape(mask.shape + (1,) * extra) if extra > 0 else mask
    return jnp.where(m, a, b)


# ---------------------------------------------------------------------------
# 4x4 affine transforms (float4x4, Math/float4x4.h). Stored row-major (4,4).
# ---------------------------------------------------------------------------

def mat4_identity() -> Array:
    return jnp.eye(4, dtype=jnp.float32)


def mat4_translate(t) -> Array:
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(jnp.asarray(t, jnp.float32))


def mat4_scale(s) -> Array:
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))


def mat4_rotate(axis, angle_rad) -> Array:
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    x, y, z = axis
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    C = 1 - c
    r = jnp.array([
        [x * x * C + c, x * y * C - z * s, x * z * C + y * s, 0],
        [y * x * C + z * s, y * y * C + c, y * z * C - x * s, 0],
        [z * x * C - y * s, z * y * C + x * s, z * z * C + c, 0],
        [0, 0, 0, 1]], jnp.float32)
    return r


def mat4_mul(a: Array, b: Array) -> Array:
    return a @ b


def mat4_inverse(m: Array) -> Array:
    return jnp.linalg.inv(m)


def transform_point(m: Array, p: Array) -> Array:
    """Apply (...,4,4) affine matrix to (...,3) points."""
    r = jnp.einsum('...ij,...j->...i', m[..., :3, :3], p) + m[..., :3, 3]
    return r


def transform_vector(m: Array, v: Array) -> Array:
    return jnp.einsum('...ij,...j->...i', m[..., :3, :3], v)


def transform_normal(m_inv: Array, n: Array) -> Array:
    """Transform a normal with the *inverse* matrix (uses transpose of its 3x3)."""
    return jnp.einsum('...ji,...j->...i', m_inv[..., :3, :3], n)


def look_at(origin, target, up) -> Array:
    """Camera-to-world matrix: +z forward, +y up, +x right (Mitsuba convention)."""
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    d = target - origin
    d = d / jnp.linalg.norm(d)
    r = jnp.cross(up / jnp.linalg.norm(up), d)
    r = r / jnp.linalg.norm(r)
    u = jnp.cross(d, r)
    m = jnp.stack([r, u, d, origin], axis=-1)  # columns
    return jnp.concatenate([m, jnp.array([[0., 0., 0., 1.]], jnp.float32)], axis=0)
