"""RGB spectrum operations (reference: ``Math/Spectrum.h`` with SPECTRUM_SAMPLES=3).

A Spectrum is a plain ``(..., 3)`` float32 array in linear RGB. Conversions to
XYZ / Yxy / sRGB and the RGBE shared-exponent encoding mirror the reference
(`Math/Spectrum.h:326`, RGBE at `Math/Spectrum.h` toRGBE/fromRGBE).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# ITU-R Rec. BT.709 primaries (same matrices the reference/Mitsuba use)
_RGB2XYZ = jnp.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]], jnp.float32)
_XYZ2RGB = jnp.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]], jnp.float32)


def luminance(rgb: Array) -> Array:
    return (rgb * _RGB2XYZ[1]).sum(-1)


def rgb_to_xyz(rgb: Array) -> Array:
    return jnp.einsum('ij,...j->...i', _RGB2XYZ, rgb)


def xyz_to_rgb(xyz: Array) -> Array:
    return jnp.einsum('ij,...j->...i', _XYZ2RGB, xyz)


def xyz_to_yxy(xyz: Array) -> Array:
    s = xyz.sum(-1)
    safe = jnp.maximum(s, 1e-12)
    return jnp.stack([xyz[..., 1], xyz[..., 0] / safe, xyz[..., 1] / safe], axis=-1)


def yxy_to_xyz(yxy: Array) -> Array:
    Y, x, y = yxy[..., 0], yxy[..., 1], yxy[..., 2]
    ys = jnp.maximum(y, 1e-12)
    X = x * Y / ys
    Z = (1.0 - x - y) * Y / ys
    return jnp.stack([X, Y, Z], axis=-1)


def srgb_to_linear(c: Array) -> Array:
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power(jnp.maximum((c + 0.055) / 1.055, 0.0), 2.4))


def linear_to_srgb(c: Array) -> Array:
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


# --------------------------------------------------------------------------
# RGBE shared-exponent packing (Ward). 32 bits: r,g,b mantissas + exponent.
# --------------------------------------------------------------------------

def to_rgbe(rgb: Array) -> Array:
    """Pack (...,3) float rgb to (...,) uint32 RGBE."""
    rgb = jnp.maximum(rgb, 0.0)
    m = jnp.max(rgb, axis=-1)
    # frexp: m = f * 2^e with f in [0.5, 1)
    f, e = jnp.frexp(jnp.maximum(m, 1e-32))
    scale = f * 256.0 / jnp.maximum(m, 1e-32)
    quant = jnp.clip((rgb * scale[..., None]).astype(jnp.uint32), 0, 255)
    ebits = jnp.clip(e + 128, 0, 255).astype(jnp.uint32)
    packed = quant[..., 0] | (quant[..., 1] << 8) | (quant[..., 2] << 16) | (ebits << 24)
    return jnp.where(m < 1e-32, jnp.uint32(0), packed)


def from_rgbe(p: Array) -> Array:
    r = (p & 0xFF).astype(jnp.float32)
    g = ((p >> 8) & 0xFF).astype(jnp.float32)
    b = ((p >> 16) & 0xFF).astype(jnp.float32)
    e = ((p >> 24) & 0xFF).astype(jnp.int32)
    scale = jnp.where(p == 0, 0.0, jnp.ldexp(jnp.float32(1.0), e - (128 + 8)))
    return jnp.stack([r, g, b], axis=-1) * scale[..., None]


# --------------------------------------------------------------------------
# 8-bit RGBA packing ("RGBCOL" display format in the reference)
# --------------------------------------------------------------------------

def to_rgbcol(rgb: Array) -> Array:
    q = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | jnp.uint32(0xFF000000)


def from_rgbcol(p: Array) -> Array:
    r = (p & 0xFF).astype(jnp.float32)
    g = ((p >> 8) & 0xFF).astype(jnp.float32)
    b = ((p >> 16) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b], axis=-1) / 255.0


def blackbody(temperature_k: float, scale: float = 1.0) -> Array:
    """Normalized RGB of a blackbody emitter (Planck's law sampled at RGB primaries).

    Rough counterpart of Spectrum::fromBlackbody; adequate for the `blackbody`
    Mitsuba spectrum type at RGB rendering resolution.
    """
    # Sample Planck at representative wavelengths for R,G,B (nm)
    lam = jnp.array([610.0, 550.0, 465.0], jnp.float32) * 1e-9
    h, c, kb = 6.62607e-34, 2.998e8, 1.38065e-23
    p = (2 * h * c * c) / (lam ** 5) / (jnp.exp(h * c / (lam * kb * temperature_k)) - 1.0)
    p = p / jnp.max(p)
    return (p * scale).astype(jnp.float32)
