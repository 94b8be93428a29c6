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


# ---------------------------------------------------------------------------
# Hero-wavelength spectral transport (reference Math/Spectrum.h:10-15: the
# TSpectrum template is compile-switchable from RGB to N spectral samples,
# with Mitsuba's conversion routines). The TPU redesign replaces the
# compile-time binned class with HERO-WAVELENGTH sampling: each path carries
# C stratified wavelengths, RGB scene parameters are upsampled to spectral
# reflectance/emission on the fly, and the path's spectral radiance resolves
# to XYZ->linear RGB at the film. Structurally a (B, C) array instead of
# (B, 3) — same SIMD shape the rest of the framework already vectorizes over.
#
# The upsampling basis is a FITTED spectral-primary decomposition (Mallett &
# Yuksel 2019 style, tools/fit_spectral_basis.py): three smooth spectra that
# form an exact partition of unity (so every RGB in [0,1]^3 maps to a
# physical reflectance in [0,1]) and whose resolve through THIS module's
# pipeline reproduces the sRGB primaries exactly — in-gamut colors
# round-trip to float precision in expectation, where the Smits 1999 basis
# (kept below as rgb_to_spectral_smits) erred by up to ~10% on saturated
# colors against the Wyman CMF fit.
# ---------------------------------------------------------------------------

SPECTRUM_MIN_WAVELENGTH = 380.0   # Smits basis support (nm)
SPECTRUM_MAX_WAVELENGTH = 720.0

# Smits (1999) "An RGB to Spectrum Conversion for Reflectances": 10 bins
# over 380-720nm for the white/cyan/magenta/yellow/red/green/blue bases.
_SMITS_BINS = 10
_SMITS = {
    "white":   [1.0000, 1.0000, 0.9999, 0.9993, 0.9992, 0.9998, 1.0000,
                1.0000, 1.0000, 1.0000],
    "cyan":    [0.9710, 0.9426, 1.0007, 1.0007, 1.0007, 1.0007, 0.1564,
                0.0000, 0.0000, 0.0000],
    "magenta": [1.0000, 1.0000, 0.9685, 0.2229, 0.0000, 0.0458, 0.8369,
                1.0000, 1.0000, 0.9959],
    "yellow":  [0.0001, 0.0000, 0.1088, 0.6651, 1.0000, 1.0000, 0.9996,
                0.9586, 0.9685, 0.9840],
    "red":     [0.1012, 0.0515, 0.0000, 0.0000, 0.0000, 0.0000, 0.8325,
                1.0149, 1.0149, 1.0149],
    "green":   [0.0000, 0.0000, 0.0273, 0.7937, 1.0000, 0.9418, 0.1719,
                0.0000, 0.0000, 0.0025],
    "blue":    [1.0000, 1.0000, 0.8916, 0.3323, 0.0000, 0.0000, 0.0003,
                0.0369, 0.0483, 0.0496],
}


def _smits_tables() -> Array:
    import numpy as np
    return jnp.asarray(np.stack([_SMITS[k] for k in
                                 ("white", "cyan", "magenta", "yellow",
                                  "red", "green", "blue")]), jnp.float32)


def sample_hero_wavelengths(u: Array, n: int = 4):
    """(B,) uniform -> ((B, n) wavelengths nm, scalar pdf per wavelength).

    Hero lambda uniform over the visible range; companions rotated by
    range/n (stratified, wrap-around) so one path carries n spectral
    samples."""
    span = SPECTRUM_MAX_WAVELENGTH - SPECTRUM_MIN_WAVELENGTH
    hero = SPECTRUM_MIN_WAVELENGTH + u * span
    offs = jnp.arange(n, dtype=jnp.float32) * (span / n)
    lam = SPECTRUM_MIN_WAVELENGTH + (hero[..., None] + offs[None, :]
                                     - SPECTRUM_MIN_WAVELENGTH) % span
    return lam, 1.0 / span


_N_BASIS_BINS = 64
_BASIS_TABLE = [  # (N, 3) fitted by tools/fit_spectral_basis.py
    (0.325399, 0.334142, 0.340459),
    (0.320791, 0.333202, 0.346007),
    (0.316006, 0.330028, 0.353966),
    (0.311918, 0.320994, 0.367088),
    (0.307469, 0.300497, 0.392033),
    (0.294089, 0.261169, 0.444741),
    (0.251970, 0.195148, 0.552882),
    (0.159907, 0.100661, 0.739432),
    (0.041646, 0.012092, 0.946261),
    (-0.000000, -0.000000, 1.000000),
    (-0.000000, -0.000000, 1.000000),
    (-0.000000, -0.000000, 1.000000),
    (-0.000000, -0.000000, 1.000000),
    (-0.000000, -0.000000, 1.000000),
    (-0.000000, -0.000000, 1.000000),
    (-0.000000, -0.000000, 1.000000),
    (-0.000000, 0.001684, 0.998316),
    (-0.000000, 0.090630, 0.909371),
    (-0.000000, 0.236062, 0.763938),
    (-0.000000, 0.378146, 0.621854),
    (-0.000000, 0.503404, 0.496596),
    (-0.000000, 0.616945, 0.383055),
    (-0.000000, 0.726920, 0.273081),
    (-0.000000, 0.841335, 0.158666),
    (-0.000000, 0.950274, 0.049726),
    (-0.000000, 0.999984, 0.000016),
    (-0.000000, 0.999986, 0.000014),
    (-0.000000, 0.999987, 0.000013),
    (-0.000000, 0.999989, 0.000012),
    (-0.000000, 0.999990, 0.000010),
    (-0.000000, 0.999991, 0.000009),
    (-0.000000, 0.999993, 0.000008),
    (-0.000000, 0.999994, 0.000006),
    (-0.000000, 0.999995, 0.000005),
    (-0.000000, 0.999997, 0.000003),
    (-0.000000, 0.999998, 0.000002),
    (-0.000000, 0.981331, 0.018669),
    (-0.000000, 0.903268, 0.096732),
    (0.012702, 0.806386, 0.180913),
    (0.330794, 0.560610, 0.108596),
    (0.681194, 0.294654, 0.024151),
    (0.931324, 0.068676, -0.000000),
    (1.000000, -0.000000, -0.000000),
    (1.000000, -0.000000, -0.000000),
    (1.000000, -0.000000, -0.000000),
    (1.000000, -0.000000, -0.000000),
    (1.000000, -0.000000, -0.000000),
    (1.000000, -0.000000, -0.000000),
    (0.997651, -0.000000, 0.002349),
    (0.909539, 0.005237, 0.085225),
    (0.781144, 0.071520, 0.147335),
    (0.664230, 0.141857, 0.193913),
    (0.568216, 0.199132, 0.232652),
    (0.492678, 0.243831, 0.263492),
    (0.436085, 0.277144, 0.286771),
    (0.395835, 0.300594, 0.303571),
    (0.368707, 0.316123, 0.315170),
    (0.351456, 0.325726, 0.322818),
    (0.341198, 0.331178, 0.327623),
    (0.335594, 0.333922, 0.330485),
    (0.332886, 0.335028, 0.332086),
    (0.331847, 0.335239, 0.332913),
    (0.331679, 0.335029, 0.333292),
    (0.331863, 0.334676, 0.333461),
]


def _basis_table() -> Array:
    return jnp.asarray(_BASIS_TABLE, jnp.float32)       # (64, 3)


def rgb_to_spectral(rgb: Array, lam: Array) -> Array:
    """Fitted spectral-primary upsampling: (B, 3) linear-RGB reflectance ->
    (B, C) spectral reflectance at wavelengths lam (B, C) nm.

    R(lam) = r*B_r(lam) + g*B_g(lam) + b*B_b(lam) with the partition-of-unity
    basis above: exact round-trip for in-gamut colors, R in [0,1] for RGB in
    [0,1]^3 (see tools/fit_spectral_basis.py)."""
    span = SPECTRUM_MAX_WAVELENGTH - SPECTRUM_MIN_WAVELENGTH
    bin_i = jnp.clip(((lam - SPECTRUM_MIN_WAVELENGTH) / span
                      * _N_BASIS_BINS).astype(jnp.int32), 0, _N_BASIS_BINS - 1)
    basis = jnp.take(_basis_table(), bin_i, axis=0)     # (B, C, 3)
    return jnp.maximum(jnp.einsum('...ci,...i->...c', basis, rgb), 0.0)


def rgb_to_spectral_smits(rgb: Array, lam: Array) -> Array:
    """Smits (1999) upsampling: (B, 3) linear-RGB reflectance -> (B, C)
    spectral reflectance at lam (B, C) nm. Piecewise-constant basis; kept as
    the reference-parity alternative to the fitted basis above."""
    t = _smits_tables()                                   # (7, 10)
    span = SPECTRUM_MAX_WAVELENGTH - SPECTRUM_MIN_WAVELENGTH
    bin_i = jnp.clip(((lam - SPECTRUM_MIN_WAVELENGTH) / span
                      * _SMITS_BINS).astype(jnp.int32), 0, _SMITS_BINS - 1)
    basis = jnp.take(t.T, bin_i, axis=0)                  # (B, C, 7)
    w_b, c_b, m_b, y_b, r_b, g_b, b_b = [basis[..., i] for i in range(7)]
    r, g, b = rgb[..., 0:1], rgb[..., 1:2], rgb[..., 2:3]
    # Smits' decomposition: white + secondary + primary, per min-ordering
    def branch(lo, mid, hi, sec, prim):
        return lo * w_b + (mid - lo) * sec + (hi - mid) * prim
    rg_le_b = None  # readability only; branches below
    out_r_min = jnp.where(g <= b, branch(r, g, b, c_b, b_b),
                          branch(r, b, g, c_b, g_b))
    out_g_min = jnp.where(r <= b, branch(g, r, b, m_b, b_b),
                          branch(g, b, r, m_b, r_b))
    out_b_min = jnp.where(r <= g, branch(b, r, g, y_b, g_b),
                          branch(b, g, r, y_b, r_b))
    r_min = (r <= g) & (r <= b)
    g_min = (g <= r) & (g <= b) & ~r_min
    out = jnp.where(r_min, out_r_min, jnp.where(g_min, out_g_min, out_b_min))
    return jnp.maximum(out, 0.0)


def _cmf_gauss(x, mu, s1, s2):
    s = jnp.where(x < mu, s1, s2)
    return jnp.exp(-0.5 * ((x - mu) / s) ** 2)


def cie_xyz_cmf(lam: Array) -> Array:
    """CIE 1931 color matching functions at lam (nm) -> (..., 3).

    Wyman, Sloan & Shirley 2013 multi-lobe Gaussian fit ("Simple Analytic
    Approximations to the CIE XYZ Color Matching Functions")."""
    x = (1.056 * _cmf_gauss(lam, 599.8, 37.9, 31.0)
         + 0.362 * _cmf_gauss(lam, 442.0, 16.0, 26.7)
         - 0.065 * _cmf_gauss(lam, 501.1, 20.4, 26.2))
    y = (0.821 * _cmf_gauss(lam, 568.8, 46.9, 40.5)
         + 0.286 * _cmf_gauss(lam, 530.9, 16.3, 31.1))
    z = (1.217 * _cmf_gauss(lam, 437.0, 11.8, 36.0)
         + 0.681 * _cmf_gauss(lam, 459.0, 26.0, 13.8))
    return jnp.stack([x, y, z], axis=-1)


# per-channel white calibration: chosen so the FLAT unit spectrum resolves
# to exactly RGB white through the Wyman CMF fit on [380, 720] (the von-Kries
# adaptation to this truncated range's equal-energy white; computed by
# tools/fit_spectral_basis.py together with the basis, which is fitted
# against this exact resolve)
_CMF_WHITE_CALIB = jnp.asarray(
    [0.00890268, 0.00935350, 0.01019191], jnp.float32)


def spectral_to_rgb(L: Array, lam: Array, inv_pdf: Array | float) -> Array:
    """Monte-Carlo resolve of per-path spectral radiance to linear RGB.

    L (B, C) radiance at lam (B, C) nm sampled with density 1/inv_pdf:
    XYZ_j = mean_c L_c * cmf_j(lam_c) * inv_pdf * calib_j; calibrated so a
    flat spectrum returns exact white and the fitted basis round-trips."""
    cmf = cie_xyz_cmf(lam)                                # (B, C, 3)
    xyz = jnp.mean(L[..., None] * cmf, axis=-2) * inv_pdf * _CMF_WHITE_CALIB
    return xyz_to_rgb(xyz)
