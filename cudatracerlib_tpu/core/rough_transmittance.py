"""Rough dielectric transmittance tables.

Reference: ``Engine/RoughTransmittance.h/.cu`` loads Mitsuba's precomputed
`data/microfacet/{beckmann,ggx,phong}.dat` tables and spline-interpolates.
Here the tables are *computed* on first use (vectorized numpy Monte Carlo of
the microfacet reflectance integral) and cached on disk — no binary data
files to ship. Used by rough plastic/coating for energy-correct diffuse
weighting: E(cos_i, alpha) = directional-hemispherical specular reflectance.
"""
from __future__ import annotations

import os

import numpy as np

_CACHE: dict = {}
_N_COS, _N_ALPHA, _N_MC = 32, 32, 2048
_ALPHA_MAX = 1.0


def _compute_table(dist: int, eta: float) -> np.ndarray:
    """E_spec(cos_i, alpha) for a rough dielectric with relative IOR eta."""
    rng = np.random.default_rng(1234 + dist)
    cos_i = np.linspace(0.02, 1.0, _N_COS)
    alphas = np.linspace(0.01, _ALPHA_MAX, _N_ALPHA)
    u1 = rng.random(_N_MC)
    u2 = rng.random(_N_MC)
    table = np.zeros((_N_COS, _N_ALPHA), np.float32)
    for ai, alpha in enumerate(alphas):
        # sample micronormals ~ D(m) cos m
        if dist == 1:  # ggx
            t2 = alpha * alpha * u1 / np.maximum(1 - u1, 1e-9)
        else:          # beckmann / phong-equivalent
            t2 = -alpha * alpha * np.log(np.maximum(1 - u1, 1e-9))
        ct = 1.0 / np.sqrt(1 + t2)
        st = np.sqrt(np.maximum(1 - ct * ct, 0))
        phi = 2 * np.pi * u2
        m = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)  # (M,3)
        for ci, c in enumerate(cos_i):
            wi = np.array([np.sqrt(max(1 - c * c, 0.0)), 0.0, c])
            dot = np.abs(m @ wi)
            # fresnel at the micronormal
            s2 = np.maximum(1 - dot * dot, 0) / (eta * eta)
            tir = s2 >= 1.0
            ctt = np.sqrt(np.maximum(1 - s2, 0))
            rs = (dot - eta * ctt) / np.maximum(dot + eta * ctt, 1e-9)
            rp = (eta * dot - ctt) / np.maximum(eta * dot + ctt, 1e-9)
            F = np.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
            # weight for D*cos sampling of reflectance: F * G2 ~ approximate
            # with the Smith shadowing of the outgoing mirror direction
            wo_z = 2 * dot * m[:, 2] - wi[2]
            valid = wo_z > 0
            table[ci, ai] = float(np.mean(F * valid))
    return np.clip(table, 0.0, 1.0)


def get_table(dist: int, eta: float = 1.5) -> np.ndarray:
    """(32, 32) E_spec table over (cos_i in [0,1], alpha in [0,1])."""
    key = (dist, round(float(eta), 3))
    if key in _CACHE:
        return _CACHE[key]
    cache_dir = os.path.join(os.path.dirname(__file__), "..", "..", ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    fn = os.path.join(cache_dir, f"rough_transmittance_{dist}_{key[1]}.npy")
    if os.path.exists(fn):
        t = np.load(fn)
    else:
        t = _compute_table(dist, eta)
        np.save(fn, t)
    _CACHE[key] = t
    return t


def eval_specular_albedo(dist: int, eta: float, cos_i, alpha):
    """Interpolated E_spec for batched jnp inputs (bilinear)."""
    import jax.numpy as jnp
    t = jnp.asarray(get_table(dist, eta))
    x = jnp.clip(jnp.abs(cos_i), 0.0, 1.0) * (_N_COS - 1)
    y = jnp.clip(alpha / _ALPHA_MAX, 0.0, 1.0) * (_N_ALPHA - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, _N_COS - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, _N_ALPHA - 2)
    fx, fy = x - x0, y - y0
    g = lambda dx, dy: t[x0 + dx, y0 + dy]
    return (g(0, 0) * (1 - fx) * (1 - fy) + g(1, 0) * fx * (1 - fy)
            + g(0, 1) * (1 - fx) * fy + g(1, 1) * fx * fy)


# eta knots for the per-lane-IOR interpolation (the reference's tables carry
# an eta axis and spline over it, Engine/RoughTransmittance.cu:100-121)
_ETA_KNOTS = (1.1, 1.3, 1.5, 1.7, 2.0)


def eval_specular_albedo_eta(dist: int, eta, cos_i, alpha):
    """E_spec with per-lane eta: trilinear over (eta, cos_i, alpha).

    eta/cos_i/alpha are (B,) jnp arrays; eta is clamped to the knot range."""
    import jax.numpy as jnp
    tabs = jnp.stack([jnp.asarray(get_table(dist, e)) for e in _ETA_KNOTS])
    knots = jnp.asarray(_ETA_KNOTS, jnp.float32)
    e = jnp.clip(eta, _ETA_KNOTS[0], _ETA_KNOTS[-1])
    hi = jnp.clip(jnp.searchsorted(knots, e, side="right"),
                  1, len(_ETA_KNOTS) - 1).astype(jnp.int32)
    lo = hi - 1
    we = (e - knots[lo]) / jnp.maximum(knots[hi] - knots[lo], 1e-6)
    x = jnp.clip(jnp.abs(cos_i), 0.0, 1.0) * (_N_COS - 1)
    y = jnp.clip(alpha / _ALPHA_MAX, 0.0, 1.0) * (_N_ALPHA - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, _N_COS - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, _N_ALPHA - 2)
    fx, fy = x - x0, y - y0

    def bilerp(ei):
        g = lambda dx, dy: tabs[ei, x0 + dx, y0 + dy]
        return (g(0, 0) * (1 - fx) * (1 - fy) + g(1, 0) * fx * (1 - fy)
                + g(0, 1) * (1 - fx) * fy + g(1, 1) * fx * fy)

    return bilerp(lo) * (1.0 - we) + bilerp(hi) * we
