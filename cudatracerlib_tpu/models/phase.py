"""Phase functions (reference: ``SceneTypes/PhaseFunction.h`` — HG, isotropic,
Kajiya-Kay, Rayleigh). Batched, branchless dispatch on per-lane type ids.

type codes: 0 = HG, 1 = isotropic, 2 = Kajiya-Kay, 3 = Rayleigh.
Convention: wi points toward the viewer (away from the collision), wo is the
sampled outgoing direction; `cos_theta` below is dot(-wi_prop, wo) where
wi_prop is the propagation direction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import frame as fr
from ..core import vecmath as vm
from ..core import warp

Array = jax.Array

PH_HG, PH_ISOTROPIC, PH_KAJIYAKAY, PH_RAYLEIGH = 0, 1, 2, 3
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def _hg(cos_t, g):
    """HG with cos_t = dot(propagation_in, w_out): mean cosine = +g (forward)."""
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 - 2.0 * g * cos_t, 1e-8)
    return INV_FOURPI * (1.0 - g2) / (denom * jnp.sqrt(denom))


def _rayleigh(cos_t):
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_t * cos_t)


# Kajiya-Kay constants (reference defaults, PhaseFunction.cu:72-76)
KK_KS, KK_KD, KK_EXPONENT = 0.4, 0.2, 4.0


def _kajiya_kay(cos_t):
    """Reference KajiyaKayPhaseFunction::Evaluate (PhaseFunction.cu:95-110):
    its reflected-direction construction collapses to R = -wi, i.e. a
    cos^e lobe about the propagation direction plus an isotropic kd floor.
    Normalized so each term integrates to its k over the sphere."""
    spec_norm = (KK_EXPONENT + 1.0) / (2.0 * jnp.pi)
    spec = jnp.maximum(cos_t, 0.0) ** KK_EXPONENT * spec_norm
    return KK_KD * INV_FOURPI + KK_KS * spec


def eval_phase(ptype: Array, g: Array, wi_prop: Array, wo: Array) -> Array:
    """p(wi->wo); wi_prop is the incoming propagation direction."""
    cos_t = vm.dot(wi_prop, wo)
    p_hg = _hg(cos_t, g)
    p_iso = jnp.full_like(cos_t, INV_FOURPI)
    p_ray = _rayleigh(cos_t)
    p_kk = _kajiya_kay(cos_t)
    out = jnp.where(ptype == PH_HG, p_hg,
                    jnp.where(ptype == PH_RAYLEIGH, p_ray,
                              jnp.where(ptype == PH_KAJIYAKAY, p_kk, p_iso)))
    return out


def pdf_phase(ptype, g, wi_prop, wo) -> Array:
    # HG & isotropic sample exactly; Rayleigh and Kajiya-Kay are sampled
    # isotropically (as the reference does) -> their pdf is the uniform one
    cos_t = vm.dot(wi_prop, wo)
    p_hg = _hg(cos_t, g)
    return jnp.where(ptype == PH_HG, p_hg, jnp.full_like(cos_t, INV_FOURPI))


def sample_phase(ptype: Array, g: Array, wi_prop: Array, u: Array):
    """Sample wo. Returns (wo, weight, pdf) with weight = p/pdf."""
    # HG inversion
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u[..., 0])
    cos_hg = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_iso = 1.0 - 2.0 * u[..., 0]
    cos_t = jnp.where((ptype == PH_HG) & (jnp.abs(g) >= 1e-3), cos_hg, cos_iso)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    frame = fr.Frame.from_normal(wi_prop)
    wo = frame.to_world(jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1))
    pdf = pdf_phase(ptype, g, wi_prop, wo)
    p = eval_phase(ptype, g, wi_prop, wo)
    weight = p / jnp.maximum(pdf, 1e-12)
    return wo, weight, pdf
