"""Microfacet normal distributions: Beckmann / GGX / Phong.

Reference: ``Engine/MicrofacetDistribution.h`` (Mitsuba-style eval/sample/pdf/
smithG1/G with visible-normal sampling). All directions are in the local shading
frame (+z = normal). Distribution type is a per-lane int array so material
batches with mixed NDFs evaluate branchlessly: we compute all three closed forms
and select (each is a handful of VPU ops).

type codes: 0 = Beckmann, 1 = GGX, 2 = Phong.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import frame as fr
from . import vecmath as vm

Array = jax.Array

BECKMANN, GGX, PHONG = 0, 1, 2
_INV_PI = 1.0 / jnp.pi


def _phong_exponent(alpha):
    """Equivalent Phong exponent for Beckmann roughness alpha (Mitsuba mapping)."""
    return jnp.maximum(2.0 / jnp.maximum(alpha * alpha, 1e-8) - 2.0, 0.0)


def eval_d(dist: Array, alpha_x: Array, alpha_y: Array, m: Array) -> Array:
    """Microfacet density D(m), zero in the lower hemisphere."""
    ct = fr.cos_theta(m)
    ct2 = ct * ct
    valid = ct > 0.0
    ct2s = jnp.maximum(ct2, 1e-12)
    ax2 = jnp.maximum(alpha_x * alpha_x, 1e-12)
    ay2 = jnp.maximum(alpha_y * alpha_y, 1e-12)
    # slope-space squared tangent, anisotropic
    e = (m[..., 0] ** 2 / ax2 + m[..., 1] ** 2 / ay2) / ct2s
    inv_norm = _INV_PI / jnp.sqrt(ax2 * ay2)

    d_beck = inv_norm * jnp.exp(-e) / jnp.maximum(ct2 * ct2, 1e-16)
    root = ct2 * (1.0 + e)
    d_ggx = inv_norm / jnp.maximum(root * root, 1e-16)
    expo = _phong_exponent(alpha_x)
    d_phong = (expo + 2.0) * (0.5 * _INV_PI) * jnp.power(jnp.maximum(ct, 1e-12), expo)

    d = jnp.where(dist == GGX, d_ggx, jnp.where(dist == PHONG, d_phong, d_beck))
    return jnp.where(valid, d, 0.0)


def _project_roughness(alpha_x, alpha_y, v):
    """Roughness projected onto the incidence plane of v."""
    inv_st2 = 1.0 / jnp.maximum(fr.sin_theta2(v), 1e-12)
    iso = jnp.abs(alpha_x - alpha_y) < 1e-7
    cos_phi2 = v[..., 0] ** 2 * inv_st2
    sin_phi2 = v[..., 1] ** 2 * inv_st2
    proj = jnp.sqrt(cos_phi2 * alpha_x ** 2 + sin_phi2 * alpha_y ** 2)
    return jnp.where(iso | (fr.sin_theta2(v) <= 1e-12), alpha_x, proj)


def smith_g1(dist: Array, alpha_x: Array, alpha_y: Array, v: Array, m: Array) -> Array:
    """Smith shadowing-masking for one direction."""
    # Backfacing w.r.t. micronormal -> zero
    back = vm.dot(v, m) * fr.cos_theta(v) <= 0.0
    tt = jnp.abs(fr.tan_theta(v))
    perp = tt < 1e-12  # perpendicular incidence
    alpha = _project_roughness(alpha_x, alpha_y, v)
    # convert phong to equivalent beckmann roughness for G
    alpha_g = jnp.where(dist == PHONG,
                        jnp.sqrt(2.0 / (_phong_exponent(alpha) + 2.0)), alpha)

    a = 1.0 / jnp.maximum(alpha_g * tt, 1e-12)
    # Beckmann/Phong rational fit
    a2 = a * a
    g_beck = jnp.where(a >= 1.6, 1.0,
                       (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2))
    # GGX closed form
    root = alpha_g * tt
    g_ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + root * root))

    g = jnp.where(dist == GGX, g_ggx, g_beck)
    return jnp.where(back, 0.0, jnp.where(perp, 1.0, g))


def smith_g(dist, alpha_x, alpha_y, wi, wo, m):
    return (smith_g1(dist, alpha_x, alpha_y, wi, m)
            * smith_g1(dist, alpha_x, alpha_y, wo, m))


def _sample_all(dist, alpha_x, alpha_y, u: Array):
    """Sample m ~ D(m) cos(theta). Returns (m, pdf)."""
    u0 = jnp.clip(u[..., 0], 1e-7, 1.0 - 1e-7)
    u1 = u[..., 1]
    iso = jnp.abs(alpha_x - alpha_y) < 1e-7

    # azimuth (anisotropic correction per PBRT)
    phi_iso = 2.0 * jnp.pi * u1
    phi_aniso = jnp.arctan(alpha_y / jnp.maximum(alpha_x, 1e-12)
                           * jnp.tan(2.0 * jnp.pi * u1 + 0.5 * jnp.pi))
    phi_aniso = phi_aniso + jnp.where(u1 > 0.5, jnp.pi, 0.0)
    phi = jnp.where(iso, phi_iso, phi_aniso)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    denom = cp ** 2 / jnp.maximum(alpha_x ** 2, 1e-12) + sp ** 2 / jnp.maximum(alpha_y ** 2, 1e-12)

    t2_beck = -jnp.log(1.0 - u0) / jnp.maximum(denom, 1e-12)
    t2_ggx = u0 / jnp.maximum((1.0 - u0) * denom, 1e-12)
    expo = _phong_exponent(alpha_x)
    ct_phong = jnp.power(u0, 1.0 / (expo + 2.0))
    t2_phong = jnp.maximum(1.0 - ct_phong ** 2, 0.0) / jnp.maximum(ct_phong ** 2, 1e-12)

    tan2t = jnp.where(dist == GGX, t2_ggx, jnp.where(dist == PHONG, t2_phong, t2_beck))
    ct = 1.0 / jnp.sqrt(1.0 + tan2t)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    m = jnp.stack([st * cp, st * sp, ct], axis=-1)
    pdf = eval_d(dist, alpha_x, alpha_y, m) * ct
    return m, pdf


def _sample_ggx_visible(wi: Array, alpha_x, alpha_y, u: Array):
    """Heitz 2018 VNDF sampling for GGX. wi must be in the upper hemisphere."""
    # stretch view direction
    v = vm.normalize(jnp.stack([alpha_x * wi[..., 0], alpha_y * wi[..., 1], wi[..., 2]],
                               axis=-1))
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where((lensq > 1e-12)[..., None],
                   jnp.stack([-v[..., 1] * inv, v[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), v.shape))
    t2 = vm.cross(v, t1)
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (p1[..., None] * t1 + p2[..., None] * t2
          + jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))[..., None] * v)
    m = vm.normalize(jnp.stack([alpha_x * nh[..., 0], alpha_y * nh[..., 1],
                                jnp.maximum(nh[..., 2], 1e-6)], axis=-1))
    return m


def pdf_visible(dist, alpha_x, alpha_y, wi, m):
    """pdf of visible-normal sampling: G1(wi) |wi.m| D(m) / |cos(wi)|."""
    ci = jnp.abs(fr.cos_theta(wi))
    return (smith_g1(dist, alpha_x, alpha_y, wi, m) * jnp.abs(vm.dot(wi, m))
            * eval_d(dist, alpha_x, alpha_y, m) / jnp.maximum(ci, 1e-12))


def sample(dist: Array, alpha_x: Array, alpha_y: Array, wi: Array, u: Array,
           sample_visible: bool = True):
    """Sample a micronormal. Returns (m, pdf).

    When sample_visible, GGX lanes use Heitz VNDF (wi flipped into the upper
    hemisphere internally); Beckmann/Phong lanes fall back to D*cos sampling.
    """
    m_all, pdf_all = _sample_all(dist, alpha_x, alpha_y, u)
    if not sample_visible:
        return m_all, pdf_all
    flip = fr.cos_theta(wi) < 0.0
    wi_up = jnp.where(flip[..., None], -wi, wi)
    m_vis = _sample_ggx_visible(wi_up, alpha_x, alpha_y, u)
    pdf_vis = pdf_visible(dist, alpha_x, alpha_y, wi_up, m_vis)
    use_vis = (dist == GGX)
    m = jnp.where(use_vis[..., None], m_vis, m_all)
    pdf = jnp.where(use_vis, pdf_vis, pdf_all)
    return m, pdf


def pdf(dist, alpha_x, alpha_y, wi, m, sample_visible: bool = True):
    pdf_all = eval_d(dist, alpha_x, alpha_y, m) * jnp.abs(fr.cos_theta(m))
    if not sample_visible:
        return pdf_all
    flip = fr.cos_theta(wi) < 0.0
    wi_up = jnp.where(flip[..., None], -wi, wi)
    p_vis = pdf_visible(dist, alpha_x, alpha_y, wi_up, m)
    return jnp.where(dist == GGX, p_vis, pdf_all)
