"""Participating media: homogeneous + voxel-grid volumes.

Reference: ``SceneTypes/Volumes.h`` (HomogeneousVolumeDensity, VolumeGrid,
KernelAggregateVolume with IntersectP/sigma_a/sigma_s/tau/sampleDistance).
TPU-native: instead of per-volume virtual calls, sigma queries sum over all
volume rows (<= a few) with containment masks; heterogeneous media use
null-collision (delta/ratio) tracking against a precomputed scene majorant —
fixed-iteration fori loops instead of data-dependent marching.

MediumTable.params layout:
  [0:3] sigma_a  [3:6] sigma_s  [6] phase_type  [7] phase_g  [8] density scale
  [9:12] Le (emission)
grid_offset[v] = (off_density, off_le, unused); -1 -> constant.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from ..core import vecmath as vm
from ..scene import schema

Array = jax.Array

MED_HOMOGENEOUS = 0
MED_GRID = 1
MAX_TRACKING_STEPS = 256


def has_media(media: schema.MediumTable) -> bool:
    return media.med_type.shape[0] > 0


def media_aabb(media: schema.MediumTable):
    """World-space AABB union of all media volumes (unit cube x to_world)."""
    corners = jnp.asarray([[x, y, z, 1.0] for x in (0, 1) for y in (0, 1)
                           for z in (0, 1)], jnp.float32)          # (8, 4)
    pts = jnp.einsum("vij,cj->vci", media.to_world, corners)[..., :3]
    return pts.min(axis=(0, 1)), pts.max(axis=(0, 1))


def _density_at(media: schema.MediumTable, v: int, p_local: Array) -> Array:
    """Trilinear density lookup for grid volume row v at local [0,1]^3 coords."""
    dim = media.grid_dim[v]
    off = media.grid_offset[v, 0]
    nx, ny, nz = dim[0], dim[1], dim[2]
    x = jnp.clip(p_local[..., 0] * (nx.astype(jnp.float32) - 1), 0, nx.astype(jnp.float32) - 1)
    y = jnp.clip(p_local[..., 1] * (ny.astype(jnp.float32) - 1), 0, ny.astype(jnp.float32) - 1)
    z = jnp.clip(p_local[..., 2] * (nz.astype(jnp.float32) - 1), 0, nz.astype(jnp.float32) - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx, fy, fz = x - x0, y - y0, z - z0

    def fetch(xi, yi, zi):
        xi = jnp.minimum(xi, nx - 1)
        yi = jnp.minimum(yi, ny - 1)
        zi = jnp.minimum(zi, nz - 1)
        return jnp.take(media.voxels, off + (zi * ny + yi) * nx + xi)

    c000 = fetch(x0, y0, z0); c100 = fetch(x0 + 1, y0, z0)
    c010 = fetch(x0, y0 + 1, z0); c110 = fetch(x0 + 1, y0 + 1, z0)
    c001 = fetch(x0, y0, z0 + 1); c101 = fetch(x0 + 1, y0, z0 + 1)
    c011 = fetch(x0, y0 + 1, z0 + 1); c111 = fetch(x0 + 1, y0 + 1, z0 + 1)
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    return (c00 * (1 - fy) + c10 * fy) * (1 - fz) + (c01 * (1 - fy) + c11 * fy) * fz


def sigma_at(media: schema.MediumTable, p: Array):
    """Total (sigma_a, sigma_s, phase_type, phase_g) at world points p (B,3).

    Sums contributions of all volumes containing p; the phase function of the
    highest-index containing volume wins (media are rarely overlapped).
    """
    B = p.shape[0]
    sig_a = jnp.zeros((B, 3))
    sig_s = jnp.zeros((B, 3))
    ptype = jnp.zeros(B, jnp.int32)
    g = jnp.zeros(B)
    V = media.med_type.shape[0]
    for v in range(V):
        w2l = media.world_to[v]
        pl = vm.transform_point(w2l, p)  # local unit-cube coords in [0,1]^3
        inside = jnp.all((pl >= 0.0) & (pl <= 1.0), axis=-1)
        dens = jnp.where(media.med_type[v] == MED_GRID,
                         _density_at(media, v, pl), 1.0) * media.params[v, 8]
        sa = media.params[v, 0:3] * dens[..., None]
        ss = media.params[v, 3:6] * dens[..., None]
        sig_a = sig_a + jnp.where(inside[..., None], sa, 0.0)
        sig_s = sig_s + jnp.where(inside[..., None], ss, 0.0)
        ptype = jnp.where(inside, media.params[v, 6].astype(jnp.int32), ptype)
        g = jnp.where(inside, media.params[v, 7], g)
    return sig_a, sig_s, ptype, g


def tau_segment(media: schema.MediumTable, o: Array, d: Array,
                t0: Array, t1: Array, grid_samples: int = 2) -> Array:
    """Optical depth of ray segments [t0, t1] — EXACT for homogeneous media
    (analytic chord clipping against each volume's unit cube), midpoint-rule
    (grid_samples points) for density grids. Used by the DDA estimators'
    per-cell transmittance so medium boundaries don't suffer the boundary
    quantization of sigma-at-midpoint x chord."""
    B = o.shape[0]
    tau = jnp.zeros((B, 3))
    V = media.med_type.shape[0]
    seg = jnp.maximum(t1 - t0, 0.0)
    for v in range(V):
        w2l = media.world_to[v]
        ol = vm.transform_point(w2l, o)
        dl = vm.transform_vector(w2l, d)
        safe = jnp.where(jnp.abs(dl) < 1e-12,
                         jnp.where(dl >= 0, 1e-12, -1e-12), dl)
        ta = (0.0 - ol) / safe
        tb = (1.0 - ol) / safe
        t_in = jnp.maximum(jnp.max(jnp.minimum(ta, tb), -1), t0)
        t_out = jnp.minimum(jnp.min(jnp.maximum(ta, tb), -1), t1)
        ell = jnp.maximum(t_out - t_in, 0.0)
        sig_t = media.params[v, 0:3] + media.params[v, 3:6]
        if True:  # homogeneous fast path; grids sample density along the chord
            is_grid = media.med_type[v] == MED_GRID
            dens = jnp.ones(B)
            # average density over grid_samples points of the clipped chord
            dens_g = jnp.zeros(B)
            for s in range(grid_samples):
                t_s = t_in + ell * ((s + 0.5) / grid_samples)
                pl = ol + dl * t_s[:, None]
                dens_g = dens_g + _density_at(media, v, jnp.clip(pl, 0.0, 1.0))
            dens = jnp.where(is_grid, dens_g / grid_samples, dens)
        tau = tau + (sig_t * media.params[v, 8])[None, :] * (dens * ell)[:, None]
    return tau


def majorant(media: schema.MediumTable) -> Array:
    """Scalar upper bound on sigma_t anywhere (host-precomputable; cheap)."""
    V = media.med_type.shape[0]
    if V == 0:
        return jnp.float32(0.0)
    base = (media.params[:, 0:3] + media.params[:, 3:6]).max(-1) * media.params[:, 8]
    vox_max = jnp.maximum(jnp.max(media.voxels), 0.0)  # conservative grid bound
    st = jnp.where(media.med_type == MED_GRID, base * vox_max, base)
    return jnp.sum(st)  # overlapping volumes: sum of bounds


class MediumSample(NamedTuple):
    valid: Array    # (B,) interaction happened before t_max
    t: Array        # (B,)
    p: Array        # (B, 3)
    weight: Array   # (B, 3) throughput factor (sigma_s * T / pdf for events,
    #                 T / P_surface for pass-through)
    ptype: Array    # (B,) phase type at event
    g: Array        # (B,)


def sample_distance(media: schema.MediumTable, o: Array, d: Array, t_max: Array,
                    state: Array, active: Array) -> tuple:
    """Delta-tracking distance sampling through the aggregate medium.

    Returns (MediumSample, state). For lanes with no interaction the weight is
    the (unbiased) transmittance-over-probability factor, which for perfect
    importance sampling is 1 — delta tracking achieves this for scalar
    majorants; chromatic sigma uses the spectral ratio at accepted events.
    """
    B = o.shape[0]
    maj = jnp.maximum(majorant(media), 1e-6)

    def body(carry):
        it, t, done, escaped, state, w, p_ev, pt_ev, g_ev = carry
        state, u1 = rngmod.next_float(state)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) / maj
        esc_now = t_new >= t_max
        p = o + d * jnp.minimum(t_new, t_max)[..., None]
        sig_a, sig_s, ptype, g = sigma_at(media, p)
        sig_t_spec = sig_a + sig_s
        # Spectral next-flight tracking: choose SCATTER with the scalar
        # probability max_c sigma_s / maj; everything else (true null AND
        # absorption) continues as a weighted null so chromatic absorption
        # stays unbiased per channel.
        p_scat = jnp.clip(sig_s.max(-1) / maj, 0.0, 1.0)
        state, u2 = rngmod.next_float(state)
        scat = u2 < p_scat
        ev_now = ~done & ~esc_now & scat
        null_now = ~done & ~esc_now & ~scat
        done_new = done | esc_now | ev_now
        w_scat = sig_s / jnp.maximum(maj * p_scat, 1e-9)[..., None]
        w_null = jnp.maximum(1.0 - sig_t_spec / maj, 0.0) \
            / jnp.maximum(1.0 - p_scat, 1e-6)[..., None]
        w = jnp.where(ev_now[..., None], w * w_scat,
                      jnp.where(null_now[..., None], w * w_null, w))
        p_ev = jnp.where(ev_now[..., None], p, p_ev)
        pt_ev = jnp.where(ev_now, ptype, pt_ev)
        g_ev = jnp.where(ev_now, g, g_ev)
        return (it + 1, jnp.where(done, t, t_new), done_new,
                escaped | (esc_now & ~done), state, w, p_ev, pt_ev, g_ev)

    def cond(carry):
        return (carry[0] < MAX_TRACKING_STEPS) & jnp.any(~carry[2] & active)

    init = (jnp.int32(0), jnp.zeros(B), ~active, jnp.zeros(B, bool), state,
            jnp.ones((B, 3)), o, jnp.zeros(B, jnp.int32), jnp.zeros(B))
    it, t, done, escaped, state, w, p_ev, pt_ev, g_ev = jax.lax.while_loop(cond, body, init)
    interacted = active & done & ~escaped
    # escaped lanes keep their accumulated null-collision corrections
    ms = MediumSample(valid=interacted, t=t, p=p_ev,
                      weight=jnp.where(active[..., None], w, 1.0),
                      ptype=pt_ev, g=g_ev)
    return ms, state


def transmittance(media: schema.MediumTable, o: Array, d: Array, t_max: Array,
                  state: Array, active: Array) -> tuple:
    """Ratio-tracking transmittance estimate along shadow segments."""
    B = o.shape[0]
    maj = jnp.maximum(majorant(media), 1e-6)

    def body(carry):
        it, t, done, state, T = carry
        state, u1 = rngmod.next_float(state)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) / maj
        esc = t_new >= t_max
        p = o + d * jnp.minimum(t_new, t_max)[..., None]
        sig_a, sig_s, _, _ = sigma_at(media, p)
        sig_t = sig_a + sig_s
        factor = jnp.maximum(1.0 - sig_t / maj, 0.0)
        T = jnp.where((~done & ~esc)[..., None], T * factor, T)
        return it + 1, t_new, done | esc, state, T

    def cond(carry):
        return (carry[0] < MAX_TRACKING_STEPS) & jnp.any(~carry[2] & active)

    init = (jnp.int32(0), jnp.zeros(B), ~active, state, jnp.ones((B, 3)))
    it, t, done, state, T = jax.lax.while_loop(cond, body, init)
    return jnp.where(active[..., None], T, 1.0), state
