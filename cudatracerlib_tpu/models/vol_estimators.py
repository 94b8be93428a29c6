"""Volumetric photon-mapping estimators: Point / BeamGrid / BeamBeam.

Reference: ``Integrators/VolEstimators/PointStorage.h:66-193`` (ray-marched
point gather), ``BeamGrid.h:8-135`` (photon "beam radiance estimate": per-cell
photon discs + a DDA camera-ray walk, after Jarosz et al.), and
``Beam.h:63-117`` + ``BeamBeamGrid.h`` (photon beams x camera beam, 1D
kernel). TPU redesign: the atomic linked-list grids become the sort-based
grid (ops/hashgrid.py), the per-thread grid walks become lockstep DDA lanes
(ops/dda.py), and photon-disc insertion becomes 8-way row duplication with
foot-point-cell dedup at query time (no atomics anywhere).

Estimator selection mirrors the reference's template parameter on
``PPPMTracer<VolEstimator>`` — ``PPMTracer(vol_estimator="beamgrid")``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import kernels as kernelsmod
from ..core import vecmath as vm
from ..ops import dda, hashgrid
from ..scene import schema
from . import medium as mediummod
from . import phase as phasemod

Array = jax.Array

VOL_POINT = "point"
VOL_BEAMGRID = "beamgrid"
VOL_BEAMBEAM = "beambeam"


def radiance_beamgrid(scene: schema.SceneData, grid: hashgrid.HashGrid,
                      o: Array, d: Array, t1: Array, radius,
                      max_cells: int = 96, max_per_cell: int = 16):
    """Beam radiance estimate: exact 1D line integral of the 2D kernel over
    each photon disc pierced by the camera ray (reference BeamGrid.h:86-135),
    replacing PointStorage's quadrature marching. Transmittance accumulates
    per visited cell chord (exact for homogeneous media, midpoint rule for
    grids). Photon rows: [pos(3) power(3) wi_prop(3) ...].
    """
    B = o.shape[0]
    r_lane = jnp.full(B, radius)
    lo_m, hi_m = mediummod.media_aabb(scene.media)

    def visit(carry, flat_cell, t_enter, t_exit, alive):
        L, tau = carry
        mid = o + d * (0.5 * (t_enter + t_exit))[:, None]
        sig_a, sig_s, ptype, g = mediummod.sigma_at(scene.media, mid)
        sig_t = sig_a + sig_s
        T_enter = jnp.exp(-tau)

        def accum(L, rows, in_range):
            # K-axis vectorized over the batched cell rows (B, K, W)
            ph_pos, ph_pow, ph_wi = (rows[..., 0:3], rows[..., 3:6],
                                     rows[..., 6:9])
            o_ = o[:, None, :]
            d_ = d[:, None, :]
            t_p = jnp.sum((ph_pos - o_) * d_, axis=-1)           # (B, K)
            foot = o_ + d_ * t_p[..., None]
            foot_cell = hashgrid.cell_of(grid, foot)
            dist = jnp.sqrt(jnp.maximum(
                jnp.sum((ph_pos - foot) ** 2, -1), 0.0))
            ok = (alive[:, None] & in_range & (dist <= r_lane[:, None])
                  & (foot_cell == flat_cell[:, None])   # count each disc once
                  & (t_p >= t_enter[:, None]) & (t_p <= t_exit[:, None]))
            kw = kernelsmod.k(kernelsmod.PERLIN, dist, r_lane[:, None], dim=2)
            # boundary-corrected kernel: renormalize by the kernel-mass
            # fraction inside the medium (density estimation collects no
            # photons past the boundary, biasing slabs dark near faces)
            b_d = jnp.min(jnp.minimum(foot - lo_m, hi_m - foot), axis=-1)
            kw = kw / kernelsmod.boundary_frac(jnp.maximum(b_d, 0.0),
                                               r_lane[:, None], 2)
            ph = phasemod.eval_phase(ptype[:, None], g[:, None], ph_wi,
                                     jnp.broadcast_to(-d_, ph_wi.shape))
            # transmittance from the cell entry to each disc with the CELL's
            # sigma (midpoint rule within the chord; exact for homogeneous
            # media — same accuracy as the tau_segment it replaces there)
            dt_p = jnp.maximum(t_p - t_enter[:, None], 0.0)
            T_p = (T_enter[:, None, :]
                   * jnp.exp(-sig_t[:, None, :] * dt_p[..., None]))
            contrib = ph_pow * (kw * ph)[..., None] * T_p
            return L + jnp.sum(jnp.where(ok[..., None], contrib, 0.0), axis=1)

        L = dda.gather_cell(grid, flat_cell, accum, L, max_per_cell=max_per_cell)
        tau_cell = mediummod.tau_segment(scene.media, o, d, t_enter, t_exit)
        tau = tau + jnp.where(alive[:, None], tau_cell, 0.0)
        return L, tau

    L0 = jnp.zeros((B, 3))
    tau0 = jnp.zeros((B, 3))
    L, tau = dda.dda_walk(grid, o, d, jnp.zeros(B), t1, visit, (L0, tau0),
                          max_cells=max_cells)
    # eye transmittance over the WHOLE segment analytically: exact even when
    # the walk exhausts max_cells or the grid clips the segment (the walked
    # tau only weights the in-scatter terms above)
    Tr = jnp.exp(-mediummod.tau_segment(scene.media, o, d, jnp.zeros(B), t1))
    return L, Tr


def radiance_beambeam(scene: schema.SceneData, beam_grid: hashgrid.HashGrid,
                      o: Array, d: Array, t1: Array, radius,
                      max_cells: int = 96, max_per_cell: int = 16):
    """Photon-beam x camera-beam estimator (reference Beam.h:63-117): for
    each photon beam near the camera ray, the 1D kernel over the closest
    approach between the two segments, divided by the |sin theta| Jacobian.
    Beam rows: [o(3) d(3) t_len(1) power(3) sigma_t(3) ...] — power is the
    throughput at the beam ORIGIN; attenuation to the closest-approach point
    uses the stored sigma_t (exact for homogeneous media).
    """
    B = o.shape[0]
    r_lane = jnp.full(B, radius)
    lo_m, hi_m = mediummod.media_aabb(scene.media)

    def visit(carry, flat_cell, t_enter, t_exit, alive):
        L, tau = carry
        mid = o + d * (0.5 * (t_enter + t_exit))[:, None]
        sig_a, sig_s, ptype, g = mediummod.sigma_at(scene.media, mid)
        sig_t = sig_a + sig_s
        T_enter = jnp.exp(-tau)

        def accum(L, rows, in_range):
            # K-axis vectorized over the batched cell rows (B, K, W)
            bo, bd = rows[..., 0:3], rows[..., 3:6]
            b_len, b_pow, b_sig = (rows[..., 6], rows[..., 7:10],
                                   rows[..., 10:13])
            o_ = o[:, None, :]
            d_ = d[:, None, :]
            # closest approach between ray (o, d) and beam (bo, bd)
            w0 = o_ - bo
            b_ = jnp.sum(d_ * bd, -1)
            c_ = jnp.sum(bd * bd, -1)
            dd_ = jnp.sum(d_ * w0, -1)
            e_ = jnp.sum(bd * w0, -1)
            denom = c_ - b_ * b_                     # a_ == 1 for unit d
            sin2 = jnp.maximum(denom, 1e-8)          # |d x bd|^2 for unit dirs
            s_cam = (b_ * e_ - c_ * dd_) / sin2      # param on camera ray
            t_beam = (e_ - b_ * dd_) / sin2          # param on photon beam
            s_cam_c = jnp.clip(s_cam, 0.0, t1[:, None])
            t_beam_c = jnp.clip(t_beam, 0.0, b_len)
            p_cam = o_ + d_ * s_cam_c[..., None]
            p_beam = bo + bd * t_beam_c[..., None]
            dist = jnp.sqrt(jnp.maximum(
                jnp.sum((p_cam - p_beam) ** 2, -1), 0.0))
            foot_cell = hashgrid.cell_of(beam_grid, p_cam)
            ok = (alive[:, None] & in_range & (dist <= r_lane[:, None])
                  & (foot_cell == flat_cell[:, None])
                  & (s_cam >= 0.0) & (s_cam <= t1[:, None])
                  & (t_beam >= 0.0) & (t_beam <= b_len))
            sin_theta = jnp.sqrt(jnp.clip(sin2, 1e-8, 1.0))
            kw = kernelsmod.k(kernelsmod.PERLIN, dist, r_lane[:, None], dim=1)
            # boundary-corrected 1D kernel (see radiance_beamgrid)
            b_d = jnp.min(jnp.minimum(p_cam - lo_m, hi_m - p_cam), axis=-1)
            kw = kw / kernelsmod.boundary_frac(jnp.maximum(b_d, 0.0),
                                               r_lane[:, None], 1)
            ph = phasemod.eval_phase(ptype[:, None], g[:, None], bd,
                                     jnp.broadcast_to(-d_, bd.shape))
            # camera transmittance from the cell entry with the CELL's sigma
            # (midpoint rule within the chord; exact for homogeneous media)
            dt_c = jnp.maximum(s_cam_c - t_enter[:, None], 0.0)
            T_cam = (T_enter[:, None, :]
                     * jnp.exp(-sig_t[:, None, :] * dt_c[..., None]))
            T_beam = jnp.exp(-b_sig * t_beam_c[..., None])
            # in-scattered sigma_s at the gather point
            contrib = (b_pow * T_beam * T_cam
                       * ((kw * ph / sin_theta)[..., None])
                       * sig_s[:, None, :])
            return L + jnp.sum(jnp.where(ok[..., None], contrib, 0.0), axis=1)

        L = dda.gather_cell(beam_grid, flat_cell, accum, L, max_per_cell=max_per_cell)
        tau_cell = mediummod.tau_segment(scene.media, o, d, t_enter, t_exit)
        tau = tau + jnp.where(alive[:, None], tau_cell, 0.0)
        return L, tau

    L0 = jnp.zeros((B, 3))
    tau0 = jnp.zeros((B, 3))
    L, tau = dda.dda_walk(beam_grid, o, d, jnp.zeros(B), t1, visit, (L0, tau0),
                          max_cells=max_cells)
    # analytic whole-segment transmittance (see radiance_beamgrid)
    Tr = jnp.exp(-mediummod.tau_segment(scene.media, o, d, jnp.zeros(B), t1))
    return L, Tr


def build_beam_cells(beams: Array, valid: Array, radius, lo: Array, hi: Array,
                     max_dim: int = 96, samples_per_beam: int = 16,
                     keep_prob: float = 0.25) -> hashgrid.HashGrid:
    """Rasterize photon beams into the grid: sample points every ~cell along
    each beam and insert the 2x2x2 neighborhood of each sample (covers cells
    within r of the beam axis; reference BeamBeamGrid inserts along a DDA).
    Beam rows: [o(3) d(3) t_len(1) power(3) sigma_t(3) ...].

    Beams are SUBSAMPLED with probability keep_prob and their power scaled by
    1/keep_prob (Jarosz-style unbiased beam thinning): each beam occupies many
    cells, so thinning keeps per-cell occupancy inside the fixed gather budget
    where plain truncation would lose energy."""
    from ..core import rng as rngmod
    N = beams.shape[0]
    if keep_prob < 1.0:
        h = rngmod.pcg_hash(jnp.arange(N, dtype=jnp.uint32) ^ jnp.uint32(0xBEA7))
        keep = (h & jnp.uint32(0xFFFF)).astype(jnp.float32) < keep_prob * 65536.0
        valid = valid & keep
        beams = beams.at[:, 7:10].multiply(1.0 / keep_prob)
    extent = jnp.maximum(hi - lo, 1e-6)
    # grow the cell (never clamp dims) so the grid always covers the medium
    # (see ops/dda.build_ball_grid; advisor finding, round 2)
    cell_size = jnp.maximum(2.0 * radius, jnp.max(extent) / (max_dim - 1))
    dims = jnp.ceil(extent / jnp.maximum(cell_size, 1e-6)).astype(jnp.int32) + 1
    inv_cell = 1.0 / jnp.maximum(cell_size, 1e-6)
    bo, bd, b_len = beams[:, 0:3], beams[:, 3:6], beams[:, 6]
    S = samples_per_beam
    frac = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    pts = bo[:, None, :] + bd[:, None, :] * (b_len[:, None] * frac[None, :])[:, :, None]
    base = jnp.clip(((pts - radius - lo) * inv_cell).astype(jnp.int32),
                    0, dims - 2)                                  # (N,S,3)
    offs = jnp.asarray([[i, j, k] for k in (0, 1) for j in (0, 1) for i in (0, 1)],
                       jnp.int32)
    cc = jnp.clip(base[:, :, None, :] + offs[None, None, :, :], 0, dims - 1)
    cid = (cc[..., 2] * dims[1] + cc[..., 1]) * dims[0] + cc[..., 0]  # (N,S,8)
    cid = cid.reshape(N, S * 8)
    # drop duplicates within each beam (sorted-run trick: sort per beam,
    # invalidate equal neighbors)
    cid_sorted = jnp.sort(cid, axis=1)
    dup = jnp.concatenate([jnp.zeros((N, 1), bool),
                           cid_sorted[:, 1:] == cid_sorted[:, :-1]], axis=1)
    cid_final = jnp.where(valid[:, None] & ~dup, cid_sorted, jnp.int32(0x7FFFFFFF))
    cid_flat = cid_final.reshape(-1)
    order = jnp.argsort(cid_flat)
    dataR = jnp.repeat(beams, S * 8, axis=0)
    sorted_rows = jnp.take(dataR, order, axis=0)
    return hashgrid.HashGrid(data=sorted_rows,
                             cell_ids=jnp.take(cid_flat, order),
                             lo=lo, inv_cell=inv_cell, dims=dims,
                             data_t=sorted_rows.T)
