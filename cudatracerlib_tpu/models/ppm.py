"""Progressive photon mapping (surface + volumetric estimators).

Reference: ``Integrators/ProgressivePhotonMapping/PPPMTracer*`` — photon pass
filling hash-grid maps via `ParticleProcess` walks, eye pass gathering with
progressively shrinking radii (alpha = 2/3 schedule,
`PhotonMapHelper.h:16-21`). TPU-native: the photon pass is a lockstep light
walk whose stored photons are sorted into a dense hash grid (ops/hashgrid.py);
the eye pass walks camera paths to their first diffuse vertex (through
specular chains) and gathers over the 2x2x2 cell neighborhood with fixed
photon budgets; volumetric radiance uses ratio-tracked single scattering with
photon gathers at sampled medium points (the reference's PointStorage
estimator, redesigned without atomics).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import kernels as kernelsmod
from ..core import records
from ..core import rng as rngmod
from ..core import vecmath as vm
from ..ops import hashgrid, shading, traversal, traversal8
from ..scene import schema
from . import bsdf as bsdfmod
from . import film as filmmod
from . import lights as lightsmod
from . import medium as mediummod
from . import phase as phasemod
from . import tracer

Array = jax.Array

# photon row: [pos(3), power(3), wi(3), normal(3)] = 12 floats
PHOTON_K = 12


def trace_photons(scene: schema.SceneData, n_photons: int, pass_idx, state_seed,
                  max_depth: int, active_types, store_medium: bool = False,
                  collect_beams: bool = False, photon_ids: Array = None,
                  total_photons: int = None):
    """Light walk storing photons at diffuse-ish surface hits (and medium
    events when store_medium). Returns (rows (N*D, 12), valid) — plus
    (beams (N*D, 16), beams_valid) when collect_beams: one photon beam per
    traversed medium segment (reference Beam.h photon-beam storage), rows
    [o(3) d(3) t_len(1) power(3) sigma_t(3) pad(3)] with power = throughput
    at the segment origin."""
    B = n_photons
    if photon_ids is None:
        photon_ids = jnp.arange(B, dtype=jnp.int32)
    state = rngmod.seed(photon_ids, pass_idx, state_seed)
    er, state = lightsmod.sample_emitter_ray(scene, state)
    beta = er.power / float(total_photons or B)
    rays = traversal.Rays(o=er.o + er.d * 1e-4, d=er.d,
                          tmin=jnp.zeros(B), tmax=jnp.full(B, 1e30))
    active = jnp.ones(B, bool)
    with_media = store_medium and mediummod.has_media(scene.media)
    rows_out, valid_out = [], []
    beams_out, beams_valid_out = [], []

    for depth in range(max_depth):
        trace_rays = rays._replace(tmax=jnp.where(active, rays.tmax, 0.0))
        hit = traversal8.intersect_scene(scene.geom, trace_rays)

        if with_media:
            t_seg = jnp.where(hit.valid, hit.t * 0.999, 1e7)
            beta_seg = beta
            ms, state = mediummod.sample_distance(scene.media, rays.o, rays.d,
                                                  t_seg, state, active)
            beta = beta * ms.weight
            med_event = ms.valid
            med_row = jnp.concatenate([ms.p, beta, -rays.d, jnp.zeros((B, 3))], -1)
            rows_out.append(med_row)
            valid_out.append(med_event)
            if collect_beams:
                # clip the beam to the media AABB: only the in-medium part
                # scatters, and bounded length keeps the grid rasterization
                # (build_beam_cells) dense enough to cover every cell
                lo_m, hi_m = mediummod.media_aabb(scene.media)
                inv = 1.0 / jnp.where(jnp.abs(rays.d) < 1e-12, 1e-12, rays.d)
                ta = (lo_m - rays.o) * inv
                tb = (hi_m - rays.o) * inv
                t_in = jnp.maximum(jnp.max(jnp.minimum(ta, tb), axis=-1), 0.0)
                t_out = jnp.min(jnp.maximum(ta, tb), axis=-1)
                t_end = jnp.where(med_event, ms.t,
                                  jnp.where(hit.valid, hit.t, t_out))
                t_end = jnp.minimum(t_end, t_out)
                b_len = jnp.maximum(t_end - t_in, 0.0)
                b_o = rays.o + rays.d * t_in[:, None]
                sa0, ss0, _, _ = mediummod.sigma_at(
                    scene.media, b_o + rays.d * 1e-4)
                beam = jnp.concatenate(
                    [b_o, rays.d, b_len[:, None], beta_seg, sa0 + ss0,
                     jnp.zeros((B, 3))], -1)
                beams_out.append(beam)
                beams_valid_out.append(active & (b_len > 0))
        else:
            med_event = jnp.zeros(B, bool)

        si = shading.fill_dg(scene.geom, trace_rays, hit, flip_to_ray=False)
        alive = active & hit.valid & ~med_event
        ctx = bsdfmod.gather_ctx(scene, si.mat_id, si.uv)
        # store photons only on surfaces with a smooth (non-delta) component
        storable = alive & ~bsdfmod.is_delta_only(ctx)
        row = jnp.concatenate([si.p, beta, si.wi, si.ns], axis=-1)
        rows_out.append(row)
        valid_out.append(storable)

        frame = si.frame()
        wi_local = frame.to_local(si.wi)
        s, state = bsdfmod.sample_with_rng(ctx, wi_local, state, active_types)
        wo_world = frame.to_world(s.wo)
        beta2 = beta * s.weight
        cont = alive & (jnp.max(jnp.abs(s.weight), -1) > 0)
        if with_media:
            state, u_ph = rngmod.next_float2(state)
            wo_ph, w_ph, _ = phasemod.sample_phase(ms.ptype, ms.g, rays.d, u_ph)
            wo_world = jnp.where(med_event[:, None], wo_ph, wo_world)
            beta2 = jnp.where(med_event[:, None], beta * w_ph[:, None], beta2)
            cont = cont | med_event
        state, u_rr = rngmod.next_float(state)
        q = jnp.clip(jnp.max(beta2, -1), 0.05, 0.95)
        do_rr = depth >= 2
        survive = jnp.where(do_rr, u_rr < q, True)
        beta = jnp.where((do_rr & survive)[:, None],
                         beta2 / jnp.maximum(q, 1e-6)[:, None], beta2)
        active = cont & survive
        surf_o = shading.offset_ray_origin(si.p, si.ng, wo_world)
        new_o = jnp.where(med_event[:, None], ms.p, surf_o) if with_media else surf_o
        rays = traversal.Rays(o=new_o, d=wo_world,
                              tmin=jnp.zeros(B), tmax=jnp.full(B, 1e30))

    if collect_beams:
        return (jnp.concatenate(rows_out, 0), jnp.concatenate(valid_out, 0),
                jnp.concatenate(beams_out, 0), jnp.concatenate(beams_valid_out, 0))
    return jnp.concatenate(rows_out, 0), jnp.concatenate(valid_out, 0)


def diffuse_albedo(ctx: bsdfmod.BsdfCtx) -> Array:
    """Diffuse reflectance used for the gather-time BRDF approximation
    (photon gathering at non-delta vertices; the glossy part of the transport
    is carried by the eye walk and the photon directions)."""
    t = ctx.mat_type
    # plastics/phong/ward keep their diffuse color in c1
    use_c1 = ((t == schema.BSDF_PLASTIC) | (t == schema.BSDF_ROUGHPLASTIC)
              | (t == schema.BSDF_PHONG) | (t == schema.BSDF_WARD))
    return jnp.where(use_c1[:, None], ctx.c1, ctx.c0)


def transmittance_det(scene: schema.SceneData, o, d, t_max, n_steps: int = 16):
    """Deterministic transmittance along segments — analytic chord clipping
    per volume (exact for homogeneous media; grids sample the density),
    via medium.tau_segment."""
    del n_steps
    B = o.shape[0]
    return jnp.exp(-mediummod.tau_segment(scene.media, o, d, jnp.zeros(B), t_max))


def volumetric_radiance(scene: schema.SceneData, grid: hashgrid.HashGrid,
                        o, d, t_max, radius, n_steps: int = 16):
    """Ray-march in-scattered radiance from the medium photon map along
    camera segments (reference PointStorage::L_Volume ray-marched gather):
    L = sum_k dt * T(0,t_k) * sum_p K3(|x_k - x_p|, r) beta_p phase(w_p -> -d).
    Transmittance accumulates deterministically from sigma_t at the samples."""
    B = o.shape[0]
    dt = t_max / n_steps
    L = jnp.zeros((B, 3))
    tau = jnp.zeros((B, 3))
    r_lane = jnp.full(B, radius)
    lo_m, hi_m = mediummod.media_aabb(scene.media)
    for k in range(n_steps):
        t_k = (k + 0.5) * dt
        p_k = o + d * t_k[:, None]
        # boundary-corrected 3D kernel (see core/kernels.boundary_frac)
        b_d = jnp.min(jnp.minimum(p_k - lo_m, hi_m - p_k), axis=-1)
        corr = 1.0 / kernelsmod.boundary_frac(jnp.maximum(b_d, 0.0), r_lane, 3)
        sig_a, sig_s, ptype, g = mediummod.sigma_at(scene.media, p_k)
        # exact optical depth up to the sample (analytic chord clipping)
        T = jnp.exp(-(tau + mediummod.tau_segment(scene.media, o, d,
                                                  k * dt, t_k)))

        def accum(carry, rows, mask):
            # K-axis vectorized over the batched neighborhood (B, K, W)
            ph_pow, ph_wi = rows[..., 3:6], rows[..., 6:9]
            is_med = jnp.all(rows[..., 9:12] == 0.0, axis=-1)  # medium photons
            ok = mask & is_med
            dist = jnp.sqrt(jnp.maximum(
                jnp.sum((rows[..., 0:3] - p_k[:, None, :]) ** 2, -1), 0.0))
            kw = (kernelsmod.k(kernelsmod.PERLIN, dist, r_lane[:, None], dim=3)
                  * corr[:, None])
            ph = phasemod.eval_phase(ptype[:, None], g[:, None], ph_wi,
                                     jnp.broadcast_to(-d[:, None, :],
                                                      ph_wi.shape))
            contrib = ph_pow * (kw * ph)[..., None]
            return carry + jnp.sum(jnp.where(ok[..., None], contrib, 0.0),
                                   axis=1)

        inscatter = hashgrid.gather_neighbors(grid, p_k, r_lane, accum,
                                              jnp.zeros((B, 3)), max_per_cell=4)
        L = L + T * inscatter * dt[:, None]
        tau = tau + mediummod.tau_segment(scene.media, o, d, k * dt,
                                          (k + 1) * dt)
    return L


def eye_pass(scene: schema.SceneData, film: filmmod.Film, grid: hashgrid.HashGrid,
             vol_grid, pass_idx, w: int, h: int, radius, n_emitted: float,
             max_depth: int, active_types, kernel_type: int = kernelsmod.PERLIN,
             with_volume: bool = False, vol_est: str = "beamgrid",
             vol_max_per_cell: int = 16, ppm_state=None, alpha: float = 2.0 / 3.0,
             final_gather: bool = False, pixel_idx: Array = None):
    """Camera walk to the first smooth vertex (through specular chains), then
    one density-estimation gather at that vertex. Direct emission is added
    analytically (hit emitters / env).

    With ppm_state (PixelStats) the gather uses per-pixel adaptive kNN radii
    with Hachisuka's progressive statistics (reference PPPMTracer.h:29-146:
    per-pixel density-derived radii instead of one global schedule); the
    gathered flux accumulates in the state's tau and the function returns
    (film, new_state). With final_gather the walk samples ONE extra bounce at
    the first smooth vertex and density-estimates there instead, while the
    vertex itself gets NEE direct lighting (PPPMTracer_EyePass.cu:16-40).
    pixel_idx restricts the walk to a pixel subset (multi-chip sharding)."""
    adaptive = ppm_state is not None
    if pixel_idx is None:
        pixel_idx = jnp.arange(w * h, dtype=jnp.int32)
    B = pixel_idx.shape[0]
    rays, px, py, state, wt = tracer.gen_camera_rays(scene, pixel_idx, 0, pass_idx, w, h)
    L = jnp.zeros((B, 3))
    beta = jnp.ones((B, 3))
    active = jnp.ones(B, bool)
    gathered = jnp.zeros(B, bool)
    # stored gather vertex
    gv_p = jnp.zeros((B, 3))
    gv_ns = jnp.zeros((B, 3))
    gv_albedo = jnp.zeros((B, 3))
    gv_beta = jnp.zeros((B, 3))

    n_smooth = jnp.zeros(B, jnp.int32)
    for depth in range(max_depth):
        trace_rays = rays._replace(tmax=jnp.where(active, rays.tmax, 0.0))
        hit = traversal8.intersect_scene(scene.geom, trace_rays)
        if with_volume:
            # inactive lanes get a ZERO-length segment: their in-scatter is
            # masked out below anyway, but a nonzero t_seg kept them walking
            # the whole grid inside dda_walk (the gather is paid per
            # iteration whether lanes are masked or not) — at bounce depths
            # where most rays have terminated that was almost all the work.
            # Their beta decays to whatever exp(-tau) says, which is never
            # read again (active never resurrects).
            t_seg = jnp.where(hit.valid, hit.t,
                              2.0 * jnp.max(scene.world_hi - scene.world_lo))
            t_seg = jnp.where(active, t_seg, 0.0)
            # in-scattered radiance gathered along this segment, then
            # attenuate the throughput. Estimator selection mirrors the
            # reference's PPPMTracer<VolEstimator> template parameter.
            from . import vol_estimators as ve
            if vol_est == ve.VOL_BEAMGRID:
                Lv, Tr = ve.radiance_beamgrid(scene, vol_grid, rays.o, rays.d,
                                              t_seg, radius,
                                              max_per_cell=vol_max_per_cell)
                L = L + jnp.where(active[:, None], beta * Lv, 0.0)
                beta = beta * Tr
            elif vol_est == ve.VOL_BEAMBEAM:
                Lv, Tr = ve.radiance_beambeam(scene, vol_grid, rays.o, rays.d,
                                              t_seg, radius,
                                              max_per_cell=vol_max_per_cell)
                L = L + jnp.where(active[:, None], beta * Lv, 0.0)
                beta = beta * Tr
            else:  # PointStorage: quadrature marching with 3D-kernel gathers
                n_march = 16 if depth == 0 else 8
                Lv = volumetric_radiance(scene, vol_grid, rays.o, rays.d, t_seg,
                                         radius, n_steps=n_march)
                L = L + jnp.where(active[:, None], beta * Lv, 0.0)
                beta = beta * transmittance_det(scene, rays.o, rays.d, t_seg)
        miss = active & ~hit.valid
        env = lightsmod.eval_environment(scene, rays.d)
        env_ok = miss & ((n_smooth == 0) if final_gather else True)
        L = L + jnp.where(env_ok[:, None], beta * env, 0.0)
        si = shading.fill_dg(scene.geom, trace_rays, hit, flip_to_ray=False)
        alive = active & hit.valid
        le = lightsmod.eval_hit_emitter(scene, si.light_id, si.ng, si.wi)
        # with final gathering, emission past the first smooth vertex is
        # already estimated by that vertex's NEE
        le_ok = alive & ((n_smooth == 0) if final_gather else True)
        L = L + jnp.where(le_ok[:, None], beta * le, 0.0)

        ctx = bsdfmod.gather_ctx(scene, si.mat_id, si.uv)
        frame = si.frame()
        wi_local = frame.to_local(si.wi)
        is_smooth = ~bsdfmod.is_delta_only(ctx)
        smooth_hit = alive & is_smooth
        n_smooth2 = n_smooth + smooth_hit.astype(jnp.int32)
        if final_gather:
            gather_here = smooth_hit & (n_smooth2 >= 2) & ~gathered
            nee_here = smooth_hit & (n_smooth2 == 1)
            ed, state = lightsmod.sample_emitter_direct(scene, si.p, state)
            wo_nee = frame.to_local(ed.d)
            lob = bsdfmod.evaluate(ctx, wi_local, wo_nee, active_types)
            do_sh = nee_here & (vm.length_sqr(lob.f) > 0)
            shadow = traversal.Rays(
                o=shading.offset_ray_origin(si.p, si.ng, ed.d), d=ed.d,
                tmin=jnp.zeros(B), tmax=jnp.where(do_sh, ed.dist * 0.999, 0.0))
            occ = traversal8.intersect_scene(scene.geom, shadow, any_hit=True).valid
            L = L + jnp.where((nee_here & ~occ)[:, None],
                              beta * lob.f * ed.radiance_over_pdf, 0.0)
        else:
            gather_here = smooth_hit & ~gathered
        n_smooth = n_smooth2
        gv_p = jnp.where(gather_here[:, None], si.p, gv_p)
        gv_ns = jnp.where(gather_here[:, None], si.ns, gv_ns)
        gv_albedo = jnp.where(gather_here[:, None], diffuse_albedo(ctx), gv_albedo)
        gv_beta = jnp.where(gather_here[:, None], beta, gv_beta)
        gathered = gathered | gather_here

        # continue through delta surfaces (and, with final gathering, one
        # sampled bounce past the first smooth vertex)
        s, state = bsdfmod.sample_with_rng(ctx, wi_local, state, active_types)
        wo_world = frame.to_world(s.wo)
        beta = beta * s.weight
        active = alive & ~gathered & (jnp.max(jnp.abs(s.weight), -1) > 0)
        rays = traversal.Rays(o=shading.offset_ray_origin(si.p, si.ng, wo_world),
                              d=wo_world, tmin=jnp.zeros(B), tmax=jnp.full(B, 1e30))

    inv_pi = 1.0 / jnp.pi
    if adaptive:
        # ---- per-pixel adaptive kNN radii (stochastic progressive PM) ----
        r_lane = jnp.sqrt(jnp.maximum(ppm_state.r2, 1e-20))

        def accum_a(carry, rows, mask):
            # K-axis vectorized over the batched neighborhood (B, K, W)
            flux, M = carry
            ph_pos, ph_pow, ph_wi, ph_n = (rows[..., 0:3], rows[..., 3:6],
                                           rows[..., 6:9], rows[..., 9:12])
            ns_ = gv_ns[:, None, :]
            d2 = jnp.sum((ph_pos - gv_p[:, None, :]) ** 2, -1)
            ok = (mask & (jnp.sum(ph_n * ns_, -1) > 0.5)
                  & (jnp.sum(ph_wi * ns_, -1) > 0.0)
                  & (d2 <= (r_lane * r_lane)[:, None]))
            # smooth-kernel flux in Hachisuka's count units (K2 * pi r^2)
            kw = (kernelsmod.k(kernel_type, jnp.sqrt(jnp.maximum(d2, 0.0)),
                               r_lane[:, None], dim=2)
                  * (jnp.pi * r_lane * r_lane)[:, None])
            flux = flux + jnp.sum(
                jnp.where(ok[..., None], ph_pow * kw[..., None], 0.0), axis=1)
            return flux, M + jnp.sum(ok.astype(jnp.float32), axis=1)

        flux, M = hashgrid.gather_neighbors(
            grid, gv_p, r_lane, accum_a, (jnp.zeros((B, 3)), jnp.zeros(B)))
        # outgoing radiance numerator; the 1/(pi r^2 n_passes) lives in develop
        flux = jnp.where(gathered[:, None],
                         flux * gv_albedo * inv_pi * gv_beta, 0.0)
        M = jnp.where(gathered, M, 0.0)
        N = ppm_state.n
        ratio = jnp.where(M > 0, (N + alpha * M) / jnp.maximum(N + M, 1e-9), 1.0)
        new_state = PixelStats(r2=ppm_state.r2 * ratio,
                               n=N + alpha * M,
                               tau=(ppm_state.tau + flux) * ratio[:, None])
        film = filmmod.add_samples(film, px, py, L * wt)
        return film, new_state

    # ---- single kernel-weighted gather at the stored vertices ----
    r_lane = jnp.full(B, radius)

    def accum(carry, rows, mask):
        # K-axis vectorized over the batched neighborhood (B, K, W)
        ph_pos, ph_pow, ph_wi, ph_n = (rows[..., 0:3], rows[..., 3:6],
                                       rows[..., 6:9], rows[..., 9:12])
        ns_ = gv_ns[:, None, :]
        ok = (mask & (jnp.sum(ph_n * ns_, -1) > 0.5)
              & (jnp.sum(ph_wi * ns_, -1) > 0.0))
        d = jnp.sqrt(jnp.maximum(
            jnp.sum((ph_pos - gv_p[:, None, :]) ** 2, -1), 0.0))
        k = kernelsmod.k(kernel_type, d, r_lane[:, None], dim=2)
        contrib = ph_pow * k[..., None]
        return carry + jnp.sum(jnp.where(ok[..., None], contrib, 0.0), axis=1)

    flux = hashgrid.gather_neighbors(grid, gv_p, r_lane, accum, jnp.zeros((B, 3)))
    Lg = gv_albedo * inv_pi * flux
    L = L + jnp.where(gathered[:, None], gv_beta * Lg, 0.0)

    return filmmod.add_samples(film, px, py, L * wt)


class PixelStats(NamedTuple):
    """Per-pixel progressive photon-mapping statistics (Hachisuka SPPM;
    reference PPPMTracer.h k_AdaptiveStruct): squared gather radius, photon
    count (alpha-weighted), accumulated flux numerator tau."""
    r2: Array    # (P,)
    n: Array     # (P,)
    tau: Array   # (P, 3)


def _is_medium_row(rows: Array) -> Array:
    return jnp.all(rows[:, 9:12] == 0.0, axis=-1)  # medium photons: normal = 0


def _build_surface_grid(rows, valid, lo, hi, cell):
    keep = valid & ~_is_medium_row(rows)
    return hashgrid.build_grid(rows, rows[:, 0:3], keep, lo, hi, cell)


def _build_vol_grid_point(rows, valid, lo, hi, cell):
    keep = valid & _is_medium_row(rows)
    return hashgrid.build_grid(rows, rows[:, 0:3], keep, lo, hi, cell)


def _build_vol_grid_ball(rows, valid, radius, lo, hi):
    from ..ops import dda
    keep = valid & _is_medium_row(rows)
    # store only the 9 columns the beam estimator reads (pos/power/wi): the
    # eye pass gathers B*max_cells*max_per_cell rows per depth, and gather
    # cost on TPU is per-element — 12->9 is a straight 25% cut
    # (tools/microbench_beamgrid.py measured the gather, not the walk or the
    # math, as ~82% of radiance_beamgrid)
    return dda.build_ball_grid(rows[:, 0:9], rows[:, 0:3], keep, radius, lo, hi)


class PPMTracer(tracer.TracerBase):
    """Progressive photon mapper (reference PPPMTracer). The volumetric
    estimator is selectable like the reference's template parameter:
    "point" (PointStorage marching), "beamgrid" (photon-disc beam radiance
    estimate, default), or "beambeam" (photon beams x camera beam)."""

    def __init__(self, scene, width, height, n_photons: Optional[int] = None,
                 max_depth: int = 6, initial_radius: Optional[float] = None,
                 alpha: float = 2.0 / 3.0, seed: int = 0,
                 active_types: Optional[Sequence[int]] = None,
                 vol_estimator: str = "beamgrid",
                 vol_max_per_cell: Optional[int] = None,
                 adaptive_radii: bool = False, final_gather: bool = False):
        super().__init__(scene, width, height, seed=seed)
        from . import path as pathmod
        import numpy as np
        self.max_depth = max_depth
        self.n_photons = n_photons or (width * height)
        self.alpha = alpha
        if active_types is None:
            active_types = pathmod.scene_active_types(scene)
        self.active_types = tuple(active_types)
        if initial_radius is None:
            meta = schema.host_meta(scene)
            diag = float(np.linalg.norm(meta["world_hi"] - meta["world_lo"]))
            initial_radius = diag * 0.01
        self.radius = float(initial_radius)
        self.photons_emitted = 0
        self.with_volume = mediummod.has_media(scene.media)
        self.vol_est = vol_estimator if self.with_volume else "point"
        collect_beams = self.with_volume and vol_estimator == "beambeam"
        self._collect_beams = collect_beams
        self._trace_jit = jax.jit(partial(
            trace_photons, n_photons=self.n_photons, state_seed=0x9907,
            max_depth=max_depth, active_types=self.active_types,
            store_medium=self.with_volume, collect_beams=collect_beams))
        if vol_max_per_cell is None:
            # beambeam rows are duplicated across many cells per beam: give
            # it a deeper budget (beams are thinned at build, keep_prob=0.25)
            vol_max_per_cell = 24 if vol_estimator == "beambeam" else 16
        self.vol_max_per_cell = vol_max_per_cell
        self.adaptive_radii = adaptive_radii
        self.final_gather = final_gather
        if adaptive_radii:
            P = width * height
            self._ppm_state = PixelStats(
                r2=jnp.full(P, self.radius * self.radius, jnp.float32),
                n=jnp.zeros(P, jnp.float32), tau=jnp.zeros((P, 3), jnp.float32))
        else:
            self._ppm_state = None
        self._eye_jit = jax.jit(partial(
            eye_pass, w=width, h=height, max_depth=max_depth,
            active_types=self.active_types, with_volume=self.with_volume,
            vol_est=self.vol_est, vol_max_per_cell=vol_max_per_cell,
            alpha=self.alpha, final_gather=final_gather))

        # beamgrid eye pass with the vol-grid build FUSED into the same
        # program: tools/microbench_beamgrid.py measured build+query in one
        # jit at 4.76 s vs 6.68 s for query-of-a-prebuilt-grid on the real
        # fog-cornell shapes — XLA picks a gather-friendly layout for the
        # sorted photon table when it sees the producer. The sharded path
        # (parallel/render.py) already traces build+eye together.
        def _eye_fused_beamgrid(scene, film, grid, rows, valid, pass_idx,
                                radius, n_emitted, ppm_state=None):
            vol_grid = _build_vol_grid_ball(rows, valid, radius,
                                            scene.world_lo, scene.world_hi)
            return eye_pass(scene, film, grid, vol_grid, pass_idx,
                            w=width, h=height, radius=radius,
                            n_emitted=n_emitted, max_depth=max_depth,
                            active_types=self.active_types,
                            with_volume=self.with_volume,
                            vol_est=self.vol_est,
                            vol_max_per_cell=vol_max_per_cell,
                            ppm_state=ppm_state, alpha=self.alpha,
                            final_gather=final_gather)
        self._eye_fused_jit = jax.jit(_eye_fused_beamgrid)
        self._surf_grid_jit = jax.jit(_build_surface_grid)
        self._vol_point_jit = jax.jit(_build_vol_grid_point)
        self._vol_ball_jit = jax.jit(_build_vol_grid_ball)
        if collect_beams:
            from . import vol_estimators as ve
            self._beam_cells_jit = jax.jit(ve.build_beam_cells)

    def render_pass(self, scene, film, pass_idx):
        if self._collect_beams:
            rows, valid, beams, bvalid = self._trace_jit(
                scene, pass_idx=jnp.int32(pass_idx))
        else:
            rows, valid = self._trace_jit(scene, pass_idx=jnp.int32(pass_idx))
        r = jnp.float32(self.radius)
        if self.adaptive_radii:
            # per-pixel radii can exceed the global schedule (pixels that saw
            # no photons keep their radius): the 2x2x2-neighborhood query is
            # only complete when cell >= 2 * max radius
            cell = 2.0 * jnp.sqrt(jnp.max(self._ppm_state.r2))
        else:
            cell = jnp.float32(2.0 * self.radius)
        grid = self._surf_grid_jit(rows, valid, scene.world_lo, scene.world_hi,
                                   cell)
        if self.with_volume and self.vol_est == "beamgrid":
            # fused build+eye program (see _eye_fused_beamgrid above)
            out = self._eye_fused_jit(
                scene, film, grid, rows, valid, jnp.int32(pass_idx),
                radius=r, n_emitted=float(self.n_photons),
                ppm_state=self._ppm_state if self.adaptive_radii else None)
            if self.adaptive_radii:
                film, self._ppm_state = out
            else:
                film = out
        else:
            if not self.with_volume:
                vol_grid = None
            elif self.vol_est == "beambeam":
                vol_grid = self._beam_cells_jit(beams, bvalid, r,
                                                scene.world_lo, scene.world_hi)
            else:
                vol_grid = self._vol_point_jit(rows, valid, scene.world_lo,
                                               scene.world_hi, cell)
            if self.adaptive_radii:
                film, self._ppm_state = self._eye_jit(
                    scene, film, grid, vol_grid, jnp.int32(pass_idx),
                    radius=r, n_emitted=float(self.n_photons),
                    ppm_state=self._ppm_state)
            else:
                film = self._eye_jit(scene, film, grid, vol_grid,
                                     jnp.int32(pass_idx),
                                     radius=r, n_emitted=float(self.n_photons))
        # progressive radius schedule r_{i+1}^2 = r_i^2 * (i+alpha)/(i+1)
        # (drives the volumetric estimator; surface radii are per-pixel when
        # adaptive_radii)
        i = self.pass_idx + 1
        self.radius = float(self.radius * ((i + self.alpha) / (i + 1.0)) ** 0.5)
        self.photons_emitted += self.n_photons
        return film

    def develop(self):
        img = filmmod.develop(self.film)
        if self._ppm_state is not None:
            st = self._ppm_state
            denom = (max(float(self.pass_idx), 1.0) * jnp.pi
                     * jnp.maximum(st.r2, 1e-20))
            img = img + (st.tau / denom[:, None]).reshape(
                self.height, self.width, 3)
        return img

    def render(self, n_passes: int = 1):
        for _ in range(n_passes):
            self.do_pass()
        return self.develop()

    def status(self):
        s = super().status()
        s.update(photons_emitted=self.photons_emitted, radius=self.radius,
                 photons_per_second=self.photons_emitted / max(self.accum_seconds, 1e-9))
        return s
