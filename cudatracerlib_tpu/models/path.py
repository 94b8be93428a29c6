"""Wavefront path tracer with NEE, power-heuristic MIS, and Russian roulette.

Reference: ``Integrators/PathTracer.cu:10-113`` (megakernel PT) and
``Integrators/WavefrontPathTracer.cu`` (queue-based PT). TPU-native design:
the whole lane batch advances bounce-by-bounce inside one jitted
`lax.fori_loop` — the wavefront "queues" are simply masked lanes (inactive
lanes carry tmax=0 rays so traversal exits immediately), and each bounce does
one closest-hit traversal plus one any-hit shadow traversal for every lane,
exactly like the reference's per-iteration primary+shadow buffers
(`DoubleRayBuffer.h:84-112`).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import mis
from ..core import records
from ..core import rng as rngmod
from ..core import vecmath as vm
from ..ops import shading, traversal, traversal8
from ..scene import schema
from . import bsdf as bsdfmod
from . import film as filmmod
from . import lights as lightsmod
from . import medium as mediummod
from . import phase as phasemod
from . import tracer

Array = jax.Array

# Merge each bounce's NEE shadow rays into the NEXT bounce's closest-hit
# traversal as ONE mixed wavefront (per-lane any-hit, ops/traversal8
# any_mask) — the reference's deferred shadow-ray queue
# (`WavefrontPathTracer.cu:62-73,118-134`: shadow rays enqueue and resolve
# next iteration). Halves the traversal calls per bounce; on TPU the per-call
# fixed costs (lockstep-loop dispatch, treelet sort/glue) dominate at
# wavefront sizes, so call count is the lever (profiled round 4:
# traversal = 82% of a san-miguel chunk). Estimator-identical: occlusion is
# a pure function of the ray, only WHEN it is tested moves. Env-overridable
# for A/B.
import os as _os
MERGE_SHADOW = _os.environ.get("CTL_PT_MERGE_SHADOW", "1") == "1"


def pt_radiance(scene: schema.SceneData, rays: traversal.Rays, state: Array,
                max_depth: int = 8, rr_depth: int = 3, use_nee: bool = True,
                active_types: Sequence[int] = bsdfmod.ALL_TYPES,
                with_media: bool | None = None, with_alpha: bool = False,
                with_bump: bool = False, with_parallax: bool = False,
                with_bssrdf: bool = False, regularize: bool = False,
                regularize_alpha: float = 0.08, with_textures: bool = True,
                return_rays: bool = False, sampler_type: int = 0,
                pixel_idx: Array = None, sample_idx=0, spectral: int = 0):
    """Estimate radiance along each lane's camera ray. Returns (L, state).

    with_media toggles participating-media handling (medium distance sampling
    per segment, phase-function scattering, transmittance on shadow rays); it
    defaults to whether the scene carries any volumes, and is static so
    media-free scenes compile none of it.

    spectral > 0 switches the transport to HERO-WAVELENGTH spectral
    rendering with that many stratified wavelengths per path (reference
    Math/Spectrum.h:10-15's compile-switchable N-sample TSpectrum, redesigned
    as per-path wavelength sampling): RGB scene colors are upsampled to
    spectral reflectance on the fly (Smits basis, core/spectrum.py) and the
    path's spectral radiance resolves to XYZ -> linear RGB on return. BSDF
    importance sampling stays in RGB (its dielectric dispersion keeps the
    channel-roulette model); the spectral gain is correct spectral
    multiplication of upsampled reflectances (metamer-aware) rather than
    per-lobe lambda-dependent sampling.
    """
    B = rays.o.shape[0]
    geom = scene.geom
    if with_media is None:
        with_media = mediummod.has_media(scene.media)

    C = int(spectral)
    if C:
        from ..core import spectrum as specmod
        state, u_lam = rngmod.next_float(state)
        lam, _ = specmod.sample_hero_wavelengths(u_lam, C)   # (B, C)
        up = lambda c3: specmod.rgb_to_spectral(c3, lam)
    else:
        up = lambda c3: c3

    # varying-typed zeros: every loop-carry constant derives from the rays so
    # the carry types are stable under shard_map's check_vma (a fresh
    # jnp.zeros is replicated; the bounce body's updates are device-varying,
    # and lax.fori_loop rejects the carry-type mismatch — VERDICT r4 #7)
    vz = jnp.where(rays.tmax > 0, 0.0, 0.0)  # (B,) varying f32 zero (exact;
    #                                          tmax*0 would NaN on inf tmax)
    vzb = vz != 0.0                # (B,) varying False
    vzi = vzb.astype(jnp.int32)    # (B,) varying i32 zero
    czero = jnp.sum(vz)            # ()  varying f32 zero (counters)
    L = jnp.zeros((B, C or 3)) + vz[:, None]
    beta = jnp.ones((B, C or 3)) + vz[:, None]
    active = jnp.ones(B, bool) | vzb
    # ray-cone angular width: one pixel of the sensor (grows linearly with t;
    # widening at rough bounces lands with ray differentials)
    params = scene.sensor.params
    cone = 2.0 * jnp.tan(0.5 * params[0]) / jnp.maximum(params[5], 1.0)
    prev_pdf = vz                 # BSDF/phase pdf of the ray's generating sample
    prev_delta = jnp.ones(B, bool) | vzb  # camera rays count as "delta" (weight 1)
    had_smooth = vzb              # a non-delta bounce happened (regularization)
    cur = rays
    # low-discrepancy sequences for EVERY path dimension (reference
    # Sampler_device.h regenerates sequences for all requested dims): depth d
    # draws its NEE dims from 4+6d..6+6d and its BSDF dims from 7+6d..9+6d.
    # The dimension index is traced (computed from the loop counter), which
    # samplers.sample_1d_dyn supports.
    use_seq = sampler_type != 0 and pixel_idx is not None
    # merged bounce+shadow wavefront (see MERGE_SHADOW above). Media need
    # the occlusion result in-iteration (transmittance sampling order).
    # Instanced scenes merge too (round 4: any_mask threads through every
    # BLAS visit of ops/instanced.py).
    merge = (MERGE_SHADOW and use_nee and not with_media and not with_bssrdf)

    def bounce(depth, carry, coherent=False):
        if merge:
            (L, beta, active, prev_pdf, prev_delta, cur, state, had_smooth,
             nrays, niters, nrows, novf, ins_med, ins_mat, mono_done,
             p_contrib, p_rays, p_act) = carry
        else:
            (L, beta, active, prev_pdf, prev_delta, cur, state, had_smooth,
             nrays, niters, nrows, novf, ins_med, ins_mat, mono_done) = carry
        trace_rays = traversal.Rays(o=cur.o, d=cur.d, tmin=cur.tmin,
                                    tmax=jnp.where(active, cur.tmax, 0.0))
        # live-ray counter (reference g_RayTracedCounter semantics: count only
        # rays actually traced, not launched lanes)
        nrays = nrays + jnp.sum(active.astype(jnp.float32))
        if merge:
            # ONE mixed wavefront: this bounce's closest rays + last bounce's
            # pending NEE shadow rays (per-lane any-hit)
            comb = traversal.Rays(
                o=jnp.concatenate([trace_rays.o, p_rays.o]),
                d=jnp.concatenate([trace_rays.d, p_rays.d]),
                tmin=jnp.concatenate([trace_rays.tmin, p_rays.tmin]),
                tmax=jnp.concatenate([trace_rays.tmax, p_rays.tmax]))
            amask = jnp.concatenate([vzb, ~vzb])  # varying-typed [F]*B+[T]*B
            h2, it1, rw1, ov1 = traversal8.intersect_scene(
                geom, comb, with_iters=True, coherent=coherent,
                any_mask=amask)
            hit = traversal.Hit(t=h2.t[:B], tri=h2.tri[:B],
                                u=h2.u[:B], v=h2.v[:B],
                                inst=None if h2.inst is None
                                else h2.inst[:B])
            occluded_prev = h2.tri[B:] >= 0
            L = L + jnp.where((p_act & ~occluded_prev)[:, None],
                              p_contrib, 0.0)
        else:
            hit, it1, rw1, ov1 = traversal8.intersect_scene(
                geom, trace_rays, with_iters=True, coherent=coherent)
        niters = niters + it1
        nrows = nrows + rw1
        novf = novf + ov1

        # --- BSSRDF internal random walk (reference Material.h:38-60): lanes
        # inside a subsurface material sample a homogeneous scattering
        # distance against the surface exit; scatter events redirect the walk
        # with the material's HG phase before any surface logic runs ---
        if with_bssrdf:
            mp = scene.materials.params
            imx = jnp.maximum(ins_mat, 0)
            sa_b = jnp.take(mp[:, 25:28], imx, axis=0)
            ss_b = jnp.take(mp[:, 28:31], imx, axis=0)
            g_b = jnp.take(mp[:, 31], imx)
            sig_tb = sa_b + ss_b
            sbar = jnp.maximum(jnp.mean(sig_tb, -1), 1e-6)
            state, u_b = rngmod.next_float(state)
            t_s = -jnp.log(jnp.maximum(1.0 - u_b, 1e-9)) / sbar
            t_exit = jnp.where(hit.valid, hit.t, 1e7)
            bss_scatter = ins_med & active & (t_s < t_exit)
            bss_through = ins_med & active & ~bss_scatter
            pdf_sc = sbar * jnp.exp(-sbar * t_s)
            w_sc = ss_b * jnp.exp(-sig_tb * t_s[:, None]) / jnp.maximum(
                pdf_sc, 1e-20)[:, None]
            w_th = jnp.exp(-sig_tb * t_exit[:, None]) / jnp.maximum(
                jnp.exp(-sbar * t_exit), 1e-20)[:, None]
            beta = jnp.where(bss_scatter[:, None], beta * up(w_sc),
                             jnp.where(bss_through[:, None],
                                       beta * up(w_th), beta))
            bss_p = cur.o + cur.d * t_s[:, None]
        else:
            bss_scatter = jnp.zeros(B, bool)

        # --- medium interaction on this segment? ---
        if with_media:
            t_seg = jnp.where(hit.valid, hit.t * 0.999, 1e7)
            ms, state = mediummod.sample_distance(scene.media, cur.o, cur.d,
                                                  t_seg, state, active)
            beta = beta * up(ms.weight)
            med_event = ms.valid
        else:
            med_event = jnp.zeros(B, bool)

        miss = active & ~hit.valid & ~med_event
        if with_bssrdf:
            miss = miss & ~ins_med

        # --- escaped rays: environment ---
        env_le = lightsmod.eval_environment(scene, cur.d)
        if use_nee:
            pdf_env = lightsmod.pdf_env_direct(scene, cur.d)
            w_env = jnp.where(prev_delta, 1.0, mis.power_heuristic(prev_pdf, pdf_env))
        else:
            w_env = jnp.ones(B)
        L = L + jnp.where(miss[:, None],
                          beta * up(env_le) * w_env[:, None], 0.0)

        # keep true geometric orientation: dielectrics need the signed side,
        # and two-sided opaque materials are mirrored inside the BSDF layer
        si = shading.fill_dg(geom, trace_rays, hit, flip_to_ray=False)
        if with_parallax:
            si = bsdfmod.apply_parallax(scene, si)
        if with_bump:
            si = bsdfmod.apply_bump(scene, si)
        hit_l = active & hit.valid & ~med_event & ~bss_scatter
        if with_alpha:
            # stochastic alpha test: transparent lanes pass straight through
            a = bsdfmod.eval_alpha(scene, si.mat_id, si.uv)
            state, u_a = rngmod.next_float(state)
            alpha_pass = hit_l & (u_a >= a)
            hit_l = hit_l & ~alpha_pass
        else:
            alpha_pass = jnp.zeros(B, bool)

        # --- emitted radiance at the hit (area lights) with MIS ---
        le = lightsmod.eval_hit_emitter(scene, si.light_id, si.ng, si.wi)
        if use_nee:
            pdf_l = lightsmod.pdf_hit_emitter_direct(scene, si.light_id, cur.o, si.p, si.ng)
            w_hit = jnp.where(prev_delta, 1.0, mis.power_heuristic(prev_pdf, pdf_l))
        else:
            w_hit = jnp.ones(B)
        L = L + jnp.where(hit_l[:, None], beta * up(le) * w_hit[:, None], 0.0)

        # --- surface shading setup ---
        footprint = cone * hit.t * si.uv_density
        # EWA anisotropy: the pixel footprint stretches by 1/cos(theta) at
        # grazing incidence along the view direction's tangent projection
        cos_v = jnp.abs(vm.dot(si.ns, cur.d))
        major = footprint / jnp.clip(cos_v, 0.125, 1.0)
        d_t = vm.dot(cur.d, si.frame_t)
        d_s = vm.dot(cur.d, si.frame_s)
        d_len = jnp.sqrt(jnp.maximum(d_t * d_t + d_s * d_s, 1e-12))
        ewa_dir = jnp.stack([d_t / d_len, d_s / d_len], -1)
        ctx = bsdfmod.gather_ctx(scene, si.mat_id, si.uv, footprint,
                                 active_types=active_types,
                                 with_textures=with_textures,
                                 ewa=(ewa_dir, major), extra=si.extra)
        if C:
            # hero-wavelength dispersion: dielectrics refract with the
            # continuous eta(lambda_hero) (nm -> um)
            ctx = ctx._replace(lam_um=lam[:, 0] * 1e-3)
        if regularize:
            ctx = bsdfmod.regularize_ctx(ctx, had_smooth, regularize_alpha)
        frame = si.frame()
        wi_local = frame.to_local(si.wi)

        # --- next-event estimation (surface and medium vertices jointly) ---
        if use_nee:
            nee_active = hit_l | med_event
            if with_bssrdf:  # inside lanes: light arrives via the walk only
                nee_active = nee_active & ~ins_med
            if with_media:
                nee_p = jnp.where(med_event[:, None], ms.p, si.p)
            else:
                nee_p = si.p
            if use_seq:
                from . import samplers
                u_nee = jnp.stack(
                    [samplers.sample_1d_dyn(sampler_type, pixel_idx,
                                            sample_idx, 4 + 6 * depth + j)
                     for j in range(3)], -1)
                ed, state = lightsmod.sample_emitter_direct(
                    scene, nee_p, state, u_override=u_nee,
                    override_mask=nee_active)
            else:
                ed, state = lightsmod.sample_emitter_direct(scene, nee_p, state)
            wo_local_nee = frame.to_local(ed.d)
            lob = bsdfmod.evaluate(ctx, wi_local, wo_local_nee, active_types)
            if with_media:
                ph = phasemod.eval_phase(ms.ptype, ms.g, cur.d, ed.d)
                ph_pdf = phasemod.pdf_phase(ms.ptype, ms.g, cur.d, ed.d)
                f_nee = jnp.where(med_event[:, None], ph[:, None], lob.f)
                pdf_fwd = jnp.where(med_event, ph_pdf, lob.pdf)
            else:
                f_nee = lob.f
                pdf_fwd = lob.pdf
            shadow_o = jnp.where(med_event[:, None], nee_p,
                                 shading.offset_ray_origin(si.p, si.ng, ed.d)) \
                if with_media else shading.offset_ray_origin(si.p, si.ng, ed.d)
            do_shadow = nee_active & ((pdf_fwd + vm.length_sqr(f_nee)) > 0)
            shadow = traversal.Rays(
                o=shadow_o, d=ed.d, tmin=vz,
                tmax=jnp.where(do_shadow, ed.dist * 0.999, 0.0))
            nrays = nrays + jnp.sum(do_shadow.astype(jnp.float32))
            w_nee = jnp.where(ed.is_delta, 1.0, mis.power_heuristic(ed.pdf, pdf_fwd))
            contrib = (beta * up(f_nee * ed.radiance_over_pdf)
                       * w_nee[:, None])
            if merge:
                # occlusion resolves in the NEXT bounce's merged traversal
                # (reference: WavefrontPathTracer.cu:118-134 resolves the
                # previous iteration's shadow queue)
                p_contrib = jnp.where(do_shadow[:, None], contrib, 0.0)
                p_rays = shadow
                p_act = nee_active
            else:
                occ_hit, it2, rw2, ov2 = traversal8.intersect_scene(
                    geom, shadow, any_hit=True, with_iters=True)
                occluded = occ_hit.valid
                niters = niters + it2
                nrows = nrows + rw2
                novf = novf + ov2
                if with_media:
                    Tr, state = mediummod.transmittance(
                        scene.media, shadow_o, ed.d, ed.dist * 0.999, state,
                        do_shadow & ~occluded)
                    contrib = contrib * up(Tr)
                L = L + jnp.where((nee_active & ~occluded)[:, None],
                                  contrib, 0.0)

        # --- continue the path: BSDF sample (surface) / phase sample (medium) ---
        if use_seq:
            from . import samplers
            u_bsdf = jnp.stack(
                [samplers.sample_1d_dyn(sampler_type, pixel_idx,
                                        sample_idx, 7 + 6 * depth + j)
                 for j in range(3)], -1)
            s, state = bsdfmod.sample_with_rng(
                ctx, wi_local, state, active_types, u_override=u_bsdf,
                override_mask=hit_l)
        else:
            s, state = bsdfmod.sample_with_rng(ctx, wi_local, state, active_types)
        wo_world = frame.to_world(s.wo)
        is_delta = (s.sampled_type & records.T_DELTA) != 0
        weight = s.weight
        next_pdf = s.pdf
        new_o = shading.offset_ray_origin(si.p, si.ng, wo_world)
        if with_media:
            state, u_ph = rngmod.next_float2(state)
            wo_ph, w_ph, pdf_ph = phasemod.sample_phase(ms.ptype, ms.g, cur.d, u_ph)
            wo_world = jnp.where(med_event[:, None], wo_ph, wo_world)
            weight = jnp.where(med_event[:, None], w_ph[:, None], weight)
            next_pdf = jnp.where(med_event, pdf_ph, next_pdf)
            is_delta = jnp.where(med_event, False, is_delta)
            new_o = jnp.where(med_event[:, None], ms.p, new_o)
        if with_alpha:
            # alpha pass-through continues unchanged along the same direction
            wo_world = jnp.where(alpha_pass[:, None], cur.d, wo_world)
            weight = jnp.where(alpha_pass[:, None], 1.0, weight)
            is_delta = jnp.where(alpha_pass, True, is_delta)
            new_o = jnp.where(alpha_pass[:, None],
                              si.p + cur.d * 1e-4, new_o)
        if with_bssrdf:
            # scatter events inside the medium: HG-redirect, keep walking
            state, u_phb = rngmod.next_float2(state)
            wo_b, w_phb, pdf_phb = phasemod.sample_phase(
                jnp.zeros(B, jnp.int32), g_b, cur.d, u_phb)
            wo_world = jnp.where(bss_scatter[:, None], wo_b, wo_world)
            weight = jnp.where(bss_scatter[:, None], w_phb[:, None], weight)
            next_pdf = jnp.where(bss_scatter, pdf_phb, next_pdf)
            is_delta = jnp.where(bss_scatter, False, is_delta)
            new_o = jnp.where(bss_scatter[:, None], bss_p, new_o)
            # toggle inside/outside when a transmission lobe crosses a
            # BSSRDF surface
            trans = (s.sampled_type & (records.T_DELTA_TRANSMISSION
                                       | records.T_GLOSSY_TRANSMISSION
                                       | records.T_DIFFUSE_TRANSMISSION)) != 0
            bss_surf = jnp.take(mp[:, 25:31].sum(-1),
                                jnp.maximum(si.mat_id, 0)) > 0
            toggle = hit_l & trans & bss_surf
            entering = toggle & ~ins_med
            ins_mat = jnp.where(entering, si.mat_id, ins_mat)
            ins_med = jnp.where(toggle, ~ins_med, ins_med)
        w_up = up(weight)
        if C > 1:
            # a dispersive delta event makes the path monochromatic: the
            # direction is only valid for the hero wavelength. Collapse the
            # companions (zero them) and scale the hero by C — unbiased
            # because the hero is uniform over the span, and applied only on
            # the FIRST such event (tracked by the mono_done carry flag —
            # inferring it from zeroed companion betas would be wrong when a
            # companion is legitimately 0, e.g. a saturated red wall zeroes
            # the blue wavelengths, and would drop the hero's xC).
            mono = (hit_l & ((s.sampled_type & records.T_DELTA) != 0)
                    & (ctx.mat_type == schema.BSDF_DIELECTRIC)
                    & (ctx.params[:, 23] > 0.0) & ~mono_done)
            if with_media:
                mono = mono & ~med_event
            if with_alpha:
                mono = mono & ~alpha_pass
            hero1 = (jnp.arange(C) == 0).astype(w_up.dtype)[None, :] * C
            w_up = jnp.where(mono[:, None], w_up * hero1, w_up)
            mono_done = mono_done | mono
        beta_next = beta * w_up
        cont = hit_l | med_event | alpha_pass | bss_scatter
        alive = cont & (jnp.max(jnp.abs(weight), axis=-1) > 0) & (depth + 1 < max_depth)

        # --- Russian roulette on throughput ---
        state, u_rr = rngmod.next_float(state)
        q = jnp.clip(jnp.max(beta_next, axis=-1), 0.05, 0.95)
        do_rr = depth >= rr_depth
        survive = jnp.where(do_rr, u_rr < q, True)
        beta_next = jnp.where((do_rr & survive)[:, None],
                              beta_next / jnp.maximum(q, 1e-6)[:, None], beta_next)
        alive = alive & survive

        had_smooth2 = had_smooth | (cont & ~is_delta)
        nxt = traversal.Rays(o=new_o, d=wo_world,
                             tmin=vz, tmax=vz + 1e30)
        out = (L, jnp.where(alive[:, None], beta_next, 0.0), alive,
               next_pdf, is_delta, nxt, state, had_smooth2, nrays,
               niters, nrows, novf, ins_med, ins_mat, mono_done)
        if merge:
            out = out + (p_contrib, p_rays, p_act)
        return out

    carry = (L, beta, active, prev_pdf, prev_delta, cur, state, had_smooth,
             czero, czero, czero, czero,
             vzb, vzi, vzb)
    if merge:
        # empty pending-shadow queue: dead rays (tmax=0) with a valid dir
        dead = traversal.Rays(
            o=jnp.zeros((B, 3)) + vz[:, None],
            d=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
            + vz[:, None],
            tmin=vz, tmax=vz)
        carry = carry + (jnp.zeros((B, C or 3)) + vz[:, None], dead, vzb)
    # depth-0 peel: camera rays are the one COHERENT wavefront of the path —
    # on HBM-scale scenes they take the treelet kernel with the smaller
    # coherent visit budget (V_COHERENT); bounces use V_INCOHERENT (or the
    # XLA loop when TREELET_INCOHERENT is off). The gate SHARES the dispatch
    # predicate with traversal8.intersect_scene (advisor finding, round 3)
    # and only peels when the coherent dispatch actually differs from the
    # bounce dispatch, so the peel never doubles trace/compile cost for an
    # identical kernel.
    peel_coherent = (max_depth > 0
                     and traversal8.treelet_would_dispatch(geom, coherent=True)
                     and (not traversal8.TREELET_INCOHERENT
                          or traversal8.V_COHERENT != traversal8.V_INCOHERENT))
    if peel_coherent:
        carry = bounce(0, carry, coherent=True)
        carry = jax.lax.fori_loop(1, max_depth, bounce, carry)
    else:
        carry = jax.lax.fori_loop(0, max_depth, bounce, carry)
    L = carry[0]
    if merge:
        # resolve the LAST bounce's pending shadow queue (no next merged
        # traversal will carry it)
        p_contrib, p_rays, p_act = carry[15], carry[16], carry[17]
        occ_hit, itf, rwf, ovf_ = traversal8.intersect_scene(
            geom, p_rays, any_hit=True, with_iters=True)
        L = L + jnp.where((p_act & ~occ_hit.valid)[:, None], p_contrib, 0.0)
        carry = (L,) + carry[1:9] + (carry[9] + itf, carry[10] + rwf,
                                     carry[11] + ovf_) + carry[12:]
    L_out = carry[0]
    if C:
        span = (specmod.SPECTRUM_MAX_WAVELENGTH
                - specmod.SPECTRUM_MIN_WAVELENGTH)
        L_out = specmod.spectral_to_rgb(L_out, lam, span)
    if return_rays:
        return L_out, carry[6], carry[8], carry[9], carry[10], carry[11]
    return L_out, carry[6]


class PathTracer(tracer.TracerBase):
    """Progressive unidirectional path tracer (reference PathTracer)."""

    def __init__(self, scene, width, height, max_depth: int = 8,
                 rr_depth: int = 3, use_nee: bool = True, regularize: bool = False,
                 spp_per_pass: int = 1, chunk_size: int = 1 << 17, seed: int = 0,
                 active_types: Optional[Sequence[int]] = None,
                 sampler_type: int = 0, spectral: int = 0):
        super().__init__(scene, width, height, spp_per_pass=spp_per_pass, seed=seed)
        self.max_depth = max_depth
        if active_types is None:
            active_types = scene_active_types(scene)
        if regularize:
            active_types = tuple(sorted(set(active_types)
                                        | set(bsdfmod.REGULARIZE_EXTRA_TYPES)))
        self.active_types = tuple(active_types)
        self.with_alpha = bsdfmod.scene_has_alpha(scene)
        self.with_bump = bsdfmod.scene_has_bump(scene)
        self.with_parallax = bsdfmod.scene_has_parallax(scene)
        self.with_bssrdf = bsdfmod.scene_has_bssrdf(scene)
        self.with_textures = bsdfmod.scene_texture_mask(scene)
        self.chunk_size = min(chunk_size, width * height)
        n_chunks = (width * height + self.chunk_size - 1) // self.chunk_size
        self._n_chunks = n_chunks
        self._rays_dev = jnp.float32(0.0)
        self._iters_dev = jnp.float32(0.0)   # traversal lockstep iterations
        self._rows_dev = jnp.float32(0.0)    # 512B fat rows gathered
        self._ovf_dev = jnp.float32(0.0)     # treelet overflow rays whose
        #                                      fallback re-traversal was
        #                                      clipped (must stay 0)
        chunk_kw = dict(
            w=width, h=height, chunk=self.chunk_size,
            max_depth=max_depth, rr_depth=rr_depth, use_nee=use_nee,
            spp=spp_per_pass, active_types=self.active_types,
            with_alpha=self.with_alpha, with_bump=self.with_bump,
            with_parallax=self.with_parallax, with_bssrdf=self.with_bssrdf,
            regularize=regularize, with_textures=self.with_textures,
            sampler_type=sampler_type, spectral=spectral)
        self._jitted = jax.jit(partial(_pt_chunk, **chunk_kw))
        self._jitted_many = jax.jit(partial(_pt_many, n_chunks=n_chunks,
                                            **chunk_kw))

    def render_pass(self, scene, film, pass_idx):
        for c in range(self._n_chunks):
            # the counter is accumulated INSIDE the jitted chunk: no eager
            # device ops in the pass loop, no device->host reads (the axon
            # client permanently slows dispatch after the first D2H transfer).
            # The tracer seed offsets the pass index so differently-seeded
            # tracers draw decorrelated streams.
            (film, self._rays_dev, self._iters_dev, self._rows_dev,
             self._ovf_dev) = self._jitted(
                    scene, film, self._rays_dev, self._iters_dev,
                    self._rows_dev, self._ovf_dev,
                    jnp.int32(pass_idx + (self.seed << 16)), jnp.int32(c))
        return film

    def render_batched(self, n_passes: int):
        """All n_passes (x all chunks) in ONE jitted dispatch: a dynamic
        `lax.fori_loop` over pass x chunk whose body is the same traced
        chunk as render_pass, so per-dispatch transport overhead (~tens of
        ms on the axon tunnel) is paid once per batch instead of once per
        chunk. Counters/film/pass_idx advance exactly as n_passes do_pass
        calls would."""
        import time as _time
        t0 = _time.perf_counter()
        (self.film, self._rays_dev, self._iters_dev, self._rows_dev,
         self._ovf_dev) = self._jitted_many(
                self.scene, self.film, self._rays_dev, self._iters_dev,
                self._rows_dev, self._ovf_dev,
                jnp.int32(self.pass_idx + (self.seed << 16)),
                jnp.int32(n_passes))
        jax.block_until_ready(self.film.rgb)
        self.film = self.film._replace(
            n_passes=self.film.n_passes + float(n_passes))
        self.pass_idx += n_passes
        dt = _time.perf_counter() - t0
        self.accum_seconds += dt
        self.last_pass_seconds = dt / max(n_passes, 1)

    @property
    def rays_traced_live(self) -> float:
        """Total rays actually traced (live lanes only; device counter)."""
        return float(self._rays_dev)

    def _debug_lane(self, pixel_idx):
        rays, px, py, state, wt = tracer.gen_camera_rays(
            self.scene, pixel_idx, 0, jnp.int32(self.pass_idx), self.width, self.height)
        L, _ = pt_radiance(self.scene, rays, state, self.max_depth,
                           active_types=self.active_types)
        return dict(L=L, ray_o=rays.o, ray_d=rays.d)


def scene_active_types(scene: schema.SceneData):
    """Static tuple of BSDF types present in the scene (compile only those)."""
    return tuple(sorted(set(schema.host_meta(scene)["mat_type"].tolist())))


def _pt_chunk(scene: schema.SceneData, film: filmmod.Film, rays_ctr,
              iters_ctr, rows_ctr, ovf_ctr, pass_idx, chunk_idx,
              w: int, h: int, chunk: int, max_depth: int, rr_depth: int,
              use_nee: bool, spp: int, active_types, with_alpha: bool = False,
              with_bump: bool = False, with_parallax: bool = False,
              with_bssrdf: bool = False, regularize: bool = False,
              with_textures: bool = True, sampler_type: int = 0,
              spectral: int = 0) -> filmmod.Film:
    base = (chunk_idx * chunk) % (w * h)
    pixel_idx = (base + jnp.arange(chunk, dtype=jnp.int32)) % (w * h)
    nrays = jnp.float32(0.0)
    niters = jnp.float32(0.0)
    nrows = jnp.float32(0.0)
    novf = jnp.float32(0.0)
    for s_i in range(spp):
        sample_idx = pass_idx * spp + s_i
        rays, px, py, state, wt = tracer.gen_camera_rays(
            scene, pixel_idx, sample_idx, pass_idx, w, h,
            sampler_type=sampler_type)
        L, state, nr, ni, nw, nv = pt_radiance(
            scene, rays, state, max_depth, rr_depth,
            use_nee, active_types, with_alpha=with_alpha,
            with_bump=with_bump,
            with_parallax=with_parallax,
            with_bssrdf=with_bssrdf,
            regularize=regularize,
            with_textures=with_textures,
            return_rays=True, sampler_type=sampler_type,
            pixel_idx=pixel_idx, sample_idx=sample_idx, spectral=spectral)
        nrays = nrays + nr
        niters = niters + ni
        nrows = nrows + nw
        novf = novf + nv
        # measured on v5e: XLA's scatter-add here is FASTER than a
        # dynamic-slice read-modify-write (0.06ms vs 0.36ms at 64K lanes)
        film = filmmod.add_samples(film, px, py, L * wt)
    return (film, rays_ctr + nrays, iters_ctr + niters, rows_ctr + nrows,
            ovf_ctr + novf)


def _pt_many(scene: schema.SceneData, film: filmmod.Film, rays_ctr,
             iters_ctr, rows_ctr, ovf_ctr, pass0, n_passes, n_chunks: int,
             **chunk_kw):
    """n_passes full passes (all chunks each) as ONE dynamic fori_loop whose
    body is a single traced _pt_chunk — compile cost stays that of one chunk
    while a whole bench batch becomes one device dispatch."""
    def body(k, carry):
        f, rc, ic, wc, oc = carry
        return _pt_chunk(scene, f, rc, ic, wc, oc, pass0 + k // n_chunks,
                         k % n_chunks, **chunk_kw)
    return jax.lax.fori_loop(0, n_passes * n_chunks, body,
                             (film, rays_ctr, iters_ctr, rows_ctr, ovf_ctr))
