"""Vertex connection and merging.

Reference: ``Integrators/VCM.cu`` + ``VCMHelper.h`` — BDPT plus photons stored
per pass in a hash grid (`VCMSurfMap`) and merged at camera vertices
(`L_Surface2`). TPU-native: the BDPT light walk additionally emits photon rows
(position, power, direction, normal, dVCM/dVC/dVM) into the sort-based grid;
camera vertices gather the 2x2x2 neighborhood and add merge contributions with
the full VCM MIS (eta_vcm coupling between connection and merging weights).
Merging evaluates the diffuse lobe at the camera vertex (the glossy part of
transport rides the connections), matching common GPU VCM practice.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import records
from ..core import rng as rngmod
from ..core import vecmath as vm
from ..ops import hashgrid, shading, traversal, traversal8
from ..scene import schema, sensors
from . import bsdf as bsdfmod
from . import bdpt as bdptmod
from . import film as filmmod
from . import lights as lightsmod
from . import ppm as ppmmod
from . import tracer

Array = jax.Array

_mis = bdptmod._mis
NUM_LIGHT_V = bdptmod.NUM_LIGHT_V
# photon row: pos(3) beta(3) wi(3) ns(3) dvcm dvc dvm = 15
PHOTON_K = 15


def vcm_pass(scene: schema.SceneData, film: filmmod.Film, pass_idx,
             w: int, h: int, max_depth: int, active_types, radius: float,
             pixel_idx: Array = None, total_paths: int = None,
             photon_gather_axis: str = None) -> filmmod.Film:
    # pixel_idx restricts the pass to a pixel/light-path subset (multi-chip
    # sharding); total_paths keeps eta_vcm and the t=1 splat normalization
    # GLOBAL; photon_gather_axis all_gathers the photon map over that mesh
    # axis so every chip merges against the full map (SURVEY §5)
    if pixel_idx is None:
        pixel_idx = jnp.arange(w * h, dtype=jnp.int32)
    B = pixel_idx.shape[0]
    n_paths = float(total_paths if total_paths is not None else B)
    eta_vcm = jnp.pi * radius * radius * n_paths
    mis_vm_w = _mis(eta_vcm)          # factor added to connection weights
    mis_vc_w = _mis(1.0 / eta_vcm)    # factor added to merging weights
    state = rngmod.seed(pixel_idx, pass_idx, jnp.uint32(0xC3))
    geom = scene.geom

    # ======================= light subpath (stores photons too) ============
    er, state = lightsmod.sample_emitter_ray(scene, state)
    ltype = jnp.take(scene.lights.light_type, er.light_idx)
    is_delta_l = (ltype == schema.LIGHT_POINT) | (ltype == schema.LIGHT_SPOT) \
        | (ltype == schema.LIGHT_DISTANT)
    emission_pdf_w = jnp.maximum(er.pdf_pos * er.pdf_dir, 1e-16)
    cos_at_l = jnp.where(jnp.any(er.n != 0, -1),
                         jnp.maximum(vm.dot(er.n, er.d), 1e-6), 1.0)
    # per-light-type direct pdf for the MIS partners (see bdpt.py)
    prev_l = jnp.where(er.light_idx > 0,
                       jnp.take(scene.lights.power_cdf,
                                jnp.maximum(er.light_idx - 1, 0)), 0.0)
    sel_l = jnp.maximum(jnp.take(scene.lights.power_cdf, er.light_idx)
                        - prev_l, 1e-12)
    is_env_l = ltype == schema.LIGHT_INFINITE
    is_dist_l = ltype == schema.LIGHT_DISTANT
    direct_pdf_a = jnp.where(is_env_l, er.pdf_dir * sel_l,
                             jnp.where(is_dist_l, sel_l, er.pdf_pos))
    beta_l = er.power
    dvcm = _mis(direct_pdf_a / emission_pdf_w)
    dvc = jnp.where(is_delta_l, 0.0, _mis(cos_at_l / emission_pdf_w))
    dvm = dvc * mis_vc_w

    rays = traversal.Rays(o=er.o + er.d * 1e-4, d=er.d,
                          tmin=jnp.zeros(B), tmax=jnp.full(B, 1e30))
    active = jnp.ones(B, bool)
    lvs = []
    photon_rows = []
    photon_valid = []
    for li in range(NUM_LIGHT_V):
        trace_rays = rays._replace(tmax=jnp.where(active, rays.tmax, 0.0))
        hit = traversal8.intersect_scene(geom, trace_rays)
        si = shading.fill_dg(geom, trace_rays, hit, flip_to_ray=False)
        alive = active & hit.valid
        dist2 = jnp.maximum(hit.t * hit.t, 1e-12)
        cos_in = jnp.maximum(vm.absdot(si.ns, si.wi), 1e-6)
        if li == 0:
            # INFINITE lights: no dist^2 at the first hit (see bdpt.py)
            dist2 = jnp.where(is_env_l | is_dist_l, 1.0, dist2)
        dvcm_h = dvcm * _mis(dist2) / _mis(cos_in)
        dvc_h = dvc / _mis(cos_in)
        dvm_h = dvm / _mis(cos_in)
        ctx = bsdfmod.gather_ctx(scene, si.mat_id, si.uv)
        frame = si.frame()
        wi_local = frame.to_local(si.wi)
        lvs.append(bdptmod.LightVertex(
            valid=alive, p=si.p, ns=si.ns, ng=si.ng, ft=si.frame_t, fs=si.frame_s,
            wi_local=wi_local, beta=beta_l, dvcm=dvcm_h, dvc=dvc_h,
            mat_id=si.mat_id, uv=si.uv))
        storable = alive & ~bsdfmod.is_delta_only(ctx)
        photon_rows.append(jnp.concatenate(
            [si.p, beta_l, si.wi, si.ns,
             dvcm_h[:, None], dvc_h[:, None], dvm_h[:, None]], -1))
        photon_valid.append(storable)

        s, state = bsdfmod.sample_with_rng(ctx, wi_local, state, active_types)
        rev = bsdfmod.evaluate(ctx, s.wo, wi_local, active_types)
        cos_out = jnp.maximum(jnp.abs(s.wo[..., 2]), 1e-6)
        pdf_fwd = jnp.maximum(s.pdf, 1e-12)
        is_delta_b = (s.sampled_type & records.T_DELTA) != 0
        pdf_rev = jnp.where(is_delta_b, pdf_fwd, jnp.maximum(rev.pdf, 1e-12))
        dvc_n = _mis(cos_out / pdf_fwd) * (dvc_h * _mis(pdf_rev) + dvcm_h + mis_vm_w)
        dvm_n = _mis(cos_out / pdf_fwd) * (dvm_h * _mis(pdf_rev) + dvcm_h * mis_vc_w + 1.0)
        dvc = jnp.where(is_delta_b, _mis(cos_out) * dvc_h * 1.0, dvc_n)
        dvm = jnp.where(is_delta_b, _mis(cos_out) * dvm_h * 1.0, dvm_n)
        dvcm = jnp.where(is_delta_b, 0.0, _mis(1.0 / pdf_fwd))
        beta_l = beta_l * s.weight
        active = alive & (jnp.max(jnp.abs(s.weight), -1) > 0)
        wo_world = frame.to_world(s.wo)
        rays = traversal.Rays(o=shading.offset_ray_origin(si.p, si.ng, wo_world),
                              d=wo_world, tmin=jnp.zeros(B), tmax=jnp.full(B, 1e30))

    rows = jnp.concatenate(photon_rows, 0)
    valid = jnp.concatenate(photon_valid, 0)
    if photon_gather_axis is not None:
        rows = jax.lax.all_gather(rows, photon_gather_axis)
        rows = rows.reshape(-1, rows.shape[-1])
        valid = jax.lax.all_gather(valid, photon_gather_axis).reshape(-1)
    grid = hashgrid.build_grid(rows, rows[:, 0:3], valid,
                               scene.world_lo, scene.world_hi,
                               jnp.float32(2.0 * radius))

    # ---------- t=1 splats (same as BDPT, weights gain the vm factor) ------
    for s_idx, lv in enumerate(lvs):
        sd = sensors.sample_direct(scene.sensor, lv.p, None)
        fr_lv = shading.fr.Frame(lv.ft, lv.fs, lv.ns)
        wo_cam = fr_lv.to_local(sd.d)
        ctx_lv = bsdfmod.gather_ctx(scene, lv.mat_id, lv.uv)
        f, pdf_f, pdf_r = bdptmod._eval_with_rev(ctx_lv, lv.wi_local, wo_cam, active_types)
        we = sd.weight[:, 0] * (w * h)
        # cameraPdfA includes the surface cosine toward the camera (see the
        # matching fix + derivation in bdpt.splat_step)
        cam_pdf_a = we * jnp.abs(wo_cam[..., 2])
        w_light = _mis(cam_pdf_a / n_paths) * (mis_vm_w + lv.dvcm
                                               + lv.dvc * _mis(pdf_r))
        mis_w = 1.0 / (w_light + 1.0)
        contrib = lv.beta * f * (we / n_paths)[:, None] * mis_w[:, None]
        shadow = traversal.Rays(
            o=shading.offset_ray_origin(lv.p, lv.ng, sd.d), d=sd.d,
            tmin=jnp.zeros(B),
            tmax=jnp.where(lv.valid & sd.valid, sd.dist * 0.999, 0.0))
        occ = traversal8.intersect_scene(geom, shadow, any_hit=True).valid
        ok = lv.valid & sd.valid & ~occ
        px_ = jnp.clip(sd.p_film[:, 0].astype(jnp.int32), 0, w - 1)
        py_ = jnp.clip(sd.p_film[:, 1].astype(jnp.int32), 0, h - 1)
        film = filmmod.splat(film, px_, py_, contrib, mask=ok)

    # ======================= camera subpath =======================
    cam_rays, px, py, state, wt = tracer.gen_camera_rays(scene, pixel_idx, 0, pass_idx, w, h)
    params = scene.sensor.params
    tan_half = jnp.tan(0.5 * params[0])
    img_dist = w / (2.0 * tan_half)
    cos_cam = vm.dot(cam_rays.d, scene.sensor.to_world[:3, 2]
                     / jnp.linalg.norm(scene.sensor.to_world[:3, 2]))
    camera_pdf_w = (img_dist * img_dist) / jnp.maximum(cos_cam ** 3, 1e-6)
    beta_c = jnp.ones((B, 3))
    dvcm_c = _mis(n_paths / jnp.maximum(camera_pdf_w, 1e-12))
    dvc_c = jnp.zeros(B)
    dvm_c = jnp.zeros(B)
    active_c = jnp.ones(B, bool)
    L = jnp.zeros((B, 3))
    rays = cam_rays

    for t_idx in range(max_depth):
        trace_rays = rays._replace(tmax=jnp.where(active_c, rays.tmax, 0.0))
        hit = traversal8.intersect_scene(geom, trace_rays)
        si = shading.fill_dg(geom, trace_rays, hit, flip_to_ray=False)
        alive = active_c & hit.valid
        dist2 = jnp.maximum(hit.t * hit.t, 1e-12)
        cos_in = jnp.maximum(vm.absdot(si.ns, si.wi), 1e-6)
        dvcm_h = dvcm_c * _mis(dist2) / _mis(cos_in)
        dvc_h = dvc_c / _mis(cos_in)
        dvm_h = dvm_c / _mis(cos_in)

        # s=0: emitter hit
        le = lightsmod.eval_hit_emitter(scene, si.light_id, si.ng, si.wi)
        lid = jnp.maximum(si.light_id, 0)
        prev = jnp.where(lid > 0, jnp.take(scene.lights.power_cdf,
                                           jnp.maximum(lid - 1, 0)), 0.0)
        sel = jnp.maximum(jnp.take(scene.lights.power_cdf, lid) - prev, 1e-12)
        lp = jnp.take(scene.lights.params, lid, axis=0)
        area = jnp.maximum(lp[:, 6], 1e-12)
        cos_l0 = jnp.maximum(vm.dot(si.ng, si.wi), 1e-6)
        w_cam0 = _mis(sel / area) * dvcm_h + _mis(sel / area * cos_l0 / jnp.pi) * dvc_h
        mis_w0 = jnp.where(t_idx == 0, 1.0, 1.0 / (1.0 + w_cam0))
        L = L + jnp.where(alive[:, None], beta_c * le * mis_w0[:, None], 0.0)

        # s=0 at infinity: escaped rays hit the env light (see bdpt.py)
        if lightsmod.has_env_static(scene.lights):
            env_le = lightsmod.eval_environment(scene, rays.d)
            pdf_env_d = lightsmod.pdf_env_direct(scene, rays.d)
            env_row = jnp.argmax(scene.lights.light_type
                                 == schema.LIGHT_INFINITE)
            wr = jnp.maximum(scene.lights.params[env_row, 7], 1e-3)
            w_cam_env = (_mis(pdf_env_d) * dvcm_c
                         + _mis(pdf_env_d / (jnp.pi * wr * wr)) * dvc_c)
            mis_env = jnp.where(t_idx == 0, 1.0, 1.0 / (1.0 + w_cam_env))
            env_mask = active_c & ~hit.valid
            L = L + jnp.where(env_mask[:, None],
                              beta_c * env_le * mis_env[:, None], 0.0)

        ctx = bsdfmod.gather_ctx(scene, si.mat_id, si.uv)
        frame = si.frame()
        wi_local = frame.to_local(si.wi)

        # s=1: direct illumination
        ed, state = lightsmod.sample_emitter_direct(scene, si.p, state)
        direct_w, emission_w, cos_at_light = bdptmod._emission_pdfs(scene, ed)
        wo_l = frame.to_local(ed.d)
        f1, pdf_f1, pdf_r1 = bdptmod._eval_with_rev(ctx, wi_local, wo_l, active_types)
        cos_to_l = jnp.maximum(vm.absdot(si.ns, ed.d), 1e-6)
        w_light1 = jnp.where(ed.is_delta, 0.0, _mis(pdf_f1 / direct_w))
        w_cam1 = _mis(emission_w * cos_to_l / (direct_w * cos_at_light)) \
            * (mis_vm_w + dvcm_h + dvc_h * _mis(pdf_r1))
        mis_w1 = 1.0 / (w_light1 + 1.0 + w_cam1)
        shadow = traversal.Rays(
            o=shading.offset_ray_origin(si.p, si.ng, ed.d), d=ed.d,
            tmin=jnp.zeros(B),
            tmax=jnp.where(alive & (pdf_f1 + vm.length_sqr(f1) > 0), ed.dist * 0.999, 0.0))
        occ = traversal8.intersect_scene(geom, shadow, any_hit=True).valid
        L = L + jnp.where((alive & ~occ)[:, None],
                          beta_c * f1 * ed.radiance_over_pdf * mis_w1[:, None], 0.0)

        # s>=2: vertex connections (weights gain the vm factors)
        for s_idx, lv in enumerate(lvs):
            dvec = lv.p - si.p
            d2 = jnp.maximum(vm.length_sqr(dvec), 1e-12)
            dist = jnp.sqrt(d2)
            dirn = dvec / dist[:, None]
            wo_c = frame.to_local(dirn)
            f_c, pdf_cf, pdf_cr = bdptmod._eval_with_rev(ctx, wi_local, wo_c, active_types)
            fr_lv = shading.fr.Frame(lv.ft, lv.fs, lv.ns)
            wo_lv = fr_lv.to_local(-dirn)
            ctx_lv = bsdfmod.gather_ctx(scene, lv.mat_id, lv.uv)
            f_l, pdf_lf, pdf_lr = bdptmod._eval_with_rev(ctx_lv, lv.wi_local, wo_lv, active_types)
            cos_c = jnp.maximum(vm.absdot(si.ns, dirn), 1e-6)
            cos_lv = jnp.maximum(vm.absdot(lv.ns, dirn), 1e-6)
            pdf_cf_a = pdf_cf * cos_lv / d2
            pdf_lf_a = pdf_lf * cos_c / d2
            w_light = _mis(pdf_cf_a) * (mis_vm_w + lv.dvcm + lv.dvc * _mis(pdf_lr))
            w_cam = _mis(pdf_lf_a) * (mis_vm_w + dvcm_h + dvc_h * _mis(pdf_cr))
            mis_w = 1.0 / (w_light + 1.0 + w_cam)
            contrib = (beta_c * f_c) * (lv.beta * f_l) * (mis_w / d2)[:, None]
            ok = alive & lv.valid & (jnp.max(contrib, -1) > 0)
            shadow = traversal.Rays(
                o=shading.offset_ray_origin(si.p, si.ng, dirn), d=dirn,
                tmin=jnp.zeros(B), tmax=jnp.where(ok, dist * 0.998, 0.0))
            occ = traversal8.intersect_scene(geom, shadow, any_hit=True).valid
            L = L + jnp.where((ok & ~occ)[:, None], contrib, 0.0)

        # ---------- merging (VM): gather photons at this camera vertex ------
        is_smooth = ~bsdfmod.is_delta_only(ctx)
        merge_here = alive & is_smooth
        albedo = ppmmod.diffuse_albedo(ctx)
        r_lane = jnp.full(B, radius)

        def accum(carry, prows, mask):
            # K-axis vectorized over the batched neighborhood (B, K, W)
            ph_beta = prows[..., 3:6]
            ph_wi = prows[..., 6:9]
            ph_ns = prows[..., 9:12]
            ph_dvcm = prows[..., 12]
            ph_dvm = prows[..., 14]
            ns_ = si.ns[:, None, :]
            ok = (mask & (jnp.sum(ph_ns * ns_, -1) > 0.5)
                  & (jnp.sum(ph_wi * ns_, -1) > 0))
            # diffuse merge: f = albedo/pi, pdfs = cos/pi both ways
            cos_ph = jnp.maximum(jnp.abs(jnp.sum(ph_wi * ns_, -1)), 1e-6)
            pdf_fwd = cos_ph / jnp.pi
            pdf_rev = cos_in / jnp.pi
            w_light = ph_dvcm * mis_vc_w + ph_dvm * _mis(pdf_fwd)
            w_cam = dvcm_h * mis_vc_w + dvm_h * _mis(pdf_rev)
            mis_w = 1.0 / (w_light + 1.0 + w_cam[:, None])
            f = (albedo / jnp.pi)[:, None, :]
            contrib = f * ph_beta * mis_w[..., None]
            return carry + jnp.sum(jnp.where(ok[..., None], contrib, 0.0),
                                   axis=1)

        flux = hashgrid.gather_neighbors(grid, si.p, r_lane, accum, jnp.zeros((B, 3)))
        Lm = beta_c * flux / eta_vcm  # 1/(pi r^2 n_paths): all lanes' photons
        L = L + jnp.where(merge_here[:, None], Lm, 0.0)

        # extend camera path
        s, state = bsdfmod.sample_with_rng(ctx, wi_local, state, active_types)
        rev = bsdfmod.evaluate(ctx, s.wo, wi_local, active_types)
        cos_out = jnp.maximum(jnp.abs(s.wo[..., 2]), 1e-6)
        pdf_fwd = jnp.maximum(s.pdf, 1e-12)
        is_delta_b = (s.sampled_type & records.T_DELTA) != 0
        pdf_rev = jnp.where(is_delta_b, pdf_fwd, jnp.maximum(rev.pdf, 1e-12))
        dvc_n = _mis(cos_out / pdf_fwd) * (dvc_h * _mis(pdf_rev) + dvcm_h + mis_vm_w)
        dvm_n = _mis(cos_out / pdf_fwd) * (dvm_h * _mis(pdf_rev) + dvcm_h * mis_vc_w + 1.0)
        dvc_c = jnp.where(is_delta_b, _mis(cos_out) * dvc_h, dvc_n)
        dvm_c = jnp.where(is_delta_b, _mis(cos_out) * dvm_h, dvm_n)
        dvcm_c = jnp.where(is_delta_b, 0.0, _mis(1.0 / pdf_fwd))
        beta_c = beta_c * s.weight
        active_c = alive & (jnp.max(jnp.abs(s.weight), -1) > 0)
        wo_world = frame.to_world(s.wo)
        rays = traversal.Rays(o=shading.offset_ray_origin(si.p, si.ng, wo_world),
                              d=wo_world, tmin=jnp.zeros(B), tmax=jnp.full(B, 1e30))

    film = filmmod.add_samples(film, px, py, L * wt)
    return film


class VCM(tracer.TracerBase):
    """Vertex connection and merging (reference VCM) with a progressive
    per-pass merge radius."""

    def __init__(self, scene, width, height, max_depth: int = 6,
                 initial_radius: Optional[float] = None, alpha: float = 0.75,
                 seed: int = 0, active_types: Optional[Sequence[int]] = None):
        super().__init__(scene, width, height, seed=seed)
        from . import path as pathmod
        import numpy as np
        self.max_depth = max_depth
        if active_types is None:
            active_types = pathmod.scene_active_types(scene)
        self.active_types = tuple(active_types)
        if initial_radius is None:
            meta = schema.host_meta(scene)
            diag = float(np.linalg.norm(meta["world_hi"] - meta["world_lo"]))
            initial_radius = diag * 0.005
        self.initial_radius = float(initial_radius)
        self.alpha = alpha
        self._cache = {}

    def render_pass(self, scene, film, pass_idx):
        # VCM radius schedule r_i = r_0 * i^((alpha-1)/2)
        i = max(self.pass_idx + 1, 1)
        radius = self.initial_radius * (i ** ((self.alpha - 1.0) / 2.0))
        fn = self._cache.get("fn")
        if fn is None:
            fn = jax.jit(partial(vcm_pass, w=self.width, h=self.height,
                                 max_depth=self.max_depth,
                                 active_types=self.active_types))
            self._cache["fn"] = fn
        return fn(scene, film, jnp.int32(pass_idx), radius=jnp.float32(radius))