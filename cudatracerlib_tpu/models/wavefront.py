"""Regenerating wavefront path tracer: a fixed lane pool at ~full occupancy.

Reference: ``Integrators/WavefrontPathTracer.cu`` — the queue-based tracer
keeps its ray buffers FULL by replacing terminated paths with fresh camera
rays pulled from a global pixel counter (`WavefrontPathTracer.cu:62-134`,
the ray-regeneration pattern of Laine/Karras/Aila "Megakernels Considered
Harmful"). The chunked PT (models/path.py) instead advances one pixel block
bounce-by-bounce: by depth 4+ most lanes are dead, yet every traversal call
still pays the full fixed cost of the treelet glue (sorts/gathers sized
B*V regardless of liveness) and the lockstep kernel. On TPU those per-call
fixed costs dominate HBM-scale scenes (profiled round 4: traversal = 82% of
a san-miguel chunk, scaling with CALL COUNT), so lane occupancy is the
multiplier on everything.

TPU-native redesign (no device-side queues or atomics): one
``lax.while_loop`` whose body (1) traces ONE merged wavefront — every live
lane's closest-hit ray plus every pending NEE shadow ray, per-lane any-hit
— (2) resolves the previous vertex's NEE, (3) scatters finished paths to
the film and (4) REGENERATES those lanes with fresh camera paths from a
device counter (prefix-sum lane ranking replaces the reference's global
atomicAdd). The loop ends when the path queue is drained and every lane
has finished; per-pass sample counts are exactly spp * W * H, unbiased and
estimator-identical to the chunked PT (the same vertex math, only the
pixel->lane schedule differs).

Coverage gates: scenes with participating media or BSSRDF random walks fall
back to the chunked PT (those paths need in-iteration occlusion /
per-segment medium sampling; see models/path.py), as do low-discrepancy
sampler sequences (per-lane DYNAMIC depth would index sequence dimensions
with a traced per-lane value). PathTracer.auto() picks the right one.
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
from . import tracer

Array = jax.Array


def _wf_pass(scene: schema.SceneData, film: filmmod.Film, rays_ctr,
             iters_ctr, rows_ctr, ovf_ctr, pass_idx,
             w: int, h: int, lanes: int, spp: int, max_depth: int,
             rr_depth: int, use_nee: bool, active_types,
             with_alpha: bool = False, with_bump: bool = False,
             with_parallax: bool = False, regularize: bool = False,
             regularize_alpha: float = 0.08, with_textures: bool = True):
    """One full progressive pass (spp * w * h camera paths) through a
    regenerating lane pool of `lanes` slots. Returns (film, counters...)."""
    B = lanes
    n_paths = w * h * spp
    geom = scene.geom

    params = scene.sensor.params
    cone = 2.0 * jnp.tan(0.5 * params[0]) / jnp.maximum(params[5], 1.0)

    def gen(qidx):
        """Camera path for queue index q: pixel q % (w*h), sample q//(w*h)."""
        pix = qidx % (w * h)
        samp = pass_idx * spp + qidx // (w * h)
        rays, px, py, state, wt = tracer.gen_camera_rays(
            scene, pix, samp, pass_idx, w, h)
        return rays, px, py, state, wt

    def vertex(st, hit, occluded_prev):
        """Process one path vertex for the active lanes (the bounce body of
        models/path.py's pt_radiance, trimmed to the no-media fast path —
        keep the two in sync)."""
        (L, beta, active, fin, prev_pdf, prev_delta, had_smooth, cur, state,
         px, py, wt, p_contrib, p_act, depth) = st
        del fin  # replaced by fin_next below; the caller keeps the pre value

        # previous vertex's NEE resolves against this iteration's traversal
        L = L + jnp.where((p_act & ~occluded_prev)[:, None], p_contrib, 0.0)

        miss = active & ~hit.valid
        env_le = lightsmod.eval_environment(scene, cur.d)
        if use_nee:
            pdf_env = lightsmod.pdf_env_direct(scene, cur.d)
            w_env = jnp.where(prev_delta, 1.0,
                              mis.power_heuristic(prev_pdf, pdf_env))
        else:
            w_env = jnp.ones(B)
        L = L + jnp.where(miss[:, None], beta * env_le * w_env[:, None], 0.0)

        si = shading.fill_dg(geom, cur, hit, flip_to_ray=False)
        if with_parallax:
            si = bsdfmod.apply_parallax(scene, si)
        if with_bump:
            si = bsdfmod.apply_bump(scene, si)
        hit_l = active & hit.valid
        if with_alpha:
            a = bsdfmod.eval_alpha(scene, si.mat_id, si.uv)
            state, u_a = rngmod.next_float(state)
            alpha_pass = hit_l & (u_a >= a)
            hit_l = hit_l & ~alpha_pass
        else:
            alpha_pass = jnp.zeros(B, bool)

        le = lightsmod.eval_hit_emitter(scene, si.light_id, si.ng, si.wi)
        if use_nee:
            pdf_l = lightsmod.pdf_hit_emitter_direct(
                scene, si.light_id, cur.o, si.p, si.ng)
            w_hit = jnp.where(prev_delta, 1.0,
                              mis.power_heuristic(prev_pdf, pdf_l))
        else:
            w_hit = jnp.ones(B)
        L = L + jnp.where(hit_l[:, None], beta * le * w_hit[:, None], 0.0)

        footprint = cone * hit.t * si.uv_density
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
        if regularize:
            ctx = bsdfmod.regularize_ctx(ctx, had_smooth, regularize_alpha)
        frame = si.frame()
        wi_local = frame.to_local(si.wi)

        if use_nee:
            ed, state = lightsmod.sample_emitter_direct(scene, si.p, state)
            wo_local_nee = frame.to_local(ed.d)
            lob = bsdfmod.evaluate(ctx, wi_local, wo_local_nee, active_types)
            shadow_o = shading.offset_ray_origin(si.p, si.ng, ed.d)
            do_shadow = hit_l & ((lob.pdf + vm.length_sqr(lob.f)) > 0)
            p_rays = traversal.Rays(
                o=shadow_o, d=ed.d, tmin=jnp.zeros(B),
                tmax=jnp.where(do_shadow, ed.dist * 0.999, 0.0))
            w_nee = jnp.where(ed.is_delta, 1.0,
                              mis.power_heuristic(ed.pdf, lob.pdf))
            contrib = beta * lob.f * ed.radiance_over_pdf * w_nee[:, None]
            p_contrib = jnp.where(do_shadow[:, None], contrib, 0.0)
            p_act = hit_l
            n_shadow = jnp.sum(do_shadow.astype(jnp.float32))
        else:
            p_rays = traversal.Rays(o=jnp.zeros((B, 3)),
                                    d=jnp.broadcast_to(
                                        jnp.asarray([0.0, 0.0, 1.0]), (B, 3)),
                                    tmin=jnp.zeros(B), tmax=jnp.zeros(B))
            p_contrib = jnp.zeros((B, 3))
            p_act = jnp.zeros(B, bool)
            n_shadow = jnp.float32(0.0)

        s, state = bsdfmod.sample_with_rng(ctx, wi_local, state, active_types)
        wo_world = frame.to_world(s.wo)
        is_delta = (s.sampled_type & records.T_DELTA) != 0
        weight = s.weight
        next_pdf = s.pdf
        new_o = shading.offset_ray_origin(si.p, si.ng, wo_world)
        if with_alpha:
            wo_world = jnp.where(alpha_pass[:, None], cur.d, wo_world)
            weight = jnp.where(alpha_pass[:, None], 1.0, weight)
            is_delta = jnp.where(alpha_pass, True, is_delta)
            new_o = jnp.where(alpha_pass[:, None], si.p + cur.d * 1e-4, new_o)
        beta_next = beta * weight
        cont = hit_l | alpha_pass
        alive = cont & (jnp.max(jnp.abs(weight), axis=-1) > 0) \
            & (depth + 1 < max_depth)

        state, u_rr = rngmod.next_float(state)
        q = jnp.clip(jnp.max(beta_next, axis=-1), 0.05, 0.95)
        do_rr = depth >= rr_depth
        survive = jnp.where(do_rr, u_rr < q, True)
        beta_next = jnp.where((do_rr & survive)[:, None],
                              beta_next / jnp.maximum(q, 1e-6)[:, None],
                              beta_next)
        alive = alive & survive

        had_smooth = had_smooth | (cont & ~is_delta)
        nxt = traversal.Rays(o=new_o, d=wo_world, tmin=jnp.zeros(B),
                             tmax=jnp.full(B, 1e30))
        # a path that stops here still owes its final NEE resolution: the
        # lane drains for one iteration (fin) before scatter + regeneration
        fin_next = active & ~alive
        return ((L, jnp.where(alive[:, None], beta_next, 0.0), alive,
                 fin_next, next_pdf, is_delta, had_smooth, nxt, state,
                 px, py, wt, p_contrib, p_act, depth + 1), p_rays, n_shadow)

    def body(carry):
        (film, qhead, L, beta, active, fin, prev_pdf, prev_delta, had_smooth,
         cur, state, px, py, wt, p_contrib, p_rays, p_act, depth,
         nrays, niters, nrows, novf, it) = carry

        trace_rays = traversal.Rays(o=cur.o, d=cur.d, tmin=cur.tmin,
                                    tmax=jnp.where(active, cur.tmax, 0.0))
        nrays = nrays + jnp.sum(active.astype(jnp.float32))
        comb = traversal.Rays(
            o=jnp.concatenate([trace_rays.o, p_rays.o]),
            d=jnp.concatenate([trace_rays.d, p_rays.d]),
            tmin=jnp.concatenate([trace_rays.tmin, p_rays.tmin]),
            tmax=jnp.concatenate([trace_rays.tmax, p_rays.tmax]))
        amask = jnp.concatenate([jnp.zeros(B, bool), jnp.ones(B, bool)])
        h2, it1, rw1, ov1 = traversal8.intersect_scene(
            geom, comb, with_iters=True, any_mask=amask)
        hit = traversal.Hit(t=h2.t[:B], tri=h2.tri[:B], u=h2.u[:B],
                            v=h2.v[:B],
                            inst=None if h2.inst is None else h2.inst[:B])
        occluded_prev = h2.tri[B:] >= 0
        niters, nrows, novf = niters + it1, nrows + rw1, novf + ov1

        fin_pre = fin
        st = (L, beta, active, fin, prev_pdf, prev_delta, had_smooth, cur,
              state, px, py, wt, p_contrib, p_act, depth)
        st, p_rays, n_shadow = vertex(st, hit, occluded_prev)
        (L, beta, active, fin, prev_pdf, prev_delta, had_smooth, cur, state,
         px, py, wt, p_contrib, p_act, depth) = st
        nrays = nrays + n_shadow
        # lanes that ENTERED this iteration draining (fin set last iteration,
        # final NEE just resolved above) are complete: scatter + free. All of
        # vertex()'s L additions are masked by active/hit_l/miss, so draining
        # lanes' L was untouched by it.
        done = fin_pre
        film = filmmod.add_samples(film, px, py, L * wt, mask=done)

        # regenerate freed lanes from the path queue (prefix-sum ranking =
        # the reference's global-counter atomicAdd, WavefrontPathTracer.cu)
        rank = jnp.cumsum(done.astype(jnp.int32)) - 1
        qidx = qhead + rank
        take = done & (qidx < n_paths)
        qhead = qhead + jnp.sum(done.astype(jnp.int32))
        rays_n, px_n, py_n, state_n, wt_n = gen(jnp.where(take, qidx, 0))
        sel = lambda a, b: jnp.where(take, a, b)
        sel3 = lambda a, b: jnp.where(take[:, None], a, b)
        cur = traversal.Rays(o=sel3(rays_n.o, cur.o), d=sel3(rays_n.d, cur.d),
                             tmin=sel(rays_n.tmin, cur.tmin),
                             tmax=sel(rays_n.tmax, cur.tmax))
        L = jnp.where(take[:, None], 0.0, L)
        beta = jnp.where(take[:, None], 1.0, beta)
        active = jnp.where(take, True, active)
        fin = jnp.where(take | done, False, fin)
        prev_pdf = sel(jnp.zeros(B), prev_pdf)
        prev_delta = jnp.where(take, True, prev_delta)
        had_smooth = jnp.where(take, False, had_smooth)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take.reshape((B,) + (1,) * (a.ndim - 1)),
                                   a, b), state_n, state)
        px, py, wt = sel(px_n, px), sel(py_n, py), sel3(wt_n, wt)
        depth = jnp.where(take, 0, depth)
        # fresh lanes have no pending shadow: kill their slot in p_rays
        p_rays = traversal.Rays(
            o=p_rays.o, d=p_rays.d, tmin=p_rays.tmin,
            tmax=jnp.where(take, 0.0, p_rays.tmax))
        p_act = p_act & ~take
        return (film, qhead, L, beta, active, fin, prev_pdf, prev_delta,
                had_smooth, cur, state, px, py, wt, p_contrib, p_rays,
                p_act, depth, nrays, niters, nrows, novf, it + 1)

    def cond(carry):
        qhead, active, fin, it = carry[1], carry[4], carry[5], carry[-1]
        more = (qhead < n_paths) | jnp.any(active) | jnp.any(fin)
        # safety bound: every lane processes <= ceil(paths/B) regenerations
        # of <= max_depth+1 iterations each, plus the initial fill + drain
        limit = (n_paths // B + 2) * (max_depth + 2)
        return more & (it < limit)

    # initial fill: lanes 0..B-1 take queue slots 0..B-1
    q0 = jnp.arange(B, dtype=jnp.int32)
    rays0, px0, py0, state0, wt0 = gen(jnp.minimum(q0, n_paths - 1))
    act0 = q0 < n_paths
    rays0 = traversal.Rays(o=rays0.o, d=rays0.d, tmin=rays0.tmin,
                           tmax=jnp.where(act0, rays0.tmax, 0.0))
    dead = traversal.Rays(o=jnp.zeros((B, 3)),
                          d=jnp.broadcast_to(
                              jnp.asarray([0.0, 0.0, 1.0]), (B, 3)),
                          tmin=jnp.zeros(B), tmax=jnp.zeros(B))
    carry = (film, jnp.int32(min(B, n_paths)), jnp.zeros((B, 3)),
             jnp.ones((B, 3)), act0, jnp.zeros(B, bool), jnp.zeros(B),
             jnp.ones(B, bool), jnp.zeros(B, bool), rays0, state0, px0, py0,
             wt0, jnp.zeros((B, 3)), dead, jnp.zeros(B, bool),
             jnp.zeros(B, jnp.int32), rays_ctr, iters_ctr, rows_ctr, ovf_ctr,
             jnp.int32(0))
    carry = jax.lax.while_loop(cond, body, carry)
    return carry[0], carry[18], carry[19], carry[20], carry[21]


class WavefrontPT(tracer.TracerBase):
    """Regenerating wavefront PT (reference WavefrontPathTracer). Estimator-
    identical to models/path.PathTracer on media-free scenes; the lane pool
    stays ~full so per-traversal fixed costs amortize over live rays only."""

    def __init__(self, scene, width, height, max_depth: int = 8,
                 rr_depth: int = 3, use_nee: bool = True,
                 regularize: bool = False, spp_per_pass: int = 1,
                 lanes: int = 1 << 17, seed: int = 0,
                 active_types: Optional[Sequence[int]] = None):
        from . import medium as mediummod
        from . import path as pathmod
        super().__init__(scene, width, height, spp_per_pass=spp_per_pass,
                         seed=seed)
        assert not mediummod.has_media(scene.media), \
            "WavefrontPT is the media-free fast path; use PathTracer"
        self.max_depth = max_depth
        if active_types is None:
            active_types = pathmod.scene_active_types(scene)
        self.active_types = tuple(active_types)
        self.lanes = min(lanes, width * height * spp_per_pass)
        self._rays_dev = jnp.float32(0.0)
        self._iters_dev = jnp.float32(0.0)
        self._rows_dev = jnp.float32(0.0)
        self._ovf_dev = jnp.float32(0.0)
        kw = dict(w=width, h=height, lanes=self.lanes, spp=spp_per_pass,
                  max_depth=max_depth, rr_depth=rr_depth, use_nee=use_nee,
                  active_types=self.active_types,
                  with_alpha=bsdfmod.scene_has_alpha(scene),
                  with_bump=bsdfmod.scene_has_bump(scene),
                  with_parallax=bsdfmod.scene_has_parallax(scene),
                  regularize=regularize,
                  with_textures=bsdfmod.scene_texture_mask(scene))
        self._jitted = jax.jit(partial(_wf_pass, **kw))
        self._jitted_many = jax.jit(partial(_wf_many, **kw))

    def render_pass(self, scene, film, pass_idx):
        (film, self._rays_dev, self._iters_dev, self._rows_dev,
         self._ovf_dev) = self._jitted(
                scene, film, self._rays_dev, self._iters_dev, self._rows_dev,
                self._ovf_dev, jnp.int32(pass_idx + (self.seed << 16)))
        return film

    def render_batched(self, n_passes: int):
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
        return float(self._rays_dev)


def _wf_many(scene, film, rays_ctr, iters_ctr, rows_ctr, ovf_ctr, pass0,
             n_passes, **kw):
    """n_passes regenerating passes in ONE dispatch (same pattern as
    models/path._pt_many)."""
    def body(k, carry):
        f, rc, ic, wc, oc = carry
        return _wf_pass(scene, f, rc, ic, wc, oc, pass0 + k, **kw)
    return jax.lax.fori_loop(0, n_passes, body,
                             (film, rays_ctr, iters_ctr, rows_ctr, ovf_ctr))
