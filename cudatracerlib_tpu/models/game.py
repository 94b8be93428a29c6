"""GameTracer: pseudo-realtime GI via path-space filtering.

Reference: ``Integrators/GameTracer`` + ``Kernel/PathSpaceFilteringBuffer``
(Keller et al. path-space filtering: first-bounce incident radiance cached in
a hash grid, re-gathered per pixel with a footprint-adaptive radius, temporal
accumulation across frames). TPU-native: the cache is the sort-based hash grid
(ops/hashgrid.py); samples are (position, normal, incident radiance) rows,
re-gathered at primary hits and blended with the previous frame's film.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from ..core import vecmath as vm
from ..ops import hashgrid, shading, traversal, traversal8
from ..scene import schema
from . import bsdf as bsdfmod
from . import film as filmmod
from . import lights as lightsmod
from . import ppm as ppmmod
from . import tracer

Array = jax.Array


def psf_pass(scene: schema.SceneData, film: filmmod.Film, prev_p, prev_ns,
             pass_idx, w: int, h: int, radius: float, temporal_alpha: float,
             active_types):
    """One realtime-GI frame. radius is the CAP; each pixel's gather radius
    adapts to its projected footprint (reference
    PathSpaceFilteringBuffer.h:15-142), and temporal history is invalidated
    per pixel when the hit point or normal moved (the reference's
    accumulation-buffer validity test)."""
    B = w * h
    pixel_idx = jnp.arange(B, dtype=jnp.int32)
    rays, px, py, state, wt = tracer.gen_camera_rays(scene, pixel_idx, 0, pass_idx, w, h)
    hit = traversal8.intersect_scene(scene.geom, rays, coherent=True)
    si = shading.fill_dg(scene.geom, rays, hit, flip_to_ray=False)
    alive = hit.valid
    ctx = bsdfmod.gather_ctx(scene, si.mat_id, si.uv)
    frame = si.frame()
    wi_local = frame.to_local(si.wi)

    # one-sample incident direct light at the primary hit -> cache entry
    ed, state = lightsmod.sample_emitter_direct(scene, si.p, state)
    wo_l = frame.to_local(ed.d)
    lob = bsdfmod.evaluate(ctx, wi_local, wo_l, active_types)
    shadow = traversal.Rays(o=shading.offset_ray_origin(si.p, si.ng, ed.d), d=ed.d,
                            tmin=jnp.zeros(B),
                            tmax=jnp.where(alive, ed.dist * 0.999, 0.0))
    occ = traversal8.intersect_scene(scene.geom, shadow, any_hit=True).valid
    Li = jnp.where((alive & ~occ)[:, None], lob.f * ed.radiance_over_pdf, 0.0)

    rows = jnp.concatenate([si.p, Li, si.ns, jnp.zeros((B, 3))], -1)
    grid = hashgrid.build_grid(rows, si.p, alive, scene.world_lo, scene.world_hi,
                               jnp.float32(2.0 * radius))

    # footprint-adaptive gather radius: ~4 projected pixels at the hit,
    # capped by the global radius (cells cover 2*radius so queries stay
    # complete)
    params = scene.sensor.params
    cone = 2.0 * jnp.tan(0.5 * params[0]) / jnp.maximum(params[5], 1.0)
    r_lane = jnp.clip(4.0 * cone * hit.t, radius / 16.0, radius)

    def accum(carry, prows, mask):
        # K-axis vectorized over the batched neighborhood (B, K, W)
        acc, cnt = carry
        ok = mask & (jnp.sum(prows[..., 6:9] * si.ns[:, None, :], -1) > 0.8)
        return (acc + jnp.sum(jnp.where(ok[..., None], prows[..., 3:6], 0.0),
                              axis=1),
                cnt + jnp.sum(ok.astype(jnp.float32), axis=1))

    acc, cnt = hashgrid.gather_neighbors(grid, si.p, r_lane, accum,
                                         (jnp.zeros((B, 3)), jnp.zeros(B)))
    filtered = acc / jnp.maximum(cnt, 1.0)[:, None]
    le = lightsmod.eval_hit_emitter(scene, si.light_id, si.ng, si.wi)
    Lout = jnp.where(alive[:, None], filtered + le,
                     lightsmod.eval_environment(scene, rays.d))

    # temporal accumulation with per-pixel invalidation: history only
    # survives where the primary hit stayed on the same surface point
    same_pt = vm.length(si.p - prev_p.reshape(B, 3)) < r_lane
    same_n = vm.dot(si.ns, prev_ns.reshape(B, 3)) > 0.9
    valid_hist = (film.n_passes > 0) & same_pt & same_n
    a_eff = jnp.where(valid_hist, temporal_alpha, 1.0).reshape(h, w, 1)
    blended = film.rgb * (1 - a_eff) + Lout.reshape(h, w, 3) * a_eff
    return (film._replace(rgb=blended, weight=jnp.ones_like(film.weight)),
            si.p.reshape(h, w, 3), si.ns.reshape(h, w, 3))


class GameTracer(tracer.TracerBase):
    """Primary hits + path-space-filtered direct light with temporal reuse."""

    def __init__(self, scene, width, height, radius: Optional[float] = None,
                 temporal_alpha: float = 0.25, seed: int = 0,
                 active_types: Optional[Sequence[int]] = None):
        super().__init__(scene, width, height, seed=seed)
        from . import path as pathmod
        import numpy as np
        if active_types is None:
            active_types = pathmod.scene_active_types(scene)
        if radius is None:
            meta = schema.host_meta(scene)
            diag = float(np.linalg.norm(meta["world_hi"] - meta["world_lo"]))
            radius = diag * 0.01
        self._jitted = jax.jit(partial(
            psf_pass, w=width, h=height, radius=float(radius),
            temporal_alpha=temporal_alpha, active_types=tuple(active_types)))
        self._prev_p = jnp.zeros((height, width, 3))
        self._prev_ns = jnp.zeros((height, width, 3))

    def render_pass(self, scene, film, pass_idx):
        film, self._prev_p, self._prev_ns = self._jitted(
            scene, film, self._prev_p, self._prev_ns, jnp.int32(pass_idx))
        return film
