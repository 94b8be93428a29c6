"""Light tracer: particle tracing from the emitters with camera splats.

Reference: ``Integrators/PhotonTracer.cu:17-108`` — a `ParticleProcess` walk
that connects every emission/surface vertex to the sensor via
`sampleAttenuatedSensorDirect` and splats to the film. TPU-native: one jitted
pass walks W*H light subpaths in lockstep (fori_loop over bounces) and
scatter-adds splats; with exactly W*H light paths per pass, the splat scale in
`film.develop` (1/n_passes) matches the path-tracer's per-pixel estimator.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import records
from ..core import rng as rngmod
from ..core import vecmath as vm
from ..ops import shading, traversal, traversal8
from ..scene import schema, sensors
from . import bsdf as bsdfmod
from . import film as filmmod
from . import lights as lightsmod
from . import tracer

Array = jax.Array


def splat_to_camera(scene: schema.SceneData, film: filmmod.Film, p: Array,
                    value: Array, active: Array) -> filmmod.Film:
    """Connect points to the sensor, shadow-test, and splat value*We."""
    B = p.shape[0]
    sd = sensors.sample_direct(scene.sensor, p, None)
    # occlusion between the surface point and the camera
    shadow = traversal.Rays(
        o=p + sd.d * 1e-4, d=sd.d, tmin=jnp.zeros(B),
        tmax=jnp.where(active & sd.valid, sd.dist * 0.999, 0.0))
    occ = traversal8.intersect_scene(scene.geom, shadow, any_hit=True).valid
    ok = active & sd.valid & ~occ
    contrib = value * sd.weight
    px = jnp.clip(sd.p_film[:, 0].astype(jnp.int32), 0, film.w - 1)
    py = jnp.clip(sd.p_film[:, 1].astype(jnp.int32), 0, film.h - 1)
    return filmmod.splat(film, px, py, contrib, mask=ok), sd


def lt_pass(scene: schema.SceneData, film: filmmod.Film, pass_idx, n_paths: int,
            max_depth: int, active_types: Sequence[int],
            path_ids: Array = None, total_paths: int = None) -> filmmod.Film:
    """Trace n_paths light subpaths; splat every vertex to the camera.

    path_ids/total_paths support multi-chip sharding: each shard traces its
    own id range while the splat normalization uses the global path count."""
    if path_ids is None:
        path_ids = jnp.arange(n_paths, dtype=jnp.int32)
    n_paths = path_ids.shape[0]
    n_total = total_paths or n_paths
    state = rngmod.seed(path_ids, pass_idx, jnp.uint32(0x9E3779B9))
    er, state = lightsmod.sample_emitter_ray(scene, state)

    # splat the emission vertex itself (s=1 connection): radiance of the
    # emitter toward the camera over its position pdf
    sd_dir = sensors.sample_direct(scene.sensor, er.o, None)
    cos_l = jnp.where(jnp.any(er.n != 0, axis=-1),
                      jnp.maximum(vm.dot(er.n, sd_dir.d), 0.0), 1.0)
    em_val = er.le * (cos_l / jnp.maximum(er.pdf_pos, 1e-12))[:, None] / float(n_total) * film.w * film.h
    is_area_or_point = jnp.isin(jnp.take(scene.lights.light_type, er.light_idx),
                                jnp.asarray([schema.LIGHT_POINT, schema.LIGHT_DIFFUSE,
                                             schema.LIGHT_SPOT]))
    film, _ = splat_to_camera(scene, film, er.o, em_val, is_area_or_point)

    beta = er.power / float(n_total) * film.w * film.h
    rays = traversal.Rays(o=er.o + er.d * 1e-4, d=er.d,
                          tmin=jnp.zeros(n_paths), tmax=jnp.full(n_paths, 1e30))
    active = jnp.ones(n_paths, bool)

    def bounce(depth, carry):
        film, beta, active, rays, state = carry
        trace_rays = rays._replace(tmax=jnp.where(active, rays.tmax, 0.0))
        hit = traversal8.intersect_scene(scene.geom, trace_rays)
        si = shading.fill_dg(scene.geom, trace_rays, hit, flip_to_ray=False)
        alive = active & hit.valid

        ctx = bsdfmod.gather_ctx(scene, si.mat_id, si.uv)
        frame = si.frame()
        wi_local = frame.to_local(si.wi)

        # connect this vertex to the camera: importance transport
        sd_probe = sensors.sample_direct(scene.sensor, si.p, None)
        wo_cam_local = frame.to_local(sd_probe.d)
        lob = bsdfmod.evaluate(ctx, wi_local, wo_cam_local, active_types)
        film, _ = splat_to_camera(scene, film, shading.offset_ray_origin(si.p, si.ng, sd_probe.d),
                                  beta * lob.f, alive)

        # continue the walk (importance transport: BSDF sampling is symmetric
        # for the materials here; full non-symmetry correction with shading
        # normals lands with the BDPT work)
        s, state = bsdfmod.sample_with_rng(ctx, wi_local, state, active_types)
        wo_world = frame.to_world(s.wo)
        beta = beta * s.weight
        alive = alive & (jnp.max(jnp.abs(s.weight), axis=-1) > 0) & (depth + 1 < max_depth)
        state, u_rr = rngmod.next_float(state)
        q = jnp.clip(jnp.max(beta, axis=-1), 0.05, 0.95)
        do_rr = depth >= 3
        survive = jnp.where(do_rr, u_rr < q, True)
        beta = jnp.where((do_rr & survive)[:, None], beta / jnp.maximum(q, 1e-6)[:, None], beta)
        alive = alive & survive
        new_rays = traversal.Rays(o=shading.offset_ray_origin(si.p, si.ng, wo_world),
                                  d=wo_world, tmin=jnp.zeros(n_paths),
                                  tmax=jnp.full(n_paths, 1e30))
        return film, jnp.where(alive[:, None], beta, 0.0), alive, new_rays, state

    film, beta, active, rays, state = jax.lax.fori_loop(
        0, max_depth, bounce, (film, beta, active, rays, state))
    return film


class LightTracer(tracer.TracerBase):
    """Pure light tracing (reference PhotonTracer): the image forms entirely
    from splats."""

    def __init__(self, scene, width, height, max_depth: int = 8,
                 n_paths: Optional[int] = None, seed: int = 0,
                 active_types: Optional[Sequence[int]] = None):
        super().__init__(scene, width, height, seed=seed)
        from . import path as pathmod
        self.max_depth = max_depth
        self.n_paths = n_paths or (width * height)
        if active_types is None:
            active_types = pathmod.scene_active_types(scene)
        self.active_types = tuple(active_types)
        self._jitted = jax.jit(partial(lt_pass, n_paths=self.n_paths,
                                       max_depth=max_depth,
                                       active_types=self.active_types))
        self._jitted_many = tracer.fuse_passes(
            partial(lt_pass, n_paths=self.n_paths, max_depth=max_depth,
                    active_types=self.active_types))

    def render_pass(self, scene, film, pass_idx):
        film = self._jitted(scene, film, jnp.int32(pass_idx))
        # weight=1 everywhere so develop() averages the (empty) rgb buffer
        return film._replace(weight=jnp.ones_like(film.weight))

    def render_batched(self, n_passes: int):
        film = self._jitted_many(self.scene, self.film,
                                 jnp.int32(self.pass_idx),
                                 jnp.int32(n_passes))
        self.film = film._replace(
            weight=jnp.ones_like(film.weight),
            n_passes=film.n_passes + float(n_passes))
        self.pass_idx += n_passes
