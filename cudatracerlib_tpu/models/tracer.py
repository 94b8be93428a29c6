"""Tracer framework: progressive pass loop + camera-ray generation.

Reference: ``Kernel/Tracer.h`` (TracerBase / Tracer<PROGRESSIVE> DoPass loop)
and the block-sampler launch logic (`Tracer.h:264-289`). TPU-native version:
each pass is one jitted SPMD function over a flat lane batch (lane = pixel
sample); "blocks" become lane tiles chosen by the adaptive block sampler, and
the film update is a scatter-add instead of per-block kernel launches.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from ..scene import schema, sensors
from ..ops import traversal
from . import film as filmmod

Array = jax.Array


def gen_camera_rays(scene: schema.SceneData, pixel_idx: Array, sample_idx,
                    pass_idx, w: int, h: int, filter_type: int = 0,
                    sampler_type: int = 0):
    """Per-lane camera ray generation with filter-importance-sampled jitter.

    pixel_idx: (B,) flat pixel ids (y*w + x). Returns (rays, px, py, rng_state).
    sampler_type (static): 0 = independent PCG, 1 = stratified, 2 = Sobol —
    the reference's selectable sampler backends (Kernel/Sampler_device.h),
    applied to the camera dims (0-1 pixel jitter, 2-3 lens).
    """
    state = rngmod.seed(pixel_idx, sample_idx, pass_idx)
    px = (pixel_idx % w).astype(jnp.int32)
    py = (pixel_idx // w).astype(jnp.int32)
    state, u_pix = rngmod.next_float2(state)
    state, u_lens = rngmod.next_float2(state)
    if sampler_type != 0:
        from . import samplers
        u_pix = samplers.sample_2d(sampler_type, pixel_idx, sample_idx, 0)
        u_lens = samplers.sample_2d(sampler_type, pixel_idx, sample_idx, 2)
    jitter = _filter_jitter(filter_type, u_pix)
    p_film = jnp.stack([px.astype(jnp.float32) + 0.5 + jitter[:, 0],
                        py.astype(jnp.float32) + 0.5 + jitter[:, 1]], axis=-1)
    sr = sensors.sample_ray(scene.sensor, p_film, u_lens)
    # tmin/tmax derive from the (possibly device-varying) ray origins rather
    # than fresh constants so downstream loop carries type consistently
    # under shard_map's check_vma (see scene/sensors._match_vary)
    vz = jnp.where(jnp.isfinite(sr.o[:, 0]), 0.0, 0.0)
    rays = traversal.Rays(o=sr.o, d=sr.d, tmin=vz, tmax=vz + 1e30)
    return rays, px, py, state, sr.weight


def _filter_jitter(filter_type: int, u: Array) -> Array:
    """Filter importance sampling: jitter offsets in pixels, centered at 0.

    0 = box (1px), 1 = tent (2px), 2 = gaussian (sigma 0.5, truncated at 2)."""
    from ..core import warp
    if filter_type == 1:
        return warp.square_to_tent(u)
    if filter_type == 2:
        g = warp.square_to_std_normal(u) * 0.5
        return jnp.clip(g, -2.0, 2.0)
    return u - 0.5


def fuse_passes(pass_fn):
    """jit-wrap a functional (scene, film, pass_idx) -> film pass into a
    (scene, film, pass0, n_passes) -> film call running n_passes inside ONE
    dynamic `lax.fori_loop` dispatch (per-dispatch transport overhead on the
    axon tunnel is ~tens of ms — fusing a batch amortizes it to one)."""
    def many(scene, film, pass0, n_passes):
        return jax.lax.fori_loop(
            0, n_passes, lambda i, f: pass_fn(scene, f, pass0 + i), film)
    return jax.jit(many)


class TracerBase:
    """Host-side driver: owns pass counters and wall-clock stats
    (reference TracerBase pass/rays-per-second accounting)."""

    progressive = True

    def __init__(self, scene: schema.SceneData, width: int, height: int,
                 spp_per_pass: int = 1, seed: int = 0):
        self.scene = scene
        self.width = width
        self.height = height
        self.spp_per_pass = spp_per_pass
        self.seed = seed
        self.pass_idx = 0
        self.film = filmmod.new_film(width, height)
        self.last_pass_seconds = 0.0
        self.accum_seconds = 0.0
        self.rays_traced = 0

    # subclasses implement: render_pass(scene, film, pass_idx) -> film
    def render_pass(self, scene, film, pass_idx):
        raise NotImplementedError

    def do_pass(self):
        t0 = time.perf_counter()
        self.film = self.render_pass(self.scene, self.film, self.pass_idx)
        jax.block_until_ready(self.film.rgb)
        self.last_pass_seconds = time.perf_counter() - t0
        self.accum_seconds += self.last_pass_seconds
        self.film = self.film._replace(n_passes=self.film.n_passes + 1.0)
        self.pass_idx += 1

    def render(self, n_passes: int = 1) -> Array:
        for _ in range(n_passes):
            self.do_pass()
        return filmmod.develop(self.film)

    def render_batched(self, n_passes: int):
        """Run n_passes with as few host->device dispatches as the tracer
        supports. Subclasses with a purely functional pass fuse the whole
        batch into ONE jitted `lax.fori_loop` dispatch (the per-dispatch
        overhead of the device transport — ~tens of ms through the axon
        tunnel — otherwise dominates sub-50ms passes). Base fallback: the
        plain per-pass loop. Equivalent to `render(n)` minus per-pass
        wall-clock stats; `pass_idx`, film and counters advance identically.
        """
        for _ in range(n_passes):
            self.do_pass()

    def debug_pixel(self, x: int, y: int):
        """Re-run the integrator for one pixel (reference Tracer::Debug) —
        runs the same jitted code on a single lane batch for inspection."""
        pix = jnp.asarray([y * self.width + x], jnp.int32)
        return self._debug_lane(pix)

    def _debug_lane(self, pixel_idx):
        raise NotImplementedError

    def status(self) -> dict:
        spp = self.pass_idx * self.spp_per_pass
        return dict(passes=self.pass_idx, spp=spp,
                    seconds=self.accum_seconds,
                    spp_per_second=spp / max(self.accum_seconds, 1e-9))
