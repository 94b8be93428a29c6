"""FastTracer: buffered primary-visibility / depth renderer.

Reference: ``Integrators/FastTracer.cu`` — two kernels over a DoubleRayBuffer
producing camera-depth or binary-visibility images as fast as the intersector
allows. Used as the traversal-throughput benchmark probe.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..ops import traversal8
from . import film as filmmod
from . import tracer

MODE_DEPTH, MODE_VISIBILITY = 0, 1


class FastTracer(tracer.TracerBase):
    progressive = False

    def __init__(self, scene, width, height, mode: int = MODE_DEPTH, **kw):
        super().__init__(scene, width, height, **kw)
        self.mode = mode
        self._jitted = jax.jit(partial(_fast_pass, w=width, h=height, mode=mode))

    def render_pass(self, scene, film, pass_idx):
        return self._jitted(scene, film, jnp.int32(pass_idx))


def _fast_pass(scene, film, pass_idx, w, h, mode):
    pixel_idx = jnp.arange(w * h, dtype=jnp.int32)
    rays, px, py, state, wt = tracer.gen_camera_rays(scene, pixel_idx, 0, pass_idx, w, h)
    hit = traversal8.intersect_scene(scene.geom, rays, coherent=True)
    if mode == MODE_VISIBILITY:
        v = hit.valid.astype(jnp.float32)
    else:
        far = vm.length(scene.world_hi - scene.world_lo)
        v = jnp.where(hit.valid, 1.0 - jnp.clip(hit.t / far, 0, 1), 0.0)
    return filmmod.add_samples(film, px, py, jnp.repeat(v[:, None], 3, -1))
