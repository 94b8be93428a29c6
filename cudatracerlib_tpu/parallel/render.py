"""Multi-chip rendering: image-plane sharding over a device mesh.

The reference is single-GPU (SURVEY §2.8); this is the new TPU-native
distributed story: pixel lanes are sharded across a 1D `jax.sharding.Mesh`
("tiles" axis), the scene pytree is fully replicated in every chip's HBM, each
chip traces its lane shard, and the partial film/splat buffers are `psum`med
over ICI — the analogue of compositing per-GPU framebuffers, with XLA choosing
the all-reduce schedule.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import bsdf as bsdfmod
from ..models import film as filmmod
from ..models import path as pathmod
from ..models import tracer
from ..scene import schema

Array = jax.Array


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def sharded_pt_pass(scene: schema.SceneData, film: filmmod.Film, pass_idx: Array,
                    mesh: Mesh, w: int, h: int, max_depth: int = 6,
                    spp: int = 1, active_types: Sequence[int] = None,
                    axis: str = "tiles") -> filmmod.Film:
    """One progressive PT pass with pixels sharded over the mesh.

    Every device traces w*h/n_dev pixels; partial films are psum'd so the
    returned film is replicated (identical) on all devices.
    """
    if active_types is None:
        active_types = pathmod.scene_active_types(scene)
    n_dev = mesh.shape[axis]
    assert (w * h) % n_dev == 0, "pixel count must divide the mesh"

    # check_vma off: sensor-model lax.switch branches mix replicated and
    # sharded-varying outputs, which the varying-axis checker rejects
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis), P()),
             out_specs=P(), check_vma=False)
    def run(scene, film, pixel_idx, pass_idx):
        partial_film = filmmod.new_film(w, h)
        for s_i in range(spp):
            rays, px, py, state, wt = tracer.gen_camera_rays(
                scene, pixel_idx, pass_idx * spp + s_i, pass_idx, w, h)
            L, state = pathmod.pt_radiance(scene, rays, state, max_depth,
                                           active_types=tuple(active_types))
            partial_film = filmmod.add_samples(partial_film, px, py, L * wt)
        rgb = jax.lax.psum(partial_film.rgb, axis)
        weight = jax.lax.psum(partial_film.weight, axis)
        splat = jax.lax.psum(partial_film.splat, axis)
        return film._replace(rgb=film.rgb + rgb, weight=film.weight + weight,
                             splat=film.splat + splat)

    pixel_idx = jnp.arange(w * h, dtype=jnp.int32)
    return run(scene, film, pixel_idx, jnp.int32(pass_idx))


def replicate_scene(scene: schema.SceneData, mesh: Mesh) -> schema.SceneData:
    """Place every scene array replicated across the mesh."""
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), scene)


class ShardedPathTracer(pathmod.PathTracer):
    """PathTracer whose passes run SPMD over a device mesh."""

    def __init__(self, scene, width, height, mesh: Mesh = None, **kw):
        self.mesh = mesh or make_mesh()
        scene = replicate_scene(scene, self.mesh)
        super().__init__(scene, width, height, **kw)
        self._sharded = jax.jit(partial(
            sharded_pt_pass, mesh=self.mesh, w=width, h=height,
            max_depth=self.max_depth, spp=self.spp_per_pass,
            active_types=self.active_types))

    def render_pass(self, scene, film, pass_idx):
        return self._sharded(scene, film, jnp.int32(pass_idx))
