"""Ablation profile of one PT chunk on TPU: where does the pass time go?

Timing ends at a real device->host readback (the axon tunnel's
block_until_ready does not wait for execution — see bench.py docstring).
"""
import time
from functools import partial
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.ops import traversal, traversal8
from cudatracerlib_tpu.utils import example_scenes


def _drain(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    return float(jnp.ravel(leaves[0])[0])


def timeit(fn, *args, n=6, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / n


def main():
    w = h = 512
    chunk = 1 << 16
    scene = example_scenes.cornell_box(w, h).build()
    at = pathmod.scene_active_types(scene)
    film = filmmod.new_film(w, h)
    z = jnp.float32(0.0)

    def make(**over):
        fn = partial(pathmod._pt_chunk, w=w, h=h, chunk=chunk, max_depth=6,
                     rr_depth=3, use_nee=over.pop("use_nee", True), spp=1,
                     active_types=at, **over)
        return jax.jit(fn)

    full = make()
    args = (scene, film, z, z, z, z, jnp.int32(0), jnp.int32(0))
    print(f"full chunk:      {timeit(full, *args)*1e3:8.2f} ms")

    no_nee = make(use_nee=False)
    print(f"no NEE:          {timeit(no_nee, *args)*1e3:8.2f} ms")

    # stub out traversal entirely: everything misses
    def fake_intersect(geom, rays, any_hit=False, with_iters=False, roots=None,
                       coherent=False):
        B = rays.o.shape[0]
        hit = traversal.Hit(t=rays.tmax, tri=jnp.full(B, -1, jnp.int32),
                            u=jnp.zeros(B), v=jnp.zeros(B))
        if with_iters:
            return hit, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)
        return hit
    with mock.patch.object(traversal8, "intersect_scene", fake_intersect):
        no_trace = jax.jit(partial(pathmod._pt_chunk, w=w, h=h, chunk=chunk,
                                   max_depth=6, rr_depth=3, use_nee=True, spp=1,
                                   active_types=at))
        print(f"no traversal:    {timeit(no_trace, *args)*1e3:8.2f} ms")

    # traversal alone: camera rays then 6x(closest+shadow-ish) on same rays
    from cudatracerlib_tpu.models import tracer as tracermod
    def trav_only(scene, film, pass_idx, chunk_idx):
        pixel_idx = (chunk_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)) % (w * h)
        rays, px, py, state, wt = tracermod.gen_camera_rays(
            scene, pixel_idx, pass_idx, pass_idx, w, h)
        acc = jnp.zeros(chunk)
        for i in range(6):
            hit = traversal8.intersect_scene(scene.geom, rays)
            occ = traversal8.intersect_scene(scene.geom, traversal.Rays(
                o=rays.o, d=-rays.d, tmin=jnp.zeros(chunk),
                tmax=jnp.full(chunk, 100.0)), any_hit=True)
            acc = acc + hit.t + occ.t
            rays = traversal.Rays(o=rays.o + 0.01 * i, d=rays.d,
                                  tmin=rays.tmin, tmax=rays.tmax)
        return acc
    tfn = jax.jit(trav_only)
    targs = (scene, film, jnp.int32(0), jnp.int32(0))
    print(f"12x traversal:   {timeit(tfn, *targs)*1e3:8.2f} ms")

    def raygen_only(scene, film, pass_idx, chunk_idx):
        pixel_idx = (chunk_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)) % (w * h)
        rays, px, py, state, wt = tracermod.gen_camera_rays(
            scene, pixel_idx, pass_idx, pass_idx, w, h)
        return filmmod.add_samples(film, px, py, jnp.stack([rays.d[:, 0]]*3, -1))
    rfn = jax.jit(raygen_only)
    print(f"raygen+film:     {timeit(rfn, *targs)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
