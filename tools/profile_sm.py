"""Ablation profile of one PT chunk on the san-miguel stand-in: where does
the 1.2M-tri pass time go? (end-to-end ~0.9 Mrays/s vs traversal-only
~4.5 Mrays/s per BENCH_r03 — this isolates the other ~80%).

Timing ends at a real device->host readback (the axon tunnel's
block_until_ready does not wait for execution — see bench.py docstring).
"""
import os
import sys
import time
from functools import partial
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import tracer as tracermod
from cudatracerlib_tpu.ops import traversal, traversal8
from cudatracerlib_tpu.utils import example_scenes


def _drain(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    return float(jnp.ravel(leaves[0])[0])


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / n


def main():
    w = h = 1024
    chunk = 1 << 17
    depth = 5
    scene = example_scenes.san_miguel_stand_in(w, h).build()
    at = pathmod.scene_active_types(scene)
    film = filmmod.new_film(w, h)
    z = jnp.float32(0.0)
    args = (scene, film, z, z, z, z, jnp.int32(0), jnp.int32(0))

    def make(**over):
        fn = partial(pathmod._pt_chunk, w=w, h=h, chunk=chunk,
                     max_depth=over.pop("max_depth", depth), rr_depth=3,
                     use_nee=over.pop("use_nee", True), spp=1,
                     active_types=at, **over)
        return jax.jit(fn)

    t_full = timeit(make(), *args)
    print(f"full chunk ({chunk} lanes, depth {depth}): {t_full*1e3:8.1f} ms")

    t = timeit(make(use_nee=False), *args)
    print(f"no NEE (shadow rays + light sampling off): {t*1e3:8.1f} ms"
          f"  (NEE share {100*(t_full-t)/t_full:4.1f}%)")

    t = timeit(make(with_textures=False), *args)
    print(f"textures off (flat reflectance):           {t*1e3:8.1f} ms"
          f"  (texture share {100*(t_full-t)/t_full:4.1f}%)")

    # cheap light sampling: constant overhead NEE record (keeps the shadow
    # TRAVERSAL + MIS pipeline, removes selection/CDF/record arithmetic) —
    # splits the measured NEE share into sampling-math vs shadow-ray cost
    from cudatracerlib_tpu.models import lights as lightsmod

    def fake_sample_direct(scene_, ref_p, state, u_override=None,
                           override_mask=None, **_kw):
        B = ref_p.shape[0]
        tgt = jnp.asarray([0.0, 20.0, 0.0], jnp.float32)
        d = tgt[None, :] - ref_p
        dist = jnp.linalg.norm(d, axis=1)
        d = d / jnp.maximum(dist, 1e-6)[:, None]
        ed = lightsmod.EmitterDirect(
            p=jnp.broadcast_to(tgt, (B, 3)), d=d, dist=dist,
            n=jnp.zeros((B, 3)).at[:, 1].set(-1.0),
            radiance_over_pdf=jnp.ones((B, 3)), pdf=jnp.ones(B),
            is_delta=jnp.zeros(B, bool), light_idx=jnp.zeros(B, jnp.int32))
        return ed, state
    with mock.patch.object(lightsmod, "sample_emitter_direct",
                           fake_sample_direct):
        t = timeit(make(), *args)
    print(f"cheap light sampling (shadow rays kept):   {t*1e3:8.1f} ms"
          f"  (sampling-math share {100*(t_full-t)/t_full:4.1f}%)")

    # stub traversal: everything misses -> isolates everything downstream of
    # the hit (NB: miss lanes die after bounce 0, so compare against depth 1)
    def fake_intersect(geom, rays, any_hit=False, with_iters=False,
                       roots=None, coherent=False, any_mask=None, **_kw):
        B = rays.o.shape[0]
        hit = traversal.Hit(t=rays.tmax, tri=jnp.full(B, -1, jnp.int32),
                            u=jnp.zeros(B), v=jnp.zeros(B))
        if with_iters:
            return hit, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)
        return hit
    with mock.patch.object(traversal8, "intersect_scene", fake_intersect):
        t = timeit(jax.jit(partial(
            pathmod._pt_chunk, w=w, h=h, chunk=chunk, max_depth=depth,
            rr_depth=3, use_nee=True, spp=1, active_types=at)), *args)
    print(f"no traversal (all rays miss):              {t*1e3:8.1f} ms")

    # traversal only: depth x (closest + shadow) on jittered camera rays
    def trav_only(scene, film, a, b, c, d, pass_idx, chunk_idx):
        pixel_idx = (chunk_idx * chunk
                     + jnp.arange(chunk, dtype=jnp.int32)) % (w * h)
        rays, px, py, state, wt = tracermod.gen_camera_rays(
            scene, pixel_idx, pass_idx, pass_idx, w, h)
        acc = jnp.zeros(chunk)
        for i in range(depth):
            hit = traversal8.intersect_scene(scene.geom, rays)
            occ = traversal8.intersect_scene(scene.geom, traversal.Rays(
                o=rays.o, d=-rays.d, tmin=jnp.zeros(chunk),
                tmax=jnp.full(chunk, 50.0)), any_hit=True)
            acc = acc + hit.t + occ.t
            rays = traversal.Rays(o=rays.o + 0.01 * i, d=rays.d,
                                  tmin=rays.tmin, tmax=rays.tmax)
        return acc
    t = timeit(jax.jit(trav_only), *args)
    print(f"{2*depth}x traversal alone:                     {t*1e3:8.1f} ms")

    def raygen_only(scene, film, a, b, c, d, pass_idx, chunk_idx):
        pixel_idx = (chunk_idx * chunk
                     + jnp.arange(chunk, dtype=jnp.int32)) % (w * h)
        rays, px, py, state, wt = tracermod.gen_camera_rays(
            scene, pixel_idx, pass_idx, pass_idx, w, h)
        return filmmod.add_samples(film, px, py,
                                   jnp.stack([rays.d[:, 0]] * 3, -1))
    t = timeit(jax.jit(raygen_only), *args)
    print(f"raygen+film:                               {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
