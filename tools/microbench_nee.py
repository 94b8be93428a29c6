"""Isolate NEE light-sampling cost on TPU: 6x sample_emitter_direct on a
65k-lane wavefront (matching one profile_pt chunk's NEE call count), vs the
same loop with the shadow TRAVERSAL included — separates arithmetic from
data-dependent traversal work that the profile_pt cheap-light stub conflated
(a constant stub direction makes shadow rays coherent and cheap to trace).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ctl_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cudatracerlib_tpu.core import rng as rngmod
from cudatracerlib_tpu.models import lights as lightsmod
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
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _drain(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    B = 1 << 16
    scene = example_scenes.veach_mis(512, 512).build()
    # surface-ish reference points spread through the scene bbox
    state0 = rngmod.seed(jnp.arange(B, dtype=jnp.int32), 7)

    def sed_only(scene, state):
        acc = jnp.zeros((B, 3))
        st = state
        st, u = rngmod.next_float3(st)
        ref = scene.world_lo + u * (scene.world_hi - scene.world_lo)
        for _ in range(6):
            ed, st = lightsmod.sample_emitter_direct(scene, ref, st)
            acc = acc + ed.radiance_over_pdf + ed.d
            ref = ref + 0.01
        return acc

    def sed_shadow(scene, state):
        acc = jnp.zeros((B, 3))
        st = state
        st, u = rngmod.next_float3(st)
        ref = scene.world_lo + u * (scene.world_hi - scene.world_lo)
        for _ in range(6):
            ed, st = lightsmod.sample_emitter_direct(scene, ref, st)
            rays = traversal.Rays(o=ref, d=ed.d, tmin=jnp.zeros(B),
                                  tmax=ed.dist * 0.999)
            occ = traversal8.intersect_scene(scene.geom, rays, any_hit=True)
            acc = acc + jnp.where(occ.valid[:, None], 0.0,
                                  ed.radiance_over_pdf)
            ref = ref + 0.01
        return acc

    def shadow_const(scene, state):
        # same traversal count, constant direction (the cheap-light stub's
        # accidental workload)
        acc = jnp.zeros((B, 3))
        st = state
        st, u = rngmod.next_float3(st)
        ref = scene.world_lo + u * (scene.world_hi - scene.world_lo)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
        for _ in range(6):
            rays = traversal.Rays(o=ref, d=d, tmin=jnp.zeros(B),
                                  tmax=jnp.full(B, 10.0))
            occ = traversal8.intersect_scene(scene.geom, rays, any_hit=True)
            acc = acc + jnp.where(occ.valid[:, None], 0.0, 1.0)
            ref = ref + 0.01
        return acc

    def baseline(scene, state):
        st, u = rngmod.next_float3(state)
        ref = scene.world_lo + u * (scene.world_hi - scene.world_lo)
        return ref

    # --- primitive decomposition: what inside sample_emitter_direct costs ---
    fat = jax.device_put(jnp.asarray(
        lightsmod._light_fat_rows(scene.lights)))
    al_rows = jax.device_put(jnp.asarray(lightsmod._al_tri_rows(scene)))
    al_cdf = scene.lights.al_cdf
    print(f"fat_rows {fat.shape} al_rows {al_rows.shape} al_cdf {al_cdf.shape}",
          flush=True)

    def prim_rng(scene, state):
        st = state
        acc = jnp.zeros(B)
        for _ in range(6):
            st, u1 = rngmod.next_float(st)
            st, u2 = rngmod.next_float2(st)
            st, u3 = rngmod.next_float(st)
            st, u4 = rngmod.next_float2(st)
            acc = acc + u1 + u2.sum(-1) + u3 + u4.sum(-1)
        return acc

    def prim_gather_fat(scene, state):
        st, u = rngmod.next_float(state)
        idx = (u * fat.shape[0]).astype(jnp.int32) % fat.shape[0]
        acc = jnp.zeros(B)
        for i in range(6):
            row = jnp.take(fat, (idx + i) % fat.shape[0], axis=0)
            acc = acc + row.sum(-1)
        return acc

    def prim_gather_al(scene, state):
        st, u = rngmod.next_float(state)
        idx = (u * al_rows.shape[0]).astype(jnp.int32) % al_rows.shape[0]
        acc = jnp.zeros(B)
        for i in range(6):
            row = jnp.take(al_rows, (idx + i) % al_rows.shape[0], axis=0)
            acc = acc + row.sum(-1)
        return acc

    def prim_cdf(scene, state):
        st, u = rngmod.next_float(state)
        first = jnp.zeros(B, jnp.int32)
        count = jnp.full(B, al_cdf.shape[0], jnp.int32)
        acc = jnp.zeros(B, jnp.int32)
        for i in range(6):
            ai = lightsmod._ranged_cdf_search(al_cdf, first, count,
                                              (u + 0.1 * i) % 1.0)
            acc = acc + ai
        return acc

    def prim_select(scene, state):
        st, u = rngmod.next_float(state)
        acc = jnp.zeros(B, jnp.int32)
        for i in range(6):
            idx, pdf_sel = lightsmod._select_light(scene.lights,
                                                   (u + 0.13 * i) % 1.0)
            acc = acc + idx
        return acc

    for name, fn in [("baseline", baseline), ("sed_only", sed_only),
                     ("sed_shadow", sed_shadow), ("shadow_const", shadow_const),
                     ("prim_rng", prim_rng), ("prim_gather_fat", prim_gather_fat),
                     ("prim_gather_al", prim_gather_al), ("prim_cdf", prim_cdf),
                     ("prim_select", prim_select)]:
        t = timeit(jax.jit(fn), scene, state0)
        print(f"{name:14s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
