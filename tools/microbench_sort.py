"""Does bucket-sorting incoherent rays speed up the VMEM Pallas kernel?

The round-4 looped profile (tools/profile_pt.py veach) shows PT traversal at
~2.2 ms per 131k-lane call on bounce/shadow wavefronts vs 0.28 ms per
65k-lane call on camera rays — ~4x per-ray. The kernel's while_loop runs to
the WORST lane of each 512-lane program (G=4 tiles x 128 lanes, K=8 rays
serial per lane), so incoherent wavefronts pay (a) low lane utilization and
(b) per-iteration gather/arith on lanes that already finished.

Hypothesis: an O(B) counting sort by direction-octant (+ origin cell) groups
similar rays into the same program, cutting worst-lane iterations. Keys are
cheap; the permutation is 2 gathers (rays out, hits back).

Measures, on veach (VMEM table) with REAL bounce rays (cosine-sampled from
actual camera-ray hit points): unsorted / octant(8) / octant+origin(64),
net-of-floor medians over fori_loop'd reps, plus the kernel's own lockstep
iteration counters.
"""
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ctl_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cudatracerlib_tpu.core import rng as rngmod
from cudatracerlib_tpu.models import tracer as tracermod
from cudatracerlib_tpu.ops import traversal, traversal8, traversal_pl
from cudatracerlib_tpu.utils import example_scenes

REPS = 10


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
    B = 1 << 17
    scene = example_scenes.veach_mis(512, 512).build()
    table_t = traversal_pl.prep_table_jnp(scene.geom.wide)

    @jax.jit
    def make_bounce_rays(seed):
        st = rngmod.seed(jnp.arange(B, dtype=jnp.int32), seed)
        pix = jnp.arange(B, dtype=jnp.int32) % (512 * 512)
        cam, px, py, st2, wt = tracermod.gen_camera_rays(scene, pix, 0, 0,
                                                         512, 512)
        hit = traversal8.intersect_scene(scene.geom, cam)
        p = cam.o + cam.d * hit.t[:, None] * 0.999
        st, u = rngmod.next_float3(st)
        # cosine-ish random hemisphere dirs around +z then randomize sign
        z = u[:, 2] * 2 - 1
        r = jnp.sqrt(jnp.maximum(0.0, 1 - z * z))
        phi = u[:, 0] * 2 * jnp.pi
        d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
        return traversal.Rays(o=p, d=d, tmin=jnp.full(B, 1e-3),
                              tmax=jnp.full(B, 1e9))

    rays = make_bounce_rays(3)
    jax.block_until_ready(rays.o)

    def trav_many(rays, mode):
        def once(k, acc):
            r = traversal.Rays(o=rays.o + 1e-5 * k, d=rays.d,
                               tmin=rays.tmin, tmax=rays.tmax)
            if mode == "sorted":
                hit, its, rows = traversal8._pallas_sorted(
                    table_t, r, any_hit=False, roots=None, with_iters=True,
                    any_mask=None)
            else:
                hit, its, rows = traversal_pl.intersect_pallas(
                    table_t, r, with_iters=True)
            return acc + jnp.sum(hit.t) + its * 0.0, its
        def body(k, carry):
            acc, _ = carry
            return once(k, acc)
        acc, its = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0.0),
                                                     jnp.float32(0.0)))
        return acc, its

    from unittest import mock
    floor = timeit(jax.jit(lambda x: x + 1.0), jnp.zeros(4))
    print(f"floor {floor*1e3:8.2f} ms", flush=True)
    for label, mode, impl in (("unsorted", "plain", None),
                              ("sorted_lax", "sorted", "lax"),
                              ("sorted_cnt", "sorted", "counting")):
        with mock.patch.object(traversal8, "SORT_IMPL", impl or "lax"):
            jax.clear_caches()   # SORT_IMPL is outside jit cache keys
            fn = jax.jit(partial(trav_many, mode=mode))
            t = timeit(fn, rays)
            _, its = fn(rays)
        net = (t - floor) / REPS
        print(f"{label:12s} {net*1e3:8.2f} ms/call  lockstep_iters/rep "
              f"{float(its)/REPS:8.0f}", flush=True)

    # coherent reference: camera rays through the same path
    pix = jnp.arange(B, dtype=jnp.int32) % (512 * 512)
    cam, *_ = tracermod.gen_camera_rays(scene, pix, 0, 0, 512, 512)
    fn = jax.jit(partial(trav_many, mode="plain"))
    t = timeit(fn, cam)
    _, its = fn(cam)
    print(f"{'camera':12s} {(t-floor)/REPS*1e3:8.2f} ms/call  "
          f"lockstep_iters/rep {float(its)/REPS:8.0f}", flush=True)


if __name__ == "__main__":
    main()
