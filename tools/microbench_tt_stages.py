"""LOOPED treelet stage decomposition on the 1.2M-tri stand-in.

The round-4 sort-cost matrix (one-off, /tmp/sortbench.py — results recorded
in docs/ROUND4_NOTES.md) measured a 3-operand 524k `lax.lax.sort` at ~49 ms
NET on this chip, vs the ~2 ms the treelet glue assumed (traversal_tt.py
comment) and the ~8 ms round-4 note. Those earlier numbers came from
SINGLE-CALL timings against a ~30-60 ms tunnel floor. This tool re-measures
every _stage cut with REPS iterations inside ONE jitted fori_loop so the
floor amortizes: net per-call ms = (t_stage - floor)/REPS.

Stages (cumulative cuts of intersect_treelet):
  phase1      top-tree Pallas kernel only (visit-list emission)
  tidmap      + visit->treelet/root mapping gathers
  sort        + the variadic lax.sort by treelet id        <- suspect
  dest        + segment geometry, dest computation, slot scatters
  blockperm   + blocked index permutes (unsort-by-second-sort)
  attrgather  + the fused ray-attr gather
  glue        everything except the phase-2 treelet kernel
  full        production (phase 1 + glue + phase-2 kernel)
"""
import json
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

from cudatracerlib_tpu.models import tracer as tracermod
from cudatracerlib_tpu.ops import traversal, traversal8, traversal_tt
from cudatracerlib_tpu.utils import example_scenes

REPS = int(os.environ.get("CTL_PROFILE_REPS", "8"))


def _drain(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    return float(jnp.ravel(leaves[0])[0])


def timeit(fn, *args, n=5, warmup=1):
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
    B = 1 << 16                       # one production chunk
    V = int(os.environ.get("CTL_TT_V", "4"))
    scene = example_scenes.san_miguel_stand_in(1024, 1024).build()
    geom = scene.geom
    pix = jnp.arange(B, dtype=jnp.int32)
    cam, _, _, _, _ = tracermod.gen_camera_rays(scene, pix, 0, 0, 1024, 1024)

    @jax.jit
    def mk_bounce(seed):
        from cudatracerlib_tpu.core import rng as rngmod
        hit = traversal8.intersect_wide_persistent(geom.wide, cam,
                                                   rays_per_lane=8)
        p = cam.o + cam.d * jnp.minimum(hit.t, 100.0)[:, None] * 0.999
        st = rngmod.seed(jnp.arange(B, dtype=jnp.int32), seed)
        st, u = rngmod.next_float3(st)
        z = u[:, 2] * 2 - 1
        r = jnp.sqrt(jnp.maximum(0.0, 1 - z * z))
        phi = u[:, 0] * 2 * jnp.pi
        d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
        return traversal.Rays(o=p, d=d, tmin=jnp.full(B, 1e-3),
                              tmax=jnp.full(B, 1e9))

    bounce = mk_bounce(7)
    jax.block_until_ready(bounce.o)
    print(f"B={B} V={V} reps={REPS} tris={scene.num_tris}", flush=True)

    floor = timeit(jax.jit(lambda x: x + 1.0), jnp.zeros(4))
    print(f"{'floor':11s} {floor*1e3:8.2f} ms", flush=True)

    stages = ((1, "phase1"), (11, "tidmap"), (12, "sort"),
              (131, "segguard"), (132, "slotfill"), (13, "dest"),
              (14, "blockperm"), (15, "attrgather"), (2, "glue"),
              (4, "full"))
    out = {"B": B, "V": V, "reps": REPS, "floor_ms": round(floor * 1e3, 2)}
    prev = 0.0
    for st, label in stages:
        def many(r0, st=st):
            def body(k, acc):
                r = traversal.Rays(o=r0.o + 1e-6 * k, d=r0.d,
                                   tmin=r0.tmin, tmax=r0.tmax)
                h = traversal_tt.intersect_treelet(
                    geom.tt_top, geom.tt_slabs, geom.tt_vid, r, V=V,
                    _stage=st)
                return acc + jnp.sum(h.t)
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
        t = timeit(jax.jit(many), bounce)
        net = (t - floor) / REPS
        out[label] = round(net * 1e3, 2)
        print(f"{label:11s} {net*1e3:8.2f} ms/call  (+{(net-prev)*1e3:7.2f})",
              flush=True)
        prev = net
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
