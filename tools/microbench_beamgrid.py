"""Pinpoint the PPM volumetric eye-pass cost (51.5 s/pass measured,
bench_out/r5_queue6.log) on the REAL fog-cornell beamgrid shapes.

Stages, each REPS calls inside one jitted fori_loop (floor amortized):
  walk       DDA walk alone (accum = constant; no gather, no math)
  gather0    + per-cell row gather via grid.data   (axis-0 row take)
  gather1    + per-cell row gather via grid.data_t (axis-1 lane take)
  math       + the full beam-estimate math on the gathered rows
  full       production radiance_beamgrid
Run on the TPU tunnel: python tools/microbench_beamgrid.py
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

from cudatracerlib_tpu.models import ppm as ppmmod          # noqa: E402
from cudatracerlib_tpu.models import vol_estimators as ve   # noqa: E402
from cudatracerlib_tpu.ops import dda, hashgrid             # noqa: E402
from cudatracerlib_tpu.utils import example_scenes          # noqa: E402

REPS = 3


def _drain(x):
    return float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


def timeit(label, fn, *args):
    out = fn(*args)
    _drain(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _drain(out)
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{label:10s} {med:8.3f}s  spread="
          f"{(max(ts) - min(ts)) / max(med, 1e-9):.3f}", flush=True)
    return out


def main():
    w = h = 256
    scene = example_scenes.fog_cornell(w, h).build()
    tr = ppmmod.PPMTracer(scene, w, h)
    pass_idx = jnp.int32(0)
    rows, valid = tr._trace_jit(tr.scene, pass_idx=pass_idx)
    r = jnp.float32(tr.radius)
    # build the volume grid exactly as the eye pass does
    med_mask = jnp.all(rows[:, 9:12] == 0.0, axis=-1)
    gridfn = jax.jit(lambda rw, vl: dda.build_ball_grid(
        rw, rw[:, 0:3], vl & med_mask, r, scene.world_lo, scene.world_hi))
    g = gridfn(rows, valid)
    jax.block_until_ready(g.data)
    B = w * h
    import numpy as np
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.random((B, 3), np.float32) * 0.5)
    d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t1 = jnp.full(B, 2.0)
    print(f"grid rows: {g.data.shape} dims={g.dims} B={B}", flush=True)

    def walk_only(g, o, d, t1):
        def visit(carry, flat_cell, t_enter, t_exit, alive):
            return carry + jnp.sum(t_enter - t_exit) * 1e-30
        return dda.dda_walk(g, o, d, jnp.zeros(B), t1, visit,
                            jnp.zeros(()), max_cells=96)

    def gather_axis0(g, o, d, t1):
        def visit(carry, flat_cell, t_enter, t_exit, alive):
            start, count = hashgrid.query_ranges(g, flat_cell)
            k = jnp.arange(16, dtype=jnp.int32)
            idx = jnp.minimum(start[:, None] + k[None, :],
                              g.data.shape[0] - 1)
            rows_ = jnp.take(g.data, idx, axis=0)
            return carry + jnp.sum(rows_) * 1e-30
        return dda.dda_walk(g, o, d, jnp.zeros(B), t1, visit,
                            jnp.zeros(()), max_cells=96)

    def gather_axis1(g, o, d, t1):
        def visit(carry, flat_cell, t_enter, t_exit, alive):
            start, count = hashgrid.query_ranges(g, flat_cell)
            k = jnp.arange(16, dtype=jnp.int32)
            idx = jnp.minimum(start[:, None] + k[None, :],
                              g.data.shape[0] - 1)
            rows_ = hashgrid._gather_rows(g, idx)
            return carry + jnp.sum(rows_) * 1e-30
        return dda.dda_walk(g, o, d, jnp.zeros(B), t1, visit,
                            jnp.zeros(()), max_cells=96)

    def full(g, o, d, t1):
        L, Tr = ve.radiance_beamgrid(scene, g, o, d, t1, r, max_cells=96,
                                     max_per_cell=16)
        return jnp.sum(L)

    # force data_t through an optimization barrier so XLA cannot rewrite
    # take(transpose(x), idx, 1) back into the slow axis-0 row gather
    g_bar = g._replace(data_t=jax.lax.optimization_barrier(g.data_t))

    timeit("walk", jax.jit(walk_only), g, o, d, t1)
    timeit("gather0", jax.jit(gather_axis0), g, o, d, t1)
    timeit("gather1", jax.jit(gather_axis1), g, o, d, t1)
    timeit("gather1bar", jax.jit(gather_axis1), g_bar, o, d, t1)
    timeit("full", jax.jit(full), g, o, d, t1)
    timeit("fullbar", jax.jit(full), g_bar, o, d, t1)

    # PRODUCTION shape: grid build + query in ONE jit (the eye pass does
    # this), where XLA is free to rewrite take(transpose(x)) into the slow
    # axis-0 gather unless the barrier stops it
    def fused(rows, valid, o, d, t1):
        gg = dda.build_ball_grid(rows, rows[:, 0:3], valid & med_mask, r,
                                 scene.world_lo, scene.world_hi)
        L, _ = ve.radiance_beamgrid(scene, gg, o, d, t1, r, max_cells=96,
                                    max_per_cell=16)
        return jnp.sum(L)

    def fused_bar(rows, valid, o, d, t1):
        gg = dda.build_ball_grid(rows, rows[:, 0:3], valid & med_mask, r,
                                 scene.world_lo, scene.world_hi)
        gg = gg._replace(data_t=jax.lax.optimization_barrier(gg.data_t))
        L, _ = ve.radiance_beamgrid(scene, gg, o, d, t1, r, max_cells=96,
                                    max_per_cell=16)
        return jnp.sum(L)

    timeit("fused", jax.jit(fused), rows, valid, o, d, t1)
    timeit("fusedbar", jax.jit(fused_bar), rows, valid, o, d, t1)


if __name__ == "__main__":
    main()
