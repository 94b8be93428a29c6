"""Per-stage PPM profile on the bench config (fog cornell 256x256).

bench.py ppm measured ~18.7 s/pass on the v5e tunnel — 65k photons + 65k
eye paths should be nowhere near that. Stages (each its own jit, seconds per
call, tunnel floor ~0.05s is negligible at these magnitudes):
  trace    photon tracing (trace_photons)
  sgrid    surface hashgrid build
  vgrid    volume grid build (beamgrid ball insert)
  eye      eye pass (walk + surface gather + volumetric ray-march)
Run on the TPU tunnel: python tools/profile_ppm.py
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

from cudatracerlib_tpu.models import film as filmmod   # noqa: E402
from cudatracerlib_tpu.models import ppm as ppmmod     # noqa: E402
from cudatracerlib_tpu.utils import example_scenes     # noqa: E402

REPS = 3


def _drain(out):
    """End the window at a REAL device->host readback: the axon tunnel's
    block_until_ready returns before execution completes (bench.py
    docstring), which made the first run of this profiler read 0.000s for
    every stage."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(label, fn):
    out = fn()
    _drain(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        _drain(out)
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{label:8s} {med:8.3f}s  spread="
          f"{(max(ts) - min(ts)) / max(med, 1e-9):.3f}", flush=True)
    return out


def main():
    w = h = 256
    scene = example_scenes.fog_cornell(w, h).build()
    tr = ppmmod.PPMTracer(scene, w, h)
    print(f"n_photons={tr.n_photons} vol_est={tr.vol_est} "
          f"max_per_cell={tr.vol_max_per_cell} radius={tr.radius:.4f}",
          flush=True)

    pass_idx = jnp.int32(0)
    rows, valid = timeit("trace", lambda: tr._trace_jit(
        tr.scene, pass_idx=pass_idx))
    cell = jnp.float32(2.0 * tr.radius)
    r = jnp.float32(tr.radius)
    grid = timeit("sgrid", lambda: tr._surf_grid_jit(
        rows, valid, tr.scene.world_lo, tr.scene.world_hi, cell))
    vol_grid = timeit("vgrid", lambda: tr._vol_ball_jit(
        rows, valid, r, tr.scene.world_lo, tr.scene.world_hi))
    film = filmmod.new_film(w, h)
    timeit("eye", lambda: tr._eye_jit(
        tr.scene, film, grid, vol_grid, pass_idx,
        radius=r, n_emitted=float(tr.n_photons)))

    # eye-pass internals: re-jit variants with the expensive features off to
    # decompose (each is a fresh compile; only deltas matter)
    from functools import partial
    base = dict(w=w, h=h, max_depth=tr.max_depth,
                active_types=tr.active_types, alpha=tr.alpha,
                final_gather=False)
    eye_novol = jax.jit(partial(ppmmod.eye_pass, **base, with_volume=False,
                                vol_est="point", vol_max_per_cell=16))
    timeit("eye-novol", lambda: eye_novol(
        tr.scene, film, grid, None, pass_idx, radius=r,
        n_emitted=float(tr.n_photons)))

    eye_nomarch = jax.jit(partial(
        ppmmod.eye_pass, **base, with_volume=True, vol_est="point",
        vol_max_per_cell=16))
    vol_pt = tr._vol_point_jit(rows, valid, tr.scene.world_lo,
                               tr.scene.world_hi, cell)
    timeit("eye-volpt", lambda: eye_nomarch(
        tr.scene, film, grid, vol_pt, pass_idx, radius=r,
        n_emitted=float(tr.n_photons)))


if __name__ == "__main__":
    main()
