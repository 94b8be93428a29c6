"""Ablation profile of one PT chunk on TPU: where does the pass time go?

Usage: python tools/profile_pt.py [cornell|veach|sanmiguel]

Stage decomposition (VERDICT r3 #3 asked specifically for veach-mis):
  full          the production chunk
  no_nee        NEE (light sampling + shadow traversal + MIS) removed
  diffuse_only  BSDF dispatch restricted to the diffuse closed form — the
                delta vs `full` is the masked multi-type BSDF evaluation cost
                (veach adds roughconductor: microfacet eval + VNDF sampling)
  no_traversal  closest-hit + shadow traversal stubbed to instant miss
  traversal     12x bare traversal on camera rays (6 closest + 6 any-hit)
  raygen+film   camera ray generation + film scatter-add only

Every stage runs REPS chunks inside ONE jitted fori_loop and the report is
NET per-chunk ms: (t_stage - t_floor)/REPS. Single-chunk calls on the axon
tunnel are dominated by a ~50-70 ms dispatch+readback floor (round-4
finding: `raygen_film` alone "measured" 72 ms), so un-looped stage deltas
were noise. `floor` (an add-1.0-to-film jit) is printed so the subtraction
is auditable.

Timing ends at a real device->host readback (the axon tunnel's
block_until_ready does not wait for execution — see bench.py docstring).
"""
import json
import os
import statistics
import sys
import time
from functools import partial
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ctl_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cudatracerlib_tpu.models import bsdf as bsdfmod
from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.ops import traversal, traversal8
from cudatracerlib_tpu.scene import schema
from cudatracerlib_tpu.utils import example_scenes

REPS = int(os.environ.get("CTL_PROFILE_REPS", "10"))


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
    name = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    w = h = 512
    chunk = 1 << 16
    if name == "cornell":
        scene = example_scenes.cornell_box(w, h).build()
    elif name == "veach":
        scene = example_scenes.veach_mis(w, h).build()
    elif name == "sanmiguel":
        w = h = 1024
        scene = example_scenes.san_miguel_stand_in(w, h).build()
    else:
        raise SystemExit(f"unknown scene {name}")
    at = pathmod.scene_active_types(scene)
    print(f"scene={name} tris={scene.num_tris} active_types={at} "
          f"reps={REPS}", flush=True)
    film = filmmod.new_film(w, h)
    z = jnp.float32(0.0)
    args = (scene, film, z, z, z, z, jnp.int32(0))
    out = {"scene": name, "chunk": chunk, "reps": REPS}

    # the dispatch+readback floor every stage pays exactly once
    t_floor = timeit(jax.jit(lambda f: f._replace(rgb=f.rgb + 1.0)), film)
    out["floor_ms"] = round(t_floor * 1e3, 2)
    print(f"{'floor':15s} {t_floor*1e3:8.2f} ms (subtracted below)",
          flush=True)

    def make(**over):
        # REPS chunks in ONE fori_loop dispatch (pass_idx varies per rep so
        # XLA cannot CSE the loop body to a single iteration)
        return jax.jit(partial(
            pathmod._pt_many, n_passes=REPS, n_chunks=1, w=w, h=h,
            chunk=chunk, max_depth=6, rr_depth=3,
            use_nee=over.pop("use_nee", True), spp=1,
            active_types=over.pop("active_types", at), **over))

    def rec(label, t):
        net = (t - t_floor) / REPS
        out[label] = round(net * 1e3, 2)
        print(f"{label:15s} {net*1e3:8.2f} ms/chunk  (raw {t*1e3:7.1f})",
              flush=True)

    rec("full", timeit(make(), *args))
    rec("no_nee", timeit(make(use_nee=False), *args))
    rec("diffuse_only", timeit(make(active_types=(schema.BSDF_DIFFUSE,)), *args))

    # stub out traversal entirely: everything misses
    def fake_intersect(geom, rays, any_hit=False, with_iters=False, roots=None,
                       coherent=False, any_mask=None):
        B = rays.o.shape[0]
        hit = traversal.Hit(t=rays.tmax, tri=jnp.full(B, -1, jnp.int32),
                            u=jnp.zeros(B), v=jnp.zeros(B))
        if with_iters:
            return hit, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)
        return hit
    with mock.patch.object(traversal8, "intersect_scene", fake_intersect):
        rec("no_traversal", timeit(make(), *args))

    # traversal alone: camera rays then 6x(closest+shadow-ish) on same rays
    from cudatracerlib_tpu.models import tracer as tracermod
    def trav_once(scene, k):
        pixel_idx = (k * 977 + jnp.arange(chunk, dtype=jnp.int32)) % (w * h)
        rays, px, py, state, wt = tracermod.gen_camera_rays(
            scene, pixel_idx, k, k, w, h)
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

    def trav_many(scene):
        return jax.lax.fori_loop(
            0, REPS, lambda k, a: a + trav_once(scene, k), jnp.zeros(chunk))
    rec("traversal_12x", timeit(jax.jit(trav_many), scene))

    # --- NEE decomposition (VERDICT r3 #3): which part of NEE costs? ---
    from cudatracerlib_tpu.models import lights as lightsmod

    def cheap_sed(scene, ref_p, state, u_override=None, override_mask=None):
        # fixed overhead-free light record: constant direction, unit radiance
        B = ref_p.shape[0]
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
        rec = lightsmod.EmitterDirect(
            p=ref_p + 10.0 * d, d=d, dist=jnp.full(B, 10.0),
            n=-d, radiance_over_pdf=jnp.ones((B, 3)),
            pdf=jnp.ones(B), is_delta=jnp.zeros(B, bool),
            light_idx=jnp.zeros(B, jnp.int32))
        return rec, state
    with mock.patch.object(lightsmod, "sample_emitter_direct", cheap_sed):
        rec("nee_cheap_light", timeit(make(), *args))

    real_eval = bsdfmod.evaluate
    def cheap_eval(ctx, wi, wo, active_types=None):
        B = wi.shape[0]
        return bsdfmod.Lobe(f=jnp.full((B, 3), 0.1), pdf=jnp.full(B, 0.5))
    with mock.patch.object(bsdfmod, "evaluate", cheap_eval):
        rec("nee_cheap_eval", timeit(make(), *args))

    with mock.patch.object(pathmod, "MERGE_SHADOW", False):
        rec("merge_off", timeit(make(), *args))

    # chunk-size scaling: marginal compute per lane vs the fixed call floor
    fn2 = jax.jit(partial(pathmod._pt_many, n_passes=REPS, n_chunks=1,
                          w=w, h=h, chunk=chunk * 2, max_depth=6, rr_depth=3,
                          use_nee=True, spp=1, active_types=at))
    rec("full_2x_chunk", timeit(fn2, *args))

    def raygen_once(scene, film, k):
        pixel_idx = (k * 977 + jnp.arange(chunk, dtype=jnp.int32)) % (w * h)
        rays, px, py, state, wt = tracermod.gen_camera_rays(
            scene, pixel_idx, k, k, w, h)
        return filmmod.add_samples(film, px, py, jnp.stack([rays.d[:, 0]]*3, -1))

    def raygen_many(scene, film):
        return jax.lax.fori_loop(
            0, REPS, lambda k, f: raygen_once(scene, f, k), film)
    rec("raygen_film", timeit(jax.jit(raygen_many), scene, film))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
