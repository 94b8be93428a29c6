"""Shared-pool vs fixed-assignment VMEM kernel A/B on REAL veach wavefronts
(VERDICT r4 next #5): the pool kernel should turn the measured 0.23-0.40
bounce/shadow lockstep utilization into ~0.9 by letting idle lanes grab the
next unstarted ray of their tile's K*128 queue.  Also verifies exactness on
device (closest-hit fields must match the fixed kernel bit-for-bit).

Run on the TPU tunnel: python tools/microbench_pool.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ctl_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cudatracerlib_tpu.models import tracer as tracermod          # noqa: E402
from cudatracerlib_tpu.ops import traversal, traversal_pl         # noqa: E402
from cudatracerlib_tpu.utils import example_scenes                # noqa: E402

REPS = 7


def _drain(x):
    return float(jnp.ravel(x)[0])


def _floor(x):
    _drain(x)
    t0 = time.perf_counter()
    _drain(x)
    return time.perf_counter() - t0


def timeit(fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _drain(leaf)
    fl = _floor(leaf)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _drain(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    return dict(net_ms=round((med - fl) * 1e3, 3),
                spread=round((max(ts) - min(ts)) / med, 3)), out


def main():
    w = h = 512
    B = 1 << 17
    scene = example_scenes.veach_mis(w, h).build()
    geom = scene.geom
    table_t = traversal_pl.prep_table_jnp(geom.wide)
    print("veach wide rows:", geom.wide.shape[0], flush=True)
    pix = jnp.arange(B, dtype=jnp.int32) % (w * h)
    cam, _, _, _, _ = tracermod.gen_camera_rays(scene, pix, 0, 0, w, h)

    rng = np.random.default_rng(7)
    d_rand = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    d_rand = d_rand / jnp.linalg.norm(d_rand, axis=1, keepdims=True)

    @jax.jit
    def first_hits(r):
        h0 = traversal_pl.intersect_pallas(table_t, r)
        p = r.o + r.d * jnp.where(h0.tri >= 0, h0.t, 1.0)[:, None]
        return p, h0.tri >= 0

    p_surf, valid = first_hits(cam)
    bounce = traversal.Rays(o=p_surf + d_rand * 1e-3, d=d_rand,
                            tmin=jnp.zeros(B),
                            tmax=jnp.where(valid, 1e30, 0.0))
    dead = jnp.asarray(rng.random(B) < 0.4)
    bounce_dead = traversal.Rays(o=bounce.o, d=bounce.d, tmin=bounce.tmin,
                                 tmax=jnp.where(dead, 0.0, bounce.tmax))
    lt = jnp.asarray([0.0, 10.0, 0.0], jnp.float32)
    dl = lt[None, :] - p_surf
    dist = jnp.linalg.norm(dl, axis=1)
    dl = dl / jnp.maximum(dist, 1e-6)[:, None]
    shadow = traversal.Rays(o=p_surf + dl * 1e-3, d=dl, tmin=jnp.zeros(B),
                            tmax=jnp.where(valid, dist, 0.0))

    sets = {"camera": cam, "bounce": bounce, "bounce40dead": bounce_dead,
            "shadow(anyhit)": shadow}

    # exactness on device first (closest-hit only; any-hit may differ by
    # which intersection stops the ray)
    ref = jax.jit(lambda r: traversal_pl.intersect_pallas(table_t, r))(bounce)
    got = jax.jit(lambda r: traversal_pl.intersect_pallas_pool(
        table_t, r))(bounce)
    same = (bool(jnp.all(ref.tri == got.tri)) and bool(jnp.all(ref.t == got.t))
            and bool(jnp.all(ref.u == got.u)))
    print(f"device exactness (bounce, closest): {'OK' if same else 'MISMATCH'}",
          flush=True)
    if not same:
        bad = int(jnp.sum(ref.tri != got.tri))
        print(f"  tri mismatches: {bad}/{B}", flush=True)

    for K, G in ((8, 4), (8, 8), (16, 4), (16, 2), (8, 2)):
        for name, r in sets.items():
            anyh = name.startswith("shadow")
            for label, f in (("fixed", traversal_pl.intersect_pallas),
                             ("pool ", traversal_pl.intersect_pallas_pool)):
                fn = jax.jit(lambda rr, K=K, G=G, anyh=anyh, f=f:
                             f(table_t, rr, any_hit=anyh, K=K, G=G,
                               with_iters=True, with_util=True))
                try:
                    tm, out = timeit(fn, r)
                except Exception as e:
                    print(f"K={K} G={G} {label} {name}: FAIL {repr(e)[:160]}",
                          flush=True)
                    continue
                hit, its, rows, act = out
                util = float(act) / max(float(rows), 1.0)
                print(f"K={K:2d} G={G} {label} {name:14s} "
                      f"net={tm['net_ms']:8.3f}ms iters={float(its):9.0f} "
                      f"util={util:.3f} hits={int(jnp.sum(hit.tri >= 0))} "
                      f"spread={tm['spread']}", flush=True)


if __name__ == "__main__":
    main()
