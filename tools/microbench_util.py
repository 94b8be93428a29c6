"""VMEM-kernel lane-utilization probe on REAL veach wavefronts (VERDICT r4
weak #3 / next #5): bounce+shadow traversal measured ~4x the per-ray cost of
camera rays; the suspected cause is worst-lane lockstep. This measures the
actual active-lane fraction (intersect_pallas with_util=True) per wavefront
class and sweeps K (rays per lane) / G (tiles per program) so the fix is
chosen from data.

Run on the TPU tunnel: python tools/microbench_util.py
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
from cudatracerlib_tpu.ops import traversal, traversal8, traversal_pl  # noqa: E402
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
    return dict(ms=round(med * 1e3, 3), net_ms=round((med - fl) * 1e3, 3),
                floor_ms=round(fl * 1e3, 2),
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

    # REAL bounce set: cosine-ish directions from first-hit surface points;
    # REAL shadow set: surface points toward the top emitters (any-hit).
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
    # ~40% dead lanes, like a depth-3 wavefront
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

    for K in (8, 4):
        for G in (4, 8, 2):
            for name, r in sets.items():
                anyh = name.startswith("shadow")
                fn = jax.jit(lambda rr, K=K, G=G, anyh=anyh:
                             traversal_pl.intersect_pallas(
                                 table_t, rr, any_hit=anyh, K=K, G=G,
                                 with_iters=True, with_util=True))
                try:
                    tm, out = timeit(fn, r)
                except Exception as e:
                    print(f"K={K} G={G} {name}: FAIL {repr(e)[:120]}",
                          flush=True)
                    continue
                hit, its, rows, act = out
                its_f, rows_f, act_f = float(its), float(rows), float(act)
                util = act_f / max(rows_f, 1.0)
                print(f"K={K} G={G} {name:14s} net={tm['net_ms']:8.3f}ms "
                      f"iters={its_f:9.0f} util={util:.3f} "
                      f"hits={int(jnp.sum(hit.tri >= 0))} "
                      f"spread={tm['spread']}", flush=True)


if __name__ == "__main__":
    main()
