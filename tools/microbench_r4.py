"""Round-4 treelet tuning: V sweep + stage decomposition on REAL bounce and
shadow rays over the 1.2M-tri stand-in.

Round 3's A/B used shuffled CAMERA rays as the "incoherent" proxy — but the
regime that matters (VERDICT r3 #1) is bounce rays (origins on scene surfaces,
random directions) and NEE shadow rays (surface origins, light-directed,
any-hit). This script measures, per ray set:
  - the XLA persistent-lane gather loop (production fallback)
  - the two-phase treelet kernel at several visit budgets V, with overflow
    rates (the exactness fallback's workload)
  - the treelet glue stage decomposition (_stage perf-debug flags)

Timing ends at a host-visible readback; the empty-queue floor is measured and
subtracted in the 'net' column (axon tunnel RTT ~30ms would otherwise drown
~60ms kernels).
"""
import json
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
from cudatracerlib_tpu.ops import traversal, traversal8, traversal_tt  # noqa: E402
from cudatracerlib_tpu.utils import example_scenes                # noqa: E402

REPS = 5


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
    return dict(ms=round(med * 1e3, 2), net_ms=round((med - fl) * 1e3, 2),
                floor_ms=round(fl * 1e3, 2),
                spread=round((max(ts) - min(ts)) / med, 3)), out


def main():
    w = h = 1024
    B = 1 << 17
    scene = example_scenes.san_miguel_stand_in(w, h).build()
    geom = scene.geom
    pix = jnp.arange(B, dtype=jnp.int32)
    cam, _, _, _, _ = tracermod.gen_camera_rays(scene, pix, 0, 0, w, h)

    # first hits (exact XLA path) -> surface origins for bounce/shadow sets.
    # Everything stays ON DEVICE: the axon tunnel fails large D2H transfers
    # (FAILED_PRECONDITION), so only scalar reductions come back.
    rng = np.random.default_rng(4)
    d_rand = rng.normal(size=(B, 3)).astype(np.float32)
    d_rand /= np.linalg.norm(d_rand, axis=1, keepdims=True)
    d_rand = jnp.asarray(d_rand)

    @jax.jit
    def make_sets(cam, d_rand):
        h0 = traversal8.intersect_wide_persistent(geom.wide, cam,
                                                  rays_per_lane=16)
        valid = h0.valid
        p = cam.o + cam.d * h0.t[:, None]
        o = p - 1e-3 * cam.d
        bounce = traversal.Rays(o=o, d=d_rand, tmin=jnp.zeros(B),
                                tmax=jnp.where(valid, 1e30, 0.0))
        lp = scene.world_hi * 0.9
        dl = lp[None, :] - p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(dl * dl, -1), 1e-12))
        shadow = traversal.Rays(o=o, d=dl / dist[:, None],
                                tmin=jnp.zeros(B),
                                tmax=jnp.where(valid, dist * 0.999, 0.0))
        return bounce, shadow, jnp.sum(valid)

    bounce, shadow, n_live = make_sets(cam, d_rand)
    valid_sum = _drain(n_live)

    sets = {"camera": (cam, False), "bounce": (bounce, False),
            "shadow": (shadow, True)}
    out = {"n_rays": B, "live": int(valid_sum)}

    for name, (rays, any_hit) in sets.items():
        res = {}
        fn_x = jax.jit(lambda r, ah=any_hit: traversal8.intersect_wide_persistent(
            geom.wide, r, rays_per_lane=16, any_hit=ah))
        t, hit_x = timeit(fn_x, rays)
        res["xla"] = dict(t, hits=int(jnp.sum(hit_x.valid)))
        for V in (4, 6, 8, 12):
            fn_t = jax.jit(lambda r, V=V, ah=any_hit: traversal_tt.intersect_treelet(
                geom.tt_top, geom.tt_slabs, geom.tt_vid, r, any_hit=ah,
                V=V, with_overflow=True))
            t, (hit_t, ovf) = timeit(fn_t, rays)
            res[f"treelet_V{V}"] = dict(t, hits=int(jnp.sum(hit_t.valid)),
                                        overflow=int(jnp.sum(ovf)))
            # full production dispatch (treelet + exact fallback)
            old = traversal8.TREELET_INCOHERENT
            traversal8.TREELET_INCOHERENT = True
            oldv = traversal8.V_INCOHERENT
            traversal8.V_INCOHERENT = V
            try:
                fn_s = jax.jit(lambda r, ah=any_hit: traversal8.intersect_scene(
                    geom, r, any_hit=ah))
                t, _ = timeit(fn_s, rays)
            finally:
                traversal8.TREELET_INCOHERENT = old
                traversal8.V_INCOHERENT = oldv
            res[f"dispatch_V{V}"] = t
        out[name] = res
        print(name, json.dumps(res), flush=True)

    # glue decomposition on the bounce set at V=8
    stages = {1: "phase1", 11: "tidmap", 12: "sort", 13: "dest/scatter",
              14: "blockperm", 15: "attrgather", 2: "glue_all", 4: "full"}
    dec = {}
    for st, label in stages.items():
        fn = jax.jit(lambda r, st=st: traversal_tt.intersect_treelet(
            geom.tt_top, geom.tt_slabs, geom.tt_vid, r, V=8, _stage=st))
        t, _ = timeit(fn, bounce)
        dec[label] = t
        print("stage", label, json.dumps(t), flush=True)
    out["stages_bounce_V8"] = dec
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
