"""Benchmark harness: the five BASELINE.md configs, honestly timed.

Prints one JSON line per config; the FINAL line is the headline metric
(path-tracer Mrays/s on Cornell, live-ray counted) and embeds the whole
matrix in its "configs" field so a single-line consumer still sees
everything.

TIMING SEMANTICS ("time-to-readback", round 3): on the axon TPU tunnel,
``jax.block_until_ready`` returns BEFORE device execution completes (verified:
20 Cornell passes "complete" in 19ms by block_until_ready but take 4.7s to
drain to a readback).  Round-2 numbers timed dispatch, not compute, and were
inflated ~80x.  Every timed region here therefore ends with a real
device->host readback of one film scalar INSIDE the clock; the empty-queue
readback floor (~30ms tunnel RTT) is measured and reported separately so the
compute time is auditable.

MEASUREMENT DISCIPLINE (round 4, VERDICT r3 #4): every config runs its timed
window REPS (>=3) times and reports the MEDIAN with min/max spread; windows
are sized so the readback floor is <5% of the median window.  A global
deadline (BENCH_BUDGET_S, default 1500s) guarantees the harness finishes
inside the driver budget: configs that would blow it emit an explicit
"skipped" record instead of dying silently (round 3 was killed at rc=124
with BDPT/PPM unreported).  Every subprocess shares a persistent JAX
compilation cache so only the first-ever run pays cold compiles.

BANDWIDTH ACCOUNTING: the PT configs carry device-resident counters
(models/path.py) following the reference's g_RayTracedCounter semantics
(`Kernel/TraceHelper.cu:309-320`): live rays traced, traversal lockstep
iterations, and 512-byte fat rows gathered.  Each config reports achieved
gather GB/s and the fraction of the chip's HBM peak (v5e ~819 GB/s) so the
Mrays/s figure can be checked against physics.  Rows marked vmem_resident
were gathered from the VMEM-held table (Pallas path), not HBM.

Baseline = the adopted north-star target of 150 Mrays/s per chip
(BASELINE.md; the reference publishes no numbers of its own).
"""
import json
import os
import statistics
import time

BASELINE_MRAYS = 150.0
HBM_PEAK_GBPS = 819.0          # TPU v5e (axon device: "TPU v5 lite")
ROW_BYTES = 512                # one 128-float fat row
# VPU state-machine speed of light (ROUND3_NOTES roofline): one 128-lane
# Pallas tile_step (8-slab test + 12-wide Moller-Trumbore + stack step)
# measures ~350 ns on v5e = 2.7 ns per ray-step.  A config's traversal
# roofline is therefore 1 / (2.7 ns x measured steps-per-ray); the
# occupancy figure below divides the time the chip spent doing SOL-rate
# step work by the wall window (the remainder is glue, shading, dispatch
# and lane under-utilization).
SOL_NS_PER_RAY_STEP = 2.7


def _roofline_fields(rays: float, rows: float, dt: float) -> dict:
    """%-of-roofline per config (VERDICT r4 #6), from the device counters:
    rows_gathered counts one state-machine step per LANE (dead-lane padding
    included), so steps/ray folds lane waste in and the occupancy isolates
    everything that is NOT step work."""
    if not rays or not rows or not dt:
        return {}
    steps_per_ray = rows / rays
    roof = 1e3 / (SOL_NS_PER_RAY_STEP * steps_per_ray)   # Mrays/s
    achieved = rays / dt / 1e6
    return {
        "roofline_model": "VPU state machine, 2.7 ns/ray-step "
                          "(128-lane tile_step ~350 ns, ROUND3_NOTES)",
        "steps_per_live_ray": round(steps_per_ray, 2),
        "roofline_Mrays_s": round(roof, 2),
        "pct_of_roofline": round(100.0 * achieved / roof, 2),
    }
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out")
CACHE_DIR = "/tmp/jax_cache_ctl_bench"
REPS = 3


def _setup_jax_cache():
    import jax
    if os.environ.get("BENCH_FORCE_CPU"):   # harness self-test without a TPU
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _drain(x) -> float:
    """REAL device sync: block_until_ready is a no-op on the axon tunnel, so
    force a scalar device->host readback (returns the value read)."""
    import jax
    import jax.numpy as jnp
    jax.block_until_ready(x)
    return float(jnp.ravel(x)[0])


def _save_image(film, key):
    from cudatracerlib_tpu.models import film as filmmod
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{key}.png")
    filmmod.save_png(filmmod.develop(film), path)
    return os.path.relpath(path, os.path.dirname(os.path.abspath(__file__)))


def _readback_floor(x) -> float:
    t0 = time.perf_counter()
    _drain(x)
    return time.perf_counter() - t0


def _spread(times):
    """Median window + relative spread over the reps."""
    med = statistics.median(times)
    return med, round((max(times) - min(times)) / med, 3)


def _bench_pt(scene_fn, key, name, w, h, max_depth, n_passes,
              chunk_size=1 << 16, reps=REPS, **scene_kw):
    from cudatracerlib_tpu.models import path as pathmod

    scene = scene_fn(w, h, **scene_kw).build()
    if os.environ.get("CTL_BENCH_WF", "0") == "1":
        # A/B hook: the regenerating wavefront tracer (models/wavefront.py,
        # full-occupancy lane pool) instead of the chunked PT. Same counter
        # interface; estimator-identical on media-free scenes.
        from cudatracerlib_tpu.models import wavefront as wfmod
        tr = wfmod.WavefrontPT(scene, w, h, max_depth=max_depth,
                               spp_per_pass=1, lanes=chunk_size)
    else:
        tr = pathmod.PathTracer(scene, w, h, max_depth=max_depth,
                                spp_per_pass=1, chunk_size=chunk_size)
    tr.render_batched(1)  # compile + warm the fused executable (n_passes is
    #                       a traced scalar: one compile covers every batch)
    _drain(tr.film.rgb)   # drain the queue before the clock starts
    floor = _readback_floor(tr.film.rgb)
    times, rays_r, iters_r, rows_r = [], [], [], []
    for _ in range(reps):
        c0, i0, r0 = tr._rays_dev, tr._iters_dev, tr._rows_dev
        t0 = time.perf_counter()
        # all passes fused into ONE device dispatch (render_batched):
        # per-dispatch tunnel overhead (~30ms RTT) is paid once per rep
        tr.render_batched(n_passes)
        _drain(tr.film.rgb)   # the clock stops when results are host-visible
        times.append(time.perf_counter() - t0)
        rays_r.append(float(tr._rays_dev - c0))
        iters_r.append(float(tr._iters_dev - i0))
        rows_r.append(float(tr._rows_dev - r0))
    dt, spread = _spread(times)
    k = times.index(statistics.median_low(times))
    rays, iters, rows = rays_r[k], iters_r[k], rows_r[k]
    gbps = rows * ROW_BYTES / dt / 1e9
    mrays = rays / dt / 1e6
    vmem = (scene.geom.inst is None
            and scene.geom.wide.shape[0] <= 16 * 128)
    return {
        "metric": name,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "spp_per_s": round(n_passes / dt, 3),
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "timing": "time-to-readback",
        "reps": reps,
        "seconds": round(dt, 3),
        "spread_rel": spread,
        "readback_floor_s": round(floor, 4),
        "floor_over_window": round(floor / dt, 4),
        "live_rays": int(rays),
        "loop_iters": int(iters),
        "rows_gathered": int(rows),
        "bytes_gathered": int(rows * ROW_BYTES),
        "gather_GBps": round(gbps, 2),
        "pct_of_HBM_peak": round(100.0 * gbps / HBM_PEAK_GBPS, 2),
        "vmem_resident_table": vmem,
        # treelet overflow rays whose exact re-traversal was clipped by the
        # fallback batch budget — MUST be 0 or hits may be treelet-pruned
        "overflow_clipped": int(tr._ovf_dev),
        "image": _save_image(tr.film, key),
        **_roofline_fields(rays, rows, dt),
    }


def bench_prim():
    """Config 1: PrimTracer primary-hit AOVs on Cornell (shading normals)."""
    from cudatracerlib_tpu.models import prim as primmod
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 512
    scene = example_scenes.cornell_box(w, h).build()
    tr = primmod.PrimTracer(scene, w, h, draw_mode=primmod.D_NORMAL_SHADE)
    tr.render_batched(1)
    _drain(tr.film.rgb)
    floor = _readback_floor(tr.film.rgb)
    n_passes = 80            # window sized for floor < 5% (r3: 20 -> 0.24s)
    times, iters_r, rows_r = [], [], []
    for _ in range(REPS):
        i0, r0 = tr._iters_dev, tr._rows_dev
        t0 = time.perf_counter()
        tr.render_batched(n_passes)   # one fused dispatch per rep
        _drain(tr.film.rgb)
        times.append(time.perf_counter() - t0)
        iters_r.append(float(tr._iters_dev - i0))
        rows_r.append(float(tr._rows_dev - r0))
    dt, spread = _spread(times)
    k = times.index(statistics.median_low(times))
    # device-accumulated counters (round 4; r3 estimated them from one
    # instrumented traversal x n_passes)
    it_n, rw_n = iters_r[k], rows_r[k]
    mrays = w * h * n_passes / dt / 1e6  # exactly one primary ray per pixel
    gbps = rw_n * ROW_BYTES / dt / 1e9
    return {
        "metric": "prim-tracer AOV (Cornell 512x512, shading normals)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "timing": "time-to-readback",
        "reps": REPS,
        "seconds": round(dt, 3),
        "spread_rel": spread,
        "readback_floor_s": round(floor, 4),
        "floor_over_window": round(floor / dt, 4),
        "live_rays": w * h * n_passes,
        "loop_iters": int(it_n),
        "rows_gathered": int(rw_n),
        "bytes_gathered": int(rw_n * ROW_BYTES),
        "gather_GBps": round(gbps, 2),
        "pct_of_HBM_peak": round(100.0 * gbps / HBM_PEAK_GBPS, 2),
        "vmem_resident_table": True,
        "counters": "device-accumulated in the fused pass loop",
        "image": _save_image(tr.film, "prim"),
        **_roofline_fields(w * h * n_passes, rw_n, dt),
    }


def bench_veach_mis():
    """Config 2: PT with NEE+MIS on veach-mis (rough-microfacet BSDFs)."""
    from cudatracerlib_tpu.utils import example_scenes
    return _bench_pt(example_scenes.veach_mis, "veach_mis",
                     "path-tracer NEE+MIS (veach-mis 512x512, depth 5)",
                     512, 512, max_depth=5, n_passes=8)


def bench_san_miguel():
    """Config 3: wavefront PT on the San-Miguel-class stand-in
    (>=1M tris, image texture, env map + sun)."""
    from cudatracerlib_tpu.utils import example_scenes
    return _bench_pt(example_scenes.san_miguel_stand_in, "san_miguel",
                     "wavefront path-tracer (san-miguel stand-in 1024x1024, "
                     "1.2M tris, textures, env light, depth 5)",
                     1024, 1024, max_depth=5, n_passes=2, chunk_size=1 << 17)


def bench_bdpt():
    """Config 4: BDPT on the glass-caustic Cornell (veach-bidir style)."""
    from cudatracerlib_tpu.models import bdpt as bdptmod
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 256
    scene = example_scenes.cornell_glass(w, h).build()
    tr = bdptmod.BDPT(scene, w, h, max_depth=6)
    tr.render_batched(1)
    _drain(tr.film.rgb)
    floor = _readback_floor(tr.film.rgb)
    n_passes = 4
    times, rays_r = [], []
    for _ in range(REPS):
        r0 = float(tr._rays_dev)
        t0 = time.perf_counter()
        tr.render_batched(n_passes)   # one fused dispatch per rep
        _drain(tr.film.rgb)
        times.append(time.perf_counter() - t0)
        rays_r.append(float(tr._rays_dev) - r0)
    dt, spread = _spread(times)
    rays = rays_r[times.index(statistics.median_low(times))]
    paths = w * h * n_passes
    return {
        "metric": "bidirectional PT (cornell-glass 256x256, depth 6)",
        "value": round(paths / dt / 1e6, 3),
        "unit": "Mpaths/s (full BDPT samples)",
        "spp_per_s": round(n_passes / dt, 3),
        "vs_baseline": None,
        "timing": "time-to-readback",
        "reps": REPS,
        "seconds": round(dt, 3),
        "spread_rel": spread,
        "readback_floor_s": round(floor, 4),
        "floor_over_window": round(floor / dt, 4),
        "live_rays": int(rays),
        "live_Mrays_s": round(rays / dt / 1e6, 3),
        "image": _save_image(tr.film, "bdpt"),
    }


def bench_ppm():
    """Config 5: progressive photon mapping in a scattering medium."""
    from cudatracerlib_tpu.models import ppm as ppmmod
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 256
    scene = example_scenes.fog_cornell(w, h).build()
    tr = ppmmod.PPMTracer(scene, w, h)
    tr.do_pass()
    _drain(tr.film.rgb)
    floor = _readback_floor(tr.film.rgb)
    n_passes = 3
    times, ph_r = [], []
    for _ in range(REPS):
        p0 = tr.photons_emitted
        t0 = time.perf_counter()
        for _ in range(n_passes):
            tr.do_pass()
        _drain(tr.film.rgb)
        times.append(time.perf_counter() - t0)
        ph_r.append(tr.photons_emitted - p0)
    dt, spread = _spread(times)
    ph = ph_r[times.index(statistics.median_low(times))]
    return {
        "metric": "PPM photon+eye pass (fog cornell 256x256, volumetric)",
        "value": round(ph / dt / 1e6, 5),
        "unit": "Mphotons/s",
        "seconds_per_pass": round(dt / n_passes, 2),
        "spp_per_s": round(n_passes / dt, 3),
        "vs_baseline": None,
        "timing": "time-to-readback",
        "reps": REPS,
        "seconds": round(dt, 3),
        "spread_rel": spread,
        "readback_floor_s": round(floor, 4),
        "floor_over_window": round(floor / dt, 4),
        "image": _save_image(tr.film, "ppm"),
    }


def bench_traversal_kernels():
    """Traversal-kernel A/B on the 1.2M-tri stand-in: two-phase treelet
    (HBM slab DMA) vs the XLA gather loop, 131k coherent camera rays AND a
    shuffled (incoherent) copy of the same rays — the bounce/shadow-ray
    regime the round-4 treelet extension targets."""
    import jax
    import jax.numpy as jnp
    from cudatracerlib_tpu.models import tracer as tracermod
    from cudatracerlib_tpu.ops import traversal8
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 1024
    B = 1 << 17
    scene = example_scenes.san_miguel_stand_in(w, h).build()
    pix = jnp.arange(B, dtype=jnp.int32)
    rays, _, _, _, _ = tracermod.gen_camera_rays(scene, pix, 0, 0, w, h)
    # incoherent variant: a fixed permutation destroys slab coherence between
    # neighbouring lanes without changing the ray set (same total work)
    import numpy as np
    perm = jnp.asarray(np.random.default_rng(0).permutation(B))
    rays_inc = type(rays)(o=rays.o[perm], d=rays.d[perm],
                          tmin=rays.tmin[perm], tmax=rays.tmax[perm])

    def run(r, mode):
        # mode: "treelet" (dispatch via the coherent hint) or "xla" (force
        # the gather loop by disabling the incoherent treelet dispatch)
        old = traversal8.TREELET_INCOHERENT
        traversal8.TREELET_INCOHERENT = mode == "treelet"
        try:
            fn = jax.jit(lambda rr: traversal8.intersect_scene(
                scene.geom, rr, with_iters=True,
                coherent=(mode == "treelet_coh")))
            hit, it, rw, ovf = fn(r)          # compile + warm
            _drain(hit.t)
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                hit, it, rw, ovf = fn(r)
                _drain(hit.t)
                ts.append(time.perf_counter() - t0)
        finally:
            traversal8.TREELET_INCOHERENT = old
        dt, spread = _spread(ts)
        return dict(Mrays_s=round(B / dt / 1e6, 3), seconds=round(dt, 4),
                    spread_rel=spread, loop_iters=int(it),
                    rows_gathered=int(rw),
                    gather_GBps=round(float(rw) * ROW_BYTES / dt / 1e9, 2),
                    hits=int(jnp.sum(hit.valid)),
                    overflow_clipped=int(ovf))

    res_t = run(rays, "treelet_coh")
    res_x = run(rays, "xla")
    res_ti = run(rays_inc, "treelet")
    res_xi = run(rays_inc, "xla")
    return {
        "metric": "traversal kernel A/B (1.2M tris, 131k camera rays)",
        "value": res_t["Mrays_s"],
        "unit": "Mrays/s (treelet two-phase, coherent)",
        "vs_baseline": round(res_t["Mrays_s"] / BASELINE_MRAYS, 4),
        "timing": "time-to-readback",
        "treelet": res_t,
        "xla_loop": res_x,
        "treelet_incoherent": res_ti,
        "xla_loop_incoherent": res_xi,
        "treelet_speedup_x": round(res_x["seconds"] / res_t["seconds"], 3),
        "treelet_speedup_incoherent_x": round(
            res_xi["seconds"] / res_ti["seconds"], 3),
    }


def bench_instanced():
    """Instanced A/B (VERDICT r3 #5): two-level TLAS/BLAS traversal over a
    shared HBM-scale BLAS (treelet path, per-lane roots) vs the flattened
    single-table build of the SAME scene, 131k camera rays. Also reports the
    memory sharing (wide-table rows instanced vs flattened)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cudatracerlib_tpu.models import tracer as tracermod
    from cudatracerlib_tpu.ops import traversal8
    from cudatracerlib_tpu.scene import host, schema, sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf

    sc = host.DynamicScene()
    white = sc.add_material(host.MaterialSpec(reflectance=(0.7, 0.7, 0.7)))
    red = sc.add_material(host.MaterialSpec(reflectance=(0.6, 0.1, 0.1)))
    floor = sc.add_material(host.MaterialSpec(reflectance=(0.4, 0.4, 0.4)))
    sc.create_node(shapes.rectangle(), floor,
                   tf.compose(tf.translate([0, -1, 0]),
                              tf.rotate_deg([1, 0, 0], -90), tf.scale(30.0)))
    # ONE ~33k-tri mesh shared by a 4x4 grid: the shared BLAS exceeds the
    # VMEM kernel budget, so instanced traversal exercises the multi-root
    # treelet path; flattened it is a ~0.5M-tri single table
    ball = shapes.sphere(radius=0.6, n_theta=128, n_phi=130)
    for i in range(4):
        for j in range(4):
            sc.create_node(ball, red if (i + j) % 2 else white,
                           tf.translate([-3.0 + 2.0 * i, -0.4,
                                         -3.0 + 2.0 * j]),
                           name=f"ball{i}_{j}")
    sc.set_sensor(sensors.make_sensor(
        schema.SENSOR_PERSPECTIVE, tf.look_at([0, 4.0, -9.0], [0, -0.5, 0]),
        fov_x_deg=50.0, film_w=512, film_h=512))
    flat = sc.build(instancing="off")
    inst = sc.build(instancing="auto")
    B = 1 << 17
    pix = jnp.arange(B, dtype=jnp.int32) % (512 * 512)
    rays, _, _, _, _ = tracermod.gen_camera_rays(inst, pix, 0, 0, 512, 512)

    def run(geom):
        fn = jax.jit(lambda r: traversal8.intersect_scene(geom, r))
        hit = fn(rays)
        _drain(hit.t)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            hit = fn(rays)
            _drain(hit.t)
            ts.append(time.perf_counter() - t0)
        dt, spread = _spread(ts)
        return dict(Mrays_s=round(B / dt / 1e6, 3), seconds=round(dt, 4),
                    spread_rel=spread, hits=int(jnp.sum(hit.valid)))

    res_i = run(inst.geom)
    res_f = run(flat.geom)
    return {
        "metric": "instanced A/B (16x shared 33k-tri BLAS, 131k camera rays)",
        "value": res_i["Mrays_s"],
        "unit": "Mrays/s (two-level TLAS/BLAS)",
        "vs_baseline": round(res_i["Mrays_s"] / BASELINE_MRAYS, 4),
        "timing": "time-to-readback",
        "instanced": res_i,
        "flattened": res_f,
        "instanced_over_flattened_x": round(
            res_f["seconds"] / res_i["seconds"], 3),
        "wide_rows_instanced": int(inst.geom.wide.shape[0]),
        "wide_rows_flattened": int(flat.geom.wide.shape[0]),
        "blas_on_treelet_path": bool(inst.geom.inst.root_top is not None),
    }


def bench_cornell_headline():
    """Headline: PT Cornell 512x512 depth 6 — round-over-round comparable."""
    from cudatracerlib_tpu.utils import example_scenes
    return _bench_pt(example_scenes.cornell_box, "headline",
                     "path-tracer throughput (Cornell 512x512, depth 6, "
                     "NEE+MIS, live rays)",
                     512, 512, max_depth=6, n_passes=24)


CONFIGS = {
    "prim": bench_prim,
    "veach_mis": bench_veach_mis,
    "san_miguel": bench_san_miguel,
    "bdpt": bench_bdpt,
    "ppm": bench_ppm,
    "traversal": bench_traversal_kernels,
    "instanced": bench_instanced,
    "headline": bench_cornell_headline,
}

# generous per-config wall estimates (cold compile + reps) used by the
# deadline gate; a config only launches if this much budget remains
EST_SECONDS = {
    "prim": 180, "veach_mis": 240, "san_miguel": 420, "bdpt": 300,
    "ppm": 300, "headline": 200, "traversal": 420, "instanced": 360,
}


def _preflight(timeout_s: float = 110.0) -> bool:
    """Liveness probe: the axon tunnel can hang indefinitely (observed round
    3: even an 8-element sum never returns; round 4's outage kept TINY probes
    alive while any real transfer hung, so probe H2D with a real array).
    Without this, each config burns its full subprocess timeout on a dead
    tunnel."""
    import subprocess
    import sys
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp, numpy as np;"
             "x = jnp.asarray(np.ones((128, 2048), np.float32));"
             "print('OK', float(jax.jit(lambda v: v.sum())(x)))"],
            capture_output=True, text=True, timeout=timeout_s)
        return "OK" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_tunnel(deadline: float) -> bool:
    """Bounded wait-for-tunnel retry loop (VERDICT r4 #2): tunnel outages are
    TRANSIENT (round 4's came back within the round) — probe, sleep, retry
    within a sub-budget instead of declaring the whole bench dead on the
    first failed probe.  Returns True as soon as a probe passes; gives up
    when less than one config's floor estimate would remain."""
    wait_budget = min(deadline - time.time() - 300.0,
                      float(os.environ.get("BENCH_TUNNEL_WAIT_S", "900")))
    t_end = time.time() + max(wait_budget, 0.0)
    attempt = 0
    while True:
        attempt += 1
        if _preflight():
            return True
        now = time.time()
        if now >= t_end:
            return False
        print(json.dumps({"tunnel_probe": attempt, "status": "down",
                          "retry_in_s": 45,
                          "wait_left_s": round(t_end - now)}), flush=True)
        time.sleep(min(45.0, max(t_end - now, 1.0)))


def _persist_last_good(name: str, rec: dict) -> None:
    """Keep the last successful record per config so a partial tunnel outage
    still reports stale-but-labeled numbers instead of nothing."""
    if rec.get("value") is None:
        return
    d = os.path.join(OUT_DIR, "last_good")
    os.makedirs(d, exist_ok=True)
    rec = dict(rec)
    rec["captured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(d, f"{name}.json"), "w") as f:
        json.dump(rec, f)


def _load_last_good(name: str):
    p = os.path.join(OUT_DIR, "last_good", f"{name}.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def main():
    import subprocess
    import sys

    if len(sys.argv) > 1:  # child mode: run one config, print one JSON line
        _setup_jax_cache()
        rec = CONFIGS[sys.argv[1]]()
        if rec.get("value") is not None and not any(
                k.startswith("CTL_") for k in os.environ):
            # single-config invocations persist too, so the last_good
            # fallback is as fresh as the newest successful run — but only
            # at HEAD defaults (CTL_* A/B overrides must not pollute it)
            _persist_last_good(sys.argv[1], rec)
        print(json.dumps(rec), flush=True)
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    deadline = time.time() + budget

    if not _wait_for_tunnel(deadline):
        stale = {n: _load_last_good(n) for n in CONFIGS}
        stale = {n: r for n, r in stale.items() if r}
        print(json.dumps({
            "metric": "path-tracer throughput (Cornell 512x512, depth 6, "
                      "NEE+MIS, live rays)",
            "value": None, "unit": "Mrays/s", "vs_baseline": None,
            "error": "device backend unreachable: an H2D probe + reduction "
                     "did not complete despite bounded retries (tunnel "
                     "down); no configs were run this invocation",
            "stale_last_good": stale}), flush=True)
        return

    def run_child(name, remaining):
        p = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True,
                           timeout=min(remaining, 1200))
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:  # crash: surface WHY (stderr tail), not an IndexError
            raise RuntimeError(
                f"child rc={p.returncode} no JSON; stderr tail: "
                + " | ".join(p.stderr.splitlines()[-4:]))
        return json.loads(lines[-1])

    # each config runs in its own process: one config's readbacks/state must
    # not affect the next (axon tunnel dispatch-mode quirks). BASELINE.md
    # configs 1-5 go first, then the headline, then the traversal A/B extra —
    # a blown budget skips extras, never the baseline matrix (VERDICT r3 #2).
    results = []
    head = None
    for name in ("prim", "veach_mis", "san_miguel", "bdpt", "ppm",
                 "headline", "traversal", "instanced"):
        remaining = deadline - time.time()
        if remaining < EST_SECONDS[name] * 0.5:
            r = {"metric": name, "value": None, "unit": "skipped",
                 "vs_baseline": None,
                 "skipped": f"global deadline: {remaining:.0f}s left < "
                            f"{EST_SECONDS[name] * 0.5:.0f}s floor estimate"}
        else:
            try:
                r = run_child(name, remaining)
                _persist_last_good(name, r)
            except Exception as e:  # one config failing must not hide the rest
                r = {"metric": name, "value": None, "unit": "error",
                     "vs_baseline": None, "error": repr(e)[:300]}
        if r.get("value") is None:
            lg = _load_last_good(name)
            if lg:  # stale-but-labeled beats nothing (VERDICT r4 #2)
                r["stale_last_good"] = lg
        if name == "headline":
            head = r
        else:
            results.append(r)
            print(json.dumps(r), flush=True)
    if head is None or "value" not in head:
        head = {"metric": "headline", "value": None, "unit": "error",
                "vs_baseline": None, "error": "headline config did not run"}
    head["configs"] = {r["metric"]: [r["value"], r.get("unit")]
                       for r in results}
    head["budget_s"] = budget
    head["note"] = ("time-to-readback timing (round 3+): every window ends at "
                    "a host-visible readback; median of >=3 reps (round 4)")
    print(json.dumps(head), flush=True)


if __name__ == "__main__":
    main()
