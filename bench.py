"""Benchmark harness: the five BASELINE.md configs.

Prints one JSON line per config; the FINAL line is the headline metric
(path-tracer Mrays/s on Cornell, live-ray counted) and embeds the whole
matrix in its "configs" field so a single-line consumer still sees
everything.

Ray counting follows the reference's g_RayTracedCounter semantics
(`Kernel/TraceHelper.cu:309-320`): only rays actually traced are counted
(live closest-hit lanes + issued shadow rays), not launched lanes.
Baseline = the adopted north-star target of 150 Mrays/s per chip
(BASELINE.md; the reference publishes no numbers of its own).
"""
import json
import time

BASELINE_MRAYS = 150.0


def _bench_pt(scene_fn, name, w, h, max_depth, n_passes, chunk_size=1 << 16,
              **scene_kw):
    import jax
    from cudatracerlib_tpu.models import path as pathmod

    scene = scene_fn(w, h, **scene_kw).build()
    tr = pathmod.PathTracer(scene, w, h, max_depth=max_depth, spp_per_pass=1,
                            chunk_size=chunk_size)
    tr.do_pass()  # compile + warm
    jax.block_until_ready(tr.film.rgb)
    # NO device->host reads between here and the end of timing: the first
    # D2H transfer permanently degrades the axon client's dispatch latency
    c0 = tr._rays_dev
    t0 = time.perf_counter()
    for _ in range(n_passes):
        tr.do_pass()
    jax.block_until_ready(tr.film.rgb)
    dt = time.perf_counter() - t0
    mrays = float(tr._rays_dev - c0) / dt / 1e6
    spp_s = n_passes / dt
    return {
        "metric": name,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "spp_per_s": round(spp_s, 3),
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }


def bench_prim():
    """Config 1: PrimTracer primary-hit AOVs on Cornell (depth + normal)."""
    import jax
    from cudatracerlib_tpu.models import prim as primmod
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 512
    scene = example_scenes.cornell_box(w, h).build()
    tr = primmod.PrimTracer(scene, w, h, draw_mode=primmod.D_NORMAL_SHADE)
    tr.do_pass()
    jax.block_until_ready(tr.film.rgb)
    n_passes = 20
    t0 = time.perf_counter()
    for _ in range(n_passes):
        tr.do_pass()
    jax.block_until_ready(tr.film.rgb)
    dt = time.perf_counter() - t0
    mrays = w * h * n_passes / dt / 1e6  # exactly one primary ray per pixel
    return {
        "metric": "prim-tracer AOV (Cornell 512x512, shading normals)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }


def bench_veach_mis():
    """Config 2: PT with NEE+MIS on veach-mis (rough-microfacet BSDFs)."""
    from cudatracerlib_tpu.utils import example_scenes
    return _bench_pt(example_scenes.veach_mis,
                     "path-tracer NEE+MIS (veach-mis 512x512, depth 5)",
                     512, 512, max_depth=5, n_passes=4)


def bench_san_miguel():
    """Config 3: wavefront PT on the San-Miguel-class stand-in
    (>=1M tris, image texture, env map + sun)."""
    from cudatracerlib_tpu.utils import example_scenes
    r = _bench_pt(example_scenes.san_miguel_stand_in,
                  "wavefront path-tracer (san-miguel stand-in 1024x1024, "
                  "1.2M tris, textures, env light, depth 5)",
                  1024, 1024, max_depth=5, n_passes=2, chunk_size=1 << 17)
    return r


def bench_bdpt():
    """Config 4: BDPT on the glass-caustic Cornell (veach-bidir style)."""
    import jax
    from cudatracerlib_tpu.models import bdpt as bdptmod
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 256
    scene = example_scenes.cornell_glass(w, h).build()
    tr = bdptmod.BDPT(scene, w, h, max_depth=6)
    tr.do_pass()
    jax.block_until_ready(tr.film.rgb)
    n_passes = 4
    t0 = time.perf_counter()
    for _ in range(n_passes):
        tr.do_pass()
    jax.block_until_ready(tr.film.rgb)
    dt = time.perf_counter() - t0
    # per sample: light walk (<=NUM_LIGHT_V segments), camera walk
    # (<=max_depth segments), plus one shadow ray per (light-vertex x camera
    # vertex) connection and one per camera NEE — count the launched upper
    # bound and flag it as such (BDPT lanes have no cheap live counter yet)
    paths = w * h * n_passes
    spp_s = n_passes / dt
    return {
        "metric": "bidirectional PT (cornell-glass 256x256, depth 6)",
        "value": round(paths / dt / 1e6, 3),
        "unit": "Mpaths/s (full BDPT samples)",
        "spp_per_s": round(spp_s, 3),
        "vs_baseline": None,
    }


def bench_ppm():
    """Config 5: progressive photon mapping in a scattering medium."""
    import jax
    from cudatracerlib_tpu.models import ppm as ppmmod
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 256
    scene = example_scenes.fog_cornell(w, h).build()
    tr = ppmmod.PPMTracer(scene, w, h)
    tr.do_pass()
    jax.block_until_ready(tr.film.rgb)
    p0 = tr.photons_emitted
    n_passes = 3
    t0 = time.perf_counter()
    for _ in range(n_passes):
        tr.do_pass()
    jax.block_until_ready(tr.film.rgb)
    dt = time.perf_counter() - t0
    ph_s = (tr.photons_emitted - p0) / dt / 1e6
    return {
        "metric": "PPM photon+eye pass (fog cornell 256x256, volumetric)",
        "value": round(ph_s, 3),
        "unit": "Mphotons/s",
        "spp_per_s": round(n_passes / dt, 3),
        "vs_baseline": None,
    }


def bench_cornell_headline():
    """Headline: PT Cornell 512x512 depth 6 — round-over-round comparable."""
    from cudatracerlib_tpu.utils import example_scenes
    return _bench_pt(example_scenes.cornell_box,
                     "path-tracer throughput (Cornell 512x512, depth 6, "
                     "NEE+MIS, live rays)",
                     512, 512, max_depth=6, n_passes=6)


CONFIGS = {
    "prim": bench_prim,
    "veach_mis": bench_veach_mis,
    "san_miguel": bench_san_miguel,
    "bdpt": bench_bdpt,
    "ppm": bench_ppm,
    "headline": bench_cornell_headline,
}


def main():
    import subprocess
    import sys

    if len(sys.argv) > 1:  # child mode: run one config, print one JSON line
        print(json.dumps(CONFIGS[sys.argv[1]]()), flush=True)
        return

    # each config runs in its own process: readbacks at the end of one config
    # must not poison the dispatch latency of the next (axon D2H behavior)
    results = []
    for name in ("prim", "veach_mis", "san_miguel", "bdpt", "ppm"):
        try:
            p = subprocess.run([sys.executable, __file__, name],
                               capture_output=True, text=True, timeout=1800)
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
        except Exception as e:  # one config failing must not hide the rest
            r = {"metric": name, "value": None, "unit": "error",
                 "vs_baseline": None, "error": repr(e)[:300]}
        results.append(r)
        print(json.dumps(r), flush=True)
    try:
        p = subprocess.run([sys.executable, __file__, "headline"],
                           capture_output=True, text=True, timeout=1800)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        head = json.loads(line)
    except Exception as e:
        head = {"metric": "headline", "value": None, "unit": "error",
                "vs_baseline": None, "error": repr(e)[:300]}
    head["configs"] = {r["metric"]: [r["value"], r["unit"]] for r in results}
    print(json.dumps(head), flush=True)


if __name__ == "__main__":
    main()
