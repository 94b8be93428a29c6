"""Benchmark harness: path-tracing throughput on the Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the adopted north-star target of 150 Mrays/s per chip
(BASELINE.md; the reference publishes no numbers of its own).
"""
import json
import time


def main():
    import jax
    from cudatracerlib_tpu.models import path as pathmod
    from cudatracerlib_tpu.utils import example_scenes

    w = h = 512
    max_depth = 6
    scene = example_scenes.cornell_box(w, h).build()
    tr = pathmod.PathTracer(scene, w, h, max_depth=max_depth, spp_per_pass=1,
                            chunk_size=1 << 16)
    tr.do_pass()  # compile
    n_passes = 6
    t0 = time.perf_counter()
    for _ in range(n_passes):
        tr.do_pass()
    dt = time.perf_counter() - t0

    # rays per pass: one closest-hit + one shadow ray per bounce per lane;
    # count only lanes still alive is not measurable cheaply -> report the
    # conservative upper-bound launch count like the reference's ray counters
    rays = 2 * max_depth * w * h * n_passes
    mrays = rays / dt / 1e6
    baseline = 150.0
    print(json.dumps({
        "metric": "path-tracer throughput (Cornell 512x512, depth 6, NEE+MIS)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 4),
    }))


if __name__ == "__main__":
    main()
