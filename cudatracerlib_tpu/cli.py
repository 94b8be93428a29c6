"""Command-line renderer.

Reference: ``main.cpp:135-180`` — `CudaTracerLib <data> <scene.xml> <passes>
{direct,PT,PT_Wave,BDPT,PPPM}` with a progress bar and a PNG at the end.

    python -m cudatracerlib_tpu scene.xml -o out.png -t PT -p 64
"""
from __future__ import annotations

import argparse
import sys
import time


def _coerce(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    for t in (int, float):
        try:
            return t(v)
        except ValueError:
            pass
    return v


def build_tracer(name: str, scene_data, settings, args, devices: int = 1):
    """args: list of "name=value" strings forwarded to the tracer's
    constructor (the reference's TracerArguments string->parameter path,
    TracerSettings.h:352-383) — e.g. --arg vol_estimator=beambeam
    --arg adaptive_radii=true --arg sampler_type=2.

    devices > 1 renders SPMD over a device mesh (parallel/render.py):
    supported for PT/wavefront, BDPT, PPM, VCM and LT."""
    from .models import (adaptive, bdpt, fast, game, lighttracer, path, ppm,
                         prim, vcm)
    w, h = settings.width, settings.height
    name = name.lower()
    kw = {}
    for s in args or []:
        k, _, v = s.partition("=")
        kw[k.strip()] = _coerce(v.strip())
    if devices > 1:
        from .parallel import render as prender
        mesh = prender.make_mesh(devices)
        sharded = {"pt": prender.ShardedPathTracer,
                   "path": prender.ShardedPathTracer,
                   "pt_wave": prender.ShardedPathTracer,
                   "wavefront": prender.ShardedPathTracer,
                   "bdpt": prender.ShardedBDPT,
                   "ppm": prender.ShardedPPMTracer,
                   "pppm": prender.ShardedPPMTracer,
                   "vcm": prender.ShardedVCM,
                   "lt": prender.ShardedLightTracer,
                   "lighttracer": prender.ShardedLightTracer,
                   "photontracer": prender.ShardedLightTracer}
        if name not in sharded:
            raise SystemExit(f"--devices: tracer '{name}' has no sharded "
                             "variant (PT/BDPT/PPM/VCM/LT do)")
        cls = sharded[name]
        if name not in ("lt", "lighttracer", "photontracer"):
            kw.setdefault("max_depth", min(settings.max_depth, 8))
        return cls(scene_data, w, h, mesh=mesh, **kw)
    if name in ("direct", "prim"):
        return prim.PrimTracer(scene_data, w, h,
                               **{"draw_mode": prim.D_ALBEDO, **kw})
    if name in ("pt", "path"):
        return path.PathTracer(scene_data, w, h, max_depth=settings.max_depth,
                               rr_depth=settings.rr_depth, **kw)
    if name in ("pt_wave", "wavefront"):
        return path.PathTracer(scene_data, w, h, max_depth=settings.max_depth,
                               **{"chunk_size": 1 << 16, **kw})
    if name in ("pt_adaptive", "adaptive"):
        return adaptive.AdaptivePathTracer(scene_data, w, h,
                                           max_depth=settings.max_depth, **kw)
    if name == "bdpt":
        return bdpt.BDPT(scene_data, w, h,
                         max_depth=min(settings.max_depth, 8), **kw)
    if name in ("ppm", "pppm"):
        return ppm.PPMTracer(scene_data, w, h,
                             max_depth=min(settings.max_depth, 8), **kw)
    if name == "vcm":
        return vcm.VCM(scene_data, w, h,
                       max_depth=min(settings.max_depth, 8), **kw)
    if name in ("lt", "lighttracer", "photontracer"):
        return lighttracer.LightTracer(scene_data, w, h,
                                       max_depth=settings.max_depth, **kw)
    if name == "fast":
        return fast.FastTracer(scene_data, w, h, **kw)
    if name == "game":
        return game.GameTracer(scene_data, w, h, **kw)
    raise SystemExit(f"unknown tracer '{name}'")


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="cudatracerlib_tpu",
        description="TPU-native physically-based renderer (Mitsuba-XML scenes)")
    ap.add_argument("scene", help="Mitsuba XML scene file, or 'cornell' for the builtin box")
    ap.add_argument("-o", "--output", default="result.png")
    ap.add_argument("-t", "--tracer", default=None,
                    help="direct|PT|PT_Wave|adaptive|BDPT|PPM|VCM|LT|fast|game")
    ap.add_argument("-p", "--passes", type=int, default=None)
    ap.add_argument("--res", default=None, help="WxH override")
    ap.add_argument("--tonemap", action="store_true")
    ap.add_argument("--denoise", action="store_true")
    ap.add_argument("--filter", default="box",
                    choices=["box", "gaussian", "mitchell", "lanczos", "triangle"])
    ap.add_argument("--hdr", default=None, help="also write a Radiance .hdr")
    ap.add_argument("--arg", action="append", default=[],
                    help="name=value tracer parameter (repeatable)")
    ap.add_argument("--debug-pixel", default=None, help="x,y: print one-pixel debug info")
    ap.add_argument("--devices", type=int, default=1,
                    help="render SPMD over N devices (PT/BDPT/PPM/VCM/LT)")
    ap.add_argument("--debug-nans", action="store_true",
                    help="fail fast on the first NaN produced by any pass "
                         "(jax_debug_nans; the functional counterpart of the "
                         "reference's CTL_ASSERT device checks)")
    a = ap.parse_args(argv)
    if a.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)

    from .models import film as filmmod
    from .models import pipeline
    from .scene.loader import mitsuba
    from .utils import example_scenes

    res = tuple(int(v) for v in a.res.split("x")) if a.res else None
    t0 = time.perf_counter()
    if a.scene == "cornell":
        sc = example_scenes.cornell_box(*(res or (512, 512)))
        settings = mitsuba.RenderSettings(width=(res or (512, 512))[0],
                                          height=(res or (512, 512))[1])
    else:
        sc, settings = mitsuba.load_mitsuba(a.scene, override_res=res)
    scene_data = sc.build()
    print(f"[scene] {scene_data.num_tris} tris, {scene_data.num_lights} lights, "
          f"{settings.width}x{settings.height} ({time.perf_counter() - t0:.1f}s)")

    tracer_name = a.tracer or settings.integrator
    tr = build_tracer(tracer_name, scene_data, settings, a.arg,
                      devices=a.devices)
    n_passes = a.passes if a.passes is not None else max(settings.spp, 1)
    if not tr.progressive:
        n_passes = 1

    if a.debug_pixel:
        x, y = (int(v) for v in a.debug_pixel.split(","))
        print(tr.debug_pixel(x, y))

    for i in range(n_passes):
        tr.do_pass()
        done = (i + 1) * 20 // n_passes
        sys.stdout.write("\r[" + "=" * done + " " * (20 - done) +
                         f"] pass {i + 1}/{n_passes}  {tr.last_pass_seconds:.2f}s/pass")
        sys.stdout.flush()
    print()

    ftypes = {"box": pipeline.F_BOX, "gaussian": pipeline.F_GAUSSIAN,
              "mitchell": pipeline.F_MITCHELL, "lanczos": pipeline.F_LANCZOS,
              "triangle": pipeline.F_TRIANGLE}
    vb = getattr(tr, "vb", None)
    hdr = pipeline.apply_pipeline(tr.film, ftypes[a.filter], tonemap=a.tonemap,
                                  denoise=a.denoise, vb=vb)
    filmmod.save_png(hdr, a.output)
    if a.hdr:
        import numpy as np
        from .scene.loader import images
        images.write_hdr(a.hdr, np.asarray(hdr))
    st = tr.status()
    print(f"[done] {a.output}  {st.get('spp', n_passes)} spp in "
          f"{st['seconds']:.1f}s ({st.get('spp_per_second', 0):.2f} spp/s)")


if __name__ == "__main__":
    main()
