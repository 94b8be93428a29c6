"""Regenerate the golden images in tests/goldens (CPU backend, fixed seeds).

Run after an INTENTIONAL change to an integrator's output (e.g. the round-3
BDPT/VCM splat-MIS cosine fix) — never to paper over an unexplained drift.
Pass family names to regenerate a subset: `python tools/regen_goldens.py bdpt vcm`.
"""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GDIR = os.path.join(REPO, "tests", "goldens")
W = H = 32


def main(only=()):
    from cudatracerlib_tpu.models import bdpt as bdptmod
    from cudatracerlib_tpu.models import lighttracer as ltmod
    from cudatracerlib_tpu.models import path as pathmod
    from cudatracerlib_tpu.models import ppm as ppmmod
    from cudatracerlib_tpu.models import vcm as vcmmod
    from cudatracerlib_tpu.utils import example_scenes

    def scene():
        return example_scenes.cornell_box(W, H).build()

    recipes = {
        # mirror tests/test_goldens_family.py EXACTLY
        "bdpt": ("cornell_32_bdpt.npz",
                 lambda: bdptmod.BDPT(scene(), W, H, max_depth=4).render(6)),
        "vcm": ("cornell_32_vcm.npz",
                lambda: vcmmod.VCM(scene(), W, H, max_depth=4).render(4)),
        "ppm": ("cornell_32_ppm.npz",
                lambda: ppmmod.PPMTracer(scene(), W, H, max_depth=4,
                                         initial_radius=0.08).render(6)),
        "lt": ("cornell_32_lt.npz",
               lambda: ltmod.LightTracer(scene(), W, H, max_depth=4)
               .render(12)),
        "pt": ("cornell_32_pt.npz",
               lambda: pathmod.PathTracer(scene(), W, H, max_depth=4,
                                          spp_per_pass=1).render(16)),
    }
    for name, (fname, fn) in recipes.items():
        if only and name not in only:
            continue
        img = np.asarray(fn())
        np.savez_compressed(os.path.join(GDIR, fname), img=img)
        print(f"regenerated {fname}: mean {img.mean():.5f}")


if __name__ == "__main__":
    main(tuple(sys.argv[1:]))
