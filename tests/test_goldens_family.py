"""Golden-image regression for every integrator family + the instanced
scene (round-2 review: 'a silent MIS-weight regression in VCM would pass
today's suite'). Fixed seeds; goldens rendered on the CPU backend, so runs
differ only by cross-platform float drift."""
import os

import numpy as np
import pytest

from cudatracerlib_tpu.models import bdpt as bdptmod
from cudatracerlib_tpu.models import lighttracer as ltmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import ppm as ppmmod
from cudatracerlib_tpu.models import vcm as vcmmod
from cudatracerlib_tpu.utils import example_scenes

GDIR = os.path.join(os.path.dirname(__file__), "goldens")
W = H = 32


def _check(img, name, tol=0.02):
    ref = np.load(os.path.join(GDIR, name))["img"]
    rel = np.abs(img - ref).mean() / max(ref.mean(), 1e-6)
    assert rel < tol, f"{name} golden drift {rel:.4f}"


def _scene():
    return example_scenes.cornell_box(W, H).build()


def test_bdpt_golden():
    _check(np.asarray(bdptmod.BDPT(_scene(), W, H, max_depth=4).render(6)),
           "cornell_32_bdpt.npz")


def test_vcm_golden():
    _check(np.asarray(vcmmod.VCM(_scene(), W, H, max_depth=4).render(4)),
           "cornell_32_vcm.npz")


def test_ppm_golden():
    _check(np.asarray(ppmmod.PPMTracer(_scene(), W, H, max_depth=4,
                                       initial_radius=0.08).render(6)),
           "cornell_32_ppm.npz")


def test_lt_golden():
    _check(np.asarray(ltmod.LightTracer(_scene(), W, H, max_depth=4)
                      .render(12)), "cornell_32_lt.npz")


def test_instanced_golden():
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_instancing import _scene as inst_scene
    inst = inst_scene().build(instancing="auto")
    _check(np.asarray(pathmod.PathTracer(inst, 48, 48, max_depth=4,
                                         spp_per_pass=1).render(8)),
           "instanced_48_pt.npz")


@pytest.mark.slow
def test_equal_spp_convergence_matrix():
    """Cross-integrator convergence (the RMSE-parity proxy adopted in
    BASELINE.md): PT / BDPT / VCM / PPM / LT rendered on the same scene at
    matched budgets must agree pairwise within a few percent of mean image
    error — a regression in any family's weights fails this."""
    w = h = 32
    scene = example_scenes.cornell_box(w, h).build()

    def blk(a, f=4):
        return a.reshape(h // f, f, w // f, f, 3).mean((1, 3))

    imgs = {
        "pt": np.asarray(pathmod.PathTracer(scene, w, h, max_depth=5,
                                            spp_per_pass=4).render(24)),
        "bdpt": np.asarray(bdptmod.BDPT(scene, w, h, max_depth=5).render(48)),
        "vcm": np.asarray(vcmmod.VCM(scene, w, h, max_depth=5).render(32)),
        "ppm": np.asarray(ppmmod.PPMTracer(scene, w, h, max_depth=5,
                                           initial_radius=0.06,
                                           n_photons=4096).render(48)),
        "lt": np.asarray(ltmod.LightTracer(scene, w, h, max_depth=5)
                         .render(96)),
    }
    ref = blk(imgs["pt"])
    for name, img in imgs.items():
        if name == "pt":
            continue
        b = blk(img)
        # median blockwise relative error: sensitive to systematic transport
        # bias (the round-3 BDPT splat-MIS bug put a 26% deficit on every
        # wall block) but robust to the bright emitter blocks whose splat
        # noise dominates a blockwise RMS at these budgets (measured
        # healthy: <=0.022 across all four families; RMS was 0.08-0.12 of
        # pure noise)
        relmed = np.median(np.abs(b - ref) / (ref + 0.05))
        assert relmed < 0.04, (name, float(relmed))
        # catastrophic backstop on the RMS
        rel = np.sqrt(np.mean((b - ref) ** 2)) / ref.mean()
        assert rel < 0.2, (name, float(rel))
        # mean brightness parity, the cheapest MIS-weight tripwire
        # (measured <=0.008 post-fix; the bug measured 0.035)
        assert abs(img.mean() / imgs["pt"].mean() - 1.0) < 0.02, name
