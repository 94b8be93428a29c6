"""Fast smoke-scale physics-consistency checks, one per integrator family.

The rigorous comparisons live in the slow suite (test_bdpt/test_vcm/
test_ppm/test_vol_estimators with real budgets); these tiny-resolution
versions run in the DEFAULT suite so a broken MIS weight or transport term
fails plain CI instead of hiding behind the `slow` marker (advisor finding,
round 2).  Tolerances are loose (smoke budgets) but tight enough to catch
sign/weight errors, which shift mean radiance by >2x.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.models import bdpt as bdptmod
from cudatracerlib_tpu.models import lighttracer as ltmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import ppm as ppmmod
from cudatracerlib_tpu.models import vcm as vcmmod
from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.utils import example_scenes

W = H = 24


def _mean_img(tracer, n_passes):
    tracer.render(n_passes)
    img = np.asarray(filmmod.develop(tracer.film))
    assert np.isfinite(img).all()
    return img.mean()


@pytest.fixture(scope="module")
def cornell():
    return example_scenes.cornell_box(W, H).build()


@pytest.fixture(scope="module")
def pt_mean(cornell):
    return _mean_img(pathmod.PathTracer(cornell, W, H, max_depth=4,
                                        spp_per_pass=4), 8)


def test_lt_matches_pt(cornell, pt_mean):
    lt = ltmod.LightTracer(cornell, W, H, max_depth=4)
    m = _mean_img(lt, 24)
    assert abs(m / pt_mean - 1.0) < 0.25, (m, pt_mean)


def test_bdpt_matches_pt(cornell, pt_mean):
    tr = bdptmod.BDPT(cornell, W, H, max_depth=4)
    m = _mean_img(tr, 8)
    assert abs(m / pt_mean - 1.0) < 0.25, (m, pt_mean)


def test_vcm_matches_pt(cornell, pt_mean):
    tr = vcmmod.VCM(cornell, W, H, max_depth=4)
    m = _mean_img(tr, 6)
    assert abs(m / pt_mean - 1.0) < 0.3, (m, pt_mean)


def test_ppm_matches_pt(cornell, pt_mean):
    tr = ppmmod.PPMTracer(cornell, W, H, max_depth=4)
    m = _mean_img(tr, 6)
    assert abs(m / pt_mean - 1.0) < 0.35, (m, pt_mean)
