"""Regenerating wavefront PT (models/wavefront.py) — estimator equality.

The counter-based RNG seeds every path by (pixel, sample, pass), so the
wavefront scheduler's different pixel->lane assignment must produce the
BIT-IDENTICAL image to the chunked PathTracer — a much stronger pin than a
statistical tolerance (reference: WavefrontPathTracer.cu computes the same
estimator as PathTracer.cu, only the queueing differs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import wavefront as wfmod
from cudatracerlib_tpu.utils import example_scenes


@pytest.mark.parametrize("lanes", [1024, 768])
def test_wavefront_matches_pt_bitwise(lanes):
    w = h = 32
    scene = example_scenes.cornell_box(w, h).build()
    tr1 = pathmod.PathTracer(scene, w, h, max_depth=4, chunk_size=w * h,
                             seed=0)
    tr2 = wfmod.WavefrontPT(scene, w, h, max_depth=4, lanes=lanes, seed=0)
    i1 = np.asarray(tr1.render(2))
    i2 = np.asarray(tr2.render(2))
    assert np.isfinite(i2).all()
    # identical SAMPLE SET per pixel -> identical image up to float
    # accumulation order (the film scatter-adds a pixel's samples in a
    # different order under the wavefront schedule: ~1e-7 relative noise).
    # lanes=768 makes the pool smaller than the path queue and NOT a divisor
    # of it: several regeneration waves per pass, wrap-around, and a drain
    # tail all hit. The live-ray counter IS exactly equal: the two tracers
    # trace the same rays.
    np.testing.assert_allclose(i2, i1, rtol=1e-5, atol=1e-7)
    assert float(tr1._rays_dev) == float(tr2._rays_dev)


def test_wavefront_batched_matches_render_pass():
    w = h = 16
    scene = example_scenes.cornell_box(w, h).build()
    tr1 = wfmod.WavefrontPT(scene, w, h, max_depth=3, lanes=256, seed=0)
    tr2 = wfmod.WavefrontPT(scene, w, h, max_depth=3, lanes=256, seed=0)
    i1 = np.asarray(tr1.render(2))
    tr2.render_batched(2)
    i2 = np.asarray(filmmod.develop(tr2.film))
    np.testing.assert_allclose(i2, i1, rtol=1e-6)


def test_wavefront_overflow_counter_zero():
    w = h = 16
    scene = example_scenes.cornell_box(w, h).build()
    tr = wfmod.WavefrontPT(scene, w, h, max_depth=3, lanes=256)
    tr.render(1)
    assert float(tr._ovf_dev) == 0.0
