"""Sampler backends wired into rendering (reference Kernel/Sampler_device.h
sequence sampler + combiner): selectable per tracer, and the low-discrepancy
sequence must measurably reduce Cornell variance at equal spp."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import path as pathmod, samplers
from cudatracerlib_tpu.utils import example_scenes


@pytest.mark.slow
def test_sampler_selectable_and_sobol_beats_independent():
    scene = example_scenes.cornell_box(32, 32).build()
    ref = np.asarray(pathmod.PathTracer(scene, 32, 32, max_depth=4,
                                        seed=7).render(160))

    def rmse(img):
        return float(np.sqrt(np.mean((img - ref) ** 2 / (ref + 0.05) ** 2)))

    errs = {}
    for st in (samplers.INDEPENDENT, samplers.STRATIFIED, samplers.SOBOL):
        tr = pathmod.PathTracer(scene, 32, 32, max_depth=4, sampler_type=st,
                                seed=1)
        errs[st] = rmse(np.asarray(tr.render(16)))
    # Sobol camera+first-bounce dims: lower error than independent at 16 spp
    assert errs[samplers.SOBOL] < errs[samplers.INDEPENDENT], errs
    # stratified must not be catastrophically worse (unscrambled strata at
    # deep path dims can correlate; observed 1.0-1.11x of independent —
    # 1.1 was a knife-edge bound, seen failing at 1.105)
    assert errs[samplers.STRATIFIED] < errs[samplers.INDEPENDENT] * 1.2, errs


def test_sampler_streams_differ():
    scene = example_scenes.cornell_box(16, 16).build()
    imgs = []
    for st in (0, 1, 2):
        tr = pathmod.PathTracer(scene, 16, 16, max_depth=3, sampler_type=st)
        imgs.append(np.asarray(tr.render(2)))
    assert not np.allclose(imgs[0], imgs[1])
    assert not np.allclose(imgs[0], imgs[2])
    # but all unbiased: means agree loosely
    ms = [i.mean() for i in imgs]
    assert max(ms) / min(ms) < 1.15, ms
