"""VCM: convergence vs PT (all families: connections + merging)."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import vcm as vcmmod
from cudatracerlib_tpu.utils import example_scenes


@pytest.mark.slow
def test_vcm_matches_pt():
    scene = example_scenes.cornell_box(24, 24, spheres=False).build()
    img_v = np.asarray(vcmmod.VCM(scene, 24, 24, max_depth=4,
                                  initial_radius=0.06).render(8))
    img_pt = np.asarray(pathmod.PathTracer(scene, 24, 24, max_depth=4,
                                           spp_per_pass=1).render(20))
    blk = lambda a: a.reshape(6, 4, 6, 4, 3).mean((1, 3))
    rel = np.abs(blk(img_v) - blk(img_pt)) / (blk(img_pt) + 0.05)
    assert np.median(rel) < 0.15, float(np.median(rel))
    assert abs(img_v.mean() - img_pt.mean()) / img_pt.mean() < 0.1
