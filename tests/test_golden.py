"""Golden-image regression (the reference's visual-golden strategy, made
automatic): fixed-seed Cornell render must match the stored image closely.
Catches silent regressions in sampling, shading, traversal, or RNG streams."""
import os

import numpy as np

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.utils import example_scenes

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "cornell_32_pt.npz")


def test_cornell_golden():
    scene = example_scenes.cornell_box(32, 32).build()
    img = np.asarray(pathmod.PathTracer(scene, 32, 32, max_depth=4,
                                        spp_per_pass=1).render(16))
    ref = np.load(GOLDEN)["img"]
    # same seeds: differences only from cross-platform float drift
    rel = np.abs(img - ref).mean() / max(ref.mean(), 1e-6)
    assert rel < 0.02, f"golden drift {rel:.4f}"
