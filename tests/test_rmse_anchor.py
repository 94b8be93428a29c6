"""External RMSE anchor: production renders vs the independent brute-force
CPU reference (tools/ref_renderer.py), at equal spp (VERDICT r4 next #8;
reference validates by golden images, `README.md:5` / `docs/images/*`).

The committed goldens (tests/goldens/ref_*.npz) were rendered by a
shared-nothing numpy path tracer: brute-force all-triangle intersection
(no BVH), its own RNG/warps/NEE/MIS.  Both estimators are unbiased for the
same max_depth-truncated transport, so at equal spp their images differ by
Monte-Carlo noise only.  Each golden stores TWO seeds of the reference;
their RMSE is the measured noise floor, and the production render must land
within CAL x that floor (independent estimators of the same integral with
comparable variance differ by ~sqrt(2) x the single-render noise; CAL=2.5
leaves margin for the production renderer's different-variance estimator
while still failing hard on any physics error — a one-sided emission bug,
a missing MIS term, or a pi-factor slip shifts RMSE by 5-100x the floor).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.utils import example_scenes

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
CAL = 2.5

pytestmark = pytest.mark.slow


def _rmse(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return float(np.sqrt((d * d).mean()))


def _render_production(sc, w, h, spp, max_depth):
    tr = pathmod.PathTracer(sc.build(), w, h, max_depth=max_depth,
                            rr_depth=4, use_nee=True)
    tr.render_batched(spp)
    return np.asarray(filmmod.develop(tr.film))


def _check(name, scene_fn):
    p = os.path.join(GOLD, f"ref_{name}.npz")
    if not os.path.exists(p):
        pytest.skip(f"golden {p} not generated yet")
    g = np.load(p)
    ref, ref2 = g["img"], g["img_seed2"]
    spp, w, h, depth = int(g["spp"]), int(g["w"]), int(g["h"]), int(g["max_depth"])
    floor = _rmse(ref, ref2)
    got = _render_production(scene_fn(w, h), w, h, spp, depth)
    err = _rmse(got, 0.5 * (ref + ref2))
    mean_ref = float(ref.mean())
    # also anchor the absolute mean (catches global-scale errors that RMSE
    # against a noisy reference could hide at large tolerances)
    mean_got = float(got.mean())
    assert err < CAL * floor, (
        f"{name}: RMSE vs independent reference {err:.5f} exceeds "
        f"{CAL}x noise floor {floor:.5f} (means ref={mean_ref:.4f} "
        f"got={mean_got:.4f})")
    assert abs(mean_got - mean_ref) < 0.05 * max(mean_ref, 1e-6) + 3.0 * floor


def test_rmse_anchor_cornell():
    _check("cornell", lambda w, h: example_scenes.cornell_box(
        w, h, spheres=False))


def test_rmse_anchor_veach():
    _check("veach", example_scenes.veach_mis_anchor)
