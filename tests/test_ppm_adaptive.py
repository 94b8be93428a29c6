"""Per-pixel adaptive kNN radii + final gathering (reference
PPPMTracer.h:29-146 adaptive struct; PPPMTracer_EyePass.cu:16-40 final
gather)."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import ppm as ppmmod
from cudatracerlib_tpu.utils import example_scenes


def _blk(a, f=4):
    h, w, _ = a.shape
    return a.reshape(h // f, f, w // f, f, 3).mean((1, 3))


@pytest.mark.slow
def test_adaptive_matches_pt():
    scene = example_scenes.cornell_box(32, 32, spheres=False).build()
    pm = ppmmod.PPMTracer(scene, 32, 32, max_depth=4, initial_radius=0.08,
                          adaptive_radii=True)
    img_pm = np.asarray(pm.render(12))
    pt = pathmod.PathTracer(scene, 32, 32, max_depth=4, spp_per_pass=1)
    img_pt = np.asarray(pt.render(24))
    rel = np.abs(_blk(img_pm) - _blk(img_pt)) / (_blk(img_pt) + 0.05)
    assert np.median(rel) < 0.2, float(np.median(rel))
    # radii actually adapted: pixels that saw photons shrank below r0
    r2 = np.asarray(pm._ppm_state.r2)
    assert (r2 < 0.08 ** 2 * 0.999).mean() > 0.5
    assert r2.min() > 0


@pytest.mark.slow
def test_adaptive_comparable_on_caustic():
    """Equal photon budget on a caustics scene: the per-pixel SPPM statistics
    must stay within a small factor of the global kernel estimator's RMSE at
    modest pass counts (SPPM trades a slightly noisier start for per-pixel
    bias control), and the caustic region's radii must shrink faster than the
    scene median (density-driven adaptation actually happening)."""
    w = h = 48
    scene = example_scenes.cornell_glass(w, h).build()
    ref = np.asarray(pathmod.PathTracer(scene, w, h, max_depth=6,
                                        spp_per_pass=1).render(96))

    def rmse(img):
        a, b = _blk(img), _blk(ref)
        return float(np.sqrt(np.mean((a - b) ** 2 / (b + 0.05) ** 2)))

    kw = dict(max_depth=6, initial_radius=0.1, n_photons=8192, seed=0)
    glob = ppmmod.PPMTracer(scene, w, h, **kw)
    e_glob = rmse(np.asarray(glob.render(20)))
    adap = ppmmod.PPMTracer(scene, w, h, adaptive_radii=True, **kw)
    e_adap = rmse(np.asarray(adap.render(20)))
    assert e_adap < e_glob * 1.25, (e_adap, e_glob)
    # density adaptation: radii vary spatially (dense regions shrink more)
    r2 = np.asarray(adap._ppm_state.r2)
    assert r2.max() / max(r2.min(), 1e-12) > 1.5


@pytest.mark.slow
def test_adaptive_beats_global_in_caustic_at_60_passes():
    """The SPPM crossover (round-2 review item): with equal photon budgets,
    per-pixel adaptive radii BEAT the global-radius estimator in the caustic
    region once enough passes accumulate (measured ratio 0.974 at 60 passes;
    adaptive stays slightly worse in flat regions, where per-pixel radius
    noise has nothing to adapt to — the textbook SPPM trade).
    CPU arithmetic is deterministic, so the strict <1.0 assert is stable."""
    import cudatracerlib_tpu.models.film as filmmod
    w = h = 48
    scene = example_scenes.cornell_glass(w, h).build()
    ref = np.asarray(pathmod.PathTracer(scene, w, h, max_depth=6,
                                        spp_per_pass=4).render(64))
    lum = ref.mean(-1)
    lower = np.zeros_like(lum, bool)
    lower[h // 2:, :] = True
    caustic = lower & (lum > np.median(lum[lower]) * 1.5)
    assert caustic.sum() > 50

    def rmse(img):
        d2 = ((img.mean(-1) - lum) ** 2 / (lum + 0.05) ** 2)[caustic]
        return float(np.sqrt(d2.mean()))

    kw = dict(max_depth=6, initial_radius=0.1, n_photons=8192, seed=0)
    glob = ppmmod.PPMTracer(scene, w, h, **kw)
    adap = ppmmod.PPMTracer(scene, w, h, adaptive_radii=True, **kw)
    for _ in range(60):
        glob.do_pass()
        adap.do_pass()
    e_g = rmse(np.asarray(filmmod.develop(glob.film)))
    e_a = rmse(np.asarray(adap.develop()))
    assert e_a < e_g, (e_a, e_g)


@pytest.mark.slow
def test_final_gather_runs():
    scene = example_scenes.cornell_box(24, 24, spheres=False).build()
    pm = ppmmod.PPMTracer(scene, 24, 24, max_depth=5, initial_radius=0.12,
                          adaptive_radii=True, final_gather=True)
    img = np.asarray(pm.render(8))
    assert np.isfinite(img).all() and img.mean() > 0.02
    # final gather + NEE should stay in the same brightness ballpark as PT
    pt = np.asarray(pathmod.PathTracer(scene, 24, 24, max_depth=5,
                                       spp_per_pass=1).render(16))
    ratio = img.mean() / pt.mean()
    assert 0.6 < ratio < 1.4, float(ratio)
