"""Progressive photon mapping: PT agreement + radius schedule + grid ops."""
import os
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.models import ppm as ppmmod
from cudatracerlib_tpu.ops import hashgrid
from cudatracerlib_tpu.utils import example_scenes


def test_hashgrid_query():
    r = np.random.default_rng(0)
    n = 4000
    pos = r.random((n, 3)).astype(np.float32) * 4 - 2
    rows = np.concatenate([pos, r.random((n, 9)).astype(np.float32)], 1)
    lo = jnp.asarray([-2.0, -2.0, -2.0])
    hi = jnp.asarray([2.0, 2.0, 2.0])
    radius = 0.15
    g = hashgrid.build_grid(jnp.asarray(rows), jnp.asarray(pos),
                            jnp.ones(n, bool), lo, hi, jnp.float32(2 * radius))
    # count photons within radius of query points via the grid vs brute force
    q = r.random((64, 3)).astype(np.float32) * 3 - 1.5

    def accum(carry, rows_, mask):
        # batched API: rows (B, 8*K, W), mask (B, 8*K)
        return carry + jnp.sum(mask.astype(jnp.float32), axis=1)

    cnt = hashgrid.gather_neighbors(g, jnp.asarray(q), jnp.full(64, radius),
                                    accum, jnp.zeros(64), max_per_cell=64)
    brute = ((np.linalg.norm(pos[None, :, :] - q[:, None, :], axis=-1) <= radius)
             .sum(1))
    np.testing.assert_array_equal(np.asarray(cnt).astype(int), brute)


@pytest.mark.slow
def test_ppm_matches_pt():
    scene = example_scenes.cornell_box(32, 32, spheres=False).build()
    pm = ppmmod.PPMTracer(scene, 32, 32, max_depth=4, initial_radius=0.08)
    img_pm = np.asarray(pm.render(12))
    pt = pathmod.PathTracer(scene, 32, 32, max_depth=4, spp_per_pass=1)
    img_pt = np.asarray(pt.render(24))
    blk = lambda a: a.reshape(8, 4, 8, 4, 3).mean((1, 3))
    rel = np.abs(blk(img_pm) - blk(img_pt)) / (blk(img_pt) + 0.05)
    assert np.median(rel) < 0.2, float(np.median(rel))
    assert abs(img_pm.mean() - img_pt.mean()) / img_pt.mean() < 0.12


def test_radius_schedule():
    scene = example_scenes.cornell_box(16, 16, spheres=False).build()
    pm = ppmmod.PPMTracer(scene, 16, 16, max_depth=3, initial_radius=0.1, alpha=2 / 3)
    r0 = pm.radius
    pm.render(3)
    # r_i^2 = r_0^2 * prod (i+alpha)/(i+1): strictly decreasing
    assert pm.radius < r0
    st = pm.status()
    assert st["photons_emitted"] == 3 * 16 * 16


@pytest.mark.slow
def test_ppm_volumetric_estimator():
    """Medium photons + ray-marched gather approximate PT on a scattering slab
    (primary-segment estimator: agreement within ~20%)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_media import _slab_scene
    scene = _slab_scene((0.05,) * 3, (0.8,) * 3, g=0.0, emitter_radiance=3.0)
    pm = ppmmod.PPMTracer(scene, 24, 24, max_depth=5, initial_radius=0.25,
                          n_photons=4096)
    assert pm.with_volume
    img_pm = np.asarray(pm.render(12))
    from cudatracerlib_tpu.models import path as pathmod2
    img_pt = np.asarray(pathmod2.PathTracer(scene, 24, 24, max_depth=8,
                                            spp_per_pass=1).render(32))
    ratio = img_pm[8:16, 8:16].mean() / img_pt[8:16, 8:16].mean()
    assert 0.7 < ratio < 1.25, ratio


@pytest.mark.slow
def test_fused_beamgrid_eye_matches_unfused():
    """The fused build+eye program (PPMTracer._eye_fused_jit) and the split
    _vol_ball_jit + _eye_jit path must agree bit-for-bit: the fusion only
    moves the grid build inside the jit and trims the stored photon rows to
    the 9 columns the beam estimator reads (pos/power/wi)."""
    scene = example_scenes.fog_cornell(48, 48).build()
    tr = ppmmod.PPMTracer(scene, 48, 48)
    assert tr.with_volume and tr.vol_est == "beamgrid"
    rows, valid = tr._trace_jit(tr.scene, pass_idx=jnp.int32(0))
    r = jnp.float32(tr.radius)
    from cudatracerlib_tpu.models import film as filmmod
    f0 = filmmod.new_film(48, 48)
    cell = jnp.float32(2.0 * tr.radius)
    grid = tr._surf_grid_jit(rows, valid, scene.world_lo, scene.world_hi, cell)
    vol = tr._vol_ball_jit(rows, valid, r, scene.world_lo, scene.world_hi)
    a = tr._eye_jit(scene, f0, grid, vol, jnp.int32(0), radius=r,
                    n_emitted=float(tr.n_photons))
    b = tr._eye_fused_jit(scene, f0, grid, rows, valid, jnp.int32(0),
                          radius=r, n_emitted=float(tr.n_photons))
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), atol=1e-5)
