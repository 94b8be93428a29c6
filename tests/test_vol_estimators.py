"""Volumetric estimator family: Point / BeamGrid / BeamBeam vs path tracing.

Reference parity target: the three estimators of
``Integrators/VolEstimators`` (PointStorage.h, BeamGrid.h, Beam.h +
BeamBeamGrid.h), selectable like the reference's template parameter."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_media import _slab_scene  # noqa: E402

from cudatracerlib_tpu.models import path as pathmod  # noqa: E402
from cudatracerlib_tpu.models import ppm as ppmmod  # noqa: E402


@pytest.fixture(scope="module")
def slab():
    scene = _slab_scene((0.05,) * 3, (0.8,) * 3, g=0.0, emitter_radiance=3.0)
    pt = np.asarray(pathmod.PathTracer(scene, 24, 24, max_depth=8,
                                       spp_per_pass=1).render(48))
    return scene, pt


@pytest.mark.slow
@pytest.mark.parametrize("estimator", ["point", "beamgrid", "beambeam"])
def test_slab_estimator_vs_pt(slab, estimator):
    """Boundary-corrected kernels (core/kernels.boundary_frac) brought the
    slab bias under the round-1 <5% target; the tolerance here is +-10%
    (5% bias budget + MC noise at this photon budget)."""
    scene, img_pt = slab
    pm = ppmmod.PPMTracer(scene, 24, 24, max_depth=5, initial_radius=0.25,
                          n_photons=4096, vol_estimator=estimator)
    assert pm.with_volume and pm.vol_est == estimator
    img_pm = np.asarray(pm.render(16))
    ratio = img_pm[8:16, 8:16].mean() / img_pt[8:16, 8:16].mean()
    assert 0.90 < ratio < 1.10, (estimator, float(ratio))


def test_beamgrid_transmittance_matches_analytic(slab):
    """The per-cell tau accumulation of the DDA estimators must reproduce
    exp(-sigma_t * L) through the slab (it replaces transmittance_det)."""
    scene, _ = slab
    import jax.numpy as jnp
    from cudatracerlib_tpu.models import vol_estimators as ve
    from cudatracerlib_tpu.ops import dda
    B = 8
    rows = jnp.zeros((B, 12))
    grid = dda.build_ball_grid(rows, rows[:, 0:3], jnp.zeros(B, bool),
                               jnp.float32(0.2), scene.world_lo, scene.world_hi)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -0.5]]), (B, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    t1 = jnp.full(B, 2.2)  # crosses the z=0..1 slab entirely
    _, Tr = ve.radiance_beamgrid(scene, grid, o, d, t1, jnp.float32(0.2),
                                 max_cells=96)
    expect = np.exp(-0.85)  # sigma_t * 1 unit
    np.testing.assert_allclose(np.asarray(Tr)[:, 0], expect, rtol=0.08)


def test_dda_walk_early_exit_matches_full_trip():
    """dda_walk's all-dead early exit (while_loop) must agree with a fixed
    max_cells trip: dead lanes contribute nothing by the visit contract, so
    exiting once every lane has left the grid is bit-exact."""
    import jax
    import jax.numpy as jnp
    from cudatracerlib_tpu.ops import dda, hashgrid
    rng = np.random.default_rng(7)
    N, B = 512, 64
    pos = jnp.asarray(rng.random((N, 3), np.float32))
    data = jnp.concatenate([pos, jnp.asarray(rng.random((N, 9), np.float32))], 1)
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    grid = hashgrid.build_grid(data, pos, jnp.ones(N, bool), lo, hi,
                               jnp.float32(0.125))
    o = jnp.asarray(rng.random((B, 3), np.float32))
    d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    # mix of zero-length (dead from the start), short, and grid-crossing rays
    t1 = jnp.asarray(np.where(rng.random(B) < 0.3, 0.0,
                              rng.random(B) * 3.0).astype(np.float32))

    def visit(carry, flat_cell, t_enter, t_exit, alive):
        s, cnt = carry
        start, count = hashgrid.query_ranges(grid, flat_cell)
        contrib = (t_exit - t_enter) * count.astype(jnp.float32)
        s = s + jnp.where(alive, contrib, 0.0)
        return s, cnt + alive.astype(jnp.int32)

    init = (jnp.zeros(B), jnp.zeros(B, jnp.int32))
    few = jax.jit(lambda: dda.dda_walk(grid, o, d, jnp.zeros(B), t1, visit,
                                       init, max_cells=8))()
    many = jax.jit(lambda: dda.dda_walk(grid, o, d, jnp.zeros(B), t1, visit,
                                        init, max_cells=256))()
    # 256 >> the longest possible crossing of an 8^3 grid: the while_loop
    # must stop at the worst lane's exit, and a larger budget can't change
    # the answer once every lane is out
    huge = jax.jit(lambda: dda.dda_walk(grid, o, d, jnp.zeros(B), t1, visit,
                                        init, max_cells=4096))()
    np.testing.assert_array_equal(np.asarray(many[0]), np.asarray(huge[0]))
    np.testing.assert_array_equal(np.asarray(many[1]), np.asarray(huge[1]))
    # the small budget genuinely truncates (sanity that max_cells still binds)
    assert np.any(np.asarray(few[1]) != np.asarray(many[1]))
    # zero-length rays visit nothing
    dead = np.asarray(t1) == 0.0
    np.testing.assert_array_equal(np.asarray(many[1])[dead], 0)
