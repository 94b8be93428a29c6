"""Shared-pool Pallas traversal == fixed-assignment kernel (exact).

The pool kernel reassigns rays to lanes dynamically and emits outputs in
completion order; after the host un-permute it must agree bit-for-bit with
intersect_pallas on every field, including per-lane any-hit wavefronts and
padded (non-multiple-of-block) ray counts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.models import film as filmmod  # noqa: F401 (env init)
from cudatracerlib_tpu.ops import traversal_pl
from cudatracerlib_tpu.ops.traversal import Rays
from cudatracerlib_tpu.utils import example_scenes


@pytest.fixture(scope="module")
def scene_rays():
    w = h = 64
    scene = example_scenes.cornell_box(w, h).build()
    table_t = traversal_pl.prep_table_jnp(scene.geom.wide)
    key = jax.random.PRNGKey(7)
    n = 4096 + 513          # force padding
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=0.05, maxval=0.95)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(o=o, d=d, tmin=jnp.full(n, 1e-4), tmax=jnp.full(n, 1e9))
    return table_t, rays


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u), rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v), rtol=0,
                               atol=0)


def test_pool_matches_fixed_closest(scene_rays):
    table_t, rays = scene_rays
    ref = traversal_pl.intersect_pallas(table_t, rays)
    got = traversal_pl.intersect_pallas_pool(table_t, rays)
    _assert_same(got, ref)


def test_pool_matches_fixed_any_hit(scene_rays):
    table_t, rays = scene_rays
    ref = traversal_pl.intersect_pallas(table_t, rays, any_hit=True)
    got = traversal_pl.intersect_pallas_pool(table_t, rays, any_hit=True)
    # any-hit may stop at ANY intersection; only hit/miss must agree
    np.testing.assert_array_equal(np.asarray(ref.tri >= 0),
                                  np.asarray(got.tri >= 0))


def test_pool_matches_fixed_mixed_any_mask(scene_rays):
    table_t, rays = scene_rays
    n = rays.o.shape[0]
    mask = (jnp.arange(n) % 3) == 0
    ref = traversal_pl.intersect_pallas(table_t, rays, any_mask=mask)
    got = traversal_pl.intersect_pallas_pool(table_t, rays, any_mask=mask)
    # closest-hit lanes must agree exactly; any-hit lanes on hit/miss
    am = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(ref.tri >= 0)[am],
                                  np.asarray(got.tri >= 0)[am])
    cl = ~am
    np.testing.assert_array_equal(np.asarray(ref.tri)[cl],
                                  np.asarray(got.tri)[cl])
    np.testing.assert_array_equal(np.asarray(ref.t)[cl],
                                  np.asarray(got.t)[cl])


def test_pool_with_iters_counts(scene_rays):
    table_t, rays = scene_rays
    got, iters, rows = traversal_pl.intersect_pallas_pool(
        table_t, rays, with_iters=True)
    ref = traversal_pl.intersect_pallas(table_t, rays)
    _assert_same(got, ref)
    assert float(iters) > 0 and float(rows) > 0
