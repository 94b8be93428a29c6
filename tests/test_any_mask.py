"""Per-lane any-hit (any_mask) across all traversal kernels.

One call may trace a MIXED wavefront: closest-hit lanes and any-hit lanes
together (the merged bounce+shadow batch of models/path.py, mirroring the
reference's deferred shadow-ray queue, WavefrontPathTracer.cu:62-73).
Semantics per lane must match the dedicated single-mode calls: closest lanes
bit-exactly, any-hit lanes on the hit/miss answer."""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.ops import traversal8, traversal_pl, traversal_tt
from cudatracerlib_tpu.scene import treelet
from cudatracerlib_tpu.utils import example_scenes


@pytest.fixture(scope="module")
def scene():
    return example_scenes.cornell_box(64, 64).build()


@pytest.fixture(scope="module")
def rays(scene):
    from cudatracerlib_tpu.models import tracer as tracermod
    B = 1024
    pix = jnp.arange(B, dtype=jnp.int32) * 4
    r, _, _, _, _ = tracermod.gen_camera_rays(scene, pix, 0, 0, 64, 64)
    return r


@pytest.fixture(scope="module")
def mask(rays):
    B = rays.o.shape[0]
    return jnp.asarray(np.arange(B) % 2 == 1)


def _check(hit_mixed, hit_closest, hit_any, mask):
    m = np.asarray(mask)
    # closest lanes: bit-exact vs the dedicated closest call
    for fld in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(getattr(hit_mixed, fld))[~m],
                                      np.asarray(getattr(hit_closest, fld))[~m])
    # any-hit lanes: hit/miss answer matches the dedicated any-hit call
    np.testing.assert_array_equal(np.asarray(hit_mixed.valid)[m],
                                  np.asarray(hit_any.valid)[m])


def test_any_mask_wide(scene, rays, mask):
    g = scene.geom
    _check(traversal8.intersect_wide(g.wide, rays, any_mask=mask),
           traversal8.intersect_wide(g.wide, rays),
           traversal8.intersect_wide(g.wide, rays, any_hit=True), mask)


def test_any_mask_persistent(scene, rays, mask):
    g = scene.geom
    k = dict(rays_per_lane=4)
    _check(traversal8.intersect_wide_persistent(g.wide, rays, any_mask=mask, **k),
           traversal8.intersect_wide_persistent(g.wide, rays, **k),
           traversal8.intersect_wide_persistent(g.wide, rays, any_hit=True, **k),
           mask)


def test_any_mask_pallas(scene, rays, mask):
    table_t = traversal_pl.prep_table_jnp(scene.geom.wide)
    _check(traversal_pl.intersect_pallas(table_t, rays, any_mask=mask),
           traversal_pl.intersect_pallas(table_t, rays),
           traversal_pl.intersect_pallas(table_t, rays, any_hit=True), mask)


def test_any_mask_treelet(scene, rays, mask):
    table = np.asarray(scene.geom.wide)
    part = treelet.partition(table, treelet_rows=128, max_top_rows=256)
    top_t, slabs_t = treelet.prep_device(part)
    a = (jnp.asarray(top_t), jnp.asarray(slabs_t), jnp.asarray(part.vid_map))
    h_mixed, ovf = traversal_tt.intersect_treelet(*a, rays, any_mask=mask,
                                                  V=6, with_overflow=True)
    h_c = traversal_tt.intersect_treelet(*a, rays, V=6)
    h_a = traversal_tt.intersect_treelet(*a, rays, any_hit=True, V=6)
    _check(h_mixed, h_c, h_a, mask)
    # and through the production dispatch incl. the overflow fallback
    from unittest import mock
    import jax
    geom_tt = scene.geom._replace(tt_top=a[0], tt_slabs=a[1], tt_vid=a[2])
    jax.clear_caches()
    with mock.patch.object(traversal8, "FORCE_TREELET", True), \
            mock.patch.object(traversal8, "V_INCOHERENT", 2):
        h_d = traversal8.intersect_scene(geom_tt, rays, any_mask=mask)
    h_ref = traversal8.intersect_wide(scene.geom.wide, rays)
    h_refa = traversal8.intersect_wide(scene.geom.wide, rays, any_hit=True)
    _check(h_d, h_ref, h_refa, mask)


def test_pt_merged_shadow_matches_unmerged():
    """The merged bounce+shadow wavefront is estimator-identical: occlusion
    is a pure function of the ray, only WHEN it is tested moves (reference
    deferred shadow queue, WavefrontPathTracer.cu:118-134)."""
    from unittest import mock
    import jax
    from cudatracerlib_tpu.models import path as pathmod

    scene = example_scenes.cornell_box(32, 32).build()
    with mock.patch.object(pathmod, "MERGE_SHADOW", False):
        ref = np.asarray(pathmod.PathTracer(scene, 32, 32, max_depth=4,
                                            seed=5).render(2))
    jax.clear_caches()   # MERGE_SHADOW is outside jit cache keys
    with mock.patch.object(pathmod, "MERGE_SHADOW", True):
        got = np.asarray(pathmod.PathTracer(scene, 32, 32, max_depth=4,
                                            seed=5).render(2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_any_mask_instanced():
    """Mixed wavefront through the two-level TLAS/BLAS path (round 4: the
    merged bounce+shadow wavefront now serves instanced scenes too)."""
    from tests.test_instancing import _scene
    from cudatracerlib_tpu.models import tracer as tracermod

    scene = _scene().build(instancing="auto")
    assert scene.geom.inst is not None
    B = 1024
    pix = jnp.arange(B, dtype=jnp.int32) * 2
    rays, *_ = tracermod.gen_camera_rays(scene, pix, 0, 0, 48, 48)
    mask = jnp.asarray(np.arange(B) % 2 == 1)
    h_mixed = traversal8.intersect_scene(scene.geom, rays, any_mask=mask)
    h_c = traversal8.intersect_scene(scene.geom, rays)
    h_a = traversal8.intersect_scene(scene.geom, rays, any_hit=True)
    _check(h_mixed, h_c, h_a, mask)
    # instance ids must also survive the mixed call on closest lanes
    m = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(h_mixed.inst)[~m],
                                  np.asarray(h_c.inst)[~m])


def test_pt_merged_shadow_matches_unmerged_instanced():
    from unittest import mock
    import jax
    from tests.test_instancing import _scene
    from cudatracerlib_tpu.models import path as pathmod

    scene = _scene().build(instancing="auto")
    with mock.patch.object(pathmod, "MERGE_SHADOW", False):
        ref = np.asarray(pathmod.PathTracer(scene, 48, 48, max_depth=4,
                                            seed=5).render(2))
    jax.clear_caches()   # MERGE_SHADOW is outside jit cache keys
    with mock.patch.object(pathmod, "MERGE_SHADOW", True):
        got = np.asarray(pathmod.PathTracer(scene, 48, 48, max_depth=4,
                                            seed=5).render(2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
