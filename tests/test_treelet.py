"""Treelet decomposition (scene/treelet.py) + two-phase traversal
(ops/traversal_tt.py) against the single-table reference traversal.

Runs on CPU: the Pallas kernels execute in interpret mode. The partition is
forced with small limits so Cornell-sized scenes exercise the HBM-scale path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.ops import traversal, traversal8, traversal_tt
from cudatracerlib_tpu.scene import treelet
from cudatracerlib_tpu.utils import example_scenes


@pytest.fixture(scope="module")
def scene():
    return example_scenes.cornell_box(64, 64).build()


@pytest.fixture(scope="module")
def rays(scene):
    from cudatracerlib_tpu.models import tracer as tracermod
    B = 2048
    pix = jnp.arange(B, dtype=jnp.int32) * 2
    r, _, _, _, _ = tracermod.gen_camera_rays(scene, pix, 0, 0, 64, 64)
    return r


@pytest.fixture(scope="module")
def part(scene):
    table = np.asarray(scene.geom.wide)
    p = treelet.partition(table, treelet_rows=128, max_top_rows=256)
    assert p is not None
    return p


def test_partition_covers_all_rows(scene, part):
    table = np.asarray(scene.geom.wide)
    # every leaf triangle id of the original table must appear in top+slabs
    def leaf_ids(rows):
        ids = rows[:, 108:120].copy().view(np.int32)
        cnt = rows[:, 120].astype(np.int32)
        out = []
        for r in range(rows.shape[0]):
            if cnt[r] > 0:
                out.extend(ids[r, :cnt[r]].tolist())
        return sorted(out)
    orig = leaf_ids(table)
    packed = leaf_ids(np.concatenate(
        [part.top, part.slabs.reshape(-1, 128)], axis=0))
    assert packed == orig


def test_unified_equivalent_matches_original(scene, part, rays):
    giant = treelet.unified_equivalent(part)
    h_ref = traversal8.intersect_wide(scene.geom.wide, rays)
    h_eq = traversal8.intersect_wide(jnp.asarray(giant), rays)
    np.testing.assert_allclose(np.asarray(h_eq.t), np.asarray(h_ref.t),
                               rtol=1e-6)
    assert np.array_equal(np.asarray(h_eq.tri), np.asarray(h_ref.tri))


def test_two_phase_matches_reference(scene, part, rays):
    top_t, slabs_t = treelet.prep_device(part)
    h_ref = traversal8.intersect_wide(scene.geom.wide, rays)
    h_tt = traversal_tt.intersect_treelet(
        jnp.asarray(top_t), jnp.asarray(slabs_t), jnp.asarray(part.vid_map),
        rays, V=6)
    ref_t = np.asarray(h_ref.t)
    tt_t = np.asarray(h_tt.t)
    np.testing.assert_allclose(tt_t, ref_t, rtol=1e-5)
    assert np.array_equal(np.asarray(h_tt.tri), np.asarray(h_ref.tri))
    np.testing.assert_allclose(np.asarray(h_tt.u), np.asarray(h_ref.u),
                               atol=1e-5)


def test_two_phase_any_hit(scene, part, rays):
    top_t, slabs_t = treelet.prep_device(part)
    h_ref = traversal8.intersect_wide(scene.geom.wide, rays, any_hit=True)
    h_tt = traversal_tt.intersect_treelet(
        jnp.asarray(top_t), jnp.asarray(slabs_t), jnp.asarray(part.vid_map),
        rays, any_hit=True, V=6)
    # any-hit agreement on hit/miss (the hit itself may differ)
    assert np.array_equal(np.asarray(h_tt.valid), np.asarray(h_ref.valid))


def test_visit_overflow_is_counted(scene, part, rays):
    top_t, _ = treelet.prep_device(part)
    total, dropped = traversal_tt.count_dropped_visits(
        jnp.asarray(top_t), part.n_treelets, rays, V=1)
    assert int(total) > 0
    # with V=1 on a many-treelet cut, overflow must be detected, not silent
    assert int(dropped) >= 0


def test_overflow_fallback_is_exact(scene, part, rays):
    """Force visit overflow (V=1) and check the compacted XLA fallback in
    intersect_scene restores exact hits (round-3: overflow used to drop up
    to ~5% of bounce-ray hits silently)."""
    from unittest import mock

    top_t, slabs_t = treelet.prep_device(part)
    geom = scene.geom._replace(tt_top=jnp.asarray(top_t),
                               tt_slabs=jnp.asarray(slabs_t),
                               tt_vid=jnp.asarray(part.vid_map))
    h_ref = traversal8.intersect_wide(scene.geom.wide, rays)

    # sanity: at V=1 this cut really does overflow (else the test is vacuous)
    _, dropped = traversal_tt.count_dropped_visits(
        geom.tt_top, part.n_treelets, rays, V=1)
    assert int(dropped) > 0

    with mock.patch.object(traversal8, "V_COHERENT", 1), \
            mock.patch.object(traversal8, "FORCE_TREELET", True):
        hit = traversal8.intersect_scene(geom, rays, coherent=True)
    assert np.array_equal(np.asarray(hit.tri), np.asarray(h_ref.tri))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(h_ref.t),
                               rtol=1e-5)


def test_overflow_fallback_is_budgetless(scene, part, rays):
    """The round-4 full-batch fallback has NO budget to exhaust: even with
    V=1 forcing mass overflow, hits come back exact and the clipped counter
    is 0 by construction (round 3's fixed-M compacted batch clipped MILLIONS
    of rays per pass on dense san-miguel regions — measured via its own
    counter — so the budget was replaced with a masked full-batch
    re-traversal whose dead lanes die in one lockstep step)."""
    from unittest import mock

    top_t, slabs_t = treelet.prep_device(part)
    geom = scene.geom._replace(tt_top=jnp.asarray(top_t),
                               tt_slabs=jnp.asarray(slabs_t),
                               tt_vid=jnp.asarray(part.vid_map))
    res = traversal_tt.intersect_treelet(geom.tt_top, geom.tt_slabs,
                                         geom.tt_vid, rays, V=1,
                                         with_overflow=True)
    n_ovf = int(np.asarray(res[1]).sum())
    assert n_ovf > 32  # sanity: the adversarial wavefront really overflows

    h_ref = traversal8.intersect_wide(scene.geom.wide, rays)
    with mock.patch.object(traversal8, "V_COHERENT", 1), \
            mock.patch.object(traversal8, "FORCE_TREELET", True):
        hit, _, _, clipped = traversal8.intersect_scene(
            geom, rays, coherent=True, with_iters=True)
    assert int(clipped) == 0
    assert np.array_equal(np.asarray(hit.tri), np.asarray(h_ref.tri))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(h_ref.t),
                               rtol=1e-5)


def test_pt_treelet_dispatch_matches_plain_loop(scene, part):
    """The PT peels depth 0 onto the coherent treelet kernel AND (round 4)
    routes bounce + shadow rays through the treelet kernel with the
    incoherent visit budget. Neither may change the image: same seed, same
    scene, treelet dispatch on (tt tables + FORCE_TREELET) vs off (plain
    fori_loop over the single table)."""
    import jax
    from unittest import mock

    from cudatracerlib_tpu.models import path as pathmod

    top_t, slabs_t = treelet.prep_device(part)
    geom_tt = scene.geom._replace(tt_top=jnp.asarray(top_t),
                                  tt_slabs=jnp.asarray(slabs_t),
                                  tt_vid=jnp.asarray(part.vid_map))
    scene_tt = scene._replace(geom=geom_tt)

    w = h = 32
    ref = np.asarray(pathmod.PathTracer(scene, w, h, max_depth=3,
                                        seed=7).render(1))
    # FORCE_TREELET is a trace-time Python flag OUTSIDE jax's jit cache key:
    # drop compiled executables so the patched render cannot silently reuse
    # a no-treelet trace of the same shapes (advisor finding, round 3)
    jax.clear_caches()
    with mock.patch.object(traversal8, "FORCE_TREELET", True):
        assert traversal8.treelet_would_dispatch(geom_tt, coherent=False)
        tr = pathmod.PathTracer(scene_tt, w, h, max_depth=3, seed=7)
        got = np.asarray(tr.render(1))
    # the fallback batch never clipped, so traversal is exact through the
    # overflow fallback; residual diffs are t-ULP tie-breaks flipping the
    # odd occlusion ray
    assert float(tr._ovf_dev) == 0.0
    assert np.isfinite(got).all()
    assert abs(got.mean() / ref.mean() - 1.0) < 1e-3
    close = np.isclose(got, ref, rtol=1e-3, atol=1e-4).mean()
    assert close > 0.995, float(close)


def test_overflow_compact_branch_exact(scene, part, rays):
    """The round-4 runtime fallback ladder: when 0 < overflow <= B/8 the
    overflow rays are sort-compacted and re-traversed in an M-lane batch
    (the full-batch loop's gather traffic is lanes x iterations x 512B even
    for dead lanes — it dominated san-miguel passes). Exactness must hold
    through the compaction permutation and the inverse-gather merge."""
    from unittest import mock

    top_t, slabs_t = treelet.prep_device(part)
    geom = scene.geom._replace(tt_top=jnp.asarray(top_t),
                               tt_slabs=jnp.asarray(slabs_t),
                               tt_vid=jnp.asarray(part.vid_map))
    B = rays.o.shape[0]
    K = traversal8.DEFAULT_RAYS_PER_LANE
    M = max(4 * K, (B // 8) // K * K)
    # pick a V that lands the overflow count strictly inside (0, M]
    for V in (2, 3, 4):
        res = traversal_tt.intersect_treelet(geom.tt_top, geom.tt_slabs,
                                             geom.tt_vid, rays, V=V,
                                             with_overflow=True)
        n_ovf = int(np.asarray(res[1]).sum())
        if 0 < n_ovf <= M:
            break
    assert 0 < n_ovf <= M, f"no V produced a compactable overflow ({n_ovf})"

    h_ref = traversal8.intersect_wide(scene.geom.wide, rays)
    with mock.patch.object(traversal8, "V_COHERENT", V), \
            mock.patch.object(traversal8, "FORCE_TREELET", True):
        hit, _, _, clipped = traversal8.intersect_scene(
            geom, rays, coherent=True, with_iters=True)
    assert int(clipped) == 0
    assert np.array_equal(np.asarray(hit.tri), np.asarray(h_ref.tri))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(h_ref.t),
                               rtol=1e-5)
