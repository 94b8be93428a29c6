"""Coherence bucket-sort in front of the VMEM Pallas kernel (traversal8).

The sort is a pure permutation of independent per-ray queries, so results
must be EXACTLY those of the unsorted call — any mismatch means the
permutation plumbing (rays/roots/any_mask forward, hits back) is wrong.
Runs on CPU via the kernel's interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp

from cudatracerlib_tpu.ops import traversal, traversal8, traversal_pl
from cudatracerlib_tpu.utils import example_scenes


def test_bucket_perm_is_stable_counting_sort():
    rng = np.random.default_rng(5)
    key = jnp.asarray(rng.integers(0, 65, size=2048, dtype=np.int32))
    src, dest = traversal8._bucket_perm(key, 65)
    src_np, dest_np = np.asarray(src), np.asarray(dest)
    # src is a permutation and dest is its inverse
    assert sorted(src_np.tolist()) == list(range(2048))
    assert (src_np[dest_np] == np.arange(2048)).all()
    ks = np.asarray(key)[src_np]
    assert (np.diff(ks) >= 0).all()  # sorted by key
    # stability: within a bucket, original order preserved
    for b in (0, 7, 64):
        orig = np.nonzero(np.asarray(key) == b)[0]
        got = src_np[ks == b]
        assert (got == orig).all()


def _random_rays(B, seed):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-1.5, 1.5, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(B, 50.0, np.float32)
    tmax[:: 7] = 0.0  # dead lanes mixed in
    return traversal.Rays(o=jnp.asarray(o), d=jnp.asarray(d),
                          tmin=jnp.zeros(B), tmax=jnp.asarray(tmax))


def test_sorted_pallas_exact_match():
    scene = example_scenes.cornell_box(32, 32).build()
    table_t = traversal_pl.prep_table_jnp(scene.geom.wide)
    B = 2048
    rays = _random_rays(B, 9)
    amask = jnp.asarray(np.random.default_rng(3).random(B) < 0.5)

    ref = traversal_pl.intersect_pallas(table_t, rays, any_mask=amask)
    got = traversal8._pallas_sorted(table_t, rays, any_hit=False, roots=None,
                                    with_iters=False, any_mask=amask)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sorted_pallas_with_iters_shape():
    scene = example_scenes.cornell_box(32, 32).build()
    table_t = traversal_pl.prep_table_jnp(scene.geom.wide)
    rays = _random_rays(1024, 2)
    hit, its, rows = traversal8._pallas_sorted(
        table_t, rays, any_hit=True, roots=None, with_iters=True,
        any_mask=None)
    assert hit.t.shape == (1024,)
    assert float(its) > 0


def test_intersect_scene_dispatch_uses_sort(monkeypatch):
    """On a (mocked) TPU backend + VMEM-size table + coherent=False, the
    dispatch must route through _pallas_sorted; coherent=True must not."""
    scene = example_scenes.cornell_box(32, 32).build()
    rays = _random_rays(512, 4)
    calls = []
    real = traversal8._pallas_sorted

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(traversal8, "_pallas_sorted", spy)
    monkeypatch.setattr(traversal8, "FORCE_PALLAS", True)
    monkeypatch.setattr(traversal8, "SORT_INCOHERENT", True)
    h1 = traversal8.intersect_scene(scene.geom, rays, coherent=False)
    assert calls, "incoherent dispatch skipped the sort wrapper"
    n = len(calls)
    h2 = traversal8.intersect_scene(scene.geom, rays, coherent=True)
    assert len(calls) == n, "coherent dispatch must not sort"
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(h2.t))
