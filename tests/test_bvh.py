import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.ops import traversal as trv
from cudatracerlib_tpu.scene import bvh as bvhmod


def _random_soup(n_tris, seed=0, spread=4.0):
    r = np.random.default_rng(seed)
    base = (r.random((n_tris, 3)) - 0.5) * spread
    v0 = base
    v1 = base + (r.random((n_tris, 3)) - 0.5) * 0.7
    v2 = base + (r.random((n_tris, 3)) - 0.5) * 0.7
    return v0.astype(np.float32), v1.astype(np.float32), v2.astype(np.float32)


def _random_rays(n, seed=1, spread=4.0):
    r = np.random.default_rng(seed)
    o = (r.random((n, 3)) - 0.5) * spread * 1.5
    d = r.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return trv.Rays(o=jnp.asarray(o, jnp.float32), d=jnp.asarray(d, jnp.float32),
                    tmin=jnp.full(n, 1e-4, jnp.float32), tmax=jnp.full(n, 1e10, jnp.float32))


class TestBVHBuild:
    def test_build_small(self):
        v0, v1, v2 = _random_soup(100)
        b = bvhmod.build_bvh(v0, v1, v2)
        n_nodes, n_leaves, avg = bvhmod.flatten_leaf_stats(b)
        assert n_nodes >= 1
        assert sorted(np.asarray(b.tri_order).tolist()) == list(range(100))
        # every leaf's range must be within bounds
        codes = np.concatenate([b.nodes[:, 12].view(np.int32), b.nodes[:, 13].view(np.int32)])
        covered = np.zeros(100, bool)
        for c in codes[codes <= -2]:
            first, cnt = bvhmod.decode_leaf(int(c))
            assert cnt >= 1 and first + cnt <= 100
            covered[first:first + cnt] = True
        assert covered.all()

    def test_build_single_tri(self):
        v0, v1, v2 = _random_soup(1)
        b = bvhmod.build_bvh(v0, v1, v2)
        assert b.nodes.shape[0] == 1


class TestTraversal:
    def _check_match(self, n_tris, n_rays, seed):
        v0, v1, v2 = _random_soup(n_tris, seed=seed)
        b = bvhmod.build_bvh(v0, v1, v2)
        tris = jnp.asarray(trv.pack_tris(v0, v1, v2))
        rays = _random_rays(n_rays, seed=seed + 100)
        h_bvh = trv.intersect_bvh(jnp.asarray(b.nodes), tris, jnp.asarray(b.tri_order), rays)
        h_ref = trv.intersect_bruteforce(tris, rays)
        hit_b = np.asarray(h_bvh.tri >= 0)
        hit_r = np.asarray(h_ref.tri >= 0)
        np.testing.assert_array_equal(hit_b, hit_r)
        # distances agree (ids may differ on shared-edge ties)
        tb, tr_ = np.asarray(h_bvh.t), np.asarray(h_ref.t)
        np.testing.assert_allclose(tb[hit_b], tr_[hit_b], rtol=1e-4, atol=1e-5)
        same_id = np.asarray(h_bvh.tri) == np.asarray(h_ref.tri)
        assert same_id[hit_b].mean() > 0.99
        return hit_b.mean()

    def test_match_bruteforce_small(self):
        rate = self._check_match(64, 256, seed=2)
        assert rate > 0.01  # sanity: some rays actually hit

    def test_match_bruteforce_medium(self):
        self._check_match(2000, 512, seed=3)

    def test_anyhit_consistent(self):
        v0, v1, v2 = _random_soup(500, seed=4)
        b = bvhmod.build_bvh(v0, v1, v2)
        tris = jnp.asarray(trv.pack_tris(v0, v1, v2))
        rays = _random_rays(512, seed=5)
        h = trv.intersect_bvh(jnp.asarray(b.nodes), tris, jnp.asarray(b.tri_order), rays)
        occ = trv.occluded(jnp.asarray(b.nodes), tris, jnp.asarray(b.tri_order), rays)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(h.tri >= 0))

    def test_tmax_respected(self):
        v0 = np.array([[-1, -1, 5.0]], np.float32)
        v1 = np.array([[1, -1, 5.0]], np.float32)
        v2 = np.array([[0, 1, 5.0]], np.float32)
        b = bvhmod.build_bvh(v0, v1, v2)
        tris = jnp.asarray(trv.pack_tris(v0, v1, v2))
        mk = lambda tmax: trv.Rays(o=jnp.zeros((1, 3)), d=jnp.asarray([[0., 0., 1.]]),
                                   tmin=jnp.asarray([1e-4]), tmax=jnp.asarray([tmax]))
        h1 = trv.intersect_bvh(jnp.asarray(b.nodes), tris, jnp.asarray(b.tri_order), mk(10.0))
        h2 = trv.intersect_bvh(jnp.asarray(b.nodes), tris, jnp.asarray(b.tri_order), mk(4.0))
        assert int(h1.tri[0]) == 0 and abs(float(h1.t[0]) - 5.0) < 1e-4
        assert int(h2.tri[0]) == -1

    def test_axis_aligned_rays(self):
        # rays with zero direction components exercise the safe-reciprocal path
        v0, v1, v2 = _random_soup(200, seed=6)
        b = bvhmod.build_bvh(v0, v1, v2)
        tris = jnp.asarray(trv.pack_tris(v0, v1, v2))
        n = 128
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = np.linspace(-2, 2, n)
        o[:, 2] = -5.0
        d = np.tile(np.array([[0., 0., 1.]], np.float32), (n, 1))
        rays = trv.Rays(o=jnp.asarray(o), d=jnp.asarray(d),
                        tmin=jnp.full(n, 1e-4), tmax=jnp.full(n, 1e10))
        h_bvh = trv.intersect_bvh(jnp.asarray(b.nodes), tris, jnp.asarray(b.tri_order), rays)
        h_ref = trv.intersect_bruteforce(tris, rays)
        np.testing.assert_array_equal(np.asarray(h_bvh.tri >= 0), np.asarray(h_ref.tri >= 0))
        hit = np.asarray(h_bvh.tri >= 0)
        np.testing.assert_allclose(np.asarray(h_bvh.t)[hit], np.asarray(h_ref.t)[hit],
                                   rtol=1e-4, atol=1e-5)
