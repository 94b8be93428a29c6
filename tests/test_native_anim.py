"""Native BVH builder + animation/refit + asset cache + small-math parity."""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.core import dispersion, quadrature, spline, rough_transmittance
from cudatracerlib_tpu.ops import traversal as trv, traversal8 as trv8
from cudatracerlib_tpu.scene import animation, asset_cache, native_bvh


def _soup(n, seed=0, spread=6.0):
    r = np.random.default_rng(seed)
    base = (r.random((n, 3)) - 0.5).astype(np.float32) * spread
    return (base,
            base + (r.random((n, 3)).astype(np.float32) - 0.5) * 0.5,
            base + (r.random((n, 3)).astype(np.float32) - 0.5) * 0.5)


def test_native_builder_matches_bruteforce():
    v0, v1, v2 = _soup(6000, 1)
    b = native_bvh.build_bvh8(v0, v1, v2)  # uses the C++ path (>= 4096 tris)
    table = jnp.asarray(trv8.pack_unified(b.nodes, b.leaves))
    r = np.random.default_rng(2)
    B = 512
    o = (r.random((B, 3)).astype(np.float32) - 0.5) * 9
    d = r.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = trv.Rays(o=jnp.asarray(o), d=jnp.asarray(d),
                    tmin=jnp.full(B, 1e-4, jnp.float32), tmax=jnp.full(B, 1e10, jnp.float32))
    h8 = trv8.intersect_wide(table, rays)
    hb = trv.intersect_bruteforce(jnp.asarray(trv.pack_tris(v0, v1, v2)), rays)
    m = np.asarray(hb.tri >= 0)
    assert (np.asarray(h8.tri >= 0) == m).all()
    assert np.allclose(np.asarray(h8.t)[m], np.asarray(hb.t)[m], rtol=1e-4)


def test_refit_after_deformation():
    v0, v1, v2 = _soup(3000, 3)
    from cudatracerlib_tpu.scene import bvh8 as b8mod
    b = b8mod.build_bvh8(v0, v1, v2)
    table = trv8.pack_unified(b.nodes, b.leaves)
    # deform: translate + nonuniform stretch
    def deform(v):
        return (v * np.array([1.2, 0.8, 1.0]) + np.array([0.3, -0.2, 0.5])).astype(np.float32)
    w0, w1, w2 = deform(v0), deform(v1), deform(v2)
    table2 = animation.refit_wide(table, b.nodes.shape[0], w0, w1, w2)
    r = np.random.default_rng(4)
    B = 512
    o = (r.random((B, 3)).astype(np.float32) - 0.5) * 9
    d = r.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = trv.Rays(o=jnp.asarray(o), d=jnp.asarray(d),
                    tmin=jnp.full(B, 1e-4, jnp.float32), tmax=jnp.full(B, 1e10, jnp.float32))
    h8 = trv8.intersect_wide(jnp.asarray(table2), rays)
    hb = trv.intersect_bruteforce(jnp.asarray(trv.pack_tris(w0, w1, w2)), rays)
    m = np.asarray(hb.tri >= 0)
    assert (np.asarray(h8.tri >= 0) == m).all()
    assert np.allclose(np.asarray(h8.t)[m], np.asarray(hb.t)[m], rtol=1e-4)


def test_skinning():
    # two bones: rotate the second half of a strip by 90 degrees
    V = 8
    pos = np.stack([np.linspace(0, 7, V), np.zeros(V), np.zeros(V)], -1).astype(np.float32)
    bone_ids = np.zeros((V, 4), np.int32)
    bone_wts = np.zeros((V, 4), np.float32)
    bone_ids[:, 0] = (pos[:, 0] >= 4).astype(np.int32)
    bone_wts[:, 0] = 1.0
    mats = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
    c, s = 0.0, 1.0
    mats[1][:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    out = np.asarray(animation.skin_vertices(jnp.asarray(pos), jnp.asarray(bone_ids),
                                             jnp.asarray(bone_wts), jnp.asarray(mats)))
    np.testing.assert_allclose(out[:4], pos[:4], atol=1e-5)          # bone 0 fixed
    np.testing.assert_allclose(out[4:, 1], pos[4:, 0], atol=1e-5)    # rotated x->y


def test_asset_cache(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    m1 = asset_cache.load_mesh_cached(str(obj))
    # second load must come from cache (delete source to prove it)
    caches = list((tmp_path / ".meshcache").glob("*.npz"))
    assert len(caches) == 1
    m2 = asset_cache.load_mesh_cached(str(obj))
    np.testing.assert_array_equal(m1.v, m2.v)


def test_film_checkpoint(tmp_path):
    from cudatracerlib_tpu.models import film as filmmod
    f = filmmod.new_film(8, 8)
    f = filmmod.add_samples(f, jnp.asarray([1]), jnp.asarray([2]),
                            jnp.asarray([[1.0, 2.0, 3.0]]))
    p = str(tmp_path / "ckpt.npz")
    asset_cache.save_film_checkpoint(p, f, 7)
    f2, pi = asset_cache.load_film_checkpoint(p)
    assert pi == 7
    np.testing.assert_allclose(np.asarray(f2.rgb), np.asarray(f.rgb))


class TestSmallMath:
    def test_spline_interpolates_knots(self):
        vals = jnp.asarray([0.0, 1.0, 4.0, 9.0, 16.0])
        x = jnp.asarray([0.0, 0.25, 0.5, 1.0])
        out = np.asarray(spline.eval_1d(vals, x))
        np.testing.assert_allclose(out[[0, 1, 2, 3]], [0, 1, 4, 16], atol=1e-5)

    def test_quadrature_poly_exact(self):
        # GL-16 integrates x^3 exactly on [0, 2] -> 4
        val = float(quadrature.integrate(lambda t: t ** 3, 0.0, 2.0))
        np.testing.assert_allclose(val, 4.0, rtol=1e-5)
        val2 = float(quadrature.integrate_lobatto7(lambda t: t ** 2, 0.0, 3.0))
        np.testing.assert_allclose(val2, 9.0, rtol=1e-4)

    def test_dispersion_orders(self):
        # BK7 Cauchy fit: blue bends more than red
        params = jnp.asarray([1.5046, 0.0042, 0, 0, 0, 0])
        n = np.asarray(dispersion.rgb_iors(jnp.int32(dispersion.DISP_CAUCHY), params))
        assert n[2] > n[1] > n[0]

    def test_rough_transmittance_monotone(self):
        e_lo = float(rough_transmittance.eval_specular_albedo(1, 1.5,
                                                              jnp.asarray(0.9), jnp.asarray(0.1)))
        e_gr = float(rough_transmittance.eval_specular_albedo(1, 1.5,
                                                              jnp.asarray(0.05), jnp.asarray(0.1)))
        assert 0.0 <= e_lo < 0.3
        assert e_gr > e_lo  # grazing reflects more


@pytest.mark.slow
def test_incremental_transform_update():
    """Move a node, refit, and verify the render tracks the new position."""
    from cudatracerlib_tpu.utils import example_scenes, transforms as tf
    from cudatracerlib_tpu.models import prim
    sc = example_scenes.cornell_box(32, 32, spheres=True)
    scene = sc.build()
    tr0 = prim.PrimTracer(scene, 32, 32, draw_mode=prim.D_NORMAL_SHADE)
    img0 = np.asarray(tr0.render(1))
    # move the sphere node (index 6 in cornell_box construction order) up
    sphere_id = next(i for i, n in enumerate(sc._nodes) if n.name == "sphere")
    moved = sc.update_transforms(scene, {sphere_id: tf.translate([-0.4, 0.2, 0.3])})
    tr1 = prim.PrimTracer(moved, 32, 32, draw_mode=prim.D_NORMAL_SHADE)
    img1 = np.asarray(tr1.render(1))
    assert np.abs(img1 - img0).max() > 0.01  # the image changed
    # sphere no longer occupies its old lower-left region
    assert img1[22:26, 8:12].mean() != img0[22:26, 8:12].mean()
    # and traversal stays consistent with a full rebuild at the new pose
    rebuilt = sc.build()
    tr2 = prim.PrimTracer(rebuilt, 32, 32, draw_mode=prim.D_NORMAL_SHADE)
    img2 = np.asarray(tr2.render(1))
    np.testing.assert_allclose(img1, img2, atol=5e-3)


MD5MESH = """MD5Version 10
numJoints 2
numMeshes 1
joints {
\t"root" -1 ( 0 0 0 ) ( 0 0 0 )
\t"arm" 0 ( 1 0 0 ) ( 0 0 0 )
}
mesh {
\tnumverts 4
\tvert 0 ( 0 0 ) 0 1
\tvert 1 ( 1 0 ) 0 1
\tvert 2 ( 0 1 ) 1 1
\tvert 3 ( 1 1 ) 1 1
\tnumtris 2
\ttri 0 0 1 2
\ttri 1 1 3 2
\tnumweights 2
\tweight 0 0 1.0 ( 0 0 0 )
\tweight 1 1 1.0 ( 1 0 0 )
}
"""

MD5ANIM = """MD5Version 10
frameRate 24
numFrames 2
numJoints 2
numAnimatedComponents 3
hierarchy {
\t"root" -1 0 0
\t"arm" 0 7 0
}
bounds {
\t( -1 -1 -1 ) ( 3 3 3 )
\t( -1 -1 -1 ) ( 3 3 3 )
}
baseframe {
\t( 0 0 0 ) ( 0 0 0 )
\t( 1 0 0 ) ( 0 0 0 )
}
frame 0 {
\t1 0 0
}
frame 1 {
\t1 1 0
}
"""


def test_md5_mesh_and_anim(tmp_path):
    mp = tmp_path / "m.md5mesh"
    mp.write_text(MD5MESH)
    ap = tmp_path / "a.md5anim"
    ap.write_text(MD5ANIM)
    mesh, skel = animation.load_md5mesh(str(mp))
    assert mesh.rest_pos.shape == (4, 3)
    # vert0 at root origin; vert2 = arm joint (1,0,0) + offset (1,0,0)
    np.testing.assert_allclose(mesh.rest_pos[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mesh.rest_pos[2], [2, 0, 0], atol=1e-6)

    anim = animation.load_md5anim(str(ap))
    assert anim.n_frames == 2 and anim.frame_rate == 24
    # frame 0: same as bind pose -> identity skinning
    mats0 = animation.pose_at_frame(anim, skel, 0)
    out0 = np.asarray(animation.skin_vertices(
        np.asarray(mesh.rest_pos), np.asarray(mesh.bone_ids),
        np.asarray(mesh.bone_wts), np.asarray(mats0)))
    np.testing.assert_allclose(out0, mesh.rest_pos, atol=1e-5)
    # frame 1: arm translated +y -> arm-weighted verts move by (0,1,0)
    mats1 = animation.pose_at_frame(anim, skel, 1)
    out1 = np.asarray(animation.skin_vertices(
        np.asarray(mesh.rest_pos), np.asarray(mesh.bone_ids),
        np.asarray(mesh.bone_wts), np.asarray(mats1)))
    np.testing.assert_allclose(out1[0], mesh.rest_pos[0], atol=1e-5)
    np.testing.assert_allclose(out1[2], mesh.rest_pos[2] + [0, 1, 0], atol=1e-5)
