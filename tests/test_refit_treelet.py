"""Refit must refresh the treelet decomposition: tt_slabs are packed COPIES
of the unified table's leaf rows, so `update_transforms` rewriting `wide`
without re-packing them would leave the two-phase traversal intersecting
stale bounds (reference analogue: BVHRebuilder invalidates every derived
structure on refit, Engine/SpatialStructures/BVH/BVHRebuilder.cpp).

The treelet path normally engages above MAX_TOP_ROWS (~24k tris); the test
shrinks the threshold so a ~3k-tri scene exercises the real build+refit
code in scene/host.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.ops import traversal, traversal8, traversal_tt
from cudatracerlib_tpu.scene import host, schema, sensors, shapes, treelet
from cudatracerlib_tpu.utils import transforms as tf


@pytest.fixture()
def patched_treelet(monkeypatch):
    # engage the treelet path for a small scene, bypassing the disk cache
    monkeypatch.setattr(
        treelet, "partition_cached",
        lambda table, **kw: treelet.partition(table, max_top_rows=128, **kw)
        if table.shape[0] > 128 else None)


def _translate(tx):
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = tx
    return m


def test_update_transforms_refreshes_treelets(patched_treelet):
    sc = host.DynamicScene()
    mat = sc.add_material(host.MaterialSpec(reflectance=(0.7, 0.7, 0.7)))
    nid = sc.create_node(shapes.sphere(radius=1.0, n_theta=32, n_phi=48), mat)
    sc.create_node(shapes.rectangle(), mat,
                   tf.compose(tf.translate([0, 2.5, 0]),
                              tf.rotate_deg([1, 0, 0], 90)),
                   emission=(5.0, 5.0, 5.0))
    sc.set_sensor(sensors.make_sensor(
        schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0, -6], [0, 0, 0]),
        fov_x_deg=40.0, film_w=64, film_h=64))
    scene = sc.build(instancing="off")
    assert scene.geom.tt_slabs is not None, "treelet path not engaged"
    # built scenes keep the raw per-tri columns off-device (shade rows carry
    # everything the kernels read; refit mirrors live in host_meta)
    assert scene.geom.n0 is None and scene.geom.uv0 is None
    assert schema.host_meta(scene)["refit_src"]["uv0"].shape[0] == \
        scene.num_tris

    scene2 = sc.update_transforms(scene, {nid: _translate(2.5)})
    assert scene2.geom.tt_slabs is not None
    assert not np.array_equal(np.asarray(scene.geom.tt_slabs),
                              np.asarray(scene2.geom.tt_slabs)), \
        "refit left stale treelet slabs"

    # two-phase traversal of the refit scene agrees with the single-table
    # traversal of the same (refit) wide table
    B = 512
    ox = np.linspace(-3.0, 4.5, B, dtype=np.float32)
    o = np.stack([ox, np.zeros(B, np.float32),
                  np.full(B, -6.0, np.float32)], -1)
    d = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (B, 1))
    rays = traversal.Rays(o=jnp.asarray(o), d=jnp.asarray(d),
                          tmin=jnp.zeros(B), tmax=jnp.full(B, 100.0))
    h_ref = traversal8.intersect_wide(scene2.geom.wide, rays)
    h_tt = traversal_tt.intersect_treelet(
        scene2.geom.tt_top, scene2.geom.tt_slabs, scene2.geom.tt_vid, rays)
    np.testing.assert_array_equal(np.asarray(h_ref.tri), np.asarray(h_tt.tri))
    np.testing.assert_allclose(np.asarray(h_ref.t), np.asarray(h_tt.t),
                               rtol=1e-5)
