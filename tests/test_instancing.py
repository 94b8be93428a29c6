"""Two-level TLAS/BLAS instancing: parity with the flattened build, memory
sharing, and O(1) instance transform updates.

Reference parity: ``Engine/SceneBVH`` + ``Kernel/TraceHelper.cu:88-180``."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.scene import host, schema, sensors, shapes
from cudatracerlib_tpu.utils import transforms as tf


def _scene(n_spheres=5):
    sc = host.DynamicScene()
    white = sc.add_material(host.MaterialSpec(reflectance=(0.7, 0.7, 0.7)))
    red = sc.add_material(host.MaterialSpec(reflectance=(0.6, 0.1, 0.1)))
    black = sc.add_material(host.MaterialSpec(reflectance=(0, 0, 0)))
    rect = shapes.rectangle()
    sc.create_node(rect, white,
                   tf.compose(tf.translate([0, -1, 0]), tf.rotate_deg([1, 0, 0], -90),
                              tf.scale(4.0)), name="floor")
    sc.create_node(rect, black,
                   tf.compose(tf.translate([0, 2.5, 0]), tf.rotate_deg([1, 0, 0], 90),
                              tf.scale(1.0)), emission=(10.0, 10.0, 10.0), name="light")
    ball = shapes.sphere(radius=0.4, n_theta=12, n_phi=24)  # ONE mesh object
    for i in range(n_spheres):
        x = -1.6 + i * 0.8
        sc.create_node(ball, red if i % 2 else white,
                       tf.compose(tf.translate([x, -0.6, 0.3 * (i % 3)]),
                                  tf.scale(0.8 + 0.1 * i)),
                       name=f"ball{i}")
    cam = sensors.make_sensor(schema.SENSOR_PERSPECTIVE,
                              tf.look_at([0, 0.5, -4.5], [0, -0.3, 0]),
                              fov_x_deg=40.0, film_w=48, film_h=48)
    sc.set_sensor(cam)
    return sc


def _render(scene, spp=4):
    tr = pathmod.PathTracer(scene, 48, 48, max_depth=4, spp_per_pass=1)
    return np.asarray(tr.render(spp))


def test_instanced_matches_flattened():
    sc = _scene()
    flat = sc.build(instancing="off")
    inst = sc.build(instancing="auto")
    assert inst.geom.inst is not None, "expected an instanced build"
    assert flat.geom.inst is None
    # shared geometry: the instanced fat-row table must be much smaller
    assert inst.geom.wide.shape[0] < flat.geom.wide.shape[0] * 0.55
    img_f = _render(flat)
    img_i = _render(inst)
    # identical sampling decisions -> near-identical images
    diff = np.abs(img_f - img_i).mean() / (img_f.mean() + 1e-6)
    assert diff < 0.02, float(diff)


def test_instanced_hits_match_flattened_to_float_tolerance():
    """The round-2 review flagged the 2% image diff as a possible local->world
    hand-off bug. Running it down: traversal hits AND the reconstructed
    shading frames agree to float tolerance; the image-level diff is chaotic
    MC path divergence seeded by ULP-level t differences (pre-transformed
    f32 vertices vs trace-time ray transforms), not a systematic error."""
    import jax.numpy as jnp
    from cudatracerlib_tpu.models import tracer as tracermod
    from cudatracerlib_tpu.ops import shading, traversal8

    sc = _scene()
    flat = sc.build(instancing="off")
    inst = sc.build(instancing="auto")
    w = h = 48
    pix = jnp.arange(w * h, dtype=jnp.int32)
    rays, _, _, _, _ = tracermod.gen_camera_rays(flat, pix, 0, 0, w, h)
    hf = traversal8.intersect_scene(flat.geom, rays)
    hi = traversal8.intersect_scene(inst.geom, rays)
    assert np.array_equal(np.asarray(hf.valid), np.asarray(hi.valid))
    both = np.asarray(hf.valid)
    np.testing.assert_allclose(np.asarray(hi.t)[both], np.asarray(hf.t)[both],
                               rtol=1e-5, atol=1e-5)
    sif = shading.fill_dg(flat.geom, rays, hf, flip_to_ray=False)
    sii = shading.fill_dg(inst.geom, rays, hi, flip_to_ray=False)
    for name in ("p", "ns", "ng", "uv", "frame_t"):
        np.testing.assert_allclose(np.asarray(getattr(sii, name))[both],
                                   np.asarray(getattr(sif, name))[both],
                                   atol=1e-4, err_msg=name)
    assert np.array_equal(np.asarray(sii.mat_id)[both],
                          np.asarray(sif.mat_id)[both])
    assert np.array_equal(np.asarray(sii.light_id)[both],
                          np.asarray(sif.light_id)[both])


def test_instanced_any_hit_shadows():
    """NEE shadow rays go through the any-hit instanced path."""
    sc = _scene(3)
    inst = sc.build()
    img = _render(inst, spp=6)
    assert np.isfinite(img).all() and img.mean() > 0.01


@pytest.mark.slow
def test_moving_instance_refit():
    sc = _scene(3)
    inst = sc.build()
    assert inst.geom.inst is not None
    # move ball1 and compare against a fresh build at the new transform
    m_new = tf.compose(tf.translate([1.5, -0.2, -0.5]), tf.scale(0.9))
    nid = 3  # ball1 (floor=0, light=1, ball0=2)
    moved = sc.update_transforms(inst, {nid: m_new})
    img_moved = _render(moved)
    fresh = sc.build()
    img_fresh = _render(fresh)
    diff = np.abs(img_moved - img_fresh).mean() / (img_fresh.mean() + 1e-6)
    assert diff < 0.02, float(diff)
    # and it actually moved the image content vs the original
    img_orig = _render(inst)
    assert np.abs(img_orig - img_moved).mean() / (img_orig.mean() + 1e-6) > 0.01


def test_tlas_500_instances_matches_flattened():
    """Instance-heavy scene (500+ shared spheres): selection goes through the
    8-wide TLAS (round-2 review: the dense (B,I) scan is the wrong shape for
    real instanced scenes, and MAX_VISITS=8 dropped hits silently). Hits must
    match the flattened build to float tolerance, memory must be shared, and
    no visits may be dropped silently."""
    import jax.numpy as jnp
    from cudatracerlib_tpu.models import tracer as tracermod
    from cudatracerlib_tpu.ops import instanced as instmod
    from cudatracerlib_tpu.ops import traversal8

    sc = host.DynamicScene()
    white = sc.add_material(host.MaterialSpec(reflectance=(0.7, 0.7, 0.7)))
    black = sc.add_material(host.MaterialSpec(reflectance=(0, 0, 0)))
    rect = shapes.rectangle()
    sc.create_node(rect, white,
                   tf.compose(tf.translate([0, -1, 0]),
                              tf.rotate_deg([1, 0, 0], -90), tf.scale(40.0)),
                   name="floor")
    sc.create_node(rect, black,
                   tf.compose(tf.translate([0, 6, 0]),
                              tf.rotate_deg([1, 0, 0], 90), tf.scale(2.0)),
                   emission=(30.0, 30.0, 30.0), name="light")
    ball = shapes.sphere(radius=0.3, n_theta=6, n_phi=12)  # ONE mesh
    n = 0
    for gx in range(23):
        for gz in range(23):
            sc.create_node(ball, white,
                           tf.compose(tf.translate([(gx - 11) * 0.9, -0.7,
                                                    (gz - 11) * 0.9]),
                                      tf.scale(1.0)), name=f"b{gx}_{gz}")
            n += 1
    assert n >= 500
    cam = sensors.make_sensor(schema.SENSOR_PERSPECTIVE,
                              tf.look_at([0, 3.0, -14.0], [0, -0.5, 0]),
                              fov_x_deg=50.0, film_w=32, film_h=32)
    sc.set_sensor(cam)

    inst = sc.build(instancing="auto")
    flat = sc.build(instancing="off")
    assert inst.geom.inst is not None and inst.geom.inst.tlas is not None
    # memory: one shared sphere BLAS instead of 529 copies
    assert inst.geom.wide.shape[0] < flat.geom.wide.shape[0] * 0.25

    B = 32 * 32
    pix = jnp.arange(B, dtype=jnp.int32)
    rays, _, _, _, _ = tracermod.gen_camera_rays(flat, pix, 0, 0, 32, 32)
    hf = traversal8.intersect_scene(flat.geom, rays)
    hi = traversal8.intersect_scene(inst.geom, rays)
    assert np.array_equal(np.asarray(hf.valid), np.asarray(hi.valid))
    both = np.asarray(hf.valid)
    np.testing.assert_allclose(np.asarray(hi.t)[both], np.asarray(hf.t)[both],
                               rtol=1e-5, atol=1e-5)
    # no silent drops at this visit budget
    _, counts, dropped = instmod.tlas_visits(inst.geom.inst.tlas,
                                             inst.geom.inst.tlas_order, rays)
    assert int(dropped) == 0, int(dropped)
    assert int(jnp.max(counts)) >= 1


def test_instanced_treelet_blas_matches_plain():
    """HBM-scale instanced scenes route BLAS visits through the two-phase
    treelet kernel with per-lane top-local roots (VERDICT r3 #5). Forced
    small partition limits make this Cornell-sized scene exercise the path;
    hits must match the plain instanced traversal exactly."""
    from unittest import mock
    import jax
    import jax.numpy as jnp
    from cudatracerlib_tpu.models import tracer as tracermod
    from cudatracerlib_tpu.ops import traversal8
    from cudatracerlib_tpu.scene import treelet

    sc = _scene()
    inst_sc = sc.build(instancing="auto")
    geom = inst_sc.geom
    table = np.asarray(geom.wide)
    roots_np = np.asarray(geom.inst.root)
    uroots = tuple(int(r) for r in np.unique(roots_np))
    assert len(uroots) >= 2, "expected a multi-part BLAS forest"
    part = treelet.partition(table, treelet_rows=128, max_top_rows=16,
                             roots=uroots)
    assert part is not None and part.root_top is not None
    top_t, slabs_t = treelet.prep_device(part)
    r2t = {r: int(t) for r, t in zip(uroots, part.root_top)}
    root_top = np.asarray([r2t[int(r)] for r in roots_np], np.int32)
    geom_tt = geom._replace(
        tt_top=jnp.asarray(top_t), tt_slabs=jnp.asarray(slabs_t),
        tt_vid=jnp.asarray(part.vid_map),
        inst=geom.inst._replace(root_top=jnp.asarray(root_top)))

    w = h = 48
    pix = jnp.arange(w * h, dtype=jnp.int32)
    rays, _, _, _, _ = tracermod.gen_camera_rays(inst_sc, pix, 0, 0, w, h)
    h_ref = traversal8.intersect_scene(geom, rays)
    jax.clear_caches()   # FORCE_TREELET is outside jit cache keys
    with mock.patch.object(traversal8, "FORCE_TREELET", True):
        h_tt = traversal8.intersect_scene(geom_tt, rays)
        s_ref = traversal8.intersect_scene(geom, rays, any_hit=True)
        s_tt = traversal8.intersect_scene(geom_tt, rays, any_hit=True)
    assert np.array_equal(np.asarray(h_tt.valid), np.asarray(h_ref.valid))
    both = np.asarray(h_ref.valid)
    np.testing.assert_allclose(np.asarray(h_tt.t)[both],
                               np.asarray(h_ref.t)[both], rtol=1e-5)
    assert np.array_equal(np.asarray(h_tt.tri)[both],
                          np.asarray(h_ref.tri)[both])
    assert np.array_equal(np.asarray(h_tt.inst)[both],
                          np.asarray(h_ref.inst)[both])
    # any-hit: hit/miss agreement (the winning tri may differ)
    assert np.array_equal(np.asarray(s_tt.valid), np.asarray(s_ref.valid))
