"""BDPT: convergence vs PT, strategy isolation (Force_s/Force_t), caustics."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import bdpt as bdptmod, path as pathmod
from cudatracerlib_tpu.scene import host, schema
from cudatracerlib_tpu.utils import example_scenes


@pytest.mark.slow
def test_bdpt_matches_pt():
    scene = example_scenes.cornell_box(32, 32, spheres=False).build()
    img_bd = np.asarray(bdptmod.BDPT(scene, 32, 32, max_depth=4).render(24))
    img_pt = np.asarray(pathmod.PathTracer(scene, 32, 32, max_depth=4,
                                           spp_per_pass=1).render(36))
    blk = lambda a: a.reshape(8, 4, 8, 4, 3).mean((1, 3))
    rel = np.abs(blk(img_bd) - blk(img_pt)) / (blk(img_pt) + 0.05)
    assert np.median(rel) < 0.15, float(np.median(rel))
    assert abs(img_bd.mean() - img_pt.mean()) / img_pt.mean() < 0.1


@pytest.mark.slow
def test_force_strategies_sum():
    """Individually-forced families must sum (approximately) to the full image."""
    scene = example_scenes.cornell_box(24, 24, spheres=False).build()
    full = np.asarray(bdptmod.BDPT(scene, 24, 24, max_depth=2, seed=1).render(16))
    # depth 2 families: (s=0,t in {2,3}), (s=1,t in {2,3}), (s>=2,t), (s,t=1)
    parts = []
    for fs in (0, 1, 2, 3):
        tr = bdptmod.BDPT(scene, 24, 24, max_depth=2, force_s=fs, seed=1)
        parts.append(np.asarray(tr.render(16)))
    total = sum(p.mean() for p in parts)
    assert abs(total - full.mean()) / full.mean() < 0.15, (total, full.mean())


def test_bdpt_glass_caustic_scene():
    """BDPT handles a glass sphere over a diffuse floor without fireworks."""
    sc = example_scenes.cornell_box(24, 24, spheres=False)
    glass = sc.add_material(host.MaterialSpec(bsdf_type=schema.BSDF_DIELECTRIC,
                                              eta=1.5, two_sided=False))
    from cudatracerlib_tpu.scene import shapes
    from cudatracerlib_tpu.utils import transforms as tf
    sc.create_node(shapes.sphere(radius=0.3, n_theta=16, n_phi=32), glass,
                   tf.translate([0, -0.5, 0]))
    scene = sc.build()
    img = np.asarray(bdptmod.BDPT(scene, 24, 24, max_depth=5).render(12))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


@pytest.mark.slow
def test_two_segment_strategy_weights_sum_to_pt_direct():
    """The 2-segment path class camera->x->light is sampled by exactly three
    BDPT strategies — NEE (s=1,t=2), emitter hit (s=0,t=3), splat (s=2,t=1)
    — plus the directly-visible emitter (s=0,t=2). Their MIS weights must
    sum to 1, so the force_s x force_t family renders must sum to PT at
    max_depth=1 (which integrates the same class with its own 2-way MIS).
    This is the probe that caught the round-3 splat-MIS cosine bug (the sum
    came out 30% low on grazing walls)."""
    w = h = 32
    scene = example_scenes.cornell_box(w, h).build()
    pt1 = np.asarray(pathmod.PathTracer(scene, w, h, max_depth=1,
                                        spp_per_pass=8).render(24))
    tot = 0.0
    for (s, t) in ((0, 2), (0, 3), (1, 2), (2, 1)):
        tot = tot + np.asarray(bdptmod.BDPT(scene, w, h, max_depth=2,
                                         force_s=s, force_t=t).render(48))
    assert abs(tot.mean() / pt1.mean() - 1.0) < 0.02, (tot.mean(), pt1.mean())
    # the red wall is the grazing-view region where the bug was 30% low
    red = (slice(8, 24), slice(0, 4))
    assert abs(tot[red].mean() / pt1[red].mean() - 1.0) < 0.05, (
        tot[red].mean(), pt1[red].mean())


@pytest.mark.slow
def test_bdpt_vcm_env_light_match_pt():
    """Environment-lit scene: BDPT and VCM must agree with PT (round-3 gap:
    neither had the s=0-at-infinity strategy, so skies were black through
    them; the light-subpath init also needed the background-light measure
    swap for the MIS partners)."""
    from cudatracerlib_tpu.models import vcm as vcmmod
    from cudatracerlib_tpu.scene import sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf
    from cudatracerlib_tpu.utils.example_scenes import _sky_envmap
    w = h = 24
    sc = host.DynamicScene()
    m = sc.add_material(host.MaterialSpec(reflectance=(0.6, 0.5, 0.4)))
    sc.create_node(shapes.rectangle(), m,
                   tf.compose(tf.translate([0, -0.5, 1.5]),
                              tf.rotate_deg([1, 0, 0], -90), tf.scale(3)))
    sc.create_node(shapes.rectangle(), m,
                   tf.compose(tf.translate([0, 0.5, 2.5]),
                              tf.rotate_deg([0, 1, 0], 180), tf.scale(1.5)))
    sc.set_environment(_sky_envmap(32, 64))
    sc.set_sensor(sensors.make_sensor(
        schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0.3, -2], [0, 0, 1.5]),
        fov_x_deg=50, film_w=w, film_h=h))
    scene = sc.build()
    pt = np.asarray(pathmod.PathTracer(scene, w, h, max_depth=4,
                                       spp_per_pass=4).render(12))
    bd = np.asarray(bdptmod.BDPT(scene, w, h, max_depth=4).render(24))
    vc = np.asarray(vcmmod.VCM(scene, w, h, max_depth=4).render(16))
    # 10%: the sun disc makes small-budget means noisy (the exactness claim
    # is the furnace test below; pre-fix BDPT was 35% low / sky black)
    assert abs(bd.mean() / pt.mean() - 1.0) < 0.10, (bd.mean(), pt.mean())
    assert abs(vc.mean() / pt.mean() - 1.0) < 0.10, (vc.mean(), pt.mean())
    # the sky itself must be visible through both (was black)
    sky = (slice(0, 4), slice(8, 16))
    assert bd[sky].mean() > 0.5 * pt[sky].mean()
    assert vc[sky].mean() > 0.5 * pt[sky].mean()


@pytest.mark.slow
def test_env_white_furnace_all_integrators():
    """Uniform env = 1 around a unit-albedo sphere: every transport family
    must return exactly 1 everywhere (the sharpest unbiasedness check for
    the env-light strategies; measured PT 1.0001 / BDPT 1.0034 / VCM 1.0055
    at these budgets)."""
    from cudatracerlib_tpu.models import vcm as vcmmod
    from cudatracerlib_tpu.scene import sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf
    w = h = 16
    sc = host.DynamicScene()
    m = sc.add_material(host.MaterialSpec(reflectance=(1.0, 1.0, 1.0)))
    sc.create_node(shapes.sphere(radius=0.6, n_theta=12, n_phi=24), m,
                   tf.translate([0, 0, 1.5]))
    sc.set_environment(np.ones((16, 32, 3), np.float32))
    sc.set_sensor(sensors.make_sensor(
        schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0, -1], [0, 0, 1.5]),
        fov_x_deg=40, film_w=w, film_h=h))
    scene = sc.build()
    pt = np.asarray(pathmod.PathTracer(scene, w, h, max_depth=8,
                                       spp_per_pass=8).render(8))
    bd = np.asarray(bdptmod.BDPT(scene, w, h, max_depth=8).render(24))
    vc = np.asarray(vcmmod.VCM(scene, w, h, max_depth=8).render(12))
    np.testing.assert_allclose(pt.mean(), 1.0, atol=0.01)
    np.testing.assert_allclose(bd.mean(), 1.0, atol=0.02)
    np.testing.assert_allclose(vc.mean(), 1.0, atol=0.02)


@pytest.mark.slow
def test_delta_light_parity_with_pt():
    """Point / spot / distant lights through BDPT and VCM must match PT
    (round-3 fixes: the delta NEE partner pdf needed the dist^2 fold for
    position-deltas but NOT for the direction-delta distant light, whose
    light sub-path also must skip the first-hit dist^2 conversion —
    SmallVCM's mIsFiniteLight. Pre-fix errors: -32% / -22% / +15%)."""
    from cudatracerlib_tpu.models import vcm as vcmmod
    from cudatracerlib_tpu.scene import sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf
    w = h = 20
    for kind in ("point", "spot", "distant"):
        sc = host.DynamicScene()
        m = sc.add_material(host.MaterialSpec(reflectance=(0.6, 0.5, 0.4)))
        sc.create_node(shapes.rectangle(), m,
                       tf.compose(tf.translate([0, -0.5, 1.5]),
                                  tf.rotate_deg([1, 0, 0], -90), tf.scale(3)))
        sc.create_node(shapes.rectangle(), m,
                       tf.compose(tf.translate([0, 0.5, 2.5]),
                                  tf.rotate_deg([0, 1, 0], 180),
                                  tf.scale(1.5)))
        if kind == "point":
            sc.add_point_light([0.5, 1.5, 0.5], (4.0, 3.5, 3.0))
        elif kind == "spot":
            sc.add_spot_light([0.5, 1.5, 0.5], [-0.3, -1, 0.5],
                              (6.0, 5.5, 5.0), cutoff_deg=40)
        else:
            sc.add_distant_light([-0.3, -1, 0.4], (1.5, 1.4, 1.2))
        sc.set_sensor(sensors.make_sensor(
            schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0.3, -2], [0, 0, 1.5]),
            fov_x_deg=50, film_w=w, film_h=h))
        scene = sc.build()
        pt = np.asarray(pathmod.PathTracer(scene, w, h, max_depth=4,
                                           spp_per_pass=8).render(8))
        bd = np.asarray(bdptmod.BDPT(scene, w, h, max_depth=4).render(24))
        vc = np.asarray(vcmmod.VCM(scene, w, h, max_depth=4).render(12))
        assert abs(bd.mean() / pt.mean() - 1.0) < 0.05, (kind, bd.mean(),
                                                         pt.mean())
        assert abs(vc.mean() / pt.mean() - 1.0) < 0.05, (kind, vc.mean(),
                                                         pt.mean())
