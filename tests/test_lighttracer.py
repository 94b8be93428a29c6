"""Light tracer must converge to the same image as the path tracer."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import lighttracer, path as pathmod
from cudatracerlib_tpu.utils import example_scenes


@pytest.mark.slow
def test_lt_matches_pt_cornell():
    scene = example_scenes.cornell_box(32, 32, spheres=False).build()
    pt = pathmod.PathTracer(scene, 32, 32, max_depth=4, spp_per_pass=1)
    img_pt = np.asarray(pt.render(48))
    lt = lighttracer.LightTracer(scene, 32, 32, max_depth=4)
    img_lt = np.asarray(lt.render(48))
    # compare means (global energy) and per-pixel on a blurred basis
    m_pt, m_lt = img_pt.mean(), img_lt.mean()
    assert abs(m_pt - m_lt) / m_pt < 0.1, (m_pt, m_lt)
    # coarse 4x4 block comparison to be robust to noise
    blk = lambda a: a.reshape(8, 4, 8, 4, 3).mean((1, 3))
    b_pt, b_lt = blk(img_pt), blk(img_lt)
    rel = np.abs(b_pt - b_lt) / (b_pt + 0.05)
    assert np.median(rel) < 0.25, float(np.median(rel))


def test_lt_point_light():
    from cudatracerlib_tpu.scene import host, schema, sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf
    sc = host.DynamicScene()
    white = sc.add_material(host.MaterialSpec(reflectance=(0.7, 0.7, 0.7)))
    sc.create_node(shapes.rectangle(), white,
                   tf.compose(tf.translate([0, -1, 0]), tf.rotate_deg([1, 0, 0], -90),
                              tf.scale(3)))
    sc.add_point_light((0, 1, 0), (4, 4, 4))
    sc.set_sensor(sensors.make_sensor(schema.SENSOR_PERSPECTIVE,
                                      tf.look_at([0, 1.2, -3], [0, -0.5, 0]),
                                      fov_x_deg=50, film_w=32, film_h=32))
    scene = sc.build()
    pt = pathmod.PathTracer(scene, 32, 32, max_depth=3, spp_per_pass=1)
    img_pt = np.asarray(pt.render(24))
    lt = lighttracer.LightTracer(scene, 32, 32, max_depth=3)
    img_lt = np.asarray(lt.render(24))
    floor_pt = img_pt[20:30, 8:24].mean()
    floor_lt = img_lt[20:30, 8:24].mean()
    assert abs(floor_pt - floor_lt) / floor_pt < 0.15, (floor_pt, floor_lt)


def _sensor_scene(sensor_type, **kw):
    from cudatracerlib_tpu.scene import host, schema, sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf
    sc = host.DynamicScene()
    white = sc.add_material(host.MaterialSpec(reflectance=(0.7, 0.7, 0.7)))
    black = sc.add_material(host.MaterialSpec(reflectance=(0, 0, 0)))
    sc.create_node(shapes.rectangle(), white,
                   tf.compose(tf.translate([0, -1, 0]), tf.rotate_deg([1, 0, 0], -90),
                              tf.scale(3)))
    sc.create_node(shapes.rectangle(), black,
                   tf.compose(tf.translate([0, 1.5, 0]), tf.rotate_deg([1, 0, 0], 90),
                              tf.scale(0.5)), emission=(8.0, 8.0, 8.0))
    sc.set_sensor(sensors.make_sensor(sensor_type,
                                      tf.look_at([0, 0.6, -2.5], [0, -0.6, 0]),
                                      fov_x_deg=50, film_w=32, film_h=32, **kw))
    return sc.build()


@pytest.mark.slow
def test_lt_matches_pt_all_sensors():
    """sample_direct for spherical/ortho/telecentric unlocks light tracing
    for every camera (reference Sensor.h:527-626)."""
    import pytest
    from cudatracerlib_tpu.scene import schema
    for st, kw in [(schema.SENSOR_SPHERICAL, {}),
                   (schema.SENSOR_ORTHOGRAPHIC, dict(ortho_scale=(2.0, 2.0))),
                   (schema.SENSOR_TELECENTRIC,
                    dict(ortho_scale=(2.0, 2.0), aperture_radius=0.05,
                         focus_distance=2.5))]:
        scene = _sensor_scene(st)
        if kw:
            scene = _sensor_scene(st, **kw)
        pt = pathmod.PathTracer(scene, 32, 32, max_depth=3, spp_per_pass=1)
        img_pt = np.asarray(pt.render(32))
        lt = lighttracer.LightTracer(scene, 32, 32, max_depth=3)
        img_lt = np.asarray(lt.render(64))
        m_pt, m_lt = img_pt.mean(), img_lt.mean()
        assert m_lt > 0, f"sensor {st}: no splats"
        assert abs(m_pt - m_lt) / (m_pt + 1e-9) < 0.2, (st, m_pt, m_lt)
