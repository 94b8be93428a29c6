"""BSSRDF: subsurface random walk through material-attached media
(reference Engine/Material.h:38-60 GetBSSRDF + ParticleProcess bssrdf
handling)."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import bsdf as bsdfmod
from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.scene import host, schema, sensors, shapes
from cudatracerlib_tpu.utils import transforms as tf


def _marble_scene(sigma_s=(3.0, 3.0, 3.0), sigma_a=(0.05, 0.1, 0.15)):
    sc = host.DynamicScene()
    marble = sc.add_material(host.MaterialSpec(
        bsdf_type=schema.BSDF_DIELECTRIC, eta=1.3,
        bssrdf_sigma_a=sigma_a, bssrdf_sigma_s=sigma_s, bssrdf_g=0.3))
    black = sc.add_material(host.MaterialSpec(reflectance=(0, 0, 0)))
    sc.create_node(shapes.sphere(radius=0.5, n_theta=24, n_phi=48), marble)
    sc.create_node(shapes.rectangle(), black,
                   tf.compose(tf.translate([0, 1.8, 0]),
                              tf.rotate_deg([1, 0, 0], 90), tf.scale(0.8)),
                   emission=(12.0,) * 3)
    sc.set_sensor(sensors.make_sensor(
        schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0.4, -2.4], [0, 0, 0]),
        fov_x_deg=35, film_w=32, film_h=32))
    return sc.build()


@pytest.mark.slow
def test_bssrdf_scatters_light():
    """A scattering marble sphere must carry substantially more light to the
    camera than clear glass (light enters the top, diffuses through)."""
    scene = _marble_scene()
    assert bsdfmod.scene_has_bssrdf(scene)
    tr = pathmod.PathTracer(scene, 32, 32, max_depth=12)
    assert tr.with_bssrdf
    img = np.asarray(tr.render(24))
    assert np.isfinite(img).all()
    center = img[12:20, 12:20].mean()
    assert center > 0.05, float(center)

    # clear glass control
    sc2 = host.DynamicScene()
    g = sc2.add_material(host.MaterialSpec(bsdf_type=schema.BSDF_DIELECTRIC,
                                           eta=1.3))
    b2 = sc2.add_material(host.MaterialSpec(reflectance=(0, 0, 0)))
    sc2.create_node(shapes.sphere(radius=0.5, n_theta=24, n_phi=48), g)
    sc2.create_node(shapes.rectangle(), b2,
                    tf.compose(tf.translate([0, 1.8, 0]),
                               tf.rotate_deg([1, 0, 0], 90), tf.scale(0.8)),
                    emission=(12.0,) * 3)
    sc2.set_sensor(scene.sensor)
    img_glass = np.asarray(pathmod.PathTracer(sc2.build(), 32, 32,
                                              max_depth=12).render(24))
    assert img.mean() > 3.0 * img_glass.mean(), (img.mean(), img_glass.mean())


def test_bssrdf_absorption_tints():
    """Chromatic sigma_a must tint the transmitted light (more red survives
    when red absorption is lowest)."""
    scene = _marble_scene(sigma_a=(0.02, 0.6, 1.2))
    img = np.asarray(pathmod.PathTracer(scene, 32, 32,
                                        max_depth=12).render(16))
    c = img[12:20, 12:20].mean(axis=(0, 1))
    assert c[0] > c[1] > c[2], c
