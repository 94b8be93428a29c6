"""Participating-media tests: analytic attenuation, furnace energy
conservation, grid/homogeneous consistency."""
import numpy as np
import pytest

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.scene import host, schema, sensors, shapes
from cudatracerlib_tpu.utils import example_scenes, transforms as tf


def _slab_scene(sigma_a, sigma_s, g=0.0, density=None, emitter_radiance=2.0):
    """Camera -> [1-unit-thick medium slab] -> emissive wall."""
    sc = host.DynamicScene()
    black = sc.add_material(host.MaterialSpec(reflectance=(0, 0, 0)))
    # emissive wall behind the slab
    sc.create_node(shapes.rectangle(), black,
                   tf.compose(tf.translate([0, 0, 2]), tf.rotate_deg([0, 1, 0], 180),
                              tf.scale(8)),
                   emission=(emitter_radiance,) * 3)
    # medium: unit cube scaled to a 4x4x1 slab from z=0..1
    m2w = tf.compose(tf.translate([-2, -2, 0]), tf.scale([4, 4, 1]))
    if density is None:
        sc.add_homogeneous_medium(sigma_a, sigma_s, m2w, phase_g=g)
    else:
        sc.add_grid_medium(density, sigma_a, sigma_s, m2w, phase_g=g)
    sc.set_sensor(sensors.make_sensor(
        schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0, -2], [0, 0, 1]),
        fov_x_deg=20, film_w=24, film_h=24))
    return sc.build()


def _render(scene, spp=32, depth=8):
    tr = pathmod.PathTracer(scene, 24, 24, max_depth=depth, spp_per_pass=1)
    return np.asarray(tr.render(spp))


class TestAbsorption:
    def test_beer_lambert(self):
        # pure absorption sigma_a=0.8 over thickness 1: T = exp(-0.8)
        scene = _slab_scene((0.8, 0.8, 0.8), (0, 0, 0))
        img = _render(scene, spp=64)
        expect = 2.0 * np.exp(-0.8)
        got = img[10:14, 10:14].mean()
        np.testing.assert_allclose(got, expect, rtol=0.05)

    def test_chromatic_absorption(self):
        scene = _slab_scene((1.5, 0.5, 0.1), (0, 0, 0))
        img = _render(scene, spp=48)
        got = img[10:14, 10:14].mean(axis=(0, 1))
        expect = 2.0 * np.exp(-np.array([1.5, 0.5, 0.1]))
        np.testing.assert_allclose(got, expect, rtol=0.12)

    def test_grid_matches_homogeneous(self):
        dens = np.ones((8, 8, 8), np.float32)
        s_h = _slab_scene((0.7, 0.7, 0.7), (0, 0, 0))
        s_g = _slab_scene((0.7, 0.7, 0.7), (0, 0, 0), density=dens)
        ih = _render(s_h, spp=48)[10:14, 10:14].mean()
        ig = _render(s_g, spp=48)[10:14, 10:14].mean()
        np.testing.assert_allclose(ih, ig, rtol=0.08)

    def test_zero_density_grid_transparent(self):
        dens = np.zeros((4, 4, 4), np.float32)
        scene = _slab_scene((5.0, 5.0, 5.0), (0, 0, 0), density=dens)
        img = _render(scene, spp=8)
        np.testing.assert_allclose(img[10:14, 10:14].mean(), 2.0, rtol=0.03)


class TestScattering:
    @pytest.mark.slow
    def test_scattering_furnace(self):
        # purely scattering medium inside a furnace: radiance stays 1 everywhere
        sc = example_scenes.furnace(24, 24, albedo=0.0)
        m2w = tf.compose(tf.translate([-1.5, -1.5, -1.5]), tf.scale(3.0))
        sc._media.append(dict(med_type=0, sigma_a=(0, 0, 0), sigma_s=(1.2, 1.2, 1.2),
                              to_world=np.asarray(m2w, np.float32), phase_type=0,
                              phase_g=0.3, scale=1.0, emission=(0, 0, 0), density=None))
        # remove the probe sphere: only furnace + medium
        sc._nodes = [n for n in sc._nodes if n.name != "probe"]
        scene = sc.build()
        img = _render(scene, spp=48, depth=48)
        np.testing.assert_allclose(img.mean(axis=(0, 1)), 1.0, atol=0.07)

    def test_single_scatter_brightens_shadowed(self):
        # scattering slab lit from behind: off-axis pixels receive scattered light
        scene = _slab_scene((0.0, 0.0, 0.0), (0.6, 0.6, 0.6), g=0.0)
        img = _render(scene, spp=32)
        assert img.mean() > 0.1
        assert np.isfinite(img).all()


class TestPhase:
    def test_hg_forward_peaked_and_consistent(self):
        # regression: eval and sampling must share the forward-peaked convention
        import jax.numpy as jnp
        from cudatracerlib_tpu.models import phase as phasemod
        B = 50000
        r = np.random.default_rng(0)
        d_in = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
        g = jnp.full(B, 0.6)
        pt = jnp.zeros(B, jnp.int32)
        u = jnp.asarray(r.random((B, 2)), np.float32)
        wo, w, pdf = phasemod.sample_phase(pt, g, d_in, u)
        assert abs(float(wo[:, 2].mean()) - 0.6) < 0.02  # mean cosine = +g
        fwd = float(phasemod.eval_phase(pt, g, d_in, jnp.asarray([[0., 0., 1.]]))[0])
        bwd = float(phasemod.eval_phase(pt, g, d_in, jnp.asarray([[0., 0., -1.]]))[0])
        assert fwd > bwd * 10
        # eval == pdf at sampled directions for HG (exact sampling)
        ev = phasemod.eval_phase(pt, g, d_in, wo)
        np.testing.assert_allclose(np.asarray(ev), np.asarray(pdf), rtol=1e-4)
