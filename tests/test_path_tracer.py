"""Path tracer integration tests: white furnace (exact expected radiance),
NEE on/off agreement, Cornell sanity."""
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.scene import host, schema
from cudatracerlib_tpu.utils import example_scenes


def _render(scene, w, h, spp, **kw):
    # one sample per pass: the pass fn compiles once and is re-invoked, instead
    # of unrolling the spp loop inside jit
    tr = pathmod.PathTracer(scene, w, h, spp_per_pass=1, **kw)
    return np.asarray(tr.render(spp))


class TestFurnace:
    def test_diffuse_furnace(self):
        # probe sphere albedo 0.7 in an L=1 furnace -> probe pixels read 0.7
        scene = example_scenes.furnace(48, 48, albedo=0.7).build()
        img = _render(scene, 48, 48, spp=32, max_depth=6)
        center = img[20:28, 20:28].mean(axis=(0, 1))
        np.testing.assert_allclose(center, 0.7, atol=0.03)
        # background pixels see the emitter directly: exactly 1
        corner = img[0:3, 0:3].mean(axis=(0, 1))
        np.testing.assert_allclose(corner, 1.0, atol=0.02)

    @pytest.mark.slow
    def test_rough_conductor_furnace_bounded(self):
        # perfect rough mirror in furnace: center reads <= 1 (energy conservation)
        spec = host.MaterialSpec(bsdf_type=schema.BSDF_ROUGHCONDUCTOR,
                                 reflectance=(1, 1, 1), alpha=0.4,
                                 eta_c=(0, 0, 0), k_c=(1e4, 1e4, 1e4))  # ~perfect mirror
        scene = example_scenes.furnace(32, 32, mat_spec=spec).build()
        img = _render(scene, 32, 32, spp=32, max_depth=6)
        center = img[12:20, 12:20].mean(axis=(0, 1))
        assert (center < 1.05).all()
        # single-scattering Smith microfacet loses energy at alpha=0.4 (no
        # multiple-scattering compensation, same as the reference's model)
        assert (center > 0.7).all()

    def test_dielectric_furnace(self):
        # lossless glass sphere in furnace -> all pixels ~1 (energy passes through)
        spec = host.MaterialSpec(bsdf_type=schema.BSDF_DIELECTRIC, eta=1.5,
                                 reflectance=(1, 1, 1), transmittance=(1, 1, 1))
        scene = example_scenes.furnace(32, 32, mat_spec=spec).build()
        img = _render(scene, 32, 32, spp=48, max_depth=12)
        np.testing.assert_allclose(img.mean(axis=(0, 1)), 1.0, atol=0.05)


class TestNEEConsistency:
    @pytest.mark.slow
    def test_nee_matches_bsdf_sampling(self):
        # same scene, NEE on vs off must converge to the same image
        sc = example_scenes.cornell_box(32, 32, spheres=False)
        scene = sc.build()
        img_nee = _render(scene, 32, 32, spp=96, max_depth=4, seed=0)
        img_bsdf = _render(scene, 32, 32, spp=384, max_depth=4, use_nee=False, seed=1)
        m_nee = img_nee.mean()
        m_bsdf = img_bsdf.mean()
        assert abs(m_nee - m_bsdf) / m_nee < 0.08, (m_nee, m_bsdf)


class TestCornell:
    def test_render_sane(self):
        scene = example_scenes.cornell_box(48, 48).build()
        img = _render(scene, 48, 48, spp=16, max_depth=5)
        assert np.isfinite(img).all()
        assert img.mean() > 0.05           # lit scene
        assert img[:, :, 0].mean() > img[:, :, 2].mean()  # warm light (17,12,4)
        # left half reddish vs right half greenish (color bleeding)
        left = img[20:40, 2:10]
        right = img[20:40, 38:46]
        assert left[..., 0].mean() / max(left[..., 1].mean(), 1e-9) > \
               right[..., 0].mean() / max(right[..., 1].mean(), 1e-9)

    def test_debug_pixel_runs(self):
        scene = example_scenes.cornell_box(32, 32).build()
        tr = pathmod.PathTracer(scene, 32, 32)
        d = tr.debug_pixel(16, 16)
        assert np.isfinite(np.asarray(d["L"])).all()


class TestRegularization:
    @pytest.mark.slow
    def test_regularized_caustic_less_noisy(self):
        # glass sphere over floor lit by a small area light: pure PT leaves
        # caustics to rare BSDF paths; regularization lets NEE reach them
        from cudatracerlib_tpu.scene import host, schema, shapes
        from cudatracerlib_tpu.utils import transforms as tf
        sc = example_scenes.cornell_box(24, 24, spheres=False)
        glass = sc.add_material(host.MaterialSpec(bsdf_type=schema.BSDF_DIELECTRIC,
                                                  eta=1.5, two_sided=False))
        sc.create_node(shapes.sphere(radius=0.3, n_theta=12, n_phi=24), glass,
                       tf.translate([0, -0.6, 0]))
        scene = sc.build()
        plain = np.asarray(pathmod.PathTracer(scene, 24, 24, max_depth=6,
                                              spp_per_pass=1).render(12))
        reg = np.asarray(pathmod.PathTracer(scene, 24, 24, max_depth=6,
                                            regularize=True,
                                            spp_per_pass=1).render(12))
        assert np.isfinite(reg).all()
        # images must stay broadly consistent (regularization bias is small)
        assert abs(reg.mean() - plain.mean()) / plain.mean() < 0.25


class TestEnvImportance:
    def test_env_nee_matches_bsdf_sampling(self):
        """Env-map CDF importance sampling agrees with BSDF-only sampling."""
        from cudatracerlib_tpu.scene import host, schema, sensors, shapes
        from cudatracerlib_tpu.utils import transforms as tf
        env = np.full((32, 64, 3), 0.05, np.float32)
        env[8:16, 10:20] = (8.0, 6.0, 2.0)
        sc = host.DynamicScene()
        white = sc.add_material(host.MaterialSpec(reflectance=(0.7, 0.7, 0.7)))
        sc.create_node(shapes.rectangle(), white,
                       tf.compose(tf.rotate_deg([1, 0, 0], -90), tf.scale(3)))
        sc.create_node(shapes.sphere(radius=0.4, center=(0, 0.4, 0),
                                     n_theta=16, n_phi=32), white)
        sc.set_environment(env)
        sc.set_sensor(sensors.make_sensor(
            schema.SENSOR_PERSPECTIVE, tf.look_at([0, 1.2, -3], [0, 0.3, 0]),
            fov_x_deg=40, film_w=24, film_h=24))
        scene = sc.build()
        img_nee = np.asarray(pathmod.PathTracer(scene, 24, 24, max_depth=4,
                                                spp_per_pass=1).render(48))
        img_bsdf = np.asarray(pathmod.PathTracer(scene, 24, 24, max_depth=4,
                                                 use_nee=False, seed=5,
                                                 spp_per_pass=1).render(144))
        assert abs(img_nee.mean() - img_bsdf.mean()) / img_bsdf.mean() < 0.06
        blk = lambda a: a.reshape(6, 4, 6, 4, 3).mean((1, 3))
        rel = np.abs(blk(img_nee) - blk(img_bsdf)) / (blk(img_bsdf) + 0.02)
        assert np.median(rel) < 0.1
