import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.models import prim
from cudatracerlib_tpu.utils import example_scenes


class TestPrimTracer:
    def setup_method(self):
        self.scene = example_scenes.cornell_box(64, 64, spheres=True).build()

    def test_depth_center(self):
        tr = prim.PrimTracer(self.scene, 64, 64, draw_mode=prim.D_LINEAR_DEPTH)
        img = np.asarray(tr.render(1))
        # center ray travels from z=-3.5; hits the box object or back wall —
        # depth must be monotone increasing toward the back wall and nonzero
        assert img[32, 32, 0] > 0.1
        # all pixels hit something (closed box)
        assert (img[..., 0] > 0).mean() > 0.99

    def test_normals(self):
        tr = prim.PrimTracer(self.scene, 64, 64, draw_mode=prim.D_NORMAL_SHADE)
        img = np.asarray(tr.render(1))
        # left edge pixels see the red wall: normal +x -> color (1, .5, .5)
        left = img[32, 2]
        assert left[0] > 0.9 and abs(left[1] - 0.5) < 0.1
        # right edge: normal -x -> (0, .5, .5)
        right = img[32, 61]
        assert right[0] < 0.1
        # floor: normal +y -> (.5, 1, .5)
        floor = img[61, 32]
        assert floor[1] > 0.9

    def test_emission_aov(self):
        tr = prim.PrimTracer(self.scene, 64, 64, draw_mode=prim.D_LIGHT_LE)
        img = np.asarray(tr.render(1))
        # the light patch at image top-center shows its radiance
        top = img[3:10, 28:36]
        assert img.max() > 10.0  # light radiance ~17
        # most of the image is not emissive
        assert (img.sum(-1) > 0).mean() < 0.1

    def test_albedo_aov(self):
        tr = prim.PrimTracer(self.scene, 64, 64, draw_mode=prim.D_ALBEDO)
        img = np.asarray(tr.render(1))
        left = img[32, 2]
        np.testing.assert_allclose(left, [0.63, 0.065, 0.05], atol=0.02)

    def test_debug_pixel(self):
        tr = prim.PrimTracer(self.scene, 64, 64)
        d = tr.debug_pixel(32, 32)
        assert int(d["tri"][0]) >= 0
        assert float(d["t"][0]) > 0.0


class TestFilm:
    def test_accumulate(self):
        f = filmmod.new_film(4, 4)
        px = jnp.asarray([0, 0, 3], jnp.int32)
        py = jnp.asarray([0, 0, 3], jnp.int32)
        val = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [2.0, 2.0, 2.0]])
        f = filmmod.add_samples(f, px, py, val)
        img = np.asarray(filmmod.develop(f))
        np.testing.assert_allclose(img[0, 0], [0.5, 0.5, 0.0], atol=1e-6)
        np.testing.assert_allclose(img[3, 3], [2, 2, 2], atol=1e-6)

    def test_splat(self):
        f = filmmod.new_film(4, 4)
        f = filmmod.splat(f, jnp.asarray([1]), jnp.asarray([2]), jnp.asarray([[3.0, 0, 0]]))
        f = f._replace(n_passes=jnp.float32(1.0))
        img = np.asarray(filmmod.develop(f))
        np.testing.assert_allclose(img[2, 1], [3, 0, 0], atol=1e-6)

    def test_nan_guard(self):
        f = filmmod.new_film(2, 2)
        f = filmmod.add_samples(f, jnp.asarray([0]), jnp.asarray([0]),
                                jnp.asarray([[jnp.nan, 1.0, jnp.inf]]))
        img = np.asarray(filmmod.develop(f))
        assert np.isfinite(img).all()
