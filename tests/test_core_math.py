import jax
import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.core import (compression, frame, fresnel, kernels,
                                    microfacet, mis, rng, spectrum, vecmath as vm,
                                    warp)


def _uniforms(n, d=2, seed=0):
    return jnp.asarray(np.random.default_rng(seed).random((n, d)), jnp.float32)


class TestVecmath:
    def test_normalize(self):
        v = jnp.asarray(np.random.default_rng(1).normal(size=(100, 3)), jnp.float32)
        n = vm.normalize(v)
        np.testing.assert_allclose(vm.length(n), 1.0, atol=1e-5)

    def test_reflect(self):
        n = jnp.array([[0.0, 0.0, 1.0]])
        w = vm.normalize(jnp.array([[1.0, 0.0, 1.0]]))
        r = vm.reflect(w, n)
        np.testing.assert_allclose(r, vm.normalize(jnp.array([[-1.0, 0.0, 1.0]])), atol=1e-6)

    def test_refract_snell(self):
        # entering glass at 45 deg: check Snell's law and tangential flip
        n = jnp.array([[0.0, 0.0, 1.0]])
        wi = vm.normalize(jnp.array([[1.0, 0.0, 1.0]]))
        F, ct = fresnel.fresnel_dielectric_ext(wi[..., 2], 1.5)
        wo = vm.refract(wi, n, 1.5, ct)
        np.testing.assert_allclose(vm.length(wo), 1.0, atol=1e-5)
        sin_i = np.sqrt(1 - float(wi[0, 2]) ** 2)
        sin_t = np.sqrt(float(wo[0, 0]) ** 2 + float(wo[0, 1]) ** 2)
        np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)
        assert float(wo[0, 0]) < 0  # tangential component flips
        assert float(wo[0, 2]) < 0  # crosses the interface
        # exiting: reverse must recover the original direction (reciprocity)
        F2, ct2 = fresnel.fresnel_dielectric_ext(wo[..., 2], 1.5)
        wi2 = vm.refract(wo, n, 1.5, ct2)
        np.testing.assert_allclose(np.asarray(wi2), np.asarray(wi), atol=1e-5)

    def test_coordinate_system_orthonormal(self):
        n = vm.normalize(jnp.asarray(np.random.default_rng(2).normal(size=(200, 3)), jnp.float32))
        t, s = vm.coordinate_system(n)
        np.testing.assert_allclose(vm.dot(t, n), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(s, n), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(t, s), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(t), 1.0, atol=1e-5)

    def test_transforms(self):
        m = vm.mat4_mul(vm.mat4_translate([1, 2, 3]), vm.mat4_scale(2.0))
        p = jnp.array([1.0, 1.0, 1.0])
        np.testing.assert_allclose(vm.transform_point(m, p), [3, 4, 5], atol=1e-6)
        np.testing.assert_allclose(vm.transform_vector(m, p), [2, 2, 2], atol=1e-6)
        minv = vm.mat4_inverse(m)
        np.testing.assert_allclose(vm.transform_point(minv, vm.transform_point(m, p)), p, atol=1e-5)

    def test_look_at(self):
        m = vm.look_at([0, 0, 0], [0, 0, 5], [0, 1, 0])
        # forward (+z in camera space) maps to world +z
        np.testing.assert_allclose(vm.transform_vector(m, jnp.array([0., 0., 1.])), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(vm.transform_point(m, jnp.array([0., 0., 0.])), [0, 0, 0], atol=1e-6)


class TestFrame:
    def test_roundtrip(self):
        n = vm.normalize(jnp.asarray(np.random.default_rng(3).normal(size=(50, 3)), jnp.float32))
        f = frame.Frame.from_normal(n)
        v = vm.normalize(jnp.asarray(np.random.default_rng(4).normal(size=(50, 3)), jnp.float32))
        np.testing.assert_allclose(f.to_world(f.to_local(v)), v, atol=1e-5)
        # normal maps to +z
        np.testing.assert_allclose(f.to_local(n), jnp.tile(jnp.array([0., 0., 1.]), (50, 1)), atol=1e-5)


class TestWarp:
    def test_cosine_hemisphere_pdf_integrates(self):
        u = _uniforms(200000)
        d = warp.square_to_cosine_hemisphere(u)
        np.testing.assert_allclose(vm.length(d), 1.0, atol=1e-4)
        assert float(jnp.min(d[:, 2])) >= 0.0
        # E[cos] over cosine-weighted = int cos^2 / pi = 2/3
        np.testing.assert_allclose(float(jnp.mean(d[:, 2])), 2.0 / 3.0, atol=5e-3)

    def test_uniform_sphere(self):
        d = warp.square_to_uniform_sphere(_uniforms(100000))
        np.testing.assert_allclose(vm.length(d), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.mean(d, 0)), [0, 0, 0], atol=1e-2)

    def test_cone(self):
        cc = 0.9
        d = warp.square_to_uniform_cone(_uniforms(50000), cc)
        assert float(jnp.min(d[:, 2])) >= cc - 1e-5
        # MC estimate of cone solid angle = 1/pdf
        np.testing.assert_allclose(1.0 / float(warp.square_to_uniform_cone_pdf(cc)),
                                   2 * np.pi * (1 - cc), rtol=1e-5)

    def test_triangle(self):
        b = warp.square_to_uniform_triangle(_uniforms(50000))
        assert float(jnp.min(b)) >= 0.0
        assert float(jnp.max(b.sum(-1))) <= 1.0 + 1e-5
        np.testing.assert_allclose(np.asarray(jnp.mean(b, 0)), [1 / 3, 1 / 3], atol=5e-3)

    def test_concentric_disk(self):
        p = warp.square_to_uniform_disk_concentric(_uniforms(50000))
        r2 = p[:, 0] ** 2 + p[:, 1] ** 2
        assert float(jnp.max(r2)) <= 1.0 + 1e-5
        # uniform: E[r^2] = 1/2
        np.testing.assert_allclose(float(jnp.mean(r2)), 0.5, atol=5e-3)


class TestFresnel:
    def test_normal_incidence(self):
        F, ct = fresnel.fresnel_dielectric_ext(jnp.array([1.0]), 1.5)
        np.testing.assert_allclose(F, ((0.5 / 2.5) ** 2), atol=1e-5)
        np.testing.assert_allclose(ct, -1.0, atol=1e-5)

    def test_tir(self):
        # from inside glass at grazing angle -> total internal reflection
        ci = jnp.array([-0.2])  # cos from inside
        F, ct = fresnel.fresnel_dielectric_ext(ci, 1.5)
        np.testing.assert_allclose(F, 1.0, atol=1e-6)

    def test_reciprocity_energy(self):
        ci = jnp.linspace(0.01, 1.0, 64)
        F, _ = fresnel.fresnel_dielectric_ext(ci, 1.5)
        assert float(jnp.min(F)) >= 0.0 and float(jnp.max(F)) <= 1.0

    def test_conductor(self):
        eta = jnp.array([[0.2, 0.9, 1.4]])
        k = jnp.array([[3.9, 2.5, 2.1]])
        F = fresnel.fresnel_conductor_exact(jnp.array([1.0]), eta, k)
        assert F.shape == (1, 3)
        # normal incidence closed form: ((eta-1)^2 + k^2) / ((eta+1)^2 + k^2)
        expect = ((eta - 1) ** 2 + k ** 2) / ((eta + 1) ** 2 + k ** 2)
        np.testing.assert_allclose(np.asarray(F), np.asarray(expect), rtol=1e-4)


class TestSpectrum:
    def test_xyz_roundtrip(self):
        rgb = jnp.asarray(np.random.default_rng(5).random((100, 3)), jnp.float32)
        np.testing.assert_allclose(spectrum.xyz_to_rgb(spectrum.rgb_to_xyz(rgb)), rgb, atol=1e-3)

    def test_yxy_roundtrip(self):
        xyz = jnp.asarray(np.random.default_rng(6).random((100, 3)), jnp.float32) + 0.01
        np.testing.assert_allclose(spectrum.yxy_to_xyz(spectrum.xyz_to_yxy(xyz)), xyz, atol=1e-4)

    def test_rgbe_roundtrip(self):
        rgb = jnp.asarray(np.random.default_rng(7).random((1000, 3)), jnp.float32) * 100.0
        dec = np.asarray(spectrum.from_rgbe(spectrum.to_rgbe(rgb)))
        # shared-exponent format: abs error bounded by max-channel / 256 per pixel
        tol = np.max(np.asarray(rgb), axis=-1, keepdims=True) / 128.0
        assert np.all(np.abs(dec - np.asarray(rgb)) <= tol)

    def test_srgb_roundtrip(self):
        c = jnp.linspace(0, 1, 64)
        np.testing.assert_allclose(spectrum.srgb_to_linear(spectrum.linear_to_srgb(c)), c, atol=1e-5)


class TestCompression:
    def test_normal_roundtrip(self):
        n = vm.normalize(jnp.asarray(np.random.default_rng(8).normal(size=(500, 3)), jnp.float32))
        dec = compression.uint16_to_normal(compression.normal_to_uint16(n))
        assert float(jnp.min(vm.dot(dec, n))) > 0.999  # < ~2.5 degrees error


class TestRng:
    def test_range_and_mean(self):
        s = rng.seed(jnp.arange(100000), 0, 0)
        s, f = rng.next_float(s)
        assert float(jnp.min(f)) >= 0.0 and float(jnp.max(f)) < 1.0
        np.testing.assert_allclose(float(jnp.mean(f)), 0.5, atol=5e-3)
        np.testing.assert_allclose(float(jnp.var(f)), 1 / 12, atol=2e-3)

    def test_streams_decorrelated(self):
        s = rng.seed(jnp.arange(10000), 0, 0)
        s, a = rng.next_float(s)
        s2 = rng.seed(jnp.arange(10000), 1, 0)
        s2, b = rng.next_float(s2)
        corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
        assert abs(corr) < 0.05


class TestMis:
    def test_heuristics(self):
        a, b = jnp.array([1.0]), jnp.array([3.0])
        np.testing.assert_allclose(mis.balance_heuristic(a, b), 0.25, atol=1e-6)
        np.testing.assert_allclose(mis.power_heuristic(a, b), 0.1, atol=1e-6)
        # partition of unity
        np.testing.assert_allclose(mis.power_heuristic(a, b) + mis.power_heuristic(b, a), 1.0, atol=1e-6)


class TestKernels:
    def test_normalization_mc(self):
        # MC-integrate each kernel over the 3-ball: should be ~1
        rng_np = np.random.default_rng(9)
        pts = rng_np.normal(size=(200000, 3))
        pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        pts = pts * rng_np.random((200000, 1)) ** (1 / 3) * 2.0  # radius 2 ball
        t = jnp.asarray(np.linalg.norm(pts, axis=-1), jnp.float32)
        vol = 4 / 3 * np.pi * 8.0
        est = jax.jit(lambda kt: jnp.mean(kernels.k(kt, t, 2.0, dim=3)) * vol)
        for kt in (kernels.UNIFORM, kernels.PERLIN):
            np.testing.assert_allclose(float(est(kt)), 1.0, atol=2e-2)


class TestMicrofacet:
    def test_d_normalization(self):
        # int D(m) cos(m) dm = 1 over hemisphere for each distribution
        u = _uniforms(200000, seed=10)
        d = warp.square_to_uniform_hemisphere(u)
        pdf = warp.square_to_uniform_hemisphere_pdf()

        @jax.jit
        def estimate(dist, alpha):
            val = microfacet.eval_d(jnp.full(d.shape[:1], dist), alpha, alpha, d) * d[:, 2]
            return jnp.mean(val) / pdf

        for dist in (microfacet.BECKMANN, microfacet.GGX, microfacet.PHONG):
            for alpha in (0.3, 0.7):
                np.testing.assert_allclose(float(estimate(dist, alpha)), 1.0, atol=0.05)

    def test_sample_pdf_consistency(self):
        # pdf() at sampled m should match the pdf returned by sample()
        wi = vm.normalize(jnp.tile(jnp.array([0.3, -0.2, 0.9]), (5000, 1)))
        u = _uniforms(5000, seed=11)

        @jax.jit
        def run(dist):
            dd = jnp.full((5000,), dist)
            ax = jnp.full((5000,), 0.4)
            m, p1 = microfacet.sample(dd, ax, ax, wi, u)
            p2 = microfacet.pdf(dd, ax, ax, wi, m)
            return p1, p2

        for dist in (microfacet.BECKMANN, microfacet.GGX, microfacet.PHONG):
            p1, p2 = run(dist)
            np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-2, atol=1e-3)

    def test_ggx_vndf_faces_wi(self):
        wi = vm.normalize(jnp.tile(jnp.array([0.6, 0.0, 0.8]), (10000, 1)))
        u = _uniforms(10000, seed=12)

        @jax.jit
        def run():
            dd = jnp.full((10000,), microfacet.GGX)
            ax = jnp.full((10000,), 0.5)
            m, pdf = microfacet.sample(dd, ax, ax, wi, u)
            return vm.dot(m, wi)

        assert float(jnp.min(run())) > 0.0  # visible normals face wi
