"""Render-framework subsystem tests: samplers, block sampling, variance
buffer, image pipeline."""
import jax
import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.models import adaptive, blocksampler as bs
from cudatracerlib_tpu.models import film as filmmod
from cudatracerlib_tpu.models import pipeline, samplers
from cudatracerlib_tpu.utils import example_scenes


class TestSamplers:
    def test_uniform_range(self):
        pix = jnp.arange(4096, dtype=jnp.int32)
        for st in (samplers.INDEPENDENT, samplers.STRATIFIED, samplers.SOBOL):
            u = np.asarray(samplers.sample_1d(st, pix, 3, dim=0))
            assert u.min() >= 0 and u.max() < 1
            assert abs(u.mean() - 0.5) < 0.02, (st, u.mean())

    def test_stratified_better_than_independent(self):
        # discrepancy proxy: variance of counts over 16 strata, one pixel,
        # many samples
        pix = jnp.zeros(256, jnp.int32)
        idx = jnp.arange(256)
        u_s = np.asarray(jax.vmap(lambda i: samplers.sample_1d(
            samplers.STRATIFIED, pix[:1], i, 0))(idx)).reshape(-1)
        u_i = np.asarray(jax.vmap(lambda i: samplers.sample_1d(
            samplers.INDEPENDENT, pix[:1], i, 0))(idx)).reshape(-1)
        cnt_s = np.histogram(u_s, bins=16, range=(0, 1))[0]
        cnt_i = np.histogram(u_i, bins=16, range=(0, 1))[0]
        assert cnt_s.var() <= cnt_i.var()

    def test_sobol_first_dims_lowdisc(self):
        pix = jnp.zeros(64, jnp.int32)
        pts = []
        for i in range(64):
            pts.append([float(samplers.sample_1d(samplers.SOBOL, pix[:1], i, 0)[0]),
                        float(samplers.sample_1d(samplers.SOBOL, pix[:1], i, 1)[0])])
        pts = np.asarray(pts)
        # 64 sobol points stratify the 8x8 grid almost perfectly
        cnt = np.histogram2d(pts[:, 0], pts[:, 1], bins=8, range=((0, 1), (0, 1)))[0]
        assert (cnt > 0).mean() > 0.9


class TestVarianceBuffer:
    def test_welford(self):
        vb = bs.VarianceBuffer.new(4, 4)
        r = np.random.default_rng(0)
        vals = r.normal(2.0, 0.5, size=(100, 3)).astype(np.float32)
        for i, v in enumerate(vals):
            vb = bs.add_samples(vb, jnp.asarray([1]), jnp.asarray([2]),
                                jnp.asarray(v)[None], jnp.asarray([i]),
                                jnp.asarray([True]))
        assert abs(float(vb.mean[2, 1, 0]) - vals[:, 0].mean()) < 1e-3
        var = float(vb.m2[2, 1, 0]) / 99
        assert abs(var - vals[:, 0].var(ddof=1)) < 2e-2

    def test_block_weights_concentrate(self):
        vb = bs.VarianceBuffer.new(64, 64)
        # inject high variance into one block
        px = jnp.asarray(np.tile(np.arange(8) + 16, 50), jnp.int32)
        py = jnp.asarray(np.tile(np.arange(8) + 32, 50), jnp.int32)
        r = np.random.default_rng(1)
        for i in range(20):
            vals = jnp.asarray(r.normal(1, 2.0, size=(400, 3)), jnp.float32)
            vb = bs.add_samples(vb, px, py, vals, jnp.full(400, i), jnp.ones(400, bool))
        # uniform low-variance elsewhere
        allp = jnp.arange(64 * 64, dtype=jnp.int32)
        for i in range(3):
            vb = bs.add_samples(vb, allp % 64, allp // 64,
                                jnp.ones((64 * 64, 3)), jnp.full(64 * 64, i),
                                jnp.ones(64 * 64, bool))
        w = np.asarray(bs.block_weights(vb, 64, 64, bs.B_VARIANCE))
        hot = w[32 // bs.BLOCK, 16 // bs.BLOCK]
        assert hot >= w.mean()


class TestAdaptive:
    def test_adaptive_matches_uniform(self):
        scene = example_scenes.cornell_box(32, 32, spheres=False).build()
        tr = adaptive.AdaptivePathTracer(scene, 32, 32, max_depth=3,
                                         mode=bs.B_VARIANCE)
        img = np.asarray(tr.render(12))
        from cudatracerlib_tpu.models import path as pathmod
        ref = np.asarray(pathmod.PathTracer(scene, 32, 32, max_depth=3,
                                            spp_per_pass=1).render(12))
        assert np.isfinite(img).all()
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.15


class TestPipeline:
    def test_filters_preserve_mean(self):
        r = np.random.default_rng(0)
        img = jnp.asarray(r.random((32, 32, 3)), jnp.float32)
        for ft in (pipeline.F_GAUSSIAN, pipeline.F_MITCHELL, pipeline.F_TRIANGLE,
                   pipeline.F_LANCZOS):
            out = pipeline.apply_filter(img, ft)
            assert abs(float(out.mean()) - float(img.mean())) < 0.02

    def test_tonemap_compresses(self):
        img = jnp.asarray(np.random.default_rng(1).random((16, 16, 3)) * 50,
                          jnp.float32)
        out = np.asarray(pipeline.tonemap_reinhard05(img))
        assert out.max() <= 50
        assert np.isfinite(out).all()

    def test_nlm_reduces_noise(self):
        r = np.random.default_rng(2)
        clean = np.zeros((32, 32, 3), np.float32)
        clean[:, 16:] = 1.0
        noisy = clean + r.normal(0, 0.25, clean.shape).astype(np.float32)
        den = np.asarray(pipeline.nlm_denoise(jnp.asarray(noisy),
                                              jnp.full((32, 32), 0.25 ** 2)))
        err_noisy = np.abs(noisy - clean).mean()
        err_den = np.abs(den - clean).mean()
        assert err_den < err_noisy * 0.6, (err_noisy, err_den)
