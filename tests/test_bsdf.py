"""BSDF validation: sample/eval/pdf consistency, pdf normalization, energy
conservation — the chi^2-style test pyramid the reference lacks (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudatracerlib_tpu.core import vecmath as vm, warp
from cudatracerlib_tpu.models import bsdf as bsdfmod
from cudatracerlib_tpu.scene import host, schema


def _make_ctx(spec: host.MaterialSpec, B: int):
    mats, texs = [], []
    host._pack_material(spec, mats, texs)
    row = mats[-1]
    t = jnp.full((B,), row["mat_type"], jnp.int32)
    p = jnp.tile(jnp.asarray(row["params"]), (B, 1))
    c0 = jnp.tile(jnp.asarray(row["params"][0:3]), (B, 1))
    c1 = jnp.tile(jnp.asarray(row["params"][19:22]), (B, 1))
    if row["nested"] >= 0:
        nrow = mats[row["nested"]]
        nt = jnp.full((B,), nrow["mat_type"], jnp.int32)
        np_ = jnp.tile(jnp.asarray(nrow["params"]), (B, 1))
        nc0 = jnp.tile(jnp.asarray(nrow["params"][0:3]), (B, 1))
        nc1 = jnp.tile(jnp.asarray(nrow["params"][19:22]), (B, 1))
    else:
        nt, np_, nc0, nc1 = jnp.zeros((B,), jnp.int32), p * 0, c0 * 0, c1 * 0
    if row["nested2"] >= 0:
        n2row = mats[row["nested2"]]
        n2t = jnp.full((B,), n2row["mat_type"], jnp.int32)
        n2p = jnp.tile(jnp.asarray(n2row["params"]), (B, 1))
        n2c0 = jnp.tile(jnp.asarray(n2row["params"][0:3]), (B, 1))
        n2c1 = jnp.tile(jnp.asarray(n2row["params"][19:22]), (B, 1))
    else:
        n2t, n2p, n2c0, n2c1 = jnp.zeros((B,), jnp.int32), p * 0, c0 * 0, c1 * 0
    return bsdfmod.BsdfCtx(t, p, c0, c1, nt, np_, nc0, nc1, n2t, n2p, n2c0, n2c1)


SMOOTH_SPECS = {
    "diffuse": host.MaterialSpec(bsdf_type=schema.BSDF_DIFFUSE, reflectance=(0.7, 0.5, 0.3)),
    "roughdiffuse": host.MaterialSpec(bsdf_type=schema.BSDF_ROUGHDIFFUSE,
                                      reflectance=(0.6, 0.6, 0.6), alpha=0.3),
    "roughconductor": host.MaterialSpec(bsdf_type=schema.BSDF_ROUGHCONDUCTOR,
                                        reflectance=(1, 1, 1), alpha=0.3, distribution=1),
    "roughconductor_beck": host.MaterialSpec(bsdf_type=schema.BSDF_ROUGHCONDUCTOR,
                                             reflectance=(1, 1, 1), alpha=0.4, distribution=0),
    "roughdielectric": host.MaterialSpec(bsdf_type=schema.BSDF_ROUGHDIELECTRIC,
                                         alpha=0.3, eta=1.5, reflectance=(1, 1, 1),
                                         transmittance=(1, 1, 1), distribution=1),
    "plastic": host.MaterialSpec(bsdf_type=schema.BSDF_PLASTIC, reflectance=(1, 1, 1),
                                 transmittance=(0.5, 0.2, 0.1), eta=1.49),
    "roughplastic": host.MaterialSpec(bsdf_type=schema.BSDF_ROUGHPLASTIC, alpha=0.3,
                                      reflectance=(1, 1, 1), transmittance=(0.5, 0.2, 0.1),
                                      eta=1.49, distribution=1),
    "phong": host.MaterialSpec(bsdf_type=schema.BSDF_PHONG, reflectance=(0.4, 0.4, 0.4),
                               transmittance=(0.3, 0.3, 0.3), exponent=40.0),
    "ward": host.MaterialSpec(bsdf_type=schema.BSDF_WARD, reflectance=(0.4, 0.4, 0.4),
                              transmittance=(0.3, 0.3, 0.3), alpha=0.25, alpha_v=0.15),
    "coating": host.MaterialSpec(
        bsdf_type=schema.BSDF_COATING, eta=1.49,
        transmittance=(0.1, 0.1, 0.1), thickness=1.0, reflectance=(1, 1, 1),
        nested=host.MaterialSpec(bsdf_type=schema.BSDF_DIFFUSE,
                                 reflectance=(0.6, 0.4, 0.3))),
    "roughcoating": host.MaterialSpec(
        bsdf_type=schema.BSDF_ROUGHCOATING, eta=1.49, alpha=0.25,
        distribution=1, transmittance=(0.1, 0.1, 0.1), thickness=1.0,
        reflectance=(1, 1, 1),
        nested=host.MaterialSpec(bsdf_type=schema.BSDF_DIFFUSE,
                                 reflectance=(0.6, 0.4, 0.3))),
    "blend": host.MaterialSpec(
        bsdf_type=schema.BSDF_BLEND, blend_weight=0.4,
        nested=host.MaterialSpec(bsdf_type=schema.BSDF_DIFFUSE, reflectance=(0.8, 0.2, 0.2)),
        nested2=host.MaterialSpec(bsdf_type=schema.BSDF_ROUGHCONDUCTOR,
                                  reflectance=(1, 1, 1), alpha=0.3)),
}

DELTA_SPECS = {
    "dielectric": host.MaterialSpec(bsdf_type=schema.BSDF_DIELECTRIC, eta=1.5,
                                    reflectance=(1, 1, 1), transmittance=(1, 1, 1)),
    "thindielectric": host.MaterialSpec(bsdf_type=schema.BSDF_THINDIELECTRIC, eta=1.5,
                                        reflectance=(1, 1, 1), transmittance=(1, 1, 1)),
    "conductor": host.MaterialSpec(bsdf_type=schema.BSDF_CONDUCTOR, reflectance=(1, 1, 1)),
}


def _wi(B, z=0.6):
    w = jnp.tile(jnp.asarray([[np.sqrt(1 - z * z), 0.0, z]], jnp.float32), (B, 1))
    return w


@pytest.mark.parametrize("name", list(SMOOTH_SPECS))
def test_sample_pdf_eval_consistency(name):
    """weight == f/pdf and pdf(sample.wo) == sample.pdf for smooth samples."""
    B = 8192
    ctx = _make_ctx(SMOOTH_SPECS[name], B)
    wi = _wi(B)
    u = jnp.asarray(np.random.default_rng(1).random((B, 3)), jnp.float32)

    at = (SMOOTH_SPECS[name].bsdf_type,)

    @jax.jit
    def run():
        s = bsdfmod.sample(ctx, wi, u, active_types=at)
        lob = bsdfmod.evaluate(ctx, wi, s.wo, active_types=at)
        return s, lob

    s, lob = run()
    smooth = np.asarray((s.sampled_type & 0b110000) == 0) & (np.asarray(s.pdf) > 1e-5)
    w_direct = np.asarray(s.weight)[smooth]
    w_ratio = (np.asarray(lob.f) / np.maximum(np.asarray(lob.pdf), 1e-12)[:, None])[smooth]
    frac_bad = (np.abs(w_direct - w_ratio) > 0.02 * (1 + np.abs(w_ratio))).mean()
    assert frac_bad < 0.02, f"{name}: weight!=f/pdf for {frac_bad:.1%}"
    p_direct = np.asarray(s.pdf)[smooth]
    p_eval = np.asarray(lob.pdf)[smooth]
    frac_bad = (np.abs(p_direct - p_eval) > 0.02 * (1 + p_eval)).mean()
    assert frac_bad < 0.02, f"{name}: pdf mismatch for {frac_bad:.1%}"


@pytest.mark.parametrize("name", list(SMOOTH_SPECS))
def test_pdf_normalization(name):
    """int pdf(wo) dwo == 1 - P(delta) over the sphere (MC, uniform)."""
    B = 200_000
    ctx = _make_ctx(SMOOTH_SPECS[name], B)
    wi = _wi(B)
    u = jnp.asarray(np.random.default_rng(2).random((B, 2)), jnp.float32)

    at = (SMOOTH_SPECS[name].bsdf_type,)

    @jax.jit
    def run():
        wo = warp.square_to_uniform_sphere(u)
        p = bsdfmod.pdf(ctx, wi, wo, active_types=at)
        return jnp.mean(p) * 4.0 * jnp.pi

    # mass not visible to pdf(): delta components, plus samples rejected by the
    # sampler (e.g. VNDF micronormals mapping below the horizon -> zero weight)
    us = jnp.asarray(np.random.default_rng(3).random((B, 3)), jnp.float32)

    @jax.jit
    def hidden_mass():
        s = bsdfmod.sample(ctx, wi, us, active_types=at)
        is_delta = (s.sampled_type & 0b110000) != 0
        rejected = jnp.all(s.weight == 0.0, axis=-1)
        return jnp.mean(jnp.where(is_delta | rejected, 1.0, 0.0))

    total = float(run()) + float(hidden_mass())
    np.testing.assert_allclose(total, 1.0, atol=0.06), name


@pytest.mark.parametrize("name", list(SMOOTH_SPECS) + list(DELTA_SPECS))
def test_energy_conservation(name):
    """E[weight] <= 1 per channel (no energy creation), over random wi."""
    B = 100_000
    spec = (SMOOTH_SPECS | DELTA_SPECS)[name]
    ctx = _make_ctx(spec, B)
    r = np.random.default_rng(4)
    z = r.random(B) * 0.98 + 0.01
    phi = r.random(B) * 2 * np.pi
    s_ = np.sqrt(1 - z * z)
    wi = jnp.asarray(np.stack([s_ * np.cos(phi), s_ * np.sin(phi), z], -1), jnp.float32)
    u = jnp.asarray(r.random((B, 3)), jnp.float32)

    @jax.jit
    def run():
        s = bsdfmod.sample(ctx, wi, u, active_types=(spec.bsdf_type,))
        return jnp.mean(s.weight, axis=0)

    mean_w = np.asarray(run())
    assert (mean_w < 1.02).all(), f"{name}: creates energy {mean_w}"
    assert (mean_w > 0.01).all(), f"{name}: black {mean_w}"


def test_diffuse_weight_equals_albedo():
    B = 50_000
    ctx = _make_ctx(SMOOTH_SPECS["diffuse"], B)
    wi = _wi(B)
    u = jnp.asarray(np.random.default_rng(5).random((B, 3)), jnp.float32)
    s = jax.jit(lambda: bsdfmod.sample(ctx, wi, u, active_types=(schema.BSDF_DIFFUSE,)))()
    np.testing.assert_allclose(np.asarray(s.weight).mean(0), [0.7, 0.5, 0.3], atol=1e-3)


def test_dielectric_snell_and_tir():
    B = 4
    ctx = _make_ctx(DELTA_SPECS["dielectric"], B)
    # grazing from inside -> TIR: all samples reflect
    wi = jnp.tile(jnp.asarray([[0.98, 0.0, -0.2]], jnp.float32), (B, 1))
    u = jnp.asarray([[0.1, 0, 0], [0.5, 0, 0], [0.9, 0, 0], [0.99, 0, 0]], jnp.float32)
    at = (schema.BSDF_DIELECTRIC,)
    s = bsdfmod.sample(ctx, wi, u, active_types=at)
    assert np.asarray(s.wo[:, 2] < 0).all()  # stays inside

    # normal incidence from outside: 4% reflect, 96% refract
    wi = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (B, 1))
    s = bsdfmod.sample(ctx, wi, u, active_types=at)
    refl = np.asarray(s.wo[:, 2]) > 0
    assert refl[0] == False and refl[3] == False  # u=.1,.99 > F=.04 -> refract
    # refraction at normal incidence goes straight through
    np.testing.assert_allclose(np.asarray(s.wo[~refl]),
                               [[0, 0, -1]] * int((~refl).sum()), atol=1e-5)


def test_reciprocity_diffuse_conductor():
    """f(wi,wo)/cos_o == f(wo,wi)/cos_i for reciprocal BSDFs."""
    B = 1000
    r = np.random.default_rng(6)
    for name in ("diffuse", "roughconductor", "phong", "ward"):
        ctx = _make_ctx(SMOOTH_SPECS[name], B)
        a = vm.normalize(jnp.asarray(np.abs(r.normal(size=(B, 3))) * [1, 1, 1], jnp.float32))
        b = vm.normalize(jnp.asarray(np.abs(r.normal(size=(B, 3))), jnp.float32))
        at = (SMOOTH_SPECS[name].bsdf_type,)
        ev = jax.jit(lambda x, y: bsdfmod.evaluate(ctx, x, y, active_types=at).f)
        f_ab = np.asarray(ev(a, b)) / np.maximum(np.asarray(b[:, 2:3]), 1e-6)
        f_ba = np.asarray(ev(b, a)) / np.maximum(np.asarray(a[:, 2:3]), 1e-6)
        ok = np.abs(f_ab - f_ba) <= 0.02 * (1 + np.abs(f_ab))
        assert ok.mean() > 0.97, name


def test_two_sided_flip():
    B = 16
    ctx = _make_ctx(SMOOTH_SPECS["diffuse"], B)
    wi_down = jnp.tile(jnp.asarray([[0.4, 0.0, -0.9]], jnp.float32), (B, 1))
    wi_down = vm.normalize(wi_down)
    u = jnp.asarray(np.random.default_rng(7).random((B, 3)), jnp.float32)
    s = bsdfmod.sample(ctx, wi_down, u, active_types=(schema.BSDF_DIFFUSE,))
    # two-sided diffuse hit from below samples into the lower hemisphere
    assert np.asarray(s.wo[:, 2] < 0).all()
    assert np.asarray(s.weight > 0).any()
