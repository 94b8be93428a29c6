"""Alpha masks + bump mapping through the path tracer."""
import os
import numpy as np
import pytest

from cudatracerlib_tpu.models import path as pathmod
from cudatracerlib_tpu.scene import host, schema, sensors, shapes
from cudatracerlib_tpu.utils import transforms as tf


def _scene_with_mask(alpha_value):
    sc = host.DynamicScene()
    black = sc.add_material(host.MaterialSpec(reflectance=(0, 0, 0)))
    # emissive wall behind a masked occluder
    sc.create_node(shapes.rectangle(), black,
                   tf.compose(tf.translate([0, 0, 2]), tf.rotate_deg([0, 1, 0], 180),
                              tf.scale(4)), emission=(2.0, 2.0, 2.0))
    mask = host.TextureSpec(tex_type=schema.TEX_CONSTANT, value=(alpha_value,) * 3)
    occ = sc.add_material(host.MaterialSpec(reflectance=(0, 0, 0),
                                            tex_alpha_mask=mask))
    sc.create_node(shapes.rectangle(), occ,
                   tf.compose(tf.translate([0, 0, 1]), tf.rotate_deg([0, 1, 0], 180),
                              tf.scale(4)))
    sc.set_sensor(sensors.make_sensor(
        schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0, -2], [0, 0, 1]),
        fov_x_deg=20, film_w=16, film_h=16))
    return sc.build()


def test_alpha_mask_transmits_fraction():
    # opacity 0.25: 75% of rays pass through to the emitter -> pixel = 1.5
    scene = _scene_with_mask(0.25)
    tr = pathmod.PathTracer(scene, 16, 16, max_depth=4, spp_per_pass=1)
    img = np.asarray(tr.render(96))
    got = img[6:10, 6:10].mean()
    np.testing.assert_allclose(got, 2.0 * 0.75, rtol=0.1)


@pytest.mark.slow
def test_alpha_opaque_blocks():
    scene = _scene_with_mask(1.0)
    tr = pathmod.PathTracer(scene, 16, 16, max_depth=4, spp_per_pass=1)
    img = np.asarray(tr.render(8))
    assert img[6:10, 6:10].mean() < 0.05


@pytest.mark.slow
def test_bump_changes_shading():
    def build(with_bump):
        sc = host.DynamicScene()
        # smooth sine height field (checkerboards have zero FD gradient)
        yy, xx = np.meshgrid(np.linspace(0, 6 * np.pi, 32),
                             np.linspace(0, 6 * np.pi, 32), indexing="ij")
        height = (0.5 + 0.5 * np.sin(xx) * np.sin(yy)).astype(np.float32)
        img = np.repeat(height[..., None], 3, -1)
        bump = host.TextureSpec(tex_type=schema.TEX_IMAGE,
                                image=img) if with_bump else None
        m = sc.add_material(host.MaterialSpec(reflectance=(0.8, 0.8, 0.8),
                                              tex_bump=bump))
        sc.create_node(shapes.rectangle(), m,
                       tf.compose(tf.rotate_deg([1, 0, 0], -90), tf.scale(2)))
        sc.add_point_light((1.5, 2, 0), (6, 6, 6))
        sc.set_sensor(sensors.make_sensor(
            schema.SENSOR_PERSPECTIVE, tf.look_at([0, 2.5, -2.5], [0, 0, 0]),
            fov_x_deg=40, film_w=24, film_h=24))
        return sc.build()

    flat = np.asarray(pathmod.PathTracer(build(False), 24, 24, max_depth=2,
                                         spp_per_pass=1).render(12))
    bumped = np.asarray(pathmod.PathTracer(build(True), 24, 24, max_depth=2,
                                           spp_per_pass=1).render(12))
    assert np.isfinite(bumped).all()
    # same seeds: any difference comes from the perturbed shading normals
    diff = np.abs(bumped - flat)[8:20, 4:20].mean()
    base = flat[8:20, 4:20].mean()
    assert diff > 0.05 * base, (diff, base)


def test_mipmap_trilinear():
    """Large footprints read coarse mips: result approaches the image mean."""
    import jax.numpy as jnp
    from cudatracerlib_tpu.ops import texture as texmod
    r = np.random.default_rng(3)
    # 4-texel checker (1-texel checkers bilinear-blur to 0.5 even at mip 0)
    img = (((np.indices((64, 64)) // 4).sum(0) % 2) * 1.0).astype(np.float32)
    img = np.repeat(img[..., None], 3, -1)
    sc = host.DynamicScene()
    spec = host.TextureSpec(tex_type=schema.TEX_IMAGE, image=img)
    m = sc.add_material(host.MaterialSpec(tex_reflectance=spec))
    sc.create_node(shapes.rectangle(), m)
    sc.set_sensor(sensors.make_sensor(schema.SENSOR_PERSPECTIVE,
                                      tf.look_at([0, 0, -3], [0, 0, 0]),
                                      film_w=8, film_h=8))
    scene = sc.build()
    assert int(scene.textures.img_nmips[0]) >= 6  # full chain built
    B = 256
    uv = jnp.asarray(r.random((B, 2)), jnp.float32)
    tex_id = jnp.zeros(B, jnp.int32)
    default = jnp.zeros((B, 3))
    fine = texmod.eval_texture(scene.textures, tex_id, uv, default,
                               uv_footprint=jnp.full(B, 1e-6))
    coarse = texmod.eval_texture(scene.textures, tex_id, uv, default,
                                 uv_footprint=jnp.full(B, 1.0))
    # fine level: binary texels; coarse: averaged to ~0.5
    assert np.asarray(fine).std() > 0.3
    np.testing.assert_allclose(np.asarray(coarse), 0.5, atol=0.05)


def test_dispersive_glass_channels():
    """Dispersive dielectric: monochromatic transmission, blue bends more."""
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_bsdf import _make_ctx
    from cudatracerlib_tpu.models import bsdf as bsdfmod
    spec = host.MaterialSpec(bsdf_type=schema.BSDF_DIELECTRIC, eta=1.45,
                             dispersion_b=0.02, two_sided=False)
    B = 20000
    ctx = _make_ctx(spec, B)
    wi = jnp.tile(jnp.asarray([[0.6, 0.0, 0.8]]), (B, 1))
    u = jnp.asarray(np.random.default_rng(0).random((B, 3)), np.float32)
    s = bsdfmod.sample(ctx, wi, u, active_types=(schema.BSDF_DIELECTRIC,))
    w = np.asarray(s.weight)
    assert ((w > 0).sum(1) == 1).all()  # every sample is single-channel
    trans = np.asarray(s.wo[:, 2]) < 0
    wo = np.asarray(s.wo)[trans]
    wt = w[trans]
    x_red = wo[wt[:, 0] > 0][:, 0].mean()
    x_blue = wo[wt[:, 2] > 0][:, 0].mean()
    assert x_blue > x_red  # higher IOR -> refracts closer to the normal
    # roulette compensation keeps energy right: E[w_c] ~ equal across channels
    m = w.mean(0)
    assert m.max() / m.min() < 1.2


def test_preetham_sunsky():
    from cudatracerlib_tpu.scene import sunsky
    img = sunsky.preetham_sky((0.4, 0.6, 0.4), turbidity=3.0, resolution=32)
    assert img.shape == (32, 64, 3) and np.isfinite(img).all()
    zen = img[1].mean(0)
    assert zen[2] > zen[0]            # blue zenith
    assert img.max() > 100            # sun disc present
    no_sun = sunsky.preetham_sky((0.4, 0.6, 0.4), with_sun=False, resolution=32)
    assert no_sun.max() < 50


def test_ewa_beats_trilinear_at_grazing():
    """Anisotropic (EWA-style) filtering must reconstruct an elongated
    footprint better than isotropic trilinear at either the minor (aliases)
    or major (overblurs) width — reference Engine/MIPMap_device.h:57-83."""
    import jax.numpy as jnp
    import numpy as np
    from cudatracerlib_tpu.ops import texture as texmod
    from cudatracerlib_tpu.scene import host, schema

    # vertical stripes: high frequency along u, constant along v
    n = 128
    img = np.zeros((n, n, 3), np.float32)
    img[:, ::2] = 1.0
    sc = host.DynamicScene()
    spec = host.TextureSpec(tex_type=schema.TEX_IMAGE, image=img)
    sc.add_material(host.MaterialSpec(reflectance=(1, 1, 1),
                                      tex_reflectance=spec))
    from cudatracerlib_tpu.scene import sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf
    sc.create_node(shapes.rectangle(), 0)
    sc.set_sensor(sensors.make_sensor(schema.SENSOR_PERSPECTIVE, tf.look_at(
        [0, 0, -3], [0, 0, 0]), film_w=8, film_h=8))
    scene = sc.build()
    tex = scene.textures

    B = 64
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    tid = jnp.zeros(B, jnp.int32)
    default = jnp.zeros((B, 3))
    # footprint: minor covers ~2 texels, major stretches 16x along v
    minor = jnp.full(B, 2.0 / n)
    major = minor * 16.0
    e_dir = jnp.tile(jnp.asarray([[1.0, 0.0]]), (B, 1))  # stretch across stripes

    # ground truth: supersample bilinear over the elongated footprint
    S = 32
    acc = jnp.zeros((B, 3))
    for k in range(S):
        t = (k + 0.5) / S - 0.5
        uv_k = uv + e_dir * (major[:, None] * t)
        acc = acc + texmod.eval_texture(tex, tid, uv_k, default)
    truth = np.asarray(acc / S)

    ewa = np.asarray(texmod.eval_texture(tex, tid, uv, default,
                                         uv_footprint=minor,
                                         ewa_dir=e_dir, ewa_major=major))
    tri_minor = np.asarray(texmod.eval_texture(tex, tid, uv, default,
                                               uv_footprint=minor))
    tri_major = np.asarray(texmod.eval_texture(tex, tid, uv, default,
                                               uv_footprint=major))
    e_ewa = np.mean((ewa - truth) ** 2)
    e_min = np.mean((tri_minor - truth) ** 2)
    e_maj = np.mean((tri_major - truth) ** 2)
    assert e_ewa < e_min, (e_ewa, e_min)
    assert e_ewa < e_maj * 1.05, (e_ewa, e_maj)


def test_parallax_occlusion_shift():
    """Parallax-occlusion mapping (reference Material.cu:45-110): a uniform
    height h shifts the sampled uv by slope * (1 - h) toward the viewer."""
    import jax.numpy as jnp
    import numpy as np
    from cudatracerlib_tpu.models import bsdf as bsdfmod
    from cudatracerlib_tpu.ops import shading
    from cudatracerlib_tpu.scene import host, schema, sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf

    h_val = 0.25
    img = np.full((8, 8, 3), h_val, np.float32)
    sc = host.DynamicScene()
    sc.add_material(host.MaterialSpec(
        reflectance=(1, 1, 1),
        tex_bump=host.TextureSpec(tex_type=schema.TEX_IMAGE, image=img),
        parallax_scale=0.1))
    sc.create_node(shapes.rectangle(), 0)
    sc.set_sensor(sensors.make_sensor(schema.SENSOR_PERSPECTIVE,
                                      tf.look_at([0, 0, -3], [0, 0, 0]),
                                      film_w=4, film_h=4))
    scene = sc.build()
    assert bsdfmod.scene_has_parallax(scene)

    B = 4
    wi = jnp.tile(jnp.asarray([[0.6, 0.0, 0.8]]), (B, 1))  # oblique viewer
    si = shading.SurfaceInteraction(
        valid=jnp.ones(B, bool), p=jnp.zeros((B, 3)), t=jnp.ones(B),
        ng=jnp.tile(jnp.asarray([[0., 0., 1.]]), (B, 1)),
        ns=jnp.tile(jnp.asarray([[0., 0., 1.]]), (B, 1)),
        uv=jnp.full((B, 2), 0.5),
        frame_t=jnp.tile(jnp.asarray([[1., 0., 0.]]), (B, 1)),
        frame_s=jnp.tile(jnp.asarray([[0., 1., 0.]]), (B, 1)),
        bary=jnp.zeros((B, 2)), mat_id=jnp.zeros(B, jnp.int32),
        light_id=jnp.full(B, -1, jnp.int32), tri=jnp.zeros(B, jnp.int32),
        wi=wi, flipped=jnp.zeros(B, bool), uv_density=jnp.ones(B))
    out = bsdfmod.apply_parallax(scene, si)
    # slope = (vx/vz) * scale = 0.75 * 0.1; expected shift = slope*(1 - h)
    expect = 0.075 * (1.0 - h_val)
    got = float(np.asarray(si.uv[0, 0] - out.uv[0, 0]))
    np.testing.assert_allclose(got, expect, rtol=0.2)
    assert abs(float(np.asarray(out.uv[0, 1] - si.uv[0, 1]))) < 1e-4


def test_cone_step_parallax_matches_dense_march():
    """Cone-step POM (scene/conemap.py; reference relaxed cone maps,
    Engine/MIPMap.cu:404) against a dense 256-step linear march on a bumpy
    height field: the conservative cone map must land on the same first
    intersection, and never overshoot it."""
    import jax.numpy as jnp
    import numpy as np
    from cudatracerlib_tpu.models import bsdf as bsdfmod
    from cudatracerlib_tpu.ops import shading
    from cudatracerlib_tpu.scene import conemap, host, schema, sensors, shapes
    from cudatracerlib_tpu.utils import transforms as tf

    rng = np.random.default_rng(3)
    H = W = 32
    yy, xx = np.meshgrid(np.linspace(0, 2 * np.pi, H, endpoint=False),
                         np.linspace(0, 2 * np.pi, W, endpoint=False),
                         indexing="ij")
    hm = (0.5 + 0.25 * np.sin(2 * xx) * np.cos(3 * yy)).astype(np.float32)
    img = np.repeat(hm[..., None], 3, axis=-1)

    sc = host.DynamicScene()
    sc.add_material(host.MaterialSpec(
        reflectance=(1, 1, 1),
        tex_bump=host.TextureSpec(tex_type=schema.TEX_IMAGE, image=img),
        parallax_scale=0.15))
    sc.create_node(shapes.rectangle(), 0)
    sc.set_sensor(sensors.make_sensor(schema.SENSOR_PERSPECTIVE,
                                      tf.look_at([0, 0, -3], [0, 0, 0]),
                                      film_w=4, film_h=4))
    scene = sc.build()
    assert scene.textures.img_cone is not None
    assert int(np.asarray(scene.textures.img_cone).max()) >= 0

    B = 64
    ang = np.linspace(0, 2 * np.pi, B, endpoint=False)
    wi = np.stack([0.55 * np.cos(ang), 0.55 * np.sin(ang),
                   np.full(B, 0.835)], -1)
    wi = (wi / np.linalg.norm(wi, axis=1, keepdims=True)).astype(np.float32)
    uv0 = rng.random((B, 2)).astype(np.float32)
    si = shading.SurfaceInteraction(
        valid=jnp.ones(B, bool), p=jnp.zeros((B, 3)), t=jnp.ones(B),
        ng=jnp.tile(jnp.asarray([[0., 0., 1.]]), (B, 1)),
        ns=jnp.tile(jnp.asarray([[0., 0., 1.]]), (B, 1)),
        uv=jnp.asarray(uv0),
        frame_t=jnp.tile(jnp.asarray([[1., 0., 0.]]), (B, 1)),
        frame_s=jnp.tile(jnp.asarray([[0., 1., 0.]]), (B, 1)),
        bary=jnp.zeros((B, 2)), mat_id=jnp.zeros(B, jnp.int32),
        light_id=jnp.full(B, -1, jnp.int32), tri=jnp.zeros(B, jnp.int32),
        wi=jnp.asarray(wi), flipped=jnp.zeros(B, bool),
        uv_density=jnp.ones(B))

    out = bsdfmod.apply_parallax(scene, si, n_steps=8, n_refine=8)
    d_cone = np.linalg.norm(np.asarray(out.uv) - uv0, axis=1)

    # dense reference march (256 uniform steps + exact bracketing)
    from cudatracerlib_tpu.ops import texture as texmod
    slope = wi[:, :2] / wi[:, 2:3] * 0.15
    bump_id = jnp.zeros(B, jnp.int32)
    zero3 = jnp.zeros((B, 3))
    d_ref = np.ones(B, np.float32)
    found = np.zeros(B, bool)
    for k in range(1, 257):
        d = k / 256.0
        uv_k = jnp.asarray(uv0) - jnp.asarray(slope) * d
        hgt = np.asarray(texmod.eval_texture(scene.textures, bump_id,
                                             uv_k, zero3)[:, 0])
        below = d >= 1.0 - hgt
        d_ref = np.where(below & ~found, d, d_ref)
        found |= below
    d_exp = d_ref * np.linalg.norm(slope, axis=1)
    # same first intersection within a coarse-march tolerance, and the
    # conservative map must never land PAST it
    np.testing.assert_allclose(d_cone, d_exp, atol=0.01)
    assert (d_cone <= d_exp + 0.005).all()


def test_quad_pool_matches_per_corner_fetches():
    """The quad-packed texel pool (one gather per bilinear tap) reproduces the
    per-corner fetch path exactly, including wrap at image edges, across all
    mip levels and EWA taps."""
    import jax.numpy as jnp
    from cudatracerlib_tpu.ops import texture as texmod
    r = np.random.default_rng(7)
    img = r.random((48, 80, 3)).astype(np.float32)  # non-square, non-pow2 w
    sc = host.DynamicScene()
    spec = host.TextureSpec(tex_type=schema.TEX_IMAGE, image=img,
                            uv_scale=(3.0, 2.0), uv_offset=(0.1, -0.3))
    m = sc.add_material(host.MaterialSpec(tex_reflectance=spec))
    sc.create_node(shapes.rectangle(), m)
    sc.set_sensor(sensors.make_sensor(schema.SENSOR_PERSPECTIVE,
                                      tf.look_at([0, 0, -3], [0, 0, 0]),
                                      film_w=8, film_h=8))
    scene = sc.build()
    tex = scene.textures
    assert tex.texels_quad is not None
    B = 512
    # uv straddling edges/outside [0,1) to exercise the wrap path
    uv = jnp.asarray(r.random((B, 2)) * 2.5 - 0.7, jnp.float32)
    tex_id = jnp.zeros(B, jnp.int32)
    default = jnp.zeros((B, 3))
    fp = jnp.asarray(np.exp(r.uniform(np.log(1e-6), np.log(1.0), B)), jnp.float32)
    ewa_d = jnp.asarray(r.standard_normal((B, 2)), jnp.float32)
    ewa_d = ewa_d / jnp.linalg.norm(ewa_d, axis=-1, keepdims=True)
    ewa_m = fp * 4.0
    tex_flat = tex._replace(texels_quad=None)
    for kw in ({}, {"uv_footprint": fp},
               {"uv_footprint": fp, "ewa_dir": ewa_d, "ewa_major": ewa_m}):
        got = texmod.eval_texture(tex, tex_id, uv, default, **kw)
        want = texmod.eval_texture(tex_flat, tex_id, uv, default, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)


def test_hero_wavelength_dispersion_continuous():
    """With ctx.lam_um set (spectral integrator), a dispersive dielectric
    refracts with the CONTINUOUS Cauchy eta(lambda_hero): refraction angle
    varies monotonically with wavelength (not 3 discrete RGB channels), and
    no channel roulette masks the weight."""
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_bsdf import _make_ctx
    from cudatracerlib_tpu.models import bsdf as bsdfmod
    spec = host.MaterialSpec(bsdf_type=schema.BSDF_DIELECTRIC, eta=1.45,
                             dispersion_b=0.02, two_sided=False)
    B = 256
    lam_nm = np.linspace(380.0, 720.0, B).astype(np.float32)
    ctx = _make_ctx(spec, B)._replace(lam_um=jnp.asarray(lam_nm) * 1e-3)
    wi = jnp.tile(jnp.asarray([[0.6, 0.0, 0.8]]), (B, 1))
    u = jnp.tile(jnp.asarray([[0.999, 0.5, 0.5]]), (B, 1))  # force refraction
    s = bsdfmod.sample(ctx, wi, u, active_types=(schema.BSDF_DIELECTRIC,))
    wo = np.asarray(s.wo)
    assert (wo[:, 2] < 0).all()                      # all transmitted
    x = wo[:, 0]
    # shorter lambda -> higher eta -> bends closer to the normal: |x| shrinks
    # strictly and measurably as lambda decreases
    assert (np.diff(np.abs(x)) > 0).all()
    assert abs(x[-1]) - abs(x[0]) > 0.01
    w = np.asarray(s.weight)
    assert ((w > 0).sum(1) == 3).all()               # no channel masking


def test_spectral_dispersion_renders_rainbow():
    """Spectral PT through a dispersive slab: the hero-wavelength collapse
    keeps the render finite and energy-sane, and produces hue variation that
    the RGB 3-channel roulette quantizes."""
    from cudatracerlib_tpu.models import path as pathmod
    from cudatracerlib_tpu.scene import sensors
    from cudatracerlib_tpu.utils import transforms as tf
    sc = host.DynamicScene()
    white = sc.add_material(host.MaterialSpec(reflectance=(0.8, 0.8, 0.8)))
    glass = sc.add_material(host.MaterialSpec(
        bsdf_type=schema.BSDF_DIELECTRIC, eta=1.45, dispersion_b=0.05,
        two_sided=False))
    # emissive backdrop seen through a tilted glass slab
    sc.create_node(shapes.rectangle(), white,
                   tf.compose(tf.translate([0, 0, 3]),
                              tf.rotate_deg([0, 1, 0], 180), tf.scale(6)),
                   emission=(4.0, 4.0, 4.0))
    sc.create_node(shapes.rectangle(), glass,
                   tf.compose(tf.translate([0, 0, 1]),
                              tf.rotate_deg([0, 1, 0], 160), tf.scale(4)))
    sc.set_sensor(sensors.make_sensor(
        schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0, -2], [0, 0, 1]),
        fov_x_deg=30, film_w=16, film_h=16))
    scene = sc.build()
    tr = pathmod.PathTracer(scene, 16, 16, max_depth=4, chunk_size=256,
                            spectral=4)
    img = np.asarray(tr.render(8))
    assert np.isfinite(img).all() and img.mean() > 0.05
    # collapse bookkeeping: energy within 30% of the RGB-roulette render
    tr_rgb = pathmod.PathTracer(scene, 16, 16, max_depth=4, chunk_size=256)
    img_rgb = np.asarray(tr_rgb.render(8))
    assert abs(img.mean() - img_rgb.mean()) / img_rgb.mean() < 0.3


class TestAlphaBlendModes:
    """Binary alpha-test modes (reference AlphaBlendState, Engine/Material.h:13-35)."""

    @staticmethod
    def _eval(spec, uv=(0.5, 0.5)):
        import jax.numpy as jnp
        from cudatracerlib_tpu.models import bsdf as bsdfmod
        sc = host.DynamicScene()
        m = sc.add_material(spec)
        sc.create_node(shapes.rectangle(), m)
        sc.set_sensor(sensors.make_sensor(
            schema.SENSOR_PERSPECTIVE, tf.look_at([0, 0, -2], [0, 0, 1]),
            film_w=4, film_h=4))
        scene = sc.build()
        mat_id = jnp.full(4, m, jnp.int32)
        uvs = jnp.tile(jnp.asarray([uv], jnp.float32), (4, 1))
        return float(np.asarray(bsdfmod.eval_alpha(scene, mat_id, uvs))[0]), scene

    def _mask(self, value):
        return host.TextureSpec(tex_type=schema.TEX_CONSTANT, value=value)

    def test_mode0_is_continuous(self):
        a, _ = self._eval(host.MaterialSpec(tex_alpha_mask=self._mask((0.25,) * 3)))
        np.testing.assert_allclose(a, 0.25, atol=1e-5)

    def test_luminance_threshold_binary(self):
        bright = host.MaterialSpec(tex_alpha_mask=self._mask((0.9, 0.9, 0.9)),
                                   alpha_mode=schema.ALPHA_LUMINANCE, alpha_test=0.5)
        dark = host.MaterialSpec(tex_alpha_mask=self._mask((0.1, 0.1, 0.1)),
                                 alpha_mode=schema.ALPHA_LUMINANCE, alpha_test=0.5)
        assert self._eval(bright)[0] == 1.0
        assert self._eval(dark)[0] == 0.0

    def test_alpha_channel_mode(self):
        spec = host.MaterialSpec(tex_alpha_mask=self._mask((0.6, 0.0, 0.0)),
                                 alpha_mode=schema.ALPHA_ALPHA, alpha_test=0.5)
        assert self._eval(spec)[0] == 1.0
        spec2 = host.MaterialSpec(tex_alpha_mask=self._mask((0.4, 0.0, 0.0)),
                                  alpha_mode=schema.ALPHA_ALPHA, alpha_test=0.5)
        assert self._eval(spec2)[0] == 0.0

    def test_color_match_mode(self):
        key = (0.2, 0.8, 0.3)
        spec = host.MaterialSpec(tex_alpha_mask=self._mask(key),
                                 alpha_mode=schema.ALPHA_COLOR, alpha_test=0.05,
                                 alpha_test_color=key)
        assert self._eval(spec)[0] == 1.0  # matches the key color -> survives
        spec2 = host.MaterialSpec(tex_alpha_mask=self._mask((0.9, 0.1, 0.1)),
                                  alpha_mode=schema.ALPHA_COLOR, alpha_test=0.05,
                                  alpha_test_color=key)
        assert self._eval(spec2)[0] == 0.0

    def test_reflectance_source_flag(self):
        # no alpha-mask texture at all: mode&4 samples the reflectance slot
        refl = host.TextureSpec(tex_type=schema.TEX_CONSTANT, value=(0.9,) * 3)
        spec = host.MaterialSpec(
            tex_reflectance=refl,
            alpha_mode=schema.ALPHA_LUMINANCE | schema.ALPHA_SRC_REFLECTANCE,
            alpha_test=0.5)
        a, scene = self._eval(spec)
        assert a == 1.0
        from cudatracerlib_tpu.models import bsdf as bsdfmod
        assert bsdfmod.scene_has_alpha(scene)  # mode != 0 counts even w/o mask tex

    def test_mitsuba_alpha_mode_parse(self, tmp_path):
        xml = """<scene version="0.5.0">
          <bsdf type="mask" id="cutout">
            <texture type="checkerboard" name="opacity"/>
            <string name="alphaMode" value="luminance"/>
            <float name="alphaTest" value="0.6"/>
            <bsdf type="diffuse"/>
          </bsdf>
          <shape type="rectangle"><ref id="cutout"/></shape>
          <sensor type="perspective">
            <film type="hdrfilm"><integer name="width" value="8"/>
              <integer name="height" value="8"/></film>
          </sensor>
        </scene>"""
        from cudatracerlib_tpu.scene.loader import mitsuba
        p = tmp_path / "alpha.xml"
        p.write_text(xml)
        sc, _ = mitsuba.load_mitsuba(str(p))
        scene = sc.build()
        meta = schema.host_meta(scene)
        assert (meta["mat_alpha_mode"] == schema.ALPHA_LUMINANCE).any()


def test_ewa_matches_bruteforce_ellipse():
    """True EWA (gaussian LUT taps + eccentricity clamp) vs a brute-force
    supersampled elliptical gaussian footprint on a checker at grazing
    anisotropy. Reference: Engine/MIPMap_device.h:57-83 ellipse walk."""
    import jax.numpy as jnp
    from cudatracerlib_tpu.ops import texture as texmod

    # 8-texel checker, 128x128 -> high frequency along both axes
    img = (((np.indices((128, 128)) // 8).sum(0) % 2) * 1.0).astype(np.float32)
    img = np.repeat(img[..., None], 3, -1)
    sc = host.DynamicScene()
    spec = host.TextureSpec(tex_type=schema.TEX_IMAGE, image=img)
    m = sc.add_material(host.MaterialSpec(tex_reflectance=spec))
    sc.create_node(shapes.rectangle(), m)
    sc.set_sensor(sensors.make_sensor(schema.SENSOR_PERSPECTIVE,
                                      tf.look_at([0, 0, -3], [0, 0, 0]),
                                      film_w=8, film_h=8))
    scene = sc.build()

    r = np.random.default_rng(11)
    B = 512
    uv = r.random((B, 2)).astype(np.float32)
    minor = np.full(B, 2.0 / 128, np.float32)        # ~2 texels
    major = minor * 16.0                              # strongly anisotropic
    theta = r.random(B).astype(np.float32) * np.pi
    edir = np.stack([np.cos(theta), np.sin(theta)], -1)

    tex_id = jnp.zeros(B, jnp.int32)
    default = jnp.zeros((B, 3))

    def run(fp, ed=None, em=None):
        kw = {}
        if ed is not None:
            kw = dict(ewa_dir=jnp.asarray(ed), ewa_major=jnp.asarray(em))
        return np.asarray(texmod.eval_texture(
            scene.textures, tex_id, jnp.asarray(uv), default,
            uv_footprint=jnp.asarray(fp), **kw))

    ewa = run(minor, edir, major)
    tri_minor = run(minor)            # aliases along the major axis
    tri_major = run(major)            # over-blurs the minor axis

    # ground truth: dense elliptical gaussian quadrature over mip 0 texels
    perp = np.stack([-edir[:, 1], edir[:, 0]], -1)
    N = 33
    s = np.linspace(-1, 1, N, dtype=np.float32)
    s1, s2 = np.meshgrid(s, s, indexing="ij")
    wgt = np.exp(-2.0 * (s1**2 + s2**2)) - np.exp(-2.0)
    wgt = np.maximum(wgt, 0.0).ravel()
    truth = np.zeros((B, 3), np.float32)
    H, W = 128, 128
    for k, (a, b) in enumerate(zip(s1.ravel(), s2.ravel())):
        p = (uv + edir * (major * 0.5 * a)[:, None]
             + perp * (minor * 0.5 * b)[:, None])
        x = (p[:, 0] % 1.0) * W - 0.5
        y = ((1.0 - p[:, 1] % 1.0) % 1.0) * H - 0.5
        x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
        fx, fy = (x - x0)[:, None], (y - y0)[:, None]
        g = lambda xi, yi: img[yi % H, xi % W]
        c = (g(x0, y0) * (1 - fx) * (1 - fy) + g(x0 + 1, y0) * fx * (1 - fy)
             + g(x0, y0 + 1) * (1 - fx) * fy + g(x0 + 1, y0 + 1) * fx * fy)
        truth += wgt[k] * c
    truth /= wgt.sum()

    rmse = lambda a: float(np.sqrt(((a - truth) ** 2).mean()))
    e_ewa, e_min, e_maj = rmse(ewa), rmse(tri_minor), rmse(tri_major)
    # EWA must beat BOTH isotropic extremes by a clear margin...
    assert e_ewa < 0.6 * e_min, (e_ewa, e_min)
    assert e_ewa < 0.6 * e_maj, (e_ewa, e_maj)
    # ...and be close to the reference-quality filter in absolute terms
    assert e_ewa < 0.08, e_ewa
