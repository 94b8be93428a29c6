"""ExtraDataTexture: barycentric-interpolated per-vertex extra data reaches
the texture system (reference SceneTypes/Texture.h:234 — closes the last
SceneTypes stub from the round-2 review)."""
import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.ops import texture as texmod
from cudatracerlib_tpu.ops import shading, traversal
from cudatracerlib_tpu.scene import schema
from cudatracerlib_tpu.utils import example_scenes


def test_fill_dg_interpolates_extra():
    scene = example_scenes.cornell_box(16, 16).build()
    g = scene.geom
    T = g.shade.shape[0]
    # write distinct per-vertex extra data onto every triangle
    shade = np.asarray(g.shade).copy()
    shade[:, 26] = 0.0
    shade[:, 27] = 1.0
    shade[:, 28] = 2.0
    g2 = g._replace(shade=jnp.asarray(shade))
    B = 8
    hit = traversal.Hit(t=jnp.ones(B), tri=jnp.zeros(B, jnp.int32),
                        u=jnp.linspace(0.0, 0.5, B), v=jnp.full(B, 0.25))
    rays = traversal.Rays(o=jnp.zeros((B, 3)),
                          d=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1)),
                          tmin=jnp.zeros(B), tmax=jnp.ones(B))
    si = shading.fill_dg(g2, rays, hit)
    expect = np.asarray(hit.u) * 1.0 + np.asarray(hit.v) * 2.0
    np.testing.assert_allclose(np.asarray(si.extra), expect, atol=1e-6)


def test_extradata_texture_eval():
    scene = example_scenes.cornell_box(16, 16).build()
    tex = scene.textures
    # append an EXTRADATA texture row with a red tint
    X = tex.tex_type.shape[0]
    tex2 = tex._replace(
        tex_type=jnp.concatenate([tex.tex_type,
                                  jnp.asarray([schema.TEX_EXTRADATA])]),
        params=jnp.concatenate([
            tex.params,
            jnp.asarray([[2.0, 0.0, 0.0] + [0.0] * 3
                         + [1.0, 1.0, 0.0, 0.0]
                         + [0.0] * (schema.N_TEX_PARAMS - 10)])]),
        image_id=jnp.concatenate([tex.image_id, jnp.asarray([-1])]))
    B = 4
    uv = jnp.zeros((B, 2))
    extra = jnp.asarray([0.0, 0.5, 1.0, 2.0])
    out = texmod.eval_texture(tex2, jnp.full(B, X, jnp.int32), uv,
                              jnp.zeros((B, 3)), extra=extra)
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.asarray(extra) * 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 1]), 0.0, atol=1e-6)
