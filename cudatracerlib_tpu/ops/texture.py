"""Texture evaluation (reference: ``SceneTypes/Texture.h`` + ``Engine/MIPMap``).

Batched, branchless: all texture types are cheap closed forms except images,
which gather from the flat texel pool. Trilinear mip selection arrives with ray
differentials; bilinear from mip 0 is the default path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene import schema

Array = jax.Array


def eval_texture(tex: schema.TextureTable, tex_id: Array, uv: Array,
                 default: Array) -> Array:
    """Evaluate texture rows for a lane batch.

    tex_id: (B,) i32 (-1 = use `default`); uv: (B, 2); default: (B, 3).
    """
    tid = jnp.maximum(tex_id, 0)
    ttype = jnp.take(tex.tex_type, tid)
    p = jnp.take(tex.params, tid, axis=0)
    u = uv[..., 0] * p[:, 6] + p[:, 8]
    v = uv[..., 1] * p[:, 7] + p[:, 9]

    c_const = p[:, 0:3]

    # checkerboard: color0 / color1 on integer parity
    iu = jnp.floor(u).astype(jnp.int32)
    iv = jnp.floor(v).astype(jnp.int32)
    par = (iu + iv) & 1
    c_checker = jnp.where((par == 0)[:, None], p[:, 0:3], p[:, 3:6])

    # bilerp between color0 (at 0,0 / 1,1) and color1 via uv
    fu, fv = u % 1.0, v % 1.0
    w = fu * fv + (1 - fu) * (1 - fv)
    c_bilerp = w[:, None] * p[:, 0:3] + (1 - w)[:, None] * p[:, 3:6]

    # uv debug
    c_uv = jnp.stack([u % 1.0, v % 1.0, jnp.zeros_like(u)], axis=-1)

    # image: bilinear from mip 0 of the atlas
    c_image = _sample_image(tex, tid, u, v)

    # wireframe: distance to nearest triangle edge is integrator-side; here
    # approximate with uv-grid lines (exact version uses barycentrics)
    bu, bv = u % 1.0, v % 1.0
    edge = (jnp.minimum(jnp.minimum(bu, bv), jnp.minimum(1 - bu, 1 - bv)) < 0.05)
    c_wire = jnp.where(edge[:, None], p[:, 0:3], p[:, 3:6])

    out = c_const
    out = jnp.where((ttype == schema.TEX_CHECKERBOARD)[:, None], c_checker, out)
    out = jnp.where((ttype == schema.TEX_BILERP)[:, None], c_bilerp, out)
    out = jnp.where((ttype == schema.TEX_IMAGE)[:, None], c_image, out)
    out = jnp.where((ttype == schema.TEX_UV)[:, None], c_uv, out)
    out = jnp.where((ttype == schema.TEX_WIREFRAME)[:, None], c_wire, out)
    return jnp.where((tex_id >= 0)[:, None], out, default)


def _sample_image(tex: schema.TextureTable, tid: Array, u: Array, v: Array) -> Array:
    img = jnp.maximum(jnp.take(tex.image_id, tid), 0)
    off = jnp.take(tex.img_offset[:, 0], img)
    w = jnp.take(tex.img_w[:, 0], img)
    h = jnp.take(tex.img_h[:, 0], img)
    # wrap repeat; v flipped (uv origin bottom-left, image row 0 on top)
    x = (u % 1.0) * w.astype(jnp.float32) - 0.5
    y = ((1.0 - v % 1.0) % 1.0) * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)

    def fetch(xi, yi):
        xi = xi % w
        yi = yi % h
        return jnp.take(tex.texels, off + yi * w + xi, axis=0)

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    fx = fx[:, None]
    fy = fy[:, None]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)
