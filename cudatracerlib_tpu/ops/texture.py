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

# True-EWA quadrature along the footprint's major axis (reference ellipse
# walk: Engine/MIPMap_device.h:57-83). The eccentricity clamp mirrors the
# reference's minor-axis scaling so EWA_N_TAPS probes always suffice.
EWA_MAX_ANISO = 8.0
EWA_N_TAPS = 9


def eval_texture(tex: schema.TextureTable, tex_id: Array, uv: Array,
                 default: Array, uv_footprint: Array | None = None,
                 ewa_dir: Array | None = None,
                 ewa_major: Array | None = None,
                 extra: Array | None = None) -> Array:
    """Evaluate texture rows for a lane batch.

    tex_id: (B,) i32 (-1 = use `default`); uv: (B, 2); default: (B, 3).
    uv_footprint: optional (B,) pixel footprint in UV units (ray-cone width *
    uv density); each image picks its mip level from it (trilinear).
    ewa_dir/ewa_major: optional anisotropy — unit uv-space direction of the
    footprint's MAJOR axis and its length. Images are then filtered with
    gaussian-weighted taps along the major axis at the minor-axis LOD
    (the TPU-friendly fixed-tap equivalent of the reference's EWA ellipse
    loop, Engine/MIPMap_device.h:57-83: same effect — sharp at grazing
    angles without the trilinear over/under-blur tradeoff).
    """
    tid = jnp.maximum(tex_id, 0)
    # one fat-row gather: [type | params | image_id] (width-free on TPU)
    bits = lambda a: jax.lax.bitcast_convert_type(a.astype(jnp.int32), jnp.float32)
    fat = jnp.concatenate([bits(tex.tex_type)[:, None], tex.params,
                           bits(tex.image_id)[:, None]], axis=1)
    row = jnp.take(fat, tid, axis=0)
    ttype = jax.lax.bitcast_convert_type(row[:, 0], jnp.int32)
    p = row[:, 1:1 + tex.params.shape[1]]
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

    # image: bilinear (mip 0), trilinear (ray-cone footprint), or EWA-style
    # anisotropic taps from the atlas
    if uv_footprint is None:
        c_image = _sample_image(tex, tid, u, v)
    else:
        img_row = jnp.maximum(
            jax.lax.bitcast_convert_type(row[:, -1], jnp.int32), 0)
        nm = jnp.take(tex.img_nmips, img_row)
        w0 = jnp.take(tex.img_w[:, 0], img_row).astype(jnp.float32)
        minor = uv_footprint
        if ewa_dir is not None:
            # eccentricity clamp (reference MIPMap_device.h:61-66 scales the
            # minor axis when the ellipse is too eccentric): widening the
            # minor axis raises the LOD so the fixed tap count still covers
            # the whole ellipse without aliasing
            major_c = jnp.maximum(ewa_major, minor)
            minor = jnp.maximum(minor, major_c / EWA_MAX_ANISO)
        texels_covered = minor * jnp.abs(p[:, 6]) * w0
        lod = jnp.log2(jnp.maximum(texels_covered, 1.0))
        l = jnp.clip(lod, 0.0, nm.astype(jnp.float32) - 1.0)
        l0 = jnp.floor(l).astype(jnp.int32)
        fl = (l - l0.astype(jnp.float32))[:, None]

        def tri_at(uu, vv):
            c_lo = _sample_image(tex, tid, uu, vv, l0)
            c_hi = _sample_image(tex, tid, uu, vv, jnp.minimum(l0 + 1, nm - 1))
            return c_lo * (1 - fl) + c_hi * fl

        if ewa_dir is None:
            c_image = tri_at(u, v)
        else:
            # True EWA along the footprint's major axis: fixed-count probes
            # (data-independent; TPU has no per-lane loop bounds) placed over
            # the ellipse extent not already covered by the trilinear minor
            # width, weighted by the reference's gaussian falloff LUT
            # w(r^2) = exp(-2 r^2) - exp(-2) (Engine/MIPMap_device.h:57-83
            # builds exactly this table; here the closed form replaces the
            # 128-entry LUT since taps are compile-time constants).
            span = jnp.maximum(major_c - minor, 0.0)
            # tap offsets are in RAW uv; scale into the texture's mapped uv
            du = ewa_dir[:, 0] * span * p[:, 6]
            dv = ewa_dir[:, 1] * span * p[:, 7]
            import math
            n_taps = EWA_N_TAPS
            c_image = jnp.zeros_like(c_const)
            w_sum = 0.0
            for i in range(n_taps):
                # tap CENTERS: r=±1 endpoints get weight exactly 0 under the
                # LUT falloff yet still pay a trilinear gather each, so place
                # taps at cell midpoints — all n gathers carry weight
                r = (2.0 * i + 1.0) / n_taps - 1.0     # ellipse-normalized
                w_ = math.exp(-2.0 * r * r) - math.exp(-2.0)
                w_sum += w_
                c_image = c_image + w_ * tri_at(u + du * (r * 0.5),
                                                v + dv * (r * 0.5))
            c_image = c_image / w_sum

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
    if extra is not None:
        # per-vertex extra data interpolated by fill_dg, tinted by color0
        # (reference ExtraDataTexture, SceneTypes/Texture.h:234: dg.extraData
        # scaled into a spectrum)
        c_extra = extra[:, None] * p[:, 0:3]
        out = jnp.where((ttype == schema.TEX_EXTRADATA)[:, None], c_extra, out)
    return jnp.where((tex_id >= 0)[:, None], out, default)


def _sample_image(tex: schema.TextureTable, tid: Array, u: Array, v: Array,
                  level: Array | None = None) -> Array:
    img = jnp.maximum(jnp.take(tex.image_id, tid), 0)
    if level is None:
        off = jnp.take(tex.img_offset[:, 0], img)
        w = jnp.take(tex.img_w[:, 0], img)
        h = jnp.take(tex.img_h[:, 0], img)
    else:
        rows_o = jnp.take(tex.img_offset, img, axis=0)
        rows_w = jnp.take(tex.img_w, img, axis=0)
        rows_h = jnp.take(tex.img_h, img, axis=0)
        oh = jnp.arange(rows_o.shape[1], dtype=jnp.int32)[None, :] == level[:, None]
        off = jnp.sum(jnp.where(oh, rows_o, 0), axis=1)
        w = jnp.sum(jnp.where(oh, rows_w, 0), axis=1)
        h = jnp.sum(jnp.where(oh, rows_h, 0), axis=1)
    # wrap repeat; v flipped (uv origin bottom-left, image row 0 on top)
    x = (u % 1.0) * w.astype(jnp.float32) - 0.5
    y = ((1.0 - v % 1.0) % 1.0) * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)

    if tex.texels_quad is not None:
        # ONE fat-row gather per bilinear tap: the quad pool row at (x0, y0)
        # already holds all four wrap-neighbour texels (schema.texels_quad)
        q = jnp.take(tex.texels_quad, off + (y0 % h) * w + (x0 % w), axis=0)
        c00, c10, c01, c11 = q[:, 0:3], q[:, 3:6], q[:, 6:9], q[:, 9:12]
    else:
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
