"""Surface interaction construction from ray hits.

Reference: ``fillDG`` shading-frame reconstruction (`Kernel/TraceHelper.cu:274-307`)
and ``Engine/DifferentialGeometry.h``. Gathers per-triangle shading rows for a
hit batch and builds interpolated normals, UVs and a tangent frame.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import frame as fr
from ..core import vecmath as vm
from ..scene import schema
from . import traversal

Array = jax.Array


class SurfaceInteraction(NamedTuple):
    valid: Array    # (B,) hit anything
    p: Array        # (B, 3) hit position
    t: Array        # (B,) distance
    ng: Array       # (B, 3) geometric normal (forward-facing w.r.t. ray)
    ns: Array       # (B, 3) interpolated shading normal (forward-facing)
    uv: Array       # (B, 2)
    frame_t: Array  # (B, 3) shading tangent
    frame_s: Array  # (B, 3) shading bitangent
    bary: Array     # (B, 2) (u, v)
    mat_id: Array   # (B,) i32
    light_id: Array  # (B,) i32
    tri: Array      # (B,) i32
    wi: Array       # (B, 3) unit direction toward the ray origin (world)
    flipped: Array  # (B,) bool: true if normals were flipped to face the ray
    uv_density: Array  # (B,) sqrt(uv area / world area) for ray-cone mip LOD
    # (B,) barycentric-interpolated per-vertex extra data, or None when the
    # scene carries none (reference DifferentialGeometry extraData /
    # Texture.h:234). Defaulted so callers building interactions by hand
    # (tests, integrator shims) keep working.
    extra: "Array | None" = None

    def frame(self) -> fr.Frame:
        return fr.Frame(self.frame_t, self.frame_s, self.ns)

    def to_local(self, v: Array) -> Array:
        return self.frame().to_local(v)

    def to_world(self, v: Array) -> Array:
        return self.frame().to_world(v)


def fill_dg(geom: schema.GeometryTable, rays: traversal.Rays,
            hit: traversal.Hit, flip_to_ray: bool = True) -> SurfaceInteraction:
    """One fat-row gather per hit (schema.pack_shade_rows layout): a TPU
    vector gather costs the same up to 128 f32 of row width, so all shading
    attributes travel together instead of ~10 separate table gathers."""
    tid = jnp.maximum(hit.tri, 0)
    u, v = hit.u, hit.v
    w = 1.0 - u - v
    row = jnp.take(geom.shade, tid, axis=0)          # (B, 32)
    n0, n1, n2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
    uv0, uv1, uv2 = row[:, 9:11], row[:, 11:13], row[:, 13:15]
    ns = vm.normalize(w[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2)
    uv = w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
    ng = row[:, 15:18]
    p = rays.o + rays.d * hit.t[:, None]
    dpdu = row[:, 18:21]
    uv_density = row[:, 21]
    degenerate = row[:, 22] > 0.5
    mat_id = jax.lax.bitcast_convert_type(row[:, 23], jnp.int32)
    light_id = jax.lax.bitcast_convert_type(row[:, 24], jnp.int32)

    if geom.inst is not None and hit.inst is not None:
        # two-level scenes: shade rows are LOCAL space; normals transform by
        # the inverse-transpose of local->world = w2l_rot^T, and per-instance
        # material/light override the (shared) mesh attributes
        it = geom.inst
        ik = jnp.maximum(hit.inst, 0)
        w2l = jnp.take(it.w2l, ik, axis=0)               # (B, 3, 4)
        rot_t = jnp.swapaxes(w2l[:, :, :3], 1, 2)        # w2l_rot^T
        ns = vm.normalize(jnp.einsum("bij,bj->bi", rot_t, ns))
        ng = vm.normalize(jnp.einsum("bij,bj->bi", rot_t, ng))
        l2w = jnp.take(it.l2w, ik, axis=0)
        dpdu = jnp.einsum("bij,bj->bi", l2w[:, :, :3], dpdu)
        uv_density = uv_density * jnp.take(it.inv_scale, ik)
        # sentinels defer to the mesh's own per-tri attributes (the identity
        # instance covering the flattened, mixed-material part of the scene)
        imat = jnp.take(it.mat_id, ik)
        mat_id = jnp.where(imat >= 0, imat, mat_id)
        ilight = jnp.take(it.light_id, ik)
        light_id = jnp.where(ilight != -2, ilight, light_id)

    if flip_to_ray:
        flip = vm.dot(ng, rays.d) > 0.0
        ng = jnp.where(flip[:, None], -ng, ng)
        # shading normal flips with its geometric side
        flip_s = vm.dot(ns, rays.d) > 0.0
        ns = jnp.where(flip_s[:, None], -ns, ns)
    else:
        flip = jnp.zeros(hit.t.shape, bool)

    # tangent frame: Gram-Schmidt dpdu against ns; fallback to branchless ONB
    t_fallback, _ = vm.coordinate_system(ns)
    t_raw = jnp.where(degenerate[:, None], t_fallback, dpdu)
    t_proj = t_raw - ns * vm.dot(t_raw, ns)[:, None]
    tiny = vm.length_sqr(t_proj) < 1e-16
    t_final = vm.normalize(jnp.where(tiny[:, None], t_fallback, t_proj))
    s_final = vm.cross(ns, t_final)

    extra = (w * row[:, 26] + u * row[:, 27] + v * row[:, 28])
    return SurfaceInteraction(
        valid=hit.tri >= 0, p=p, t=hit.t, ng=ng, ns=ns, uv=uv,
        frame_t=t_final, frame_s=s_final,
        bary=jnp.stack([u, v], -1),
        mat_id=mat_id, light_id=light_id, tri=hit.tri,
        wi=-rays.d, flipped=flip, uv_density=uv_density, extra=extra)


def offset_ray_origin(p: Array, n: Array, d: Array, eps: float = 1e-4) -> Array:
    """Offset a secondary-ray origin along the geometric normal to avoid
    self-intersection (scale-aware epsilon)."""
    scale = jnp.maximum(jnp.max(jnp.abs(p), axis=-1), 1.0)
    off = (eps * scale)[:, None] * jnp.where(vm.dot(d, n)[:, None] >= 0, n, -n)
    return p + off
