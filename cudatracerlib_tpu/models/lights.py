"""Emitter sampling / evaluation / pdfs for all light types.

Reference: ``SceneTypes/Light.h`` (PointLight/DiffuseLight/DistantLight/
SpotLight/InfiniteLight) + the scene-level emitter CDF selection in
``Engine/KernelDynamicScene.cu:25-40``. Batched and branchless: every lane
computes the closed forms for each light type present and selects by the
sampled row's type id. Area lights sample their triangle via a per-light CDF
binary search; the env map uses row/column inclusive CDFs (Light.h:294-368's
anim-stream CDFs become plain device arrays).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from ..core import vecmath as vm
from ..core import warp
from ..ops import traversal
from ..scene import schema

Array = jax.Array


class EmitterDirect(NamedTuple):
    """Result of next-event estimation toward one sampled emitter."""
    p: Array         # (B, 3) point on the emitter (or far point for inf lights)
    d: Array         # (B, 3) unit direction ref -> emitter
    dist: Array      # (B,)
    n: Array         # (B, 3) emitter normal (zeros for point-ish)
    radiance_over_pdf: Array  # (B, 3) Le * select^-1 * pdf^-1 (full NEE weight)
    pdf: Array       # (B,) solid-angle pdf at ref INCLUDING selection prob
    is_delta: Array  # (B,) delta emitters (excluded from BSDF-side MIS)
    light_idx: Array  # (B,) i32


class EmitterRay(NamedTuple):
    """Sampled emission ray for light tracing / photon mapping / BDPT."""
    o: Array          # (B, 3)
    d: Array          # (B, 3)
    n: Array          # (B, 3) emitter surface normal (zeros for point)
    power: Array      # (B, 3) full path weight Le*cos/(pdf_pos*pdf_dir*pdf_sel)
    pdf_pos: Array    # (B,) area pdf (incl. selection)
    pdf_dir: Array    # (B,) direction pdf (solid angle)
    light_idx: Array  # (B,) i32
    le: Array         # (B, 3) emitted radiance / intensity at the origin


def _searchsorted_cdf(cdf: Array, u: Array) -> Array:
    """Vectorized inclusive-CDF inversion over the shared array."""
    return jnp.clip(jnp.searchsorted(cdf, u, side="left"), 0, cdf.shape[0] - 1)


def _ranged_cdf_search(cdf_flat: Array, first: Array, count: Array, u: Array,
                       n_steps: int | None = None) -> Array:
    """Per-lane binary search of u in cdf_flat[first : first+count) (inclusive
    CDF normalized within the range). Returns absolute index.

    The step count is static from the table size (log2), not a fixed 32 —
    each step is one gather, so small shape-sets cost 1-2 gathers."""
    if n_steps is None:
        n_steps = max(int(cdf_flat.shape[0] - 1).bit_length(), 1)
    lo = first
    hi = first + count - 1

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        v = jnp.take(cdf_flat, jnp.clip(mid, 0, cdf_flat.shape[0] - 1))
        go_right = v < u
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_steps, body, (lo, hi))
    return jnp.clip(lo, first, first + count - 1)


def _sample_area_tri(lights: schema.LightTable, first: Array, count: Array,
                     u: Array) -> Array:
    """O(1) area-weighted emitter-triangle draw (absolute al_tris index).

    One alias fat-row gather replaces the ranged binary CDF search — on TPU
    the search is log2(AT) SERIAL (B,)-gathers (measured ~5.5 ms per
    65k-lane call on veach-mis's 2112-tri light set; the alias row is one).
    The integer and fractional parts of u*count are independent uniforms
    (u = (ofs + frac)/count), so slot choice and the alias coin reuse the
    single draw and the PCG stream layout is unchanged. The per-triangle
    selection pmf (area_i/total) cancels against uniform-barycentric 1/area_i,
    so callers keep the 1/total_area position pdf and no pmf is gathered."""
    if lights.al_alias is None:  # hand-built tables in tests
        return _ranged_cdf_search(lights.al_cdf, first, count, u)
    cnt = count.astype(jnp.float32)
    scaled = jnp.minimum(u, 1.0 - 1e-7) * cnt
    ofs = jnp.minimum(scaled.astype(jnp.int32), count - 1)
    frac = scaled - ofs.astype(jnp.float32)
    slot = first + ofs
    row = jnp.take(lights.al_alias, slot, axis=0)
    return jnp.where(frac < row[:, 0], slot, _bits_i32(row[:, 1]))


def _select_light(lights: schema.LightTable, u: Array):
    if lights.power_cdf.shape[0] == 1:  # static single-light fast path
        return jnp.zeros(u.shape, jnp.int32), jnp.ones(u.shape)
    idx = _searchsorted_cdf(lights.power_cdf, u)
    prev = jnp.where(idx > 0, jnp.take(lights.power_cdf, jnp.maximum(idx - 1, 0)), 0.0)
    pdf_sel = jnp.take(lights.power_cdf, idx) - prev
    return idx, jnp.maximum(pdf_sel, 1e-12)


def _bits_f32(a: Array) -> Array:
    return jax.lax.bitcast_convert_type(a.astype(jnp.int32), jnp.float32)


def _bits_i32(a: Array) -> Array:
    return jax.lax.bitcast_convert_type(a, jnp.int32)


def _light_fat_rows(lights: schema.LightTable) -> Array:
    """[type | params | al_first | al_count | cdf | cdf_prev] per light row.

    Tiny (L rows); built in-trace and hoisted, so per-lane light records
    arrive with ONE gather instead of 4-6."""
    prev = jnp.concatenate([jnp.zeros((1,)), lights.power_cdf[:-1]])
    return jnp.concatenate([
        _bits_f32(lights.light_type)[:, None], lights.params,
        _bits_f32(lights.al_first)[:, None], _bits_f32(lights.al_count)[:, None],
        lights.power_cdf[:, None], prev[:, None]], axis=1)


def _al_tri_rows(scene: schema.SceneData) -> Array:
    """Area-light triangle fat rows [v0 e1 e2 ng] (AT, 12), one gather per
    sampled emitter triangle (vs tri-id + tris + ng chained gathers).
    Precomputed at build into LightTable.al_rows (so GeometryTable can drop
    its (T, 12) intersection-layout duplicate); the gather fallback serves
    hand-built tables in tests."""
    lights = scene.lights
    if lights.al_rows is not None:
        return lights.al_rows
    trows = jnp.take(scene.geom.tris, lights.al_tris, axis=0)[:, 0:9]
    ngs = jnp.take(scene.geom.ng, lights.al_tris, axis=0)
    return jnp.concatenate([trows, ngs], axis=1)


def _env_direction_from_uv(lights: schema.LightTable, u_img: Array, v_img: Array):
    """(u,v) in [0,1)^2 equirect -> world direction."""
    phi = u_img * 2.0 * jnp.pi - jnp.pi
    theta = v_img * jnp.pi
    st = jnp.sin(theta)
    d_local = jnp.stack([st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)], axis=-1)
    return vm.transform_vector(lights.env_to_world, d_local), st


def _env_uv_from_direction(lights: schema.LightTable, d: Array):
    dl = vm.transform_vector(lights.env_world_to, d)
    theta = jnp.arccos(jnp.clip(dl[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(dl[..., 0], -dl[..., 2])
    u = (phi + jnp.pi) / (2.0 * jnp.pi)
    v = theta / jnp.pi
    return u % 1.0, jnp.clip(v, 0.0, 1.0)


def has_env_static(lights: schema.LightTable) -> bool:
    """Static (shape-level) check for an environment light: the builder emits
    a 1x1 black placeholder map when no infinite light exists, so any larger
    map means a real env light. Lets no-env scenes compile zero env code."""
    return lights.env_map.shape[0] * lights.env_map.shape[1] > 1


def eval_environment(scene: schema.SceneData, d: Array) -> Array:
    """Env radiance for escaped rays (KernelDynamicScene::EvalEnvironment)."""
    lights = scene.lights
    if not has_env_static(lights):
        return jnp.zeros(d.shape[:-1] + (3,))
    He, We = lights.env_map.shape[0], lights.env_map.shape[1]
    u, v = _env_uv_from_direction(lights, d)
    x = jnp.clip((u * We).astype(jnp.int32), 0, We - 1)
    y = jnp.clip((v * He).astype(jnp.int32), 0, He - 1)
    texel = lights.env_map[y, x]
    has_env = jnp.any(lights.light_type == schema.LIGHT_INFINITE)
    # env scale lives in the env light row's params[3:6]
    env_row = jnp.argmax(lights.light_type == schema.LIGHT_INFINITE)
    scale = jnp.take(lights.params, env_row, axis=0)[3:6]
    return jnp.where(has_env, texel * scale, 0.0)


def _env_pdf_dir(scene: schema.SceneData, d: Array) -> Array:
    """Solid-angle pdf of env importance sampling for direction d.

    One pmf gather (scene/alias.py tables) — the reference reconstructs it
    from its row/column CDFs, which on TPU costs (B, We)-row gathers."""
    lights = scene.lights
    if not has_env_static(lights):
        return jnp.zeros(d.shape[:-1])
    He, We = lights.env_map.shape[0], lights.env_map.shape[1]
    u, v = _env_uv_from_direction(lights, d)
    x = jnp.clip((u * We).astype(jnp.int32), 0, We - 1)
    y = jnp.clip((v * He).astype(jnp.int32), 0, He - 1)
    p_pixel = jnp.take(lights.env_pmf.reshape(-1), y * We + x)
    sin_t = jnp.maximum(jnp.sin(jnp.clip(v, 1e-4, 1 - 1e-4) * jnp.pi), 1e-5)
    jac = (He * We) / (2.0 * jnp.pi * jnp.pi * sin_t)
    return p_pixel * jac


def _env_sample_pixel(lights: schema.LightTable, u2: Array):
    """O(1) alias-table draw of an env pixel: (y, x, pmf) from two uniforms
    with ONE (B, 4) fat-row gather."""
    He, We = lights.env_map.shape[0], lights.env_map.shape[1]
    n = He * We
    slot = jnp.minimum((u2[:, 0] * n).astype(jnp.int32), n - 1)
    row = jnp.take(lights.env_alias, slot, axis=0)
    use_alias = u2[:, 1] >= row[:, 0]
    alias_idx = jax.lax.bitcast_convert_type(row[:, 1], jnp.int32)
    pix = jnp.where(use_alias, alias_idx, slot)
    pmf = jnp.where(use_alias, row[:, 3], row[:, 2])
    return pix // We, pix % We, pmf


def sample_emitter_direct(scene: schema.SceneData, ref_p: Array,
                         state: Array, u_override: Array = None,
                         override_mask: Array = None) -> tuple:
    """NEE: sample one emitter (by power CDF), one point on it, return the
    direct-illumination record. (KernelDynamicScene::sampleEmitterDirect).
    u_override (B,3) replaces (u_sel, u2) on lanes where override_mask is
    set (low-discrepancy first-bounce dims)."""
    lights = scene.lights
    B = ref_p.shape[0]
    state, u_sel = rngmod.next_float(state)
    state, u2 = rngmod.next_float2(state)
    if u_override is not None:
        u_sel = jnp.where(override_mask, u_override[..., 0], u_sel)
        u2 = jnp.where(override_mask[..., None], u_override[..., 1:3], u2)
    idx, pdf_sel = _select_light(lights, u_sel)
    row = jnp.take(_light_fat_rows(lights), idx, axis=0)
    NP = schema.N_LIGHT_PARAMS
    ltype = _bits_i32(row[:, 0])
    p = row[:, 1:1 + NP]

    # --- point ---
    d_pt = p[:, 0:3] - ref_p
    dist2_pt = jnp.maximum(vm.length_sqr(d_pt), 1e-12)
    dist_pt = jnp.sqrt(dist2_pt)
    dir_pt = d_pt / dist_pt[..., None]
    rop_pt = p[:, 3:6] / dist2_pt[..., None]

    # --- spot: like point with cone falloff ---
    cos_cut = p[:, 6]
    cos_beam = p[:, 7]
    cos_ang = vm.dot(p[:, 8:11], -dir_pt)
    fall = jnp.clip((cos_ang - cos_cut) / jnp.maximum(cos_beam - cos_cut, 1e-6), 0.0, 1.0)
    fall = fall * fall * (3.0 - 2.0 * fall)  # smoothstep falloff
    rop_spot = rop_pt * fall[..., None]

    # --- distant: delta direction ---
    dir_dist = -p[:, 0:3]
    rop_dist = p[:, 3:6]

    # --- area light: sample triangle by area CDF, uniform barycentric ---
    first = _bits_i32(row[:, 1 + NP])
    count = jnp.maximum(_bits_i32(row[:, 2 + NP]), 1)
    state, u_tri = rngmod.next_float(state)
    ai = _sample_area_tri(lights, first, count, u_tri)
    trow = jnp.take(_al_tri_rows(scene), ai, axis=0)
    bary = warp.square_to_uniform_triangle(u2)
    pos_area = (trow[:, 0:3] + trow[:, 3:6] * bary[:, 0:1] + trow[:, 6:9] * bary[:, 1:2])
    ng = trow[:, 9:12]
    d_ar = pos_area - ref_p
    dist2_ar = jnp.maximum(vm.length_sqr(d_ar), 1e-12)
    dist_ar = jnp.sqrt(dist2_ar)
    dir_ar = d_ar / dist_ar[..., None]
    cos_l = vm.dot(ng, -dir_ar)
    area_total = jnp.maximum(p[:, 6], 1e-12)
    pdf_ar = dist2_ar / jnp.maximum(cos_l * area_total, 1e-9)  # area->solid angle
    front = cos_l > 0
    rop_ar = jnp.where(front[..., None], p[:, 3:6] / pdf_ar[..., None], 0.0)

    # --- env: importance-sample the map (compiled out when no env light;
    # the draw always happens so the RNG stream is layout-independent) ---
    state, u_env = rngmod.next_float2(state)
    if has_env_static(lights):
        He, We = lights.env_map.shape[0], lights.env_map.shape[1]
        y, x, pmf = _env_sample_pixel(lights, u_env)
        u_img = (x.astype(jnp.float32) + 0.5) / We
        v_img = (y.astype(jnp.float32) + 0.5) / He
        dir_env, sin_t = _env_direction_from_uv(lights, u_img, v_img)
        le_env = jnp.take(lights.env_map.reshape(-1, 3), y * We + x,
                          axis=0) * p[:, 3:6]
        jac = (He * We) / (2.0 * jnp.pi * jnp.pi
                           * jnp.maximum(sin_t, 1e-5))
        pdf_env = jnp.maximum(pmf * jac, 1e-12)
        rop_env = le_env / pdf_env[..., None]
    else:
        dir_env = dir_pt
        pdf_env = jnp.ones(B)
        rop_env = jnp.zeros((B, 3))
    world_rad = jnp.maximum(p[:, 7], vm.length(scene.world_hi - scene.world_lo))

    # --- select by type ---
    is_pt = ltype == schema.LIGHT_POINT
    is_spot = ltype == schema.LIGHT_SPOT
    is_dist = ltype == schema.LIGHT_DISTANT
    is_area = ltype == schema.LIGHT_DIFFUSE
    is_env = ltype == schema.LIGHT_INFINITE

    sel3 = lambda *tv: _select_cases([is_pt, is_spot, is_dist, is_area, is_env], tv)
    d_out = sel3(dir_pt, dir_pt, dir_dist, dir_ar, dir_env)
    dist_out = sel3(dist_pt, dist_pt, jnp.full(B, 1e7), dist_ar, world_rad * 2.0)
    p_out = ref_p + d_out * dist_out[..., None]
    p_out = jnp.where(is_area[..., None], pos_area, p_out)
    n_out = jnp.where(is_area[..., None], ng, jnp.zeros_like(ref_p))
    rop = sel3(rop_pt, rop_spot, rop_dist, rop_ar, rop_env)
    rop = rop / pdf_sel[..., None]
    pdf_sa = sel3(jnp.zeros(B), jnp.zeros(B), jnp.zeros(B), pdf_ar, pdf_env) * pdf_sel
    is_delta = is_pt | is_spot | is_dist
    return EmitterDirect(p=p_out, d=d_out, dist=dist_out, n=n_out,
                         radiance_over_pdf=rop, pdf=pdf_sa, is_delta=is_delta,
                         light_idx=idx), state


def _select_cases(masks, values):
    out = values[0]
    for m, v in zip(masks[1:], values[1:]):
        if v.ndim > m.ndim:
            m = m[..., None]
        out = jnp.where(m, v, out)
    return out


def eval_hit_emitter(scene: schema.SceneData, light_id: Array, ng: Array,
                     wi: Array) -> Array:
    """Radiance of a hit area light toward wi (one-sided along ng)."""
    lid = jnp.maximum(light_id, 0)
    p = jnp.take(scene.lights.params, lid, axis=0)
    front = vm.dot(ng, wi) > 0
    return jnp.where(((light_id >= 0) & front)[..., None], p[:, 3:6], 0.0)


def pdf_hit_emitter_direct(scene: schema.SceneData, light_id: Array,
                           ref_p: Array, hit_p: Array, ng: Array) -> Array:
    """Solid-angle pdf that NEE would have sampled this hit point on this area
    light (incl. light selection) — for BSDF-side MIS weights."""
    lid = jnp.maximum(light_id, 0)
    NP = schema.N_LIGHT_PARAMS
    row = jnp.take(_light_fat_rows(scene.lights), lid, axis=0)
    p = row[:, 1:1 + NP]
    pdf_sel = jnp.maximum(row[:, 3 + NP] - row[:, 4 + NP], 1e-12)
    d = hit_p - ref_p
    dist2 = jnp.maximum(vm.length_sqr(d), 1e-12)
    cos_l = vm.dot(ng, -d) * jax.lax.rsqrt(dist2)
    area_total = jnp.maximum(p[:, 6], 1e-12)
    pdf = dist2 / jnp.maximum(cos_l * area_total, 1e-9) * pdf_sel
    return jnp.where((light_id >= 0) & (cos_l > 0), pdf, 0.0)


def pdf_env_direct(scene: schema.SceneData, d: Array) -> Array:
    """Solid-angle pdf that NEE would have sampled direction d on the env map."""
    lights = scene.lights
    if not has_env_static(lights):
        return jnp.zeros(d.shape[:-1])
    has_env = jnp.any(lights.light_type == schema.LIGHT_INFINITE)
    env_row = jnp.argmax(lights.light_type == schema.LIGHT_INFINITE)
    prev = jnp.where(env_row > 0,
                     jnp.take(lights.power_cdf, jnp.maximum(env_row - 1, 0)), 0.0)
    pdf_sel = jnp.maximum(jnp.take(lights.power_cdf, env_row) - prev, 1e-12)
    return jnp.where(has_env, _env_pdf_dir(scene, d) * pdf_sel, 0.0)


def sample_emitter_ray(scene: schema.SceneData, state: Array) -> tuple:
    """Sample an emission ray carrying full power weight — the entry point of
    light tracing / photon passes (ParticleProcess emission sampling)."""
    lights = scene.lights
    state, u_sel = rngmod.next_float(state)
    idx, pdf_sel = _select_light(lights, u_sel)
    row = jnp.take(_light_fat_rows(lights), idx, axis=0)
    NP = schema.N_LIGHT_PARAMS
    ltype = _bits_i32(row[:, 0])
    p = row[:, 1:1 + NP]
    B = u_sel.shape[0]
    state, u_pos = rngmod.next_float2(state)
    state, u_dir = rngmod.next_float2(state)

    world_c = 0.5 * (scene.world_lo + scene.world_hi)
    world_r = jnp.maximum(0.5 * vm.length(scene.world_hi - scene.world_lo), 1e-3) * 1.01

    # point: uniform sphere
    o_pt = p[:, 0:3]
    d_pt = warp.square_to_uniform_sphere(u_dir)
    w_pt = p[:, 3:6] * (4.0 * jnp.pi)
    pdfp_pt = jnp.ones(B)
    pdfd_pt = jnp.full(B, warp.INV_FOURPI)

    # spot: cone with falloff
    cos_cut = p[:, 6]
    d_cone = warp.square_to_uniform_cone(u_dir, cos_cut)
    spot_frame = vm.coordinate_system(p[:, 8:11])
    d_spot = (spot_frame[0] * d_cone[:, 0:1] + spot_frame[1] * d_cone[:, 1:2]
              + p[:, 8:11] * d_cone[:, 2:3])
    pdf_cone = warp.square_to_uniform_cone_pdf(cos_cut)
    cos_beam = p[:, 7]
    fall = jnp.clip((d_cone[:, 2] - cos_cut) / jnp.maximum(cos_beam - cos_cut, 1e-6), 0, 1)
    fall = fall * fall * (3 - 2 * fall)
    w_spot = p[:, 3:6] * (fall / pdf_cone)[..., None]
    pdfd_spot = jnp.full(B, 1.0) * pdf_cone

    # distant: point on disk of world radius, fixed direction
    dir_d = p[:, 0:3]
    t1, t2 = vm.coordinate_system(dir_d)
    disk = warp.square_to_uniform_disk_concentric(u_pos) * world_r
    o_dist = world_c - dir_d * world_r[..., None] + t1 * disk[:, 0:1] + t2 * disk[:, 1:2]
    area_disk = jnp.pi * world_r * world_r
    w_dist = p[:, 3:6] * area_disk[..., None]
    pdfp_dist = 1.0 / area_disk * jnp.ones(B)
    pdfd_dist = jnp.ones(B)

    # area: position by area CDF + cosine direction
    first = _bits_i32(row[:, 1 + NP])
    count = jnp.maximum(_bits_i32(row[:, 2 + NP]), 1)
    state, u_tri = rngmod.next_float(state)
    ai = _sample_area_tri(lights, first, count, u_tri)
    trow = jnp.take(_al_tri_rows(scene), ai, axis=0)
    bary = warp.square_to_uniform_triangle(u_pos)
    o_ar = trow[:, 0:3] + trow[:, 3:6] * bary[:, 0:1] + trow[:, 6:9] * bary[:, 1:2]
    ng = trow[:, 9:12]
    local = warp.square_to_cosine_hemisphere(u_dir)
    fr_t, fr_s = vm.coordinate_system(ng)
    d_ar = fr_t * local[:, 0:1] + fr_s * local[:, 1:2] + ng * local[:, 2:3]
    area_total = jnp.maximum(p[:, 6], 1e-12)
    w_ar = p[:, 3:6] * (jnp.pi * area_total)[..., None]
    pdfp_ar = 1.0 / area_total
    pdfd_ar = warp.square_to_cosine_hemisphere_pdf(local)

    # env: direction from map (pointing into the scene), origin on far disk
    if has_env_static(lights):
        He, We = lights.env_map.shape[0], lights.env_map.shape[1]
        y, x, pmf = _env_sample_pixel(lights, u_dir)
        u_img = (x.astype(jnp.float32) + 0.5) / We
        v_img = (y.astype(jnp.float32) + 0.5) / He
        d_from_env, sin_te = _env_direction_from_uv(lights, u_img, v_img)
        d_env = -d_from_env  # radiance flows opposite the "direction to env"
        le_env = jnp.take(lights.env_map.reshape(-1, 3), y * We + x,
                          axis=0) * p[:, 3:6]
        jac_e = (He * We) / (2.0 * jnp.pi * jnp.pi
                             * jnp.maximum(sin_te, 1e-5))
        pdf_env_d = jnp.maximum(pmf * jac_e, 1e-12)
        e1, e2 = vm.coordinate_system(d_env)
        disk_e = warp.square_to_uniform_disk_concentric(u_pos) * world_r
        o_env = (world_c - d_env * world_r[..., None] + e1 * disk_e[:, 0:1] + e2 * disk_e[:, 1:2])
        area_e = jnp.pi * world_r * world_r
        w_env = le_env * (area_e / pdf_env_d)[..., None]
        pdfp_env = 1.0 / area_e * jnp.ones(B)
        pdfd_env = pdf_env_d
    else:
        d_env = d_pt
        o_env = o_pt
        le_env = jnp.zeros((B, 3))
        w_env = jnp.zeros((B, 3))
        pdfp_env = jnp.ones(B)
        pdfd_env = jnp.ones(B)

    is_pt = ltype == schema.LIGHT_POINT
    is_spot = ltype == schema.LIGHT_SPOT
    is_dist = ltype == schema.LIGHT_DISTANT
    is_area = ltype == schema.LIGHT_DIFFUSE
    is_env = ltype == schema.LIGHT_INFINITE
    masks = [is_pt, is_spot, is_dist, is_area, is_env]
    sel = lambda *tv: _select_cases(masks, tv)

    o = sel(o_pt, o_pt, o_dist, o_ar, o_env)
    d = sel(d_pt, d_spot, dir_d, d_ar, d_env)
    n = sel(jnp.zeros_like(o), jnp.zeros_like(o), dir_d, ng, d_env)
    w = sel(w_pt, w_spot, w_dist, w_ar, w_env) / pdf_sel[..., None]
    pdf_pos = sel(pdfp_pt, pdfp_pt, pdfp_dist, pdfp_ar, pdfp_env) * pdf_sel
    pdf_dir = sel(pdfd_pt, pdfd_spot, pdfd_dist, pdfd_ar, pdfd_env)
    le = sel(p[:, 3:6], p[:, 3:6] * fall[..., None], p[:, 3:6], p[:, 3:6], le_env)
    return EmitterRay(o=o, d=d, n=n, power=w, pdf_pos=pdf_pos, pdf_dir=pdf_dir,
                      light_idx=idx, le=le), state
