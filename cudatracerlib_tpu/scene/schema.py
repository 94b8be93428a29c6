"""Device-side scene representation: a pytree of SoA arrays.

TPU-native counterpart of the reference's ``KernelDynamicScene``
(`Engine/KernelDynamicScene.h:26-54`) + the ``CudaVirtualAggregate`` tagged
unions (`Base/VirtualFuncType.h:113`): every polymorphic family (BSDF, light,
sensor, texture, ...) becomes a table with a type-id column and a fixed-width
parameter matrix, evaluated with masked/branchless dispatch instead of vtables.
The whole SceneData pytree is closed over by jitted render functions — the
analogue of the reference's ``__constant__ g_SceneData`` upload
(`Kernel/TraceHelper.h:11-27`), with XLA managing residency in HBM.
"""
from __future__ import annotations

from typing import NamedTuple

import jax

Array = jax.Array

# ---------------------------------------------------------------------------
# Enums (type-id columns)
# ---------------------------------------------------------------------------

# BSDF types (reference: SceneTypes/BSDF_Simple.h + BSDF_Complex.h)
BSDF_DIFFUSE = 0
BSDF_ROUGHDIFFUSE = 1
BSDF_DIELECTRIC = 2
BSDF_THINDIELECTRIC = 3
BSDF_ROUGHDIELECTRIC = 4
BSDF_CONDUCTOR = 5
BSDF_ROUGHCONDUCTOR = 6
BSDF_PLASTIC = 7
BSDF_ROUGHPLASTIC = 8
BSDF_PHONG = 9
BSDF_WARD = 10
BSDF_HK = 11
BSDF_COATING = 12
BSDF_ROUGHCOATING = 13
BSDF_BLEND = 14
BSDF_NULL = 15

# Light types (reference: SceneTypes/Light.h)
LIGHT_POINT = 0
LIGHT_DIFFUSE = 1     # area light
LIGHT_DISTANT = 2
LIGHT_SPOT = 3
LIGHT_INFINITE = 4    # environment map

# Sensor types (reference: SceneTypes/Sensor.h)
SENSOR_SPHERICAL = 0
SENSOR_PERSPECTIVE = 1
SENSOR_THINLENS = 2
SENSOR_ORTHOGRAPHIC = 3
SENSOR_TELECENTRIC = 4

# Texture types (reference: SceneTypes/Texture.h)
TEX_CONSTANT = 0
TEX_CHECKERBOARD = 1
TEX_BILERP = 2
TEX_IMAGE = 3
TEX_UV = 4
TEX_WIREFRAME = 5
TEX_EXTRADATA = 6

# Microfacet distribution sub-type lives in material params (core.microfacet)

N_MAT_PARAMS = 40  # slots 32..36 hold the alpha-blend test (see below)
N_MAT_TEX = 4      # texture slots: 0=reflectance/specular, 1=second albedo/transmittance, 2=alpha-mask, 3=bump/normal

# Alpha-blend test modes (reference Engine/Material.h:13-35 AlphaBlendState):
# material params [32] = mode, [33] = test_val_scalar, [34:37] = test color.
# mode & 3: 1 = luminance >= s survives, 2 = alpha channel >= s survives,
# 3 = max|sample - color| <= s survives; mode & 4: sample the REFLECTANCE
# texture (slot 0) instead of the alpha-mask texture (slot 2). mode 0 with an
# alpha-mask texture = continuous Mitsuba-style opacity (stochastic pass).
ALPHA_DISABLED = 0
ALPHA_LUMINANCE = 1
ALPHA_ALPHA = 2
ALPHA_COLOR = 3
ALPHA_SRC_REFLECTANCE = 4
N_LIGHT_PARAMS = 24
N_TEX_PARAMS = 12


class InstanceTable(NamedTuple):
    """Two-level (TLAS/BLAS) instancing: per-instance transforms over shared
    local-space BLAS subtrees in the unified fat-row table.

    Reference: ``Engine/SceneBVH.h:18`` (TLAS over nodes with per-node
    transform streams) + the traversal inverse-transform hand-off
    (``Kernel/TraceHelper.cu:88-180``). TPU redesign: the TLAS is a
    vectorized slab test over instance AABBs collecting per-lane entry
    ordering; each visited instance re-traverses the shared BLAS with a
    per-lane root (ops/instanced.py)."""
    w2l: Array        # (I, 3, 4) world->local affine
    l2w: Array        # (I, 3, 4) local->world affine
    root: Array       # (I,) i32 BLAS root row in GeometryTable.wide
    mat_id: Array     # (I,) i32 material override
    light_id: Array   # (I,) i32 area-light row (-1)
    node_id: Array    # (I,) i32 scene-graph node
    lo: Array         # (I, 3) world-space instance AABB
    hi: Array         # (I, 3)
    inv_scale: Array  # (I,) |det l2w_rot|^(1/3) — uv-density correction
    # 8-wide fat-row BVH over instance AABBs (node rows only; leaf links
    # keep the binary builder's -2-(first*16+count) codes over tlas_order).
    # None for small instance counts, where the dense slab scan is cheaper
    # than a second traversal. Reference: Engine/SceneBVH.h:18 (the 2-wide
    # TLAS), rebuilt 8-wide for the VPU.
    tlas: "Array | None" = None
    tlas_order: "Array | None" = None   # (I,) i32 leaf-contiguous instance ids
    # HBM-scale BLAS forests: per-instance TOP-LOCAL root row in the treelet
    # top table (treelet.TreeletTable.root_top[root part]); None when the
    # shared table fits the VMEM kernel. Lets each BLAS visit run on the
    # two-phase treelet kernel with a per-lane start row.
    root_top: "Array | None" = None


class GeometryTable(NamedTuple):
    """Triangle soup + BVH. Without instancing all arrays are world-space and
    `inst` is None; with instancing (shared meshes) the triangle pool and
    `wide` table are per-unique-mesh LOCAL space and `inst` maps rays/hits
    between spaces."""
    tris: Array       # (T, 12) f32 intersection layout [v0, e1, e2, pad]
    nodes: Array      # (N, 16) f32 packed 2-wide BVH nodes (reference path)
    tri_order: Array  # (T,) i32
    wide: Array       # (R, 128) f32 unified 8-wide fat-row BVH (hot path)
    n0: Array         # (T, 3) f32 vertex shading normals
    n1: Array
    n2: Array
    uv0: Array        # (T, 2) f32
    uv1: Array
    uv2: Array
    ng: Array         # (T, 3) f32 geometric normal (normalized e1 x e2)
    mat_id: Array     # (T,) i32
    light_id: Array   # (T,) i32 area-light index, -1 if not emissive
    node_id: Array    # (T,) i32 scene-graph node (instance) that owns the tri
    shade: Array      # (T, 32) f32 packed shading fat row (pack_shade_rows):
    #                   one gather per hit instead of ~10 (fill_dg hot path)
    inst: "InstanceTable | None" = None
    # HBM-scale treelet decomposition (scene/treelet.py), present when `wide`
    # exceeds the VMEM kernel's limit: transposed top table (128, S_top*128)
    # and transposed treelet slabs (n_treelets+1, 128, R_t); the last slab is
    # the inert pad slab. Static meta (counts, rows) comes from the shapes.
    tt_top: "Array | None" = None
    tt_slabs: "Array | None" = None
    tt_vid: "Array | None" = None   # (n_vids, 2) i32 visit->(treelet, root)


SHADE_WIDTH = 32


def pack_shade_rows(n0, n1, n2, uv0, uv1, uv2, ng, v0, v1, v2,
                    mat_id, light_id, node_id, extra=None):
    """Pack per-triangle shading data into one (T, 32) fat row.

    A TPU vector gather costs the same for any row width up to 128 f32, so
    fill_dg fetches everything it needs with ONE gather. dpdu and the UV
    density (mip-LOD footprint scale) are per-triangle constants and are
    precomputed here instead of per-hit.
    Layout: [0:3]=n0 [3:6]=n1 [6:9]=n2 [9:11]=uv0 [11:13]=uv1 [13:15]=uv2
    [15:18]=ng [18:21]=dpdu (0 when the UV map is degenerate) [21]=uv_density
    [22]=degenerate flag [23]=mat_id [24]=light_id [25]=node_id (i32 bitcast)
    [26:29]=per-vertex extra data (reference ExtraDataTexture source,
    SceneTypes/Texture.h:234 — barycentric-interpolated by fill_dg).
    """
    import numpy as np
    T = n0.shape[0]
    rows = np.zeros((T, SHADE_WIDTH), np.float32)
    if extra is not None:
        rows[:, 26:29] = np.asarray(extra, np.float32)
    rows[:, 0:3] = n0
    rows[:, 3:6] = n1
    rows[:, 6:9] = n2
    rows[:, 9:11] = uv0
    rows[:, 11:13] = uv1
    rows[:, 13:15] = uv2
    rows[:, 15:18] = ng
    e1 = (v1 - v0).astype(np.float32)
    e2 = (v2 - v0).astype(np.float32)
    duv1 = (uv1 - uv0).astype(np.float32)
    duv2 = (uv2 - uv0).astype(np.float32)
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    degenerate = np.abs(det) < 1e-12
    inv_det = np.where(degenerate, 0.0, 1.0 / np.where(degenerate, 1.0, det))
    rows[:, 18:21] = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * inv_det[:, None]
    world_area2 = np.linalg.norm(np.cross(e1, e2), axis=-1)
    rows[:, 21] = np.sqrt(np.abs(det) / np.maximum(world_area2, 1e-20))
    rows[:, 22] = degenerate.astype(np.float32)
    rows[:, 23] = np.asarray(mat_id, np.int32).view(np.float32)
    rows[:, 24] = np.asarray(light_id, np.int32).view(np.float32)
    rows[:, 25] = np.asarray(node_id, np.int32).view(np.float32)
    return rows


class MaterialTable(NamedTuple):
    """BSDF aggregate: type id + params + texture slots + optional nested bsdf.

    Param layout per type is documented in models/bsdf.py next to each
    implementation (mirrors the factor lists of SceneTypes/BSDF_Simple.h).
    """
    mat_type: Array    # (M,) i32
    params: Array      # (M, N_MAT_PARAMS) f32
    tex: Array         # (M, N_MAT_TEX) i32 texture table ids (-1 = none)
    nested: Array      # (M,) i32 nested simple-bsdf row for coating/blend (-1)
    nested2: Array     # (M,) i32 second nested row for blend (-1)


class TextureTable(NamedTuple):
    """Texture aggregate + image atlas.

    Images live in one flat (P, 3) texel pool; per-image rows give
    (offset, width, height, wrap_mode). Mip chains append levels to the pool.
    """
    tex_type: Array    # (X,) i32
    params: Array      # (X, N_TEX_PARAMS) f32
    image_id: Array    # (X,) i32 row into image tables below (-1 = none)
    img_offset: Array  # (I, MAX_MIPS) i32 texel offset of each mip level
    img_w: Array       # (I, MAX_MIPS) i32
    img_h: Array       # (I, MAX_MIPS) i32
    img_nmips: Array   # (I,) i32
    texels: Array      # (P, 3) f32 linear RGB texel pool
    # (I,) i32 texel-pool offset of the image's CONE-STEP map (level-0
    # resolution, ratio in channel 0), -1 when absent. Built for
    # parallax-enabled height maps (reference relaxed cone maps,
    # Engine/MIPMap.h:32 / MIPMap.cu:404-460 — the conservative variant,
    # precomputed at build instead of an offline file tool).
    img_cone: Array = None
    # (P, 12) QUAD-PACKED texel pool: row i holds the 2x2 wrap-neighborhood
    # [T(y,x), T(y,x+1), T(y+1,x), T(y+1,x+1)] of flat texel i, so ONE fat-row
    # gather returns everything a bilinear tap needs (a TPU vector gather
    # costs the same up to 128 f32 of row width — 4x fewer gather ops than
    # fetching the corners separately; EWA goes from 40 gathers/eval to 10).
    # None = fall back to per-corner fetches from `texels`.
    texels_quad: Array = None


class LightTable(NamedTuple):
    light_type: Array  # (L,) i32
    params: Array      # (L, N_LIGHT_PARAMS) f32
    power_cdf: Array   # (L,) f32 normalized CDF over emitter power (inclusive)
    # Area-light shape sets: flat triangle list + per-light ranges + area CDF
    al_tris: Array     # (AT,) i32 triangle ids
    al_cdf: Array      # (AT,) f32 per-light inclusive CDF over tri area
    al_first: Array    # (L,) i32 offset into al_tris
    al_count: Array    # (L,) i32
    # Environment map (1x1 black if absent)
    env_map: Array     # (He, We, 3) f32 radiance
    # O(1) env importance sampling: Vose alias rows over the sin-weighted
    # pixel luminance (scene/alias.py) + the per-pixel selection pmf for
    # pdf evaluation of arbitrary directions. Replaces the reference's
    # row/column CDF binary searches, which cost (B, We)-row gathers on TPU.
    env_alias: Array   # (He*We, 4) f32 [prob, alias_bits, pmf_self, pmf_alias]
    env_pmf: Array     # (He, We) f32 per-pixel selection probability
    env_to_world: Array  # (4, 4) rotation of the env sphere
    env_world_to: Array  # (4, 4) inverse
    # (AT, 12) f32 precomputed area-light triangle fat rows [v0 e1 e2 ng],
    # one row per al_tris entry — lets GeometryTable drop its (T, 12)
    # intersection-layout duplicate (the leaf data already lives in the
    # fat-row BVH): models/lights._al_tri_rows reads this directly.
    # Refits/animation refresh it alongside the shade rows.
    al_rows: Array = None
    # (AT, 2) f32 per-light Vose alias rows [prob, alias_idx_bits(ABSOLUTE)]
    # over triangle area, flattened at the same al_first offsets: O(1)
    # emitter-triangle selection with ONE gather instead of the ranged
    # binary CDF search (log2(AT) serial B-wide gathers — measured ~5.5 ms
    # per 65k-lane NEE call on a 2k-tri light set). None (hand-built test
    # tables) falls back to the CDF search.
    al_alias: Array = None


class SensorData(NamedTuple):
    sensor_type: Array  # () i32
    to_world: Array     # (4, 4) f32 camera-to-world
    to_world_inv: Array  # (4, 4)
    params: Array       # (16,) f32: [fov_y_rad, near, far, aperture_r,
    #                     focus_dist, film_w, film_h, ortho_scale_x, ortho_scale_y, ...]


class MediumTable(NamedTuple):
    """Participating media (reference: SceneTypes/Volumes.h). Filled in by the
    volume stage; a scene always carries an (empty) table for static shapes."""
    med_type: Array    # (V,) i32  0=homogeneous, 1=grid
    params: Array      # (V, 24) f32: sigma_a, sigma_s, Le, phase params, ...
    to_world: Array    # (V, 4, 4)
    world_to: Array    # (V, 4, 4)
    grid_offset: Array  # (V, 3) i32 offsets into the voxel pool for a/s/le
    grid_dim: Array    # (V, 3) i32
    voxels: Array      # (VP,) f32 flat voxel pool


class SceneData(NamedTuple):
    """The full device scene view, closed over by jitted integrators."""
    geom: GeometryTable
    materials: MaterialTable
    textures: TextureTable
    lights: LightTable
    sensor: SensorData
    media: MediumTable
    world_lo: Array    # (3,)
    world_hi: Array    # (3,)

    @property
    def host(self) -> dict:
        return host_meta(self)

    @property
    def num_tris(self) -> int:
        # shade rows are exactly one per triangle; geom.tris is optional
        # (None when the builder deduplicated the leaf data into the BVH)
        return self.geom.shade.shape[0]

    @property
    def num_lights(self) -> int:
        return self.lights.light_type.shape[0]


# ---------------------------------------------------------------------------
# Host-side metadata mirror
# ---------------------------------------------------------------------------
# The axon PJRT client drops into a permanently slower execution mode after
# the FIRST device->host transfer in a process (~0.4-3 ms added latency to
# every subsequent executable launch). Tracer construction must therefore
# never read scene arrays back from the device: `DynamicScene.build()`
# registers numpy mirrors of the small metadata tables here, and
# `host_meta(scene)` serves them without touching the device. The fallback
# (np.asarray readback) only triggers for hand-built SceneData in tests,
# which run on the CPU backend where transfers are free.

_HOST_META: dict = {}


def set_host_meta(scene: "SceneData", meta: dict) -> None:
    """Attach host (numpy) mirrors of scene metadata, keyed by identity of
    the geometry table (stable across film passes; refreshed on rebuild)."""
    import weakref
    key = id(scene.geom.wide)
    _HOST_META[key] = meta
    try:
        weakref.finalize(scene.geom.wide, _HOST_META.pop, key, None)
    except TypeError:
        pass


def host_meta(scene: "SceneData") -> dict:
    m = _HOST_META.get(id(scene.geom.wide))
    if m is None:
        import numpy as np
        m = dict(
            mat_type=np.asarray(scene.materials.mat_type),
            mat_tex=np.asarray(scene.materials.tex),
            # params[:, 32] is the alpha test mode (host.py:519) — without it
            # scene_has_alpha misses binary-mode materials with no mask texture
            mat_alpha_mode=np.asarray(scene.materials.params[:, 32]),
            world_lo=np.asarray(scene.world_lo),
            world_hi=np.asarray(scene.world_hi),
            light_type=np.asarray(scene.lights.light_type),
            n_media=int(np.asarray(scene.media.med_type).shape[0]),
        )
        set_host_meta(scene, m)
    return m
