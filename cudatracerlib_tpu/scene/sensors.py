"""Sensor models: ray generation + direct sampling (for light-tracing splats).

Reference: ``SceneTypes/Sensor.h`` (Spherical/Perspective/ThinLens/Orthographic/
Telecentric with the Mitsuba sensor interface). Here each sensor is a row of
``SensorData``; the batched functions dispatch on the (scalar) sensor type with
`lax.switch` — the type is uniform per scene, so there is no divergence.

Param layout (SensorData.params):
  [0] fov_x (radians, perspective/thinlens)
  [1] near   [2] far
  [3] aperture_radius  [4] focus_distance
  [5] film_w  [6] film_h
  [7] ortho_scale_x  [8] ortho_scale_y
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..core import warp
from . import schema

Array = jax.Array


class SensorRays(NamedTuple):
    o: Array       # (B, 3)
    d: Array       # (B, 3)
    weight: Array  # (B, 3) importance weight (1 for ideal sensors)


def _match_vary(fn, vary: Array):
    """Make every float output of a switch branch data-depend on the per-lane
    inputs. Under `shard_map(..., check_vma=True)` the varying-axis checker
    types each `lax.switch` branch separately: a branch that builds an output
    purely from REPLICATED sensor params (e.g. the broadcast pinhole origin,
    or ortho's constant axis direction) types as replicated while another
    branch's same output types as device-varying, and the switch is rejected.
    Adding a varying zero (+0.0 is exact for all finite floats and fuses
    away) unifies the types without a collective."""
    B = vary.shape[0]

    def g(op):
        def fix(x):
            if not jnp.issubdtype(x.dtype, jnp.floating):
                return x
            return x + vary.reshape((B,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return jax.tree_util.tree_map(fix, fn(op))
    return g


def _film_to_camera_dir(params: Array, p_film: Array) -> Array:
    """Pixel coords (B,2) -> unnormalized camera-space direction (perspective)."""
    w, h = params[5], params[6]
    tan_half = jnp.tan(0.5 * params[0])
    x = (2.0 * p_film[..., 0] / w - 1.0) * tan_half
    y = (1.0 - 2.0 * p_film[..., 1] / h) * tan_half * (h / w)
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def sample_ray(sensor: schema.SensorData, p_film: Array, u_aperture: Array) -> SensorRays:
    """Generate camera rays for continuous film positions (pixels).

    p_film: (B, 2) continuous pixel coordinates in [0,W)x[0,H).
    u_aperture: (B, 2) uniforms for lens sampling (thinlens/telecentric).
    """
    B = p_film.shape[0]
    params = sensor.params
    t2w = sensor.to_world
    one = jnp.ones((B, 3), jnp.float32)

    def persp(_):
        d_cam = vm.normalize(_film_to_camera_dir(params, p_film))
        o = jnp.broadcast_to(t2w[:3, 3], (B, 3))
        d = vm.normalize(vm.transform_vector(t2w, d_cam))
        return SensorRays(o, d, one)

    def thinlens(_):
        d_cam = _film_to_camera_dir(params, p_film)
        focus = d_cam * (params[4] / d_cam[..., 2:3])  # point on focal plane
        lens = warp.square_to_uniform_disk_concentric(u_aperture) * params[3]
        o_cam = jnp.concatenate([lens, jnp.zeros((B, 1))], axis=-1)
        d_cam2 = vm.normalize(focus - o_cam)
        o = vm.transform_point(jnp.broadcast_to(t2w, (B, 4, 4)), o_cam)
        d = vm.normalize(vm.transform_vector(t2w, d_cam2))
        return SensorRays(o, d, one)

    def ortho(_):
        w, h = params[5], params[6]
        x = (2.0 * p_film[..., 0] / w - 1.0) * params[7]
        y = (1.0 - 2.0 * p_film[..., 1] / h) * params[8]
        o_cam = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
        o = vm.transform_point(jnp.broadcast_to(t2w, (B, 4, 4)), o_cam)
        # camera +z axis is the 3rd column of to_world (avoids an einsum over a
        # broadcast constant, which crashes the TPU fusion cost model)
        d = jnp.broadcast_to(t2w[:3, 2] / jnp.linalg.norm(t2w[:3, 2]), (B, 3))
        return SensorRays(o, d, one)

    def spherical(_):
        w, h = params[5], params[6]
        phi = (1.0 - p_film[..., 0] / w) * 2.0 * jnp.pi - jnp.pi
        theta = p_film[..., 1] / h * jnp.pi
        st, ct = jnp.sin(theta), jnp.cos(theta)
        d_cam = jnp.stack([st * jnp.sin(phi), ct, -st * jnp.cos(phi)], axis=-1)
        o = jnp.broadcast_to(t2w[:3, 3], (B, 3))
        d = vm.normalize(vm.transform_vector(t2w, d_cam))
        return SensorRays(o, d, one)

    def telecentric(_):
        w, h = params[5], params[6]
        x = (2.0 * p_film[..., 0] / w - 1.0) * params[7]
        y = (1.0 - 2.0 * p_film[..., 1] / h) * params[8]
        lens = warp.square_to_uniform_disk_concentric(u_aperture) * params[3]
        o_cam = jnp.stack([x + lens[..., 0], y + lens[..., 1], jnp.zeros_like(x)], axis=-1)
        focus = jnp.stack([x, y, jnp.full_like(x, params[4])], axis=-1)
        d_cam = vm.normalize(focus - o_cam)
        o = vm.transform_point(jnp.broadcast_to(t2w, (B, 4, 4)), o_cam)
        d = vm.normalize(vm.transform_vector(t2w, d_cam))
        return SensorRays(o, d, one)

    vary = 0.0 * (p_film[..., 0] + u_aperture[..., 0])
    return jax.lax.switch(
        sensor.sensor_type,
        [_match_vary(f, vary)
         for f in (spherical, persp, thinlens, ortho, telecentric)], None)


class SensorDirect(NamedTuple):
    """Result of sampling the sensor from a scene point (for splatting)."""
    p_film: Array   # (B, 2) continuous pixel coords
    d: Array        # (B, 3) unit direction ref -> sensor
    dist: Array     # (B,)
    weight: Array   # (B, 3) We / pdf  (importance over the solid-angle pdf)
    valid: Array    # (B,) inside frustum & in front


def sample_direct(sensor: schema.SensorData, ref_p: Array, u: Array) -> SensorDirect:
    """Connect a world point to the sensor (reference Sensor::sampleDirect).

    For pinhole perspective the aperture is a point: the pdf is a delta and the
    returned weight is the full importance We(p->lens) / p(lens) with the
    1/dist^2 geometry folded in, matching the light-tracer splat estimator.
    """
    params = sensor.params
    w2c = sensor.to_world_inv
    t2w = sensor.to_world
    B = ref_p.shape[0]
    if u is None:  # lens uniforms only matter for the telecentric aperture
        u = jnp.full((B, 2), 0.5)

    def persp(_):
        lens_world = jnp.broadcast_to(t2w[:3, 3], (B, 3))
        to_lens = lens_world - ref_p
        dist = vm.length(to_lens)
        d = to_lens / jnp.maximum(dist[..., None], 1e-12)
        p_cam = vm.transform_point(jnp.broadcast_to(w2c, (B, 4, 4)), ref_p)
        z = p_cam[..., 2]
        w, h = params[5], params[6]
        tan_half = jnp.tan(0.5 * params[0])
        x_ndc = p_cam[..., 0] / jnp.maximum(z, 1e-12) / tan_half
        y_ndc = p_cam[..., 1] / jnp.maximum(z, 1e-12) / (tan_half * h / w)
        px = (x_ndc + 1.0) * 0.5 * w
        py = (1.0 - y_ndc) * 0.5 * h
        valid = (z > params[1]) & (px >= 0) & (px < w) & (py >= 0) & (py < h)
        # Importance of the pinhole camera: We = d^2/(A_film cos^4 theta) with
        # the solid-angle measure at the camera; after change of variables the
        # per-sample film contribution is 1/(A_pixel_ratio * cos^3 * dist^2):
        cam_fwd = t2w[:3, 2] / jnp.linalg.norm(t2w[:3, 2])
        cos_theta = vm.dot(-d, jnp.broadcast_to(cam_fwd, (B, 3)))
        film_area = 4.0 * tan_half * tan_half * (h / w)  # in z=1 plane units
        ct = jnp.maximum(cos_theta, 1e-6)
        we = 1.0 / (film_area * ct ** 3 * jnp.maximum(dist, 1e-12) ** 2)
        we = jnp.where(valid, we, 0.0)
        return SensorDirect(p_film=jnp.stack([px, py], -1), d=d, dist=dist,
                            weight=jnp.repeat(we[..., None], 3, -1), valid=valid)

    def spherical(_):
        # inverse of the equirect mapping in sample_ray (reference
        # SphericalSensor::sampleDirect, Sensor.h:527-626): every direction
        # maps to a film position; dOmega/dA_norm = 2 pi^2 sin(theta)
        w, h = params[5], params[6]
        sensor_p = jnp.broadcast_to(t2w[:3, 3], (B, 3))
        to_sensor = sensor_p - ref_p
        dist = vm.length(to_sensor)
        d = to_sensor / jnp.maximum(dist[..., None], 1e-12)
        d_cam = vm.transform_vector(jnp.broadcast_to(w2c, (B, 4, 4)), -d)
        d_cam = vm.normalize(d_cam)
        theta = jnp.arccos(jnp.clip(d_cam[..., 1], -1.0, 1.0))
        phi = jnp.arctan2(d_cam[..., 0], -d_cam[..., 2])
        px = jnp.mod((1.0 - (phi + jnp.pi) / (2.0 * jnp.pi)) * w, w)
        py = jnp.clip(theta / jnp.pi * h, 0.0, h - 1e-3)
        sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
        we = 1.0 / (2.0 * jnp.pi ** 2 * sin_t * jnp.maximum(dist, 1e-12) ** 2)
        valid = dist > 1e-9
        we = jnp.where(valid, we, 0.0)
        return SensorDirect(p_film=jnp.stack([px, py], -1), d=d, dist=dist,
                            weight=jnp.repeat(we[..., None], 3, -1), valid=valid)

    def ortho(_):
        # parallel projection: the connection direction is the camera axis
        # (delta); the splat weight is 1/(world film area), no 1/dist^2
        w, h = params[5], params[6]
        sx, sy = params[7], params[8]
        p_cam = vm.transform_point(jnp.broadcast_to(w2c, (B, 4, 4)), ref_p)
        z = p_cam[..., 2]
        px = (p_cam[..., 0] / jnp.maximum(sx, 1e-9) + 1.0) * 0.5 * w
        py = (1.0 - p_cam[..., 1] / jnp.maximum(sy, 1e-9)) * 0.5 * h
        cam_fwd = t2w[:3, 2] / jnp.linalg.norm(t2w[:3, 2])
        d = jnp.broadcast_to(-cam_fwd, (B, 3))
        valid = (z > params[1]) & (px >= 0) & (px < w) & (py >= 0) & (py < h)
        area = 4.0 * sx * sy
        we = jnp.where(valid, 1.0 / jnp.maximum(area, 1e-12), 0.0)
        return SensorDirect(p_film=jnp.stack([px, py], -1), d=d, dist=z,
                            weight=jnp.repeat(we[..., None], 3, -1), valid=valid)

    def telecentric(_):
        # ortho with an aperture: sample a lens offset on the disc; the film
        # point follows from the focus-plane constraint (x stays the ray
        # family's anchor). Lens pdf cancels against the lens-area factor of
        # We (exact as aperture -> 0; reference TelecentricSensor).
        w, h = params[5], params[6]
        sx, sy = params[7], params[8]
        r_ap, fd = params[3], params[4]
        lens = warp.square_to_uniform_disk_concentric(u) * r_ap
        p_cam = vm.transform_point(jnp.broadcast_to(w2c, (B, 4, 4)), ref_p)
        z = p_cam[..., 2]
        # anchor (x, y) solving p_xy = x + lx * (1 - z/fd)
        x = p_cam[..., 0] - lens[..., 0] * (1.0 - z / jnp.maximum(fd, 1e-6))
        y = p_cam[..., 1] - lens[..., 1] * (1.0 - z / jnp.maximum(fd, 1e-6))
        o_cam = jnp.stack([x + lens[..., 0], y + lens[..., 1],
                           jnp.zeros_like(x)], -1)
        o_world = vm.transform_point(jnp.broadcast_to(t2w, (B, 4, 4)), o_cam)
        to_lens = o_world - ref_p
        dist = vm.length(to_lens)
        d = to_lens / jnp.maximum(dist[..., None], 1e-12)
        px = (x / jnp.maximum(sx, 1e-9) + 1.0) * 0.5 * w
        py = (1.0 - y / jnp.maximum(sy, 1e-9)) * 0.5 * h
        valid = (z > params[1]) & (px >= 0) & (px < w) & (py >= 0) & (py < h)
        area = 4.0 * sx * sy
        we = jnp.where(valid, 1.0 / jnp.maximum(area, 1e-12), 0.0)
        return SensorDirect(p_film=jnp.stack([px, py], -1), d=d, dist=dist,
                            weight=jnp.repeat(we[..., None], 3, -1), valid=valid)

    vary = 0.0 * (ref_p[..., 0] + u[..., 0])
    return jax.lax.switch(
        sensor.sensor_type,
        [_match_vary(f, vary)
         for f in (spherical, persp, persp, ortho, telecentric)], None)


def make_sensor(sensor_type: int, to_world, fov_x_deg: float = 35.0,
                film_w: int = 512, film_h: int = 512, near: float = 1e-3,
                far: float = 1e7, aperture_radius: float = 0.0,
                focus_distance: float = 1.0, ortho_scale=(1.0, 1.0)) -> schema.SensorData:
    import numpy as np
    params = np.zeros(16, np.float32)
    params[0] = np.deg2rad(fov_x_deg)
    params[1], params[2] = near, far
    params[3], params[4] = aperture_radius, focus_distance
    params[5], params[6] = film_w, film_h
    params[7], params[8] = ortho_scale
    t2w = np.asarray(to_world, np.float32)
    return schema.SensorData(
        sensor_type=jnp.int32(sensor_type),
        to_world=jnp.asarray(t2w),
        to_world_inv=jnp.asarray(np.linalg.inv(t2w)),
        params=jnp.asarray(params))
