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

    return jax.lax.switch(sensor.sensor_type,
                          [spherical, persp, thinlens, ortho, telecentric], None)


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

    def fallback(_):
        # Non-perspective direct sampling lands in a later stage; return invalid.
        z2 = jnp.zeros((B, 2))
        z3 = jnp.zeros((B, 3))
        return SensorDirect(p_film=z2, d=z3, dist=jnp.zeros(B),
                            weight=z3, valid=jnp.zeros(B, bool))

    return jax.lax.switch(sensor.sensor_type,
                          [fallback, persp, persp, fallback, fallback], None)


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
