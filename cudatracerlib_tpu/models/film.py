"""Film / image accumulation buffers.

Reference: ``Engine/Image.h`` — 3-stage film with filtered accumulation
(`AddSample`) and atomic light-tracing splats (`Splat`). TPU-native version:
the accumulation buffers are a pytree threaded through jitted passes;
`add_samples` uses scatter-add over pixel ids (XLA lowers this efficiently),
and splats are identical scatter-adds — no atomics needed. Reconstruction
filtering uses filter importance sampling at ray-gen time (the jitter is drawn
from the filter distribution), so accumulation weights stay 1.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Film(NamedTuple):
    rgb: Array      # (H, W, 3) f32 weighted sample sum
    weight: Array   # (H, W) f32 sum of sample weights
    splat: Array    # (H, W, 3) f32 splat sum (light tracing / BDPT t=1)
    n_passes: Array  # () f32 number of completed passes (for splat scale)

    @property
    def h(self):
        return self.rgb.shape[0]

    @property
    def w(self):
        return self.rgb.shape[1]


def new_film(w: int, h: int) -> Film:
    return Film(rgb=jnp.zeros((h, w, 3), jnp.float32),
                weight=jnp.zeros((h, w), jnp.float32),
                splat=jnp.zeros((h, w, 3), jnp.float32),
                n_passes=jnp.float32(0.0))


def add_samples(film: Film, pixel_x: Array, pixel_y: Array, value: Array,
                weight=None, mask=None) -> Film:
    """Scatter-add sample values at integer pixel coords."""
    B = pixel_x.shape[0]
    if weight is None:
        weight = jnp.ones(B, jnp.float32)
    if mask is not None:
        weight = jnp.where(mask, weight, 0.0)
    value = jnp.where(jnp.isfinite(value), value, 0.0) * weight[:, None]
    flat = pixel_y * film.w + pixel_x
    rgb = film.rgb.reshape(-1, 3).at[flat].add(value, mode="drop").reshape(film.rgb.shape)
    wsum = film.weight.reshape(-1).at[flat].add(weight, mode="drop").reshape(film.weight.shape)
    return film._replace(rgb=rgb, weight=wsum)


def add_samples_range(film: Film, start, value: Array, weight=None) -> Film:
    """Fast path for contiguous pixel ranges (PT chunks render pixel
    [start, start+B) in order): a dynamic-slice add instead of a scatter,
    which TPU lowers far more efficiently."""
    B = value.shape[0]
    if weight is None:
        weight = jnp.ones(B, jnp.float32)
    value = jnp.where(jnp.isfinite(value), value, 0.0) * weight[:, None]
    flat_rgb = film.rgb.reshape(-1, 3)
    cur = jax.lax.dynamic_slice(flat_rgb, (start, 0), (B, 3))
    flat_rgb = jax.lax.dynamic_update_slice(flat_rgb, cur + value, (start, 0))
    flat_w = film.weight.reshape(-1)
    cur_w = jax.lax.dynamic_slice(flat_w, (start,), (B,))
    flat_w = jax.lax.dynamic_update_slice(flat_w, cur_w + weight, (start,))
    return film._replace(rgb=flat_rgb.reshape(film.rgb.shape),
                         weight=flat_w.reshape(film.weight.shape))


def splat(film: Film, pixel_x: Array, pixel_y: Array, value: Array,
          mask=None) -> Film:
    if mask is not None:
        value = jnp.where(mask[:, None], value, 0.0)
    value = jnp.where(jnp.isfinite(value), value, 0.0)
    flat = pixel_y * film.w + pixel_x
    sp = film.splat.reshape(-1, 3).at[flat].add(value, mode="drop").reshape(film.splat.shape)
    return film._replace(splat=sp)


def develop(film: Film, splat_scale: float | Array = None) -> Array:
    """Resolve to linear HDR RGB (reference Image::InternalUpdateDisplay)."""
    w = jnp.maximum(film.weight, 1e-8)[..., None]
    img = film.rgb / w
    if splat_scale is None:
        splat_scale = 1.0 / jnp.maximum(film.n_passes, 1.0)
    return img + film.splat * splat_scale


def to_srgb_u8(hdr: Array) -> Array:
    from ..core import spectrum
    return (jnp.clip(spectrum.linear_to_srgb(hdr), 0.0, 1.0) * 255.0).astype(jnp.uint8)


def save_png(hdr: Array, path: str):
    import numpy as np
    from PIL import Image as PILImage
    arr = np.asarray(to_srgb_u8(hdr))
    PILImage.fromarray(arr).save(path)


def save_hdr_npz(hdr: Array, path: str):
    import numpy as np
    np.savez_compressed(path, hdr=np.asarray(hdr))
