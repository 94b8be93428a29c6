"""Image pipeline: reconstruction filters, tone mapping, NLM denoising.

Reference: ``Kernel/ImagePipeline/*`` — `applyImagePipeline` staging (filter ->
post-process -> gamma), `CanonicalFilter` applying any `Filter` aggregate,
`NonLocalMeansFilter` (variance-weighted patch distances in shared-memory
tiles) and `ToneMapPostProcess` (Reinhard05 luminance adaptation). TPU-native:
filters are separable depthwise convolutions; NLM is a shifted-image sum over
the search window — both all-dense XLA ops, no tiling needed.

Reconstruction filter shapes mirror ``SceneTypes/Filter.h``: box, gaussian,
mitchell, lanczos-sinc, triangle (tent).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import spectrum
from . import blocksampler as bs
from . import film as filmmod

Array = jax.Array

F_BOX, F_GAUSSIAN, F_MITCHELL, F_LANCZOS, F_TRIANGLE = 0, 1, 2, 3, 4


def filter_kernel_1d(filter_type: int, radius: float = 2.0, taps: int = 5) -> np.ndarray:
    """Discrete 1D reconstruction kernel (normalized)."""
    x = np.linspace(-radius, radius, taps)
    if filter_type == F_BOX:
        w = (np.abs(x) <= 0.5).astype(np.float64)
        w = np.maximum(w, 1e-9) if w.sum() == 0 else w
    elif filter_type == F_GAUSSIAN:
        s = radius / 2.0
        w = np.exp(-0.5 * (x / s) ** 2) - np.exp(-0.5 * (radius / s) ** 2)
        w = np.maximum(w, 0)
    elif filter_type == F_MITCHELL:
        b = c = 1.0 / 3.0
        ax = np.abs(x)
        w = np.where(ax < 1,
                     ((12 - 9 * b - 6 * c) * ax ** 3 + (-18 + 12 * b + 6 * c) * ax ** 2
                      + (6 - 2 * b)) / 6,
                     np.where(ax < 2,
                              ((-b - 6 * c) * ax ** 3 + (6 * b + 30 * c) * ax ** 2
                               + (-12 * b - 48 * c) * ax + (8 * b + 24 * c)) / 6, 0.0))
    elif filter_type == F_LANCZOS:
        t = 3.0
        def sinc(v):
            safe = np.where(np.abs(v) < 1e-6, 1.0, v)
            return np.where(np.abs(v) < 1e-6, 1.0, np.sin(np.pi * safe) / (np.pi * safe))
        w = sinc(x) * sinc(x / t) * (np.abs(x) <= radius)
    else:  # triangle
        w = np.maximum(1.0 - np.abs(x) / radius, 0.0)
    return (w / w.sum()).astype(np.float32)


def apply_filter(img: Array, filter_type: int, radius: float = 2.0,
                 taps: int = 5) -> Array:
    """Separable reconstruction filter over an (H, W, 3) image."""
    if filter_type == F_BOX and taps <= 1:
        return img
    k = jnp.asarray(filter_kernel_1d(filter_type, radius, taps))
    pad = taps // 2
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    rows = sum(k[i] * x[i:i + img.shape[0]] for i in range(taps))
    x = jnp.pad(rows, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    return sum(k[i] * x[:, i:i + img.shape[1]] for i in range(taps))


def tonemap_reinhard05(img: Array, key: float = 0.18, burn: float = 1.0) -> Array:
    """Reinhard photographic tonemapping over Yxy luminance (the reference's
    ToneMapPostProcess: log-average luminance reduction + Yxy curve)."""
    lum = spectrum.luminance(img)
    log_avg = jnp.exp(jnp.mean(jnp.log(1e-4 + lum)))
    lw = jnp.maximum(lum, 1e-8)
    l_scaled = key / jnp.maximum(log_avg, 1e-8) * lw
    l_white2 = jnp.maximum((burn * jnp.max(l_scaled)) ** 2, 1e-4)
    l_out = l_scaled * (1.0 + l_scaled / l_white2) / (1.0 + l_scaled)
    return img * (l_out / lw)[..., None]


def nlm_denoise(img: Array, variance: Array | None = None,
                search_radius: int = 5, patch_radius: int = 1,
                strength: float = 0.15) -> Array:
    """Non-local means with optional per-pixel variance modulation.

    Shifted-image formulation: for each offset in the search window, the patch
    distance field is a box-filtered squared difference — everything stays
    dense (H, W) math (the TPU-native version of the reference's 64^2
    shared-memory tiles)."""
    H, W, _ = img.shape
    if variance is None:
        variance = jnp.full((H, W), 1e-4)
    h2 = jnp.maximum(strength * strength, 1e-6)
    psz = 2 * patch_radius + 1

    def box(x):
        p = patch_radius
        xp = jnp.pad(x, ((p, p), (p, p)), mode="edge")
        acc = jnp.zeros_like(x)
        for dy in range(psz):
            for dx in range(psz):
                acc = acc + xp[dy:dy + H, dx:dx + W]
        return acc / (psz * psz)

    acc = jnp.zeros_like(img)
    wsum = jnp.zeros((H, W))
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            shifted = jnp.roll(img, (dy, dx), axis=(0, 1))
            var_s = jnp.roll(variance, (dy, dx), axis=(0, 1))
            d2 = ((img - shifted) ** 2).mean(-1)
            # variance-cancelled distance (Rousselle/Buades style)
            cancel = variance + jnp.minimum(variance, var_s)
            dist = box((d2 - cancel) / (1e-6 + h2 * (variance + var_s)))
            wgt = jnp.exp(-jnp.maximum(dist, 0.0))
            acc = acc + shifted * wgt[..., None]
            wsum = wsum + wgt
    return acc / jnp.maximum(wsum, 1e-9)[..., None]


def apply_pipeline(film: filmmod.Film, filter_type: int = F_BOX,
                   tonemap: bool = False, denoise: bool = False,
                   vb: "bs.VarianceBuffer | None" = None,
                   splat_scale=None) -> Array:
    """filter -> (NLM) -> (tonemap): returns linear HDR RGB ready for sRGB.

    Mirrors `applyImagePipeline(tracer, img, filter)` (ImagePipeline.cu:54-84);
    note sample-side filtering already happens via filter importance sampling,
    so `filter_type` here is the display-time reconstruction pass.
    """
    img = filmmod.develop(film, splat_scale)
    if filter_type != F_BOX:
        img = apply_filter(img, filter_type)
    if denoise:
        var = bs.pixel_variance(vb) if vb is not None else None
        img = nlm_denoise(img, var)
    if tonemap:
        img = tonemap_reinhard05(img)
    return img
