"""Per-pixel debug visualizers.

Reference: ``Kernel/PixelDebugVisualizers/*`` — named float/Vec2f/Vec3f buffers
filled inside kernels and drawn as normalized scalar maps, quiver arrows, or
frames. TPU-native: integrators return extra per-pixel arrays; this module
normalizes and colormaps them for inspection.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


class DebugVisualizerManager:
    """Collects named per-pixel buffers and renders them to displayable RGB."""

    def __init__(self, width: int, height: int):
        self.w, self.h = width, height
        self.buffers: Dict[str, np.ndarray] = {}

    def record(self, name: str, values, pixel_x=None, pixel_y=None):
        """Store a full-frame (H,W[,C]) buffer or scatter lane values."""
        arr = np.asarray(values)
        if pixel_x is None:
            self.buffers[name] = arr.reshape(self.h, self.w, -1)
        else:
            buf = self.buffers.get(name)
            if buf is None:
                buf = np.zeros((self.h, self.w, arr.shape[-1] if arr.ndim > 1 else 1),
                               np.float32)
            buf[np.asarray(pixel_y), np.asarray(pixel_x)] = arr.reshape(len(arr), -1)
            self.buffers[name] = buf
        return self

    def normalized_scalar(self, name: str, percentile: float = 99.0) -> np.ndarray:
        """Scalar heatmap in [0,1] with robust normalization."""
        b = self.buffers[name]
        s = b.mean(-1) if b.ndim == 3 else b
        hi = np.percentile(s, percentile)
        lo = np.percentile(s, 100 - percentile)
        return np.clip((s - lo) / max(hi - lo, 1e-9), 0, 1)

    def heatmap(self, name: str) -> np.ndarray:
        """Viridis-ish 3-stop colormap of the normalized scalar."""
        t = self.normalized_scalar(name)[..., None]
        c0 = np.array([0.267, 0.005, 0.329])
        c1 = np.array([0.128, 0.567, 0.551])
        c2 = np.array([0.993, 0.906, 0.144])
        lo = c0 + (c1 - c0) * np.clip(t * 2, 0, 1)
        return np.where(t < 0.5, lo, c1 + (c2 - c1) * np.clip(t * 2 - 1, 0, 1))

    def vector_map(self, name: str) -> np.ndarray:
        """Vec3 buffer displayed as 0.5 + 0.5*normalize(v) (frame drawing)."""
        b = self.buffers[name]
        n = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
        return 0.5 + 0.5 * n

    def quiver(self, name: str, stride: int = 8) -> np.ndarray:
        """ASCII-art style arrow overlay for Vec2 buffers: returns an RGB image
        with arrow segments rasterized (a minimal IDebugDrawer)."""
        b = self.buffers[name][..., :2]
        img = np.zeros((self.h, self.w, 3), np.float32)
        mag = np.linalg.norm(b, axis=-1)
        mmax = max(mag.max(), 1e-9)
        for y in range(stride // 2, self.h, stride):
            for x in range(stride // 2, self.w, stride):
                v = b[y, x] / mmax * (stride * 0.45)
                n = int(max(abs(v[0]), abs(v[1]), 1))
                for i in range(n + 1):
                    xi = int(round(x + v[0] * i / n))
                    yi = int(round(y + v[1] * i / n))
                    if 0 <= xi < self.w and 0 <= yi < self.h:
                        img[yi, xi] = (1.0, 0.8, 0.2)
        return img
