"""Adaptive progressive rendering: block-sampled path tracing.

Reference: ``Tracer<PROGRESSIVE>::DoPass`` wiring of IBlockSampler +
PixelVarianceBuffer (`Kernel/Tracer.h:209-248`): each pass renders the blocks
the sampler chose, then updates the variance buffer and block weights.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..scene import schema
from . import blocksampler as bs
from . import film as filmmod
from . import path as pathmod
from . import tracer

Array = jax.Array


class AdaptivePathTracer(tracer.TracerBase):
    """Path tracer whose passes concentrate samples on high-variance blocks."""

    def __init__(self, scene, width, height, max_depth: int = 8,
                 mode: int = bs.B_VARIANCE, blocks_per_pass: Optional[int] = None,
                 select_rect=None, seed: int = 0,
                 active_types: Optional[Sequence[int]] = None):
        super().__init__(scene, width, height, seed=seed)
        assert width % bs.BLOCK == 0 and height % bs.BLOCK == 0, \
            f"film must be a multiple of {bs.BLOCK}"
        self.max_depth = max_depth
        self.mode = mode
        self.select_rect = select_rect
        nb = (width // bs.BLOCK) * (height // bs.BLOCK)
        self.blocks_per_pass = blocks_per_pass or nb
        self.n_det = max(self.blocks_per_pass // 2, 1)
        self.n_wt = self.blocks_per_pass - self.n_det
        if active_types is None:
            active_types = pathmod.scene_active_types(scene)
        self.active_types = tuple(active_types)
        self.vb = bs.VarianceBuffer.new(width, height)
        self._jitted = jax.jit(partial(
            _adaptive_pass, w=width, h=height, max_depth=max_depth,
            mode=mode, n_det=self.n_det, n_wt=self.n_wt,
            active_types=self.active_types,
            select_rect=tuple(select_rect) if select_rect else None))

    def render_pass(self, scene, film, pass_idx):
        film, self.vb = self._jitted(scene, film, self.vb, jnp.int32(pass_idx))
        return film

    def error_map(self):
        return bs.halfbuffer_error(self.vb)


def _adaptive_pass(scene: schema.SceneData, film: filmmod.Film,
                   vb: bs.VarianceBuffer, pass_idx, w: int, h: int,
                   max_depth: int, mode: int, n_det: int, n_wt: int,
                   active_types, select_rect):
    weights = bs.block_weights(vb, w, h, mode, select_rect)
    blocks = bs.choose_blocks(weights, n_det, n_wt, pass_idx, jnp.uint32(0xB10C))
    pixel_idx = bs.block_pixels(blocks, w).astype(jnp.int32)
    rays, px, py, state, wt = tracer.gen_camera_rays(
        scene, pixel_idx, pass_idx, pass_idx, w, h)
    L, state = pathmod.pt_radiance(scene, rays, state, max_depth,
                                   active_types=active_types)
    ok = jnp.ones(pixel_idx.shape[0], bool)
    film = filmmod.add_samples(film, px, py, L * wt, mask=ok)
    vb = bs.add_samples(vb, px, py, L, jnp.broadcast_to(pass_idx, px.shape), ok)
    return film, vb
