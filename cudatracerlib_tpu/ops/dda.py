"""Amanatides-Woo DDA grid traversal over the sort-based hash grid.

TPU-native counterpart of the reference's grid walkers
(``Engine/SpatialStructures/Grid/SpatialGridTraversal.h:9-47`` TraverseGridRay
and ``:58`` TraverseGridBeamExt): every lane walks its ray's pierced cells in
lockstep inside one ``lax.fori_loop``; per-cell photon/beam rows are fetched
with the fixed-budget gathers of ops/hashgrid.py. Dead lanes idle (masked) —
the TPU analogue of warp lanes exiting the while loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import hashgrid

Array = jax.Array


def dda_walk(grid: hashgrid.HashGrid, o: Array, d: Array, t0: Array, t1: Array,
             visit_fn, init, max_cells: int = 64):
    """Walk the grid cells pierced by each ray segment [t0, t1].

    visit_fn(carry, flat_cell (B,), t_enter (B,), t_exit (B,), alive (B,))
    is called max_cells times; it must be shape-stable. Returns final carry.
    """
    B = o.shape[0]
    cell_size = 1.0 / grid.inv_cell
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    # clip the segment to the grid AABB (reference TraverseGridRay clamps the
    # ray to the grid before walking); rays starting outside enter at t_lo
    grid_hi = grid.lo + grid.dims.astype(jnp.float32) * cell_size
    ta = (grid.lo - o) / safe_d
    tb = (grid_hi - o) / safe_d
    t_lo = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t_hi = jnp.min(jnp.maximum(ta, tb), axis=-1)
    t0 = jnp.maximum(t0, t_lo)
    t1 = jnp.minimum(t1, t_hi)
    p0 = o + d * t0[:, None]
    cell = jnp.clip(((p0 - grid.lo) * grid.inv_cell).astype(jnp.int32),
                    0, grid.dims - 1)                          # (B, 3)
    step = jnp.where(safe_d > 0, 1, -1).astype(jnp.int32)
    t_delta = jnp.abs(cell_size / safe_d)                      # (B, 3)
    # parametric t of the next boundary crossing per axis
    next_b = grid.lo + (cell + jnp.where(step > 0, 1, 0)) * cell_size
    t_max3 = t0[:, None] + (next_b - p0) / safe_d              # (B, 3)

    def body(st):
        it, carry, cell, t_max3, t_cur, alive = st
        flat = (cell[:, 2] * grid.dims[1] + cell[:, 1]) * grid.dims[0] + cell[:, 0]
        t_exit = jnp.minimum(jnp.min(t_max3, axis=-1), t1)
        carry = visit_fn(carry, flat, t_cur, t_exit, alive)
        axis = jnp.argmin(t_max3, axis=-1)
        oh = jax.lax.broadcasted_iota(jnp.int32, (B, 3), 1) == axis[:, None]
        cell = cell + jnp.where(oh, step, 0)
        t_cur2 = jnp.min(t_max3, axis=-1)
        t_max3 = t_max3 + jnp.where(oh, t_delta, 0.0)
        in_bounds = jnp.all((cell >= 0) & (cell < grid.dims), axis=-1)
        alive = alive & (t_cur2 < t1) & in_bounds
        return it + 1, carry, cell, t_max3, t_cur2, alive

    # while_loop with an all-dead early exit instead of a fixed fori_loop:
    # each iteration pays the full per-cell photon gather even for masked
    # lanes (the gather indices are data-independent), so once every lane
    # has left the grid the remaining (max_cells - worst_lane) iterations
    # were pure waste — in the PPM eye pass bounce depths where most rays
    # have terminated, nearly ALL of max_cells was dead work. Bit-exact:
    # dead lanes contribute nothing to visit_fn by contract.
    alive0 = t0 < t1
    st = (jnp.int32(0), init, cell, t_max3, t0, alive0)
    st = jax.lax.while_loop(
        lambda s: (s[0] < max_cells) & jnp.any(s[5]), body, st)
    return st[1]


def gather_cell(grid: hashgrid.HashGrid, flat_cell: Array, accum_fn, carry,
                max_per_cell: int = 8):
    """accum_fn(carry, rows (B, K, W), mask (B, K)) called ONCE with all K
    candidate rows of each lane's cell batch-gathered.

    One (B, K) gather instead of K sequential (B,) gathers: the serial
    fori_loop variant cost ~51s per 256^2 fog-cornell eye pass (96 cells x
    16 rows x 6 bounces of tiny dependent gathers); batching collapses the
    inner factor."""
    start, count = hashgrid.query_ranges(grid, flat_cell)
    n = grid.data.shape[0]
    k = jnp.arange(max_per_cell, dtype=jnp.int32)
    idx = jnp.minimum(start[:, None] + k[None, :], n - 1)
    rows = hashgrid._gather_rows(grid, idx)              # (B, K, W)
    return accum_fn(carry, rows, k[None, :] < count[:, None])


def build_ball_grid(data: Array, positions: Array, valid: Array, radius,
                    lo: Array, hi: Array, max_dim: int = 96) -> hashgrid.HashGrid:
    """Grid for beam-radiance estimates: each row is inserted into every cell
    its radius-r ball overlaps (the 2x2x2 block when cell >= 2r), so a ray
    only needs to visit its OWN pierced cells (reference BeamGrid.h photon-disc
    insertion). Duplicate cells within a block are dropped; at query time a
    row must be accepted only when the visited cell contains the kernel foot
    point, which dedups rows shared by several cells."""
    N = data.shape[0]
    extent = jnp.maximum(hi - lo, 1e-6)
    # grow the cell (never clamp dims) so the grid always covers the full
    # medium: a clamped grid would silently clip both in-scatter and tau to a
    # corner of the volume once the progressive radius shrinks below
    # extent/max_dim (advisor finding, round 2)
    cell_size = jnp.maximum(2.0 * radius, jnp.max(extent) / (max_dim - 1))
    dims = jnp.ceil(extent / jnp.maximum(cell_size, 1e-6)).astype(jnp.int32) + 1
    inv_cell = 1.0 / jnp.maximum(cell_size, 1e-6)
    base = jnp.clip(((positions - radius - lo) * inv_cell).astype(jnp.int32),
                    0, dims - 2)
    offs = jnp.asarray([[i, j, k] for k in (0, 1) for j in (0, 1) for i in (0, 1)],
                       jnp.int32)
    c = jnp.clip(base[:, None, :] + offs[None, :, :], 0, dims - 1)   # (N,8,3)
    cid = (c[..., 2] * dims[1] + c[..., 1]) * dims[0] + c[..., 0]    # (N,8)
    # drop duplicate cells within each row's block
    dup = jnp.zeros((N, 8), bool)
    for j in range(1, 8):
        for i in range(j):
            dup = dup.at[:, j].set(dup[:, j] | (cid[:, j] == cid[:, i]))
    cid = jnp.where(valid[:, None] & ~dup, cid, jnp.int32(0x7FFFFFFF))
    cid_flat = cid.reshape(-1)
    order = jnp.argsort(cid_flat)
    data8 = jnp.repeat(data, 8, axis=0)
    sorted_rows = jnp.take(data8, order, axis=0)
    return hashgrid.HashGrid(data=sorted_rows,
                             cell_ids=jnp.take(cid_flat, order),
                             lo=lo, inv_cell=inv_cell, dims=dims,
                             data_t=sorted_rows.T)
