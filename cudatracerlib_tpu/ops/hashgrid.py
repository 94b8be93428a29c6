"""Sort-based spatial hash grid for photon/beam storage.

TPU-native replacement of the reference's atomic linked-list grids
(`Engine/SpatialStructures/Grid/SpatialGridList.h:43-127`): instead of
atomicExchange list heads, photons are hashed to cells, sorted by cell id, and
cell ranges are recovered with binary searches — an all-dense, scatter-free
pipeline that XLA vectorizes end to end. Queries iterate the 8 cells of the
radius-aligned neighborhood with fixed per-cell photon budgets (masked).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class HashGrid(NamedTuple):
    data: Array        # (N, K) photon rows, sorted by cell id
    cell_ids: Array    # (N,) sorted cell id per row (-1 rows sort last)
    lo: Array          # (3,) grid origin
    inv_cell: Array    # () 1/cell_size
    dims: Array        # (3,) i32 grid resolution
    data_t: Array = None   # (K, N) MATERIALIZED transpose: queries gather
    #                        along axis 1 (the multi-row lane-gather fast
    #                        path, ~17x the per-row axis-0 gather — the PPM
    #                        eye pass was 51 s/pass through the slow path,
    #                        bench_out/r5_queue6.log)


def cell_of(grid: HashGrid, p: Array) -> Array:
    """Flat cell index of world positions (clamped to the grid)."""
    c = ((p - grid.lo) * grid.inv_cell).astype(jnp.int32)
    c = jnp.clip(c, 0, grid.dims - 1)
    return (c[..., 2] * grid.dims[1] + c[..., 1]) * grid.dims[0] + c[..., 0]


def build_grid(data: Array, positions: Array, valid: Array, lo: Array,
               hi: Array, cell_size: Array, max_dim: int = 128) -> HashGrid:
    """Sort photon rows by grid cell. Invalid rows get cell -1... sorted last.

    data: (N, K) photon payload rows; positions: (N, 3); valid: (N,).
    """
    extent = jnp.maximum(hi - lo, 1e-6)
    dims = jnp.minimum(jnp.ceil(extent / jnp.maximum(cell_size, 1e-6)).astype(jnp.int32) + 1,
                       max_dim)
    inv_cell = 1.0 / jnp.maximum(cell_size, 1e-6)
    g = HashGrid(data=data, cell_ids=None, lo=lo, inv_cell=inv_cell, dims=dims)
    cid = jnp.where(valid, cell_of(g, positions), jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(cid)
    sorted_rows = jnp.take(data, order, axis=0)
    return HashGrid(data=sorted_rows,
                    cell_ids=jnp.take(cid, order),
                    lo=lo, inv_cell=inv_cell, dims=dims,
                    data_t=sorted_rows.T)


def query_ranges(grid: HashGrid, cells: Array):
    """(start, count) of the sorted rows for each query cell id (B,)."""
    start = jnp.searchsorted(grid.cell_ids, cells, side="left")
    end = jnp.searchsorted(grid.cell_ids, cells, side="right")
    return start.astype(jnp.int32), (end - start).astype(jnp.int32)


def neighbor_cells(grid: HashGrid, p: Array, radius: Array) -> Array:
    """The 8 cells covering a radius-r ball when cell_size >= 2r: offset the
    query by -r and take the 2x2x2 block. Returns (B, 8) cell ids."""
    base = ((p - radius[..., None] - grid.lo) * grid.inv_cell).astype(jnp.int32)
    base = jnp.clip(base, 0, grid.dims - 2)
    offs = jnp.asarray([[i, j, k] for k in (0, 1) for j in (0, 1) for i in (0, 1)],
                       jnp.int32)                     # (8,3)
    c = base[:, None, :] + offs[None, :, :]
    c = jnp.clip(c, 0, grid.dims - 1)
    return (c[..., 2] * grid.dims[1] + c[..., 1]) * grid.dims[0] + c[..., 0]


def _gather_rows(grid: HashGrid, idx: Array) -> Array:
    """Fetch photon rows by index, shape-preserving: idx (...,) -> (..., W).

    Goes through the materialized (W, N) transpose when present: one axis-1
    multi-row lane gather + a result transpose (fused into consumers)
    instead of a per-row axis-0 gather, which TPU lowers to a ~7 ns/element
    serial path."""
    if grid.data_t is None:
        return jnp.take(grid.data, idx, axis=0)
    flat = jnp.take(grid.data_t, idx.reshape(-1), axis=1)   # (W, prod)
    return jnp.moveaxis(flat.reshape((-1,) + idx.shape), 0, -1)


def gather_neighbors(grid: HashGrid, p: Array, radius: Array,
                     accum_fn, init, max_per_cell: int = 16):
    """Gather photons within `radius` of each query point.

    accum_fn(carry, rows (B, 8*K, W), mask (B, 8*K)) -> carry, called ONCE
    with the whole 2x2x2 neighborhood batch-gathered (positions assumed in
    rows[..., 0:3]). One big gather replaces 8*K sequential small ones —
    the serial loop was the PPM eye pass's dominant cost."""
    B = p.shape[0]
    cells = neighbor_cells(grid, p, radius)            # (B, 8)
    n = grid.data.shape[0]
    start, count = query_ranges(grid, cells.reshape(-1))
    start = start.reshape(B, 8)
    count = count.reshape(B, 8)
    k = jnp.arange(max_per_cell, dtype=jnp.int32)
    idx = jnp.minimum(start[:, :, None] + k[None, None, :], n - 1)
    rows = _gather_rows(grid, idx.reshape(B, 8 * max_per_cell))
    in_rng = (k[None, None, :] < count[:, :, None]).reshape(B, -1)
    d2 = jnp.sum((rows[..., 0:3] - p[:, None, :]) ** 2, axis=-1)
    mask = in_rng & (d2 <= (radius * radius)[:, None])
    return accum_fn(init, rows, mask)
