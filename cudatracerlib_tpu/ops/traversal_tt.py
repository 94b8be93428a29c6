"""HBM-scale Pallas traversal: top-tree phase + sorted treelet-wavefront phase.

Scenes whose fat-row table exceeds VMEM (~24k tris) cannot use the on-chip
kernel (ops/traversal_pl.py); the XLA gather loop that replaces it is
dispatch-overhead-bound (~23 GB/s effective on the san-miguel stand-in, 2.8%
of v5e HBM peak). This module is the TPU-native redesign of the reference's
streaming megakernel (`Kernel/TraceHelper.cu:326-734`, Aila-Laine persistent
threads over L2):

  phase 1  `_top_kernel`: traverse the VMEM-resident TOP table
           (scene/treelet.py). Virtual leaves (row >= n_top) record a
           (ray, treelet) visit instead of testing triangles; real top-level
           leaves produce hits that also serve as t_best pruning for phase 2.
  sort     visits by treelet id (XLA argsort) and scatter them into fixed
           BLOCK-sized per-treelet visit blocks.
  phase 2  `_treelet_kernel`: grid over visit blocks; each block's treelet
           slab is selected by a scalar-prefetched id, so the Pallas pipeline
           DMAs it HBM->VMEM double-buffered — and skips the copy entirely
           when consecutive blocks share a slab (the sort makes runs).
  reduce   scatter-min the per-visit hits back onto rays.

Trade-off vs a single traversal: no t_best sharing ACROSS treelets of one
ray (each visit prunes only with the phase-1 top-leaf t), costing some
duplicate leaf work in exchange for perfectly coherent HBM traffic.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traversal import Hit, Rays, _safe_inv
from ..scene.treelet import VID_ROOT_BITS as _VID_ROOT_BITS

Array = jax.Array

DONE = -1
POP = -0x40000000
LANES = 128
STACK_D = 16
import os as _os                                             # noqa: E402
DEFAULT_K = 8
DEFAULT_G = 4
# phase-2 block = K2*G2*128 slots: smaller blocks cut the per-treelet
# round-up padding (~T*block slots); larger blocks amortize per-block slab
# DMA switches and halve the glue's block count. Never swept before round 5b.
DEFAULT_K2 = int(_os.environ.get("CTL_TT_K2", "2"))
DEFAULT_G2 = int(_os.environ.get("CTL_TT_G2", "2"))
DEFAULT_V = 6           # treelet-visit budget per ray (overflow is counted;
#                         rays past the budget re-traverse on the XLA path)
# two-round phase 2 (cross-treelet t_best): round A runs each ray's V/2
# nearest-entry visits; round B skips visits whose slab entry can no longer
# beat the tightened t. Default OFF: measured e2e LOSS on san-miguel
# (bench_out/r5_queue3.log: 0.918 Mrays/s on vs 1.097 off — the second
# dispatch round's fixed glue exceeds the pruning win; the entry-ordered
# nearest-V selection at phase 1 already captures most of the monotone-t
# benefit). Kept as an exactness-tested option for scenes with deeper
# occlusion stacks.
TWO_ROUND = _os.environ.get("CTL_TT_TWO_ROUND", "0") == "1"
# inverse-permutation implementation for the phase-2 slot map ("scatter" =
# flagged unique-index scatter, "sort" = second variadic sort)
UNSORT_IMPL = _os.environ.get("CTL_TT_UNSORT", "scatter")
# slot-fill implementation: "scatter" (sorted unique-index scatters of the
# sorted visits into their slots) vs "gather" (per-slot source-index take)
SLOTFILL_IMPL = _os.environ.get("CTL_TT_SLOTFILL", "scatter")


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _step_core(rt, regs, cur, t_best, any_hit, virtual=None, anyh=None):
    """One state-machine step on a gathered (128, B) row block: node slab
    test + 12-wide Moller-Trumbore. Returns the step decision pieces.
    Shared by both kernels here (traversal_pl duplicates this inline).
    regs = (ox, oy, oz, dx, dy, dz, ix, iy, iz, tmn).
    anyh: optional (1, B) int32 (0/1) — PER-LANE any-hit early-out (mixed
    closest+shadow wavefronts; static any_hit must be False with it). Kept
    int32 because Mosaic rejects selects on i1 vectors."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz, tmn = regs
    inf = jnp.float32(jnp.inf)
    bit8 = jnp.int32(1) << jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    j8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    j12 = jax.lax.broadcasted_iota(jnp.int32, (12, LANES), 0)
    is_node = cur >= 0
    is_leaf = cur <= -2
    if virtual is not None:
        is_leaf = is_leaf & ~virtual

    t0x = (rt[0:8] - ox) * ix
    t1x = (rt[24:32] - ox) * ix
    t0y = (rt[8:16] - oy) * iy
    t1y = (rt[32:40] - oy) * iy
    t0z = (rt[16:24] - oz) * iz
    t1z = (rt[40:48] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                     jnp.maximum(jnp.minimum(t0z, t1z), tmn))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                     jnp.minimum(jnp.maximum(t0z, t1z), t_best))
    links = _i32(rt[48:56])
    eligible = (tn <= tf) & (links != DONE) & (((cur & 0xFF) & bit8) != 0)
    t_sel = jnp.where(eligible, tn, inf)
    tmin_c = jnp.min(t_sel, axis=0, keepdims=True)
    best_j = jnp.argmin(t_sel, axis=0)[None, :].astype(jnp.int32)
    has_child = tmin_c < inf
    oh8 = j8 == best_j
    link_best = jnp.sum(jnp.where(oh8, links, 0), axis=0, keepdims=True)
    elig_bits = jnp.sum(jnp.where(eligible, bit8, 0), axis=0, keepdims=True)
    remaining = elig_bits & ~(jnp.int32(1) << best_j)
    descend = jnp.where(link_best >= 0, (link_best << 8) | 0xFF, link_best)
    node_next = jnp.where(has_child, descend, POP)
    push = is_node & has_child & (remaining != 0)
    push_val = ((cur >> 8) << 8) | remaining

    v0x, v0y, v0z = rt[0:12], rt[12:24], rt[24:36]
    e1x, e1y, e1z = rt[36:48], rt[48:60], rt[60:72]
    e2x, e2y, e2z = rt[72:84], rt[84:96], rt[96:108]
    ids = _i32(rt[108:120])
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    tri_ok = ((ids != -1) & (jnp.abs(det) >= 1e-12) & (u >= 0) & (v >= 0)
              & (u + v <= 1.0) & (t > tmn) & (t < t_best))
    t_tri = jnp.where(tri_ok, t, inf)
    t_hit = jnp.min(t_tri, axis=0, keepdims=True)
    oh12 = j12 == jnp.argmin(t_tri, axis=0)[None, :].astype(jnp.int32)
    leaf_hit = is_leaf & (t_hit < inf)

    nxt = jnp.where(is_node, node_next,
                    jnp.where(cur <= -2, jnp.int32(POP), jnp.int32(DONE)))
    if any_hit:
        nxt = jnp.where(leaf_hit, jnp.int32(DONE), nxt)
    elif anyh is not None:
        nxt = jnp.where(leaf_hit & (anyh != 0), jnp.int32(DONE), nxt)
    hit_vals = (t_hit,
                jnp.sum(jnp.where(oh12, ids, 0), axis=0, keepdims=True),
                jnp.sum(jnp.where(oh12, u, 0.0), axis=0, keepdims=True),
                jnp.sum(jnp.where(oh12, v, 0.0), axis=0, keepdims=True))
    # descend_t: entry t of the child being descended into this step (valid
    # when is_node & has_child). The NEXT step's cur is that child, so a
    # carried register set from this value is the precise slab-entry t of
    # every leaf/virtual-leaf arrival (leaves are only reached by descends;
    # pops return to parent NODES which re-test and re-descend).
    descend_t = jnp.where(is_node & has_child, tmin_c, jnp.float32(0.0))
    descend = is_node & has_child
    return leaf_hit, hit_vals, nxt, push, push_val, descend_t, descend


def _push_pop(stack, sp, cur, nxt, push, push_val):
    pushed = pltpu.roll(stack, 1, 0)
    pushed = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (STACK_D, LANES), 0) == 0,
        push_val, pushed)
    stack = jnp.where(push, pushed, stack)
    sp = sp + push.astype(jnp.int32)
    want_pop = nxt == POP
    can_pop = want_pop & (sp > 0)
    top = stack[0:1]
    popped = pltpu.roll(stack, STACK_D - 1, 0)
    stack = jnp.where(can_pop, popped, stack)
    sp = jnp.where(can_pop, sp - 1, sp)
    cur = jnp.where(want_pop, jnp.where(can_pop, top, DONE), nxt)
    return stack, sp, cur


def _top_kernel(table_ref, rays_ref, out_ref, vis_ref, vist_ref, *, n_slabs,
                n_top, any_hit, K, G, V, max_iters):
    """Phase 1: top-table traversal emitting real hits + treelet visits.

    Visit retention is NEAREST-V (round 5): each ray keeps the V visits with
    the smallest slab-entry t seen so far (one-hot max-replace once full)
    instead of the first V in traversal order, and tracks the MINIMUM entry t
    over everything it dropped. The caller's exactness fallback then fires
    only when that min-dropped entry is closer than the final hit — in dense
    regions the nearest treelets contain the hit, so the fallback mass
    collapses vs the round-4 `vcnt > V` gate (which fired on 30%+ of rays on
    san-miguel and re-traversed them on the slow XLA loop). Matches the
    reference's full-tree monotone-t pruning guarantee
    (`Kernel/TraceHelper.cu:446-718`) at equal final results."""
    tb = table_ref[:]
    slabs = [tb[:, s * LANES:(s + 1) * LANES] for s in range(n_slabs)]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)
    iota_kv = jax.lax.broadcasted_iota(jnp.int32, (K * V, LANES), 0)
    inf = jnp.float32(jnp.inf)

    def fetch_row(row_idx):
        ri = jnp.clip(row_idx, 0, n_top - 1)
        lo = jnp.broadcast_to(ri & (LANES - 1), (LANES, LANES))
        hi = ri >> 7
        rt = jnp.take_along_axis(slabs[0], lo, axis=1)
        for s in range(1, n_slabs):
            g = jnp.take_along_axis(slabs[s], lo, axis=1)
            rt = jnp.where(jnp.broadcast_to(hi == s, (LANES, LANES)), g, rt)
        return rt

    def tile_init(g):
        rays_g = rays_ref[:, :, g * LANES:(g + 1) * LANES]
        first = [rays_g[a, 0:1, :] for a in range(12)]
        # attrs[11] is the TOP-LOCAL root row; ~root marks per-lane any-hit
        raw = _i32(first[11])
        anyh = (raw < 0).astype(jnp.int32)   # i32 carry: Mosaic rejects
        #                                      selects on i1 vectors
        cur = (jnp.where(raw < 0, ~raw, raw) << 8) | 0xFF
        outs = (jnp.zeros((K, LANES), jnp.float32),
                jnp.full((K, LANES), -1, jnp.int32),
                jnp.zeros((K, LANES), jnp.float32),
                jnp.zeros((K, LANES), jnp.float32))
        return (cur, jnp.zeros((1, LANES), jnp.int32),
                jnp.zeros((1, LANES), jnp.int32),
                jnp.zeros((STACK_D, LANES), jnp.int32),
                tuple(first[:10]), first[10],
                jnp.full((1, LANES), -1, jnp.int32),
                jnp.zeros((1, LANES), jnp.float32),
                jnp.zeros((1, LANES), jnp.float32), outs,
                jnp.full((K * V, LANES), -1, jnp.int32),   # visit tids
                jnp.zeros((1, LANES), jnp.int32),          # vcount (cur ray)
                jnp.zeros((K, LANES), jnp.int32),          # counts out
                anyh,
                jnp.zeros((1, LANES), jnp.float32),        # tent (entry t)
                jnp.zeros((K * V, LANES), jnp.float32),    # visit entry ts
                jnp.full((1, LANES), inf, jnp.float32),    # min dropped entry
                jnp.full((K, LANES), inf, jnp.float32))    # min-drop out

    def tile_step(g, st):
        (cur, sp, kcur, stack, regs, t_best, tri_b, u_b, v_b, outs,
         vbuf, vcount, vcounts, anyh, tent, tbuf, mdrop, mdrops) = st
        row_idx = jnp.where(cur >= 0, cur >> 8, -2 - cur)
        virtual = (cur <= -2) & (row_idx >= n_top)
        rt = fetch_row(row_idx)
        leaf_hit, hv, nxt, push, push_val, desc_t, desc = _step_core(
            rt, regs, cur, t_best, any_hit, virtual=virtual, anyh=anyh)
        # record the visit BEFORE the pop. tent carries the slab-entry t of
        # the current row (set at the descend that reached it).
        win = (iota_kv >= kcur * V) & (iota_kv < kcur * V + V)
        full = vcount >= V
        # nearest-V: once full, replace the kept visit with the LARGEST entry
        # iff the new entry is closer; otherwise the new visit is dropped.
        tb_m = jnp.where(win, tbuf, -inf)
        tmax_kept = jnp.max(tb_m, axis=0, keepdims=True)
        jmax = jnp.argmax(tb_m, axis=0)[None, :].astype(jnp.int32)
        replace = virtual & full & (tent < tmax_kept)
        oh_app = (iota_kv == kcur * V + jnp.minimum(vcount, V - 1)) \
            & virtual & ~full
        wmask = oh_app | ((iota_kv == jmax) & replace)
        vbuf = jnp.where(wmask, row_idx - n_top, vbuf)
        tbuf = jnp.where(wmask, tent, tbuf)
        dropped_t = jnp.where(replace, tmax_kept, tent)
        mdrop = jnp.where(virtual & full, jnp.minimum(mdrop, dropped_t),
                          mdrop)
        vcount = vcount + virtual.astype(jnp.int32)
        nxt = jnp.where(virtual, jnp.int32(POP), nxt)
        tent = jnp.where(desc, desc_t, tent)

        t_hit, id_hit, u_hit, v_hit = hv
        t_best = jnp.where(leaf_hit, t_hit, t_best)
        tri_b = jnp.where(leaf_hit, id_hit, tri_b)
        u_b = jnp.where(leaf_hit, u_hit, u_b)
        v_b = jnp.where(leaf_hit, v_hit, v_b)
        stack, sp, cur = _push_pop(stack, sp, cur, nxt, push, push_val)

        completed = (cur == DONE) & (kcur < K)
        oh_k = (iota_k == kcur) & completed
        out_t, out_tri, out_u, out_v = outs
        out_t = jnp.where(oh_k, t_best, out_t)
        out_tri = jnp.where(oh_k, tri_b, out_tri)
        out_u = jnp.where(oh_k, u_b, out_u)
        out_v = jnp.where(oh_k, v_b, out_v)
        vcounts = jnp.where(oh_k, vcount, vcounts)
        mdrops = jnp.where(oh_k, mdrop, mdrops)
        knext = jnp.where(completed, kcur + 1, kcur)
        fetch = completed & (knext < K)
        rays_g = rays_ref[:, :, g * LANES:(g + 1) * LANES]
        kidx = jnp.broadcast_to(jnp.clip(knext, 0, K - 1), (K, LANES))
        new = [jnp.take_along_axis(rays_g[a], kidx, axis=0)[0:1]
               for a in range(12)]
        regs = tuple(jnp.where(fetch, new[a], r) for a, r in enumerate(regs))
        t_best = jnp.where(fetch, new[10], t_best)
        tri_b = jnp.where(fetch, -1, tri_b)
        u_b = jnp.where(fetch, 0.0, u_b)
        v_b = jnp.where(fetch, 0.0, v_b)
        vcount = jnp.where(fetch, 0, vcount)
        mdrop = jnp.where(fetch, inf, mdrop)
        raw_n = _i32(new[11])
        anyh = jnp.where(fetch, (raw_n < 0).astype(jnp.int32), anyh)
        cur = jnp.where(fetch,
                        (jnp.where(raw_n < 0, ~raw_n, raw_n) << 8) | 0xFF,
                        cur)
        sp = jnp.where(fetch, 0, sp)
        return (cur, sp, knext, stack, regs, t_best, tri_b, u_b, v_b,
                (out_t, out_tri, out_u, out_v), vbuf, vcount, vcounts, anyh,
                tent, tbuf, mdrop, mdrops)

    def cond(state):
        it, tiles = state
        alive = jnp.zeros((), jnp.bool_)
        for g in range(G):
            alive = alive | jnp.any(tiles[g][0] != DONE)
        return (it < max_iters) & alive

    def body(state):
        it, tiles = state
        return it + 1, tuple(tile_step(g, tiles[g]) for g in range(G))

    init = (jnp.int32(0), tuple(tile_init(g) for g in range(G)))
    it, tiles = jax.lax.while_loop(cond, body, init)
    for g in range(G):
        st = tiles[g]
        out_t, out_tri, out_u, out_v = st[9]
        sl = slice(g * LANES, (g + 1) * LANES)
        out_ref[0, :, sl] = out_t
        out_ref[1, :, sl] = _f32(out_tri)
        out_ref[2, :, sl] = out_u
        out_ref[3, :, sl] = out_v
        out_ref[4, :, sl] = jnp.broadcast_to(it.astype(jnp.float32), (K, LANES))
        vis_ref[0:K * V, sl] = st[10]
        vis_ref[K * V:K * V + K, sl] = st[12]
        vist_ref[0:K * V, sl] = st[15]         # per-visit slab-entry ts
        vist_ref[K * V:K * V + K, sl] = st[17]  # per-ray min dropped entry


def _treelet_kernel(tid_ref, table_ref, rays_ref, out_ref, *, n_slabs,
                    treelet_rows, any_hit, K, G, max_iters):
    """Phase 2: traverse ONE treelet slab for a block of sorted visits."""
    tb = table_ref[0]                        # (128, treelet_rows)
    slabs = [tb[:, s * LANES:(s + 1) * LANES] for s in range(n_slabs)]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)

    def fetch_row(row_idx):
        ri = jnp.clip(row_idx, 0, treelet_rows - 1)
        lo = jnp.broadcast_to(ri & (LANES - 1), (LANES, LANES))
        hi = ri >> 7
        rt = jnp.take_along_axis(slabs[0], lo, axis=1)
        for s in range(1, n_slabs):
            g = jnp.take_along_axis(slabs[s], lo, axis=1)
            rt = jnp.where(jnp.broadcast_to(hi == s, (LANES, LANES)), g, rt)
        return rt

    def tile_init(g):
        rays_g = rays_ref[:, :, g * LANES:(g + 1) * LANES]
        first = [rays_g[a, 0:1, :] for a in range(12)]
        outs = (jnp.zeros((K, LANES), jnp.float32),
                jnp.full((K, LANES), -1, jnp.int32),
                jnp.zeros((K, LANES), jnp.float32),
                jnp.zeros((K, LANES), jnp.float32))
        raw = _i32(first[11])          # ~root marks per-lane any-hit visits
        anyh = (raw < 0).astype(jnp.int32)
        return ((jnp.where(raw < 0, ~raw, raw) << 8) | 0xFF,  # per-visit root
                jnp.zeros((1, LANES), jnp.int32),
                jnp.zeros((1, LANES), jnp.int32),
                jnp.zeros((STACK_D, LANES), jnp.int32),
                tuple(first[:10]), first[10],
                jnp.full((1, LANES), -1, jnp.int32),
                jnp.zeros((1, LANES), jnp.float32),
                jnp.zeros((1, LANES), jnp.float32), anyh, outs)

    def tile_step(g, st):
        (cur, sp, kcur, stack, regs, t_best, tri_b, u_b, v_b, anyh,
         outs) = st
        row_idx = jnp.where(cur >= 0, cur >> 8, -2 - cur)
        rt = fetch_row(row_idx)
        leaf_hit, hv, nxt, push, push_val, _, _ = _step_core(
            rt, regs, cur, t_best, any_hit, anyh=anyh)
        t_hit, id_hit, u_hit, v_hit = hv
        t_best = jnp.where(leaf_hit, t_hit, t_best)
        tri_b = jnp.where(leaf_hit, id_hit, tri_b)
        u_b = jnp.where(leaf_hit, u_hit, u_b)
        v_b = jnp.where(leaf_hit, v_hit, v_b)
        stack, sp, cur = _push_pop(stack, sp, cur, nxt, push, push_val)

        completed = (cur == DONE) & (kcur < K)
        oh_k = (iota_k == kcur) & completed
        out_t, out_tri, out_u, out_v = outs
        out_t = jnp.where(oh_k, t_best, out_t)
        out_tri = jnp.where(oh_k, tri_b, out_tri)
        out_u = jnp.where(oh_k, u_b, out_u)
        out_v = jnp.where(oh_k, v_b, out_v)
        knext = jnp.where(completed, kcur + 1, kcur)
        fetch = completed & (knext < K)
        rays_g = rays_ref[:, :, g * LANES:(g + 1) * LANES]
        kidx = jnp.broadcast_to(jnp.clip(knext, 0, K - 1), (K, LANES))
        new = [jnp.take_along_axis(rays_g[a], kidx, axis=0)[0:1]
               for a in range(12)]
        regs = tuple(jnp.where(fetch, new[a], r) for a, r in enumerate(regs))
        t_best = jnp.where(fetch, new[10], t_best)
        tri_b = jnp.where(fetch, -1, tri_b)
        u_b = jnp.where(fetch, 0.0, u_b)
        v_b = jnp.where(fetch, 0.0, v_b)
        raw_n = _i32(new[11])
        anyh = jnp.where(fetch, (raw_n < 0).astype(jnp.int32), anyh)
        cur = jnp.where(fetch,
                        (jnp.where(raw_n < 0, ~raw_n, raw_n) << 8) | 0xFF,
                        cur)
        sp = jnp.where(fetch, 0, sp)
        return (cur, sp, knext, stack, regs, t_best, tri_b, u_b, v_b, anyh,
                (out_t, out_tri, out_u, out_v))

    def cond(state):
        it, tiles = state
        alive = jnp.zeros((), jnp.bool_)
        for g in range(G):
            alive = alive | jnp.any(tiles[g][0] != DONE)
        return (it < max_iters) & alive

    def body(state):
        it, tiles = state
        return it + 1, tuple(tile_step(g, tiles[g]) for g in range(G))

    init = (jnp.int32(0), tuple(tile_init(g) for g in range(G)))
    it, tiles = jax.lax.while_loop(cond, body, init)
    for g in range(G):
        out_t, out_tri, out_u, out_v = tiles[g][10]
        sl = slice(g * LANES, (g + 1) * LANES)
        out_ref[0, :, sl] = out_t
        out_ref[1, :, sl] = _f32(out_tri)
        out_ref[2, :, sl] = out_u
        out_ref[3, :, sl] = out_v
        out_ref[4, :, sl] = jnp.broadcast_to(it.astype(jnp.float32), (K, LANES))


def _pack_attrs(o, d, tmin, tmax, roots, pad_to):
    inv_d = _safe_inv(d)
    attrs = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                       d[:, 0], d[:, 1], d[:, 2],
                       inv_d[:, 0], inv_d[:, 1], inv_d[:, 2],
                       tmin, tmax, _f32(roots)], axis=0)
    n = o.shape[0]
    if pad_to > n:
        fill = jnp.zeros((12, pad_to - n), attrs.dtype)
        fill = fill.at[5].set(1.0).at[8].set(1.0)
        fill = fill.at[10].set(-1.0)
        attrs = jnp.concatenate([attrs, fill], axis=1)
    return attrs


@partial(jax.jit, static_argnames=("any_hit", "K", "G", "K2", "G2", "V",
                                   "max_iters", "with_iters", "with_overflow",
                                   "_stage"))
def intersect_treelet(top_t: Array, slabs_t: Array, vid_map: Array, rays: Rays,
                      any_hit: bool = False, K: int = DEFAULT_K,
                      G: int = DEFAULT_G, K2: int = DEFAULT_K2,
                      G2: int = DEFAULT_G2, V: int = DEFAULT_V,
                      max_iters: int = 4096, with_iters: bool = False,
                      with_overflow: bool = False, _stage: int = 4,
                      roots: "Array | None" = None,
                      any_mask: "Array | None" = None):
    """Two-phase treelet traversal.

    top_t:   (128, S_top*128) transposed top table (traversal_pl.prep_table)
    slabs_t: (n_treelets + 1, 128, treelet_rows) transposed treelet slabs;
             the LAST slab is the all-inert pad slab (row-0 links DONE).
    vid_map: (n_vids, 2) i32 — visit id -> (treelet id, local root row).
    roots:   optional (N,) i32 TOP-LOCAL start row per ray (instanced BLAS
             forests: treelet.TreeletTable.root_top[instance]); default row 0.

    with_overflow: also return a per-ray bool marking rays whose visit list
    overflowed the V budget — their hit may be incomplete and the caller
    must re-traverse them (traversal8.intersect_scene does, on the XLA
    persistent path, which costs ~nothing when the mask is empty).
    """
    n_top = top_t.shape[1]
    n_slabs_top = n_top // LANES
    n_tt = slabs_t.shape[0] - 1
    t_rows = slabs_t.shape[2]
    N = rays.o.shape[0]
    block = K * G * LANES
    Np = -(-N // block) * block
    interpret = jax.default_backend() == "cpu"

    # ---------------- phase 1: top traversal ----------------
    assert not (any_hit and any_mask is not None)
    r0 = jnp.zeros(N, jnp.int32) if roots is None else roots
    if any_mask is not None:
        r0 = jnp.where(any_mask, ~r0, r0)    # sign-encoded per-lane any-hit
    attrs = _pack_attrs(rays.o, rays.d, rays.tmin, rays.tmax, r0, Np)
    B1 = Np // K
    attrs = attrs.reshape(12, K, B1)
    kern1 = partial(_top_kernel, n_slabs=n_slabs_top, n_top=n_top,
                    any_hit=any_hit, K=K, G=G, V=V, max_iters=max_iters)
    out1, vis, vist = pl.pallas_call(
        kern1,
        grid=(B1 // (G * LANES),),
        out_shape=(jax.ShapeDtypeStruct((5, K, B1), jnp.float32),
                   jax.ShapeDtypeStruct((K * V + K, B1), jnp.int32),
                   jax.ShapeDtypeStruct((K * V + K, B1), jnp.float32)),
        in_specs=[
            pl.BlockSpec((128, n_top), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, K, G * LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((5, K, G * LANES), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K * V + K, G * LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K * V + K, G * LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(top_t, attrs)
    t0_ = out1[0].reshape(Np)
    tri0 = _i32(out1[1]).reshape(Np)
    u0 = out1[2].reshape(Np)
    v0 = out1[3].reshape(Np)
    it1 = jnp.sum(out1[4, 0].reshape(-1, G * LANES)[:, 0])
    # visits: vis rows [k*V + j] hold the j-th visit of slot-k rays; the
    # kept set is the V NEAREST by slab-entry t (see _top_kernel), with the
    # matching entry ts in vist and the min entry over DROPPED visits after.
    vids = vis[0:K * V].reshape(K, V, B1).transpose(0, 2, 1).reshape(Np, V)
    vcnt = vis[K * V:].reshape(K, B1).reshape(Np)
    mdrop = vist[K * V:].reshape(K, B1).reshape(Np)
    dropped = jnp.sum(jnp.maximum(vcnt - V, 0))
    if _stage == 1:   # perf-debug: phase 1 only
        return Hit(t=t0_[:N], tri=tri0[:N], u=u0[:N], v=v0[:N])

    # ---------------- phase 2 (per-round glue + kernel + reduce) ----------
    slot_v = jax.lax.broadcasted_iota(jnp.int32, (Np, V), 1)
    vid_valid = slot_v < jnp.minimum(vcnt, V)[:, None]
    RB = _VID_ROOT_BITS
    RMASK = (1 << RB) - 1
    pad_key = jnp.int32(n_tt << RB)
    block2 = K2 * G2 * LANES
    T = n_tt + 1
    eps = jnp.float32(1e-20)
    inv = lambda dd: 1.0 / jnp.where(jnp.abs(dd) < eps,
                                     jnp.where(dd >= 0, eps, -eps), dd)
    # per-RAY attr rows WITHOUT the prune row (10, Np), built once and
    # shared by both rounds; the round-specific prune t is appended per round
    src_rows = jnp.concatenate(
        [rays.o.T, rays.d.T,
         inv(rays.d[:, 0])[None], inv(rays.d[:, 1])[None],
         inv(rays.d[:, 2])[None], rays.tmin[None]], axis=0)
    if src_rows.shape[1] != Np:
        src_rows = jnp.pad(src_rows, ((0, 0), (0, Np - src_rows.shape[1])))
    if any_mask is not None:
        any_pad = (jnp.pad(any_mask, (0, Np - N)) if Np > N else any_mask)

    def _kill_anyhit(t_pr, tri_cur):
        # a found hit fully satisfies an any-hit query: kill every further
        # visit of those lanes (tmax=-1 dies in one kernel step)
        if any_hit:
            return jnp.where(tri_cur >= 0, jnp.float32(-1.0), t_pr)
        if any_mask is not None:
            ap = any_pad[:t_pr.shape[0]] if t_pr.shape[0] <= Np else any_pad
            return jnp.where(ap & (tri_cur >= 0), jnp.float32(-1.0), t_pr)
        return t_pr

    def _run_round(vids_r, valid_r, t_prune_np, stage):
        """One sorted phase-2 dispatch over a (Np, Vs) visit subset, pruned
        per ray by t_prune_np (Np,). Returns (t, tri, u, v) per ray — the
        round's best hit (inf/-1 when none) — plus kernel iterations, or a
        (stage_force, ...) early cut for the perf-debug stages."""
        Vs = vids_r.shape[1]
        S = Np * Vs
        key_flat = jnp.where(valid_r, vids_r, pad_key).reshape(S)
        if stage == 11:   # perf-debug: visits -> packed sort keys only
            return 1e-30 * jnp.sum(key_flat.astype(jnp.float32))
        # ONE variadic sort carries the payload through the sort network —
        # argsort + 524k-element take()s cost ~4ms EACH on TPU (the 1-D
        # element-gather serial path); the variadic 3-op sort measured 0.9ms
        # at S=262k (ROUND4_NOTES §8); the packed vid makes it a 2-op sort.
        iota_s = jnp.arange(S, dtype=jnp.int32)
        key_sorted, order = jax.lax.sort((key_flat, iota_s), num_keys=1)
        tid_sorted = key_sorted >> RB
        if stage == 12:   # perf-debug: + sort
            return 1e-30 * (jnp.sum(key_sorted.astype(jnp.float32))
                            + jnp.sum(order.astype(jnp.float32)))
        # per-treelet segment geometry WITHOUT (S,)-sized gathers: counts
        # come from a T-sized searchsorted, and the per-element block-padding
        # offset is broadcast by scattering T values at segment starts + a
        # cummax (equal-valued duplicates at empty segments are safe)
        seg_first = jnp.searchsorted(tid_sorted,
                                     jnp.arange(T, dtype=jnp.int32),
                                     side="left").astype(jnp.int32)
        cnt = jnp.diff(jnp.append(seg_first, jnp.int32(S)))
        blocks_per = -(-cnt // block2)
        blocks_per = blocks_per.at[n_tt].set(0)
        base_blk = jnp.cumsum(blocks_per) - blocks_per
        n_blocks = -(-S // block2) + n_tt + 1
        n_slots = n_blocks * block2
        # dest of sorted element i with tid t = i + pad_tid[t]
        pad_tid = base_blk * block2 - seg_first
        pad_scat = jnp.full(S, jnp.iinfo(jnp.int32).min, jnp.int32)
        pad_scat = pad_scat.at[jnp.minimum(seg_first, S - 1)].max(
            pad_tid, mode="drop")
        pad_elem = jax.lax.cummax(pad_scat)
        dest = jnp.where(tid_sorted < n_tt, iota_s + pad_elem, n_slots)
        if stage == 131:   # perf-debug: + segment geometry (cummax) only
            return 1e-30 * (jnp.sum(dest.astype(jnp.float32))
                            + jnp.sum(blocks_per.astype(jnp.float32)))
        # block -> treelet id: block b belongs to the first treelet whose
        # cumulative block range ends past b
        ends = jnp.cumsum(blocks_per)
        blk_tid = jnp.minimum(
            jnp.searchsorted(ends, jnp.arange(n_blocks, dtype=jnp.int32),
                             side="right"), n_tt).astype(jnp.int32)
        # slot -> sorted-element SOURCE index: slot j of block b reads
        # sorted element b*block2 + j - pad_tid[blk_tid[b]]. One (2, n_slots)
        # GATHER replaces the two slot scatters of rounds 2-4 (gathers take
        # the fast multi-row lane path; even flagged scatters measured
        # ~2.4ms here). Out-of-segment slots miss the tid check and go dead;
        # slots landing on sorted PAD entries resolve to the inert pad
        # slab's root 0 and die in one kernel step.
        if SLOTFILL_IMPL == "gather":
            # round-5a impl: per-slot source-index gather. Measured +8.2
            # ms/call at 262k visits (bench_out/r5_queue11.log "slotfill")
            # — the 2-row take never hits the multi-row fast path.
            pad_blk = jnp.take(pad_tid, blk_tid)          # (n_blocks,)
            src_ix = (jax.lax.broadcasted_iota(jnp.int32,
                                               (n_blocks, block2), 1)
                      + (jnp.arange(n_blocks, dtype=jnp.int32) * block2
                         - pad_blk)[:, None]).reshape(n_slots)
            exp_tid = jnp.broadcast_to(blk_tid[:, None],
                                       (n_blocks, block2)).reshape(n_slots)
            g2v = jnp.take(jnp.stack([key_sorted, order], 0),
                           jnp.clip(src_ix, 0, S - 1), axis=1)
            ok_s = (src_ix >= 0) & (src_ix < S) & ((g2v[0] >> RB) == exp_tid)
            slot_ray = jnp.where(ok_s, g2v[1] // Vs, -1)
            slot_root = jnp.where(ok_s, g2v[0] & RMASK, 0)
        else:
            # default: two SORTED unique-index scatters — `dest` strictly
            # increases over the sorted valid elements (i + a non-decreasing
            # pad), so this is the fast contiguous-write scatter case; pad
            # entries carry dest == n_slots and drop. Unwritten slots stay
            # dead (ray -1, the inert pad-slab root 0).
            valid_s = tid_sorted < n_tt
            dst = jnp.where(valid_s, dest, n_slots)
            slot_ray = jnp.full(n_slots, -1, jnp.int32).at[dst].set(
                order // Vs, indices_are_sorted=True, unique_indices=True,
                mode="drop")
            slot_root = jnp.zeros(n_slots, jnp.int32).at[dst].set(
                key_sorted & RMASK, indices_are_sorted=True,
                unique_indices=True, mode="drop")
        if stage == 132:   # perf-debug: + the slot-fill gather, no unsort
            return 1e-30 * (jnp.sum(slot_ray.astype(jnp.float32))
                            + jnp.sum(slot_root.astype(jnp.float32))
                            + jnp.sum(dest.astype(jnp.float32)))
        # flat visit index -> its slot (the inverse permutation). Two
        # implementations, A/B via CTL_TT_UNSORT (r5 stage decomposition:
        # the second variadic sort made the dest stage +8.8 ms/call at 262k
        # visits — bench_out/r5_queue5.log — while a flagged unique-index
        # scatter was measured ~2.4 ms on the same shapes in r4):
        if UNSORT_IMPL == "sort":
            _, slot_of_flat = jax.lax.sort((order, dest), num_keys=1)
        else:
            slot_of_flat = jnp.zeros(S, jnp.int32).at[order].set(
                dest, unique_indices=True)
        if stage == 13:   # perf-debug: + counts/dest/slot gathers
            return 1e-30 * (jnp.sum(slot_ray.astype(jnp.float32))
                            + jnp.sum(slot_root.astype(jnp.float32))
                            + jnp.sum(slot_of_flat.astype(jnp.float32))
                            + jnp.sum(blk_tid.astype(jnp.float32)))

        # Gather ray attributes DIRECTLY INTO the kernel's blocked slot
        # order: program i's rays block covers flat slots i*block +
        # k*(G*128) + j, so permuting the small int32 index arrays first
        # avoids a 190MB 4-D transpose of the f32 attrs (measured ~650ms
        # when XLA fuses that transpose over gather operands).
        B2 = n_slots // K2

        def blk_order(x):   # (n_slots,) -> (K2, B2) in kernel slot order
            return x.reshape(n_blocks, K2, G2 * LANES).transpose(1, 0, 2) \
                    .reshape(K2, B2)

        sray_b = blk_order(slot_ray)
        rix = jnp.maximum(sray_b, 0)
        root_b = blk_order(slot_root)
        if stage == 14:   # perf-debug: + blocked index permutes
            return 1e-30 * (jnp.sum(rix.astype(jnp.float32))
                            + jnp.sum(root_b.astype(jnp.float32)))
        # ONE axis-1 multi-row gather — separate element gathers are
        # ~7ns/elem serial on TPU, the fused lane gather is ~17x faster
        src = jnp.concatenate([src_rows, t_prune_np[None]], axis=0)
        g = jnp.take(src, rix, axis=1)                    # (11, K2, B2)
        if stage == 15:   # perf-debug: + the fused attr gather
            return 1e-30 * jnp.sum(g)
        stmax = jnp.where(sray_b >= 0, g[10], -1.0)
        root_enc = root_b
        if any_mask is not None:
            # phase-2 visits of any-hit rays early-out too (sign-encoded)
            slot_any = jnp.take(any_pad, rix) & (sray_b >= 0)
            root_enc = jnp.where(slot_any, ~root_b, root_b)
        attrs2 = jnp.concatenate([g[0:10], stmax[None],
                                  _f32(root_enc)[None]], axis=0)
        if stage == 2:   # perf-debug: glue only, skip the treelet kernel
            return 1e-30 * (jnp.sum(attrs2)
                            + jnp.sum(blk_tid.astype(jnp.float32))
                            + jnp.sum(slot_of_flat.astype(jnp.float32)))
        kern2 = partial(_treelet_kernel, n_slabs=t_rows // LANES,
                        treelet_rows=t_rows, any_hit=any_hit, K=K2, G=G2,
                        max_iters=max_iters)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, 128, t_rows),
                             lambda i, tid_ref: (tid_ref[i], 0, 0)),
                pl.BlockSpec((12, K2, G2 * LANES),
                             lambda i, tid_ref: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((5, K2, G2 * LANES),
                                   lambda i, tid_ref: (0, 0, i)),
        )
        out2 = pl.pallas_call(
            kern2,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((5, K2, B2), jnp.float32),
            interpret=interpret,
        )(blk_tid, slabs_t, attrs2)
        it2 = jnp.sum(out2[4, 0].reshape(-1, G2 * LANES)[:, 0])

        # reduce onto rays (gather-based): each ray owns <=Vs visits; gather
        # their per-slot hits back through slot_of_flat and min-reduce over
        # the Vs axis — no scatter-min (non-sorted TPU scatters are
        # near-serial), no inverse transpose of the kernel output (index
        # arithmetic converts flat slot ids to blocked positions)
        s_f = slot_of_flat.reshape(Np, Vs)
        i_b = s_f // block2
        r_in = s_f % block2
        pos = (r_in // (G2 * LANES)) * B2 + i_b * (G2 * LANES) \
            + r_in % (G2 * LANES)
        slot_rv = jnp.minimum(pos, K2 * B2 - 1)
        gv = jnp.take(out2[0:4].reshape(4, K2 * B2), slot_rv, axis=1)
        t_v = gv[0]
        tri_v = _i32(gv[1])
        ok_v = valid_r & (tri_v >= 0)
        t_v = jnp.where(ok_v, t_v, jnp.inf)
        jbest = jnp.argmin(t_v, axis=1)
        ohv = jax.lax.broadcasted_iota(jnp.int32, (Np, Vs), 1) \
            == jbest[:, None]
        pick = lambda arr: jnp.sum(jnp.where(ohv, arr, 0), axis=1)
        return (jnp.min(t_v, axis=1), pick(tri_v), pick(gv[2]), pick(gv[3]),
                it2)

    def _merge(cur, rnd):
        t_c, tri_c, u_c, v_c = cur
        t_r, tri_r, u_r, v_r = rnd
        better = t_r < t_c
        return (jnp.where(better, t_r, t_c), jnp.where(better, tri_r, tri_c),
                jnp.where(better, u_r, u_c), jnp.where(better, v_r, v_c))

    t_prune0 = _kill_anyhit(t0_, tri0)
    cur = (t0_, tri0, u0, v0)
    two_round = TWO_ROUND and V >= 2 and _stage == 4
    it2 = jnp.float32(0.0)
    if not two_round:
        r = _run_round(vids, vid_valid, t_prune0, _stage)
        if not isinstance(r, tuple):   # perf-debug stage cut
            return Hit(t=t0_[:N] + r, tri=tri0[:N], u=u0[:N], v=v0[:N])
        cur = _merge(cur, r[:4])
        it2 = it2 + r[4]
    else:
        # CROSS-TREELET t_best (round 5, VERDICT #3): process each ray's
        # visits nearest-first in TWO sorted dispatches. Round A takes the
        # VA nearest-entry visits; its result tightens every ray's t before
        # round B, whose remaining visits are SKIPPED outright when their
        # slab-entry t can no longer beat it (entry >= t_best ⇒ any hit
        # inside is no closer — the reference's monotone-t prune,
        # `Kernel/TraceHelper.cu:446-718`). Skipped visits sort into the
        # pad segment: round B's block count scales with SURVIVORS only.
        ent = vist[0:K * V].reshape(K, V, B1).transpose(0, 2, 1) \
            .reshape(Np, V)
        ent_m = jnp.where(vid_valid, ent, jnp.inf)
        ent_srt, vids_srt = jax.lax.sort((ent_m, vids), num_keys=1,
                                         dimension=1)
        # valid entries (all finite) sort before the inf padding, so the
        # count-based mask survives the permutation unchanged
        valid_srt = slot_v < jnp.minimum(vcnt, V)[:, None]
        VA = max(1, V // 2)
        rA = _run_round(vids_srt[:, :VA], valid_srt[:, :VA], t_prune0, 4)
        cur = _merge(cur, rA[:4])
        it2 = it2 + rA[4]
        t1 = _kill_anyhit(cur[0], cur[1])
        aliveB = valid_srt[:, VA:] & (ent_srt[:, VA:] < t1[:, None])
        rB = _run_round(vids_srt[:, VA:], aliveB, t1, 4)
        cur = _merge(cur, rB[:4])
        it2 = it2 + rB[4]
    hit = Hit(t=cur[0][:N], tri=cur[1][:N], u=cur[2][:N], v=cur[3][:N])
    out = (hit,)
    if with_overflow:
        # Exactness gate (round 5): a dropped visit can only hide a CLOSER
        # hit if its slab-entry t is below the final best t — and the kept
        # set is the V nearest entries, so min-dropped is the tightest such
        # bound. Closest-hit rays whose drops all start beyond the final hit
        # need no fallback; on san-miguel this collapses the fallback mass
        # (round 4 fired on every vcnt>V ray: 30%+ in dense regions).
        ovf = (vcnt > V)[:N]
        gate = (mdrop[:N] < hit.t) if not any_hit else None
        if any_hit:
            # an any-hit ray with SOME hit needs no fallback even if its
            # visit list overflowed: any hit answers the query
            ovf = ovf & ~(hit.tri >= 0)
        elif any_mask is not None:
            # any-hit lanes: hit-found answers; no-hit overflow lanes must
            # re-traverse (every dropped subtree could occlude).
            ovf = ovf & ~(any_mask & (hit.tri >= 0))
            ovf = ovf & jnp.where(any_mask, True, gate)
        else:
            ovf = ovf & gate
        out = out + (ovf,)
    if with_iters:
        iters = it1 + it2
        rows = (it1 * jnp.float32(G * LANES)
                + it2 * jnp.float32(G2 * LANES))
        out = out + (iters, rows)
    return out if len(out) > 1 else hit


# diagnostics hook: last-known dropped-visit count is folded into the hit
# reduction above; expose a standalone counter for tests/benches
@partial(jax.jit, static_argnames=("K", "G", "V", "max_iters"))
def count_dropped_visits(top_t: Array, n_treelets: int, rays: Rays,
                         K: int = DEFAULT_K, G: int = DEFAULT_G,
                         V: int = DEFAULT_V, max_iters: int = 4096):
    """Run phase 1 only and return (total visits, visits dropped past V)."""
    n_top = top_t.shape[1]
    N = rays.o.shape[0]
    block = K * G * LANES
    Np = -(-N // block) * block
    attrs = _pack_attrs(rays.o, rays.d, rays.tmin, rays.tmax,
                        jnp.zeros(N, jnp.int32), Np)
    B1 = Np // K
    attrs = attrs.reshape(12, K, B1)
    kern1 = partial(_top_kernel, n_slabs=n_top // LANES, n_top=n_top,
                    any_hit=False, K=K, G=G, V=V, max_iters=max_iters)
    interpret = jax.default_backend() == "cpu"
    _, vis, _ = pl.pallas_call(
        kern1,
        grid=(B1 // (G * LANES),),
        out_shape=(jax.ShapeDtypeStruct((5, K, B1), jnp.float32),
                   jax.ShapeDtypeStruct((K * V + K, B1), jnp.int32),
                   jax.ShapeDtypeStruct((K * V + K, B1), jnp.float32)),
        in_specs=[
            pl.BlockSpec((128, n_top), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, K, G * LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((5, K, G * LANES), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K * V + K, G * LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K * V + K, G * LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(top_t, attrs)
    vcnt = vis[K * V:].reshape(Np)
    return jnp.sum(vcnt), jnp.sum(jnp.maximum(vcnt - V, 0))
