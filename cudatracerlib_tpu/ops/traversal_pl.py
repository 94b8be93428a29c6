"""Pallas TPU traversal kernel: the whole BVH8 state machine on-chip.

Round-1 profiling showed the jnp while_loop traversal pays a ~50us fixed cost
per iteration at production lane counts (dispatch + loop-state round trips),
which dominates Cornell-class scenes; a Pallas kernel runs the same step in
~0.1-2us because the loop lives on the scalar core and all state stays in
vregs/VMEM.

Design (measured on v5e, tools/microbench_r2*.py):
- The unified fat-row table (scene/bvh8.py layout) is stored TRANSPOSED as
  (128, S*128): S slabs of 128 rows.  A traversal step fetches each lane's
  row with `tpu.dynamic_gather` (jnp.take_along_axis along lanes), which
  Mosaic supports when the gathered dim fits one vreg (<=128 lanes) and the
  index shape matches -> one gather per slab + an S-way select.  The gather
  output arrives already transposed (attr-major), eliminating the (B,128)
  transpose the XLA path pays every step.
- Rays are processed in TILES of 128 lanes; each lane owns K rays in
  sequence (persistent lanes, like the reference's Aila-Laine queue fetch,
  `Kernel/TraceHelper.cu:379-427`, rebuilt without atomics); G tiles advance
  in lockstep interleaved inside one while_loop to hide VPU/gather latency.
- Per-lane traversal stacks are (D,128) buffers shifted with pltpu.roll
  (cheap static sublane rotate) instead of scatter.
- Ray refill uses a single-vreg sublane dynamic_gather over the (K,128)
  ray block (K<=8).

Semantics identical to ops/traversal8.intersect_wide: closest-hit (t, tri,
u, v) or any-hit early-out; stack entries pack (row<<8)|unvisited-mask.
Replaces the reference's persistent-threads megakernel
(`Kernel/TraceHelper.cu:326-734`) as the production intersector for scenes
whose table fits VMEM; larger scenes fall back to the XLA gather path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traversal import Hit, Rays, _safe_inv

Array = jax.Array

DONE = -1
POP = -0x40000000
LANES = 128
MAX_SLABS = 16          # tables up to 16*128 rows take the Pallas path
STACK_D = 16            # per-lane stack depth (2 vregs)
import os as _os                                             # noqa: E402
DEFAULT_K = int(_os.environ.get("CTL_PL_K", "8"))
#                         rays per lane (fixed kernel's sublane gather caps
#                         K at 8; the pool kernel's 2-stage fetch takes 16)
DEFAULT_G = int(_os.environ.get("CTL_PL_G", "4"))
#                         tiles interleaved per grid program


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _make_fetch_row(table_ref, n_slabs, n_rows):
    tb = table_ref[:]                      # (128, S*128)
    slabs = [tb[:, s * LANES:(s + 1) * LANES] for s in range(n_slabs)]

    def fetch_row(row_idx):
        """row_idx (1,128) -> (128,128) gathered rows, attr-major."""
        ri = jnp.clip(row_idx, 0, n_rows - 1)
        lo = jnp.broadcast_to(ri & (LANES - 1), (LANES, LANES))
        hi = ri >> 7                                     # (1,128)
        rt = jnp.take_along_axis(slabs[0], lo, axis=1)
        for s in range(1, n_slabs):
            g = jnp.take_along_axis(slabs[s], lo, axis=1)
            rt = jnp.where(jnp.broadcast_to(hi == s, (LANES, LANES)), g, rt)
        return rt

    return fetch_row


def _step_traverse(fetch_row, cur, sp, stack, regs, t_best, tri_b, u_b, v_b,
                   anyh, *, any_hit):
    """One lockstep traversal step for a 128-lane tile: node slab tests,
    leaf Moller-Trumbore, stack push/pop.  Shared by the fixed-assignment
    and shared-pool kernels.  Returns the updated per-lane traversal state;
    `cur == DONE` afterwards means the lane's ray just finished."""
    bit8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    bit8 = jnp.int32(1) << bit8
    j8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    j12 = jax.lax.broadcasted_iota(jnp.int32, (12, LANES), 0)
    inf = jnp.float32(jnp.inf)

    ox, oy, oz, dx, dy, dz, ix, iy, iz, tmn = regs
    is_node = cur >= 0
    is_leaf = cur <= -2
    row_idx = jnp.where(is_node, cur >> 8, -2 - cur)
    rt = fetch_row(row_idx)                               # (128,128)

    # node interpretation: slab-test all 8 children
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

    # leaf interpretation: Moller-Trumbore on 12 triangles
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
    t_best = jnp.where(leaf_hit, t_hit, t_best)
    tri_b = jnp.where(leaf_hit,
                      jnp.sum(jnp.where(oh12, ids, 0), axis=0, keepdims=True),
                      tri_b)
    u_b = jnp.where(leaf_hit,
                    jnp.sum(jnp.where(oh12, u, 0.0), axis=0, keepdims=True),
                    u_b)
    v_b = jnp.where(leaf_hit,
                    jnp.sum(jnp.where(oh12, v, 0.0), axis=0, keepdims=True),
                    v_b)

    # combine / push / pop (stack shifts via sublane roll)
    nxt = jnp.where(is_node, node_next,
                    jnp.where(is_leaf, jnp.int32(POP), jnp.int32(DONE)))
    if any_hit:
        nxt = jnp.where(leaf_hit, jnp.int32(DONE), nxt)
    else:
        # per-lane any-hit (sign-encoded roots, see tile_init)
        nxt = jnp.where(leaf_hit & (anyh != 0), jnp.int32(DONE), nxt)
    pushed = pltpu.roll(stack, 1, 0)
    pushed = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (STACK_D, LANES), 0) == 0,
                       push_val, pushed)
    stack = jnp.where(push, pushed, stack)
    sp = sp + push.astype(jnp.int32)
    want_pop = nxt == POP
    can_pop = want_pop & (sp > 0)
    top = stack[0:1]
    popped_stack = pltpu.roll(stack, STACK_D - 1, 0)
    stack = jnp.where(can_pop, popped_stack, stack)
    sp = jnp.where(can_pop, sp - 1, sp)
    cur = jnp.where(want_pop, jnp.where(can_pop, top, DONE), nxt)
    return cur, sp, stack, t_best, tri_b, u_b, v_b


def _traverse_kernel(table_ref, rays_ref, out_ref, *, n_slabs, n_rows,
                     any_hit, K, G, max_iters, with_util=False):
    """One grid program: advance G tiles of 128 lanes, K rays each.

    with_util: also accumulate per-lane ACTIVE steps (cur != DONE) into
    output row 5 — the lockstep-utilization diagnostic (a program runs to
    its worst lane; active/total quantifies what lane imbalance costs)."""
    fetch_row = _make_fetch_row(table_ref, n_slabs, n_rows)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)

    def tile_init(g):
        rays_g = rays_ref[:, :, g * LANES:(g + 1) * LANES]   # (12,K,128)
        first = [rays_g[a, 0:1, :] for a in range(12)]
        # root row rides attrs[11]; a NEGATIVE (~root) encoding marks the
        # lane as PER-LANE ANY-HIT (mixed closest+shadow wavefronts)
        raw = _i32(first[11])
        anyh = (raw < 0).astype(jnp.int32)   # i32 carry: Mosaic rejects
        #                                      selects on i1 vectors
        cur = (jnp.where(raw < 0, ~raw, raw) << 8) | 0xFF     # per-ray root row
        sp = jnp.zeros((1, LANES), jnp.int32)
        kcur = jnp.zeros((1, LANES), jnp.int32)
        stack = jnp.zeros((STACK_D, LANES), jnp.int32)
        t_best = first[10]                                    # tmax
        tri = jnp.full((1, LANES), -1, jnp.int32)
        uu = jnp.zeros((1, LANES), jnp.float32)
        vv = jnp.zeros((1, LANES), jnp.float32)
        outs = (jnp.zeros((K, LANES), jnp.float32),
                jnp.full((K, LANES), -1, jnp.int32),
                jnp.zeros((K, LANES), jnp.float32),
                jnp.zeros((K, LANES), jnp.float32))
        return (cur, sp, kcur, stack, tuple(first[:10]), t_best, tri, uu, vv,
                anyh, outs, jnp.zeros((1, LANES), jnp.float32))

    def tile_step(g, st):
        (cur, sp, kcur, stack, regs, t_best, tri_b, u_b, v_b, anyh, outs,
         act) = st
        if with_util:
            act = act + (cur != DONE).astype(jnp.float32)
        cur, sp, stack, t_best, tri_b, u_b, v_b = _step_traverse(
            fetch_row, cur, sp, stack, regs, t_best, tri_b, u_b, v_b, anyh,
            any_hit=any_hit)
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmn = regs

        # completion: record outputs, refill next ray from the tile queue
        completed = (cur == DONE) & (kcur < K)
        oh_k = (iota_k == kcur) & completed
        out_t, out_tri, out_u, out_v = outs
        out_t = jnp.where(oh_k, t_best, out_t)
        out_tri = jnp.where(oh_k, tri_b, out_tri)
        out_u = jnp.where(oh_k, u_b, out_u)
        out_v = jnp.where(oh_k, v_b, out_v)
        knext = jnp.where(completed, kcur + 1, kcur)
        fetch = completed & (knext < K)
        rays_g = rays_ref[:, :, g * LANES:(g + 1) * LANES]    # (12,K,128)
        kidx = jnp.broadcast_to(jnp.clip(knext, 0, K - 1), (K, LANES))
        new = [jnp.take_along_axis(rays_g[a], kidx, axis=0)[0:1]
               for a in range(12)]
        regs = tuple(jnp.where(fetch, new[a], r)
                     for a, r in enumerate((ox, oy, oz, dx, dy, dz,
                                            ix, iy, iz, tmn)))
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
                (out_t, out_tri, out_u, out_v), act)

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
        # row 4: lockstep iterations this program ran (bench counters),
        # broadcast over the block (SMEM scalar outputs aren't lowerable)
        out_ref[4, :, sl] = jnp.broadcast_to(
            it.astype(jnp.float32), (K, LANES))
        if with_util:
            out_ref[5, :, sl] = jnp.broadcast_to(tiles[g][11], (K, LANES))


def _lane_scan(x, lane):
    """Inclusive prefix sum of an i32 (1,128) row across lanes (Hillis-
    Steele over 7 masked lane rolls — the probed Mosaic-safe primitive)."""
    inc = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        inc = inc + jnp.where(lane >= s, pltpu.roll(inc, s, 1), 0)
    return inc


def _traverse_kernel_pool(table_ref, rays_ref, out_ref, *, n_slabs, n_rows,
                          any_hit, K, G, max_iters, with_util=False):
    """Shared-pool variant: the tile's K*128 rays form ONE work queue.

    The fixed-assignment kernel gives lane b the K rays of its own column;
    a lane that drew cheap rays idles while the worst lane grinds (measured
    lockstep utilization 0.23-0.40 on bounce/shadow wavefronts,
    bench_out/r5_util.log).  Here a lane that finishes a ray GRABS the next
    unstarted ray from the tile pool — the reference's Aila-Laine global
    work queue (`Kernel/TraceHelper.cu:379-427`, atomicAdd warp fetch)
    rebuilt with a lane prefix-sum instead of atomics:
      - rank  = exclusive lane-scan of the completion mask
      - fetch = 2-stage gather of ray (pool_ctr+rank) from the (12,K,128)
        VMEM ray block (cross-lane gather by b, masked K-sublane reduce by k)
      - outputs are appended in COMPLETION order (slot = out_ctr+rank) via a
        one-hot dot_general scatter (exact at precision=HIGHEST: each output
        element is a single product; slots in one step are consecutive so
        their lane indices never collide), with the ray id written alongside
        so the host un-permutes with one XLA scatter per call.
    """
    fetch_row = _make_fetch_row(table_ref, n_slabs, n_rows)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    iota_s128 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    pool_n = K * LANES

    def tile_init(g):
        rays_g = rays_ref[:, :, g * LANES:(g + 1) * LANES]   # (12,K,128)
        first = [rays_g[a, 0:1, :] for a in range(12)]
        raw = _i32(first[11])
        anyh = (raw < 0).astype(jnp.int32)
        cur = (jnp.where(raw < 0, ~raw, raw) << 8) | 0xFF
        sp = jnp.zeros((1, LANES), jnp.int32)
        stack = jnp.zeros((STACK_D, LANES), jnp.int32)
        t_best = first[10]
        tri = jnp.full((1, LANES), -1, jnp.int32)
        uu = jnp.zeros((1, LANES), jnp.float32)
        vv = jnp.zeros((1, LANES), jnp.float32)
        n_cur = lane                                 # lane b starts ray b
        pool_ctr = jnp.full((1, LANES), LANES, jnp.int32)
        out_ctr = jnp.zeros((1, LANES), jnp.int32)
        outs = (jnp.zeros((K, LANES), jnp.float32),
                jnp.full((K, LANES), -1.0, jnp.float32),   # tri as f32
                jnp.zeros((K, LANES), jnp.float32),
                jnp.zeros((K, LANES), jnp.float32),
                jnp.full((K, LANES), -1.0, jnp.float32))   # ray id as f32
        return (cur, sp, stack, tuple(first[:10]), t_best, tri, uu, vv,
                anyh, n_cur, pool_ctr, out_ctr, outs,
                jnp.zeros((1, LANES), jnp.float32))

    def tile_step(g, st):
        (cur, sp, stack, regs, t_best, tri_b, u_b, v_b, anyh, n_cur,
         pool_ctr, out_ctr, outs, act) = st
        if with_util:
            act = act + (cur != DONE).astype(jnp.float32)
        cur, sp, stack, t_best, tri_b, u_b, v_b = _step_traverse(
            fetch_row, cur, sp, stack, regs, t_best, tri_b, u_b, v_b, anyh,
            any_hit=any_hit)
        ox, oy, oz, dx, dy, dz, ix, iy, iz, tmn = regs

        completed = (cur == DONE) & (n_cur >= 0)
        comp_i = completed.astype(jnp.int32)
        inc = _lane_scan(comp_i, lane)
        rank = inc - comp_i
        m = jnp.sum(comp_i, axis=1, keepdims=True)         # (1,1)->bcast

        # --- append outputs at slot out_ctr+rank (completion order) ---
        slot = out_ctr + rank
        b_slot = slot & (LANES - 1)
        k_slot = slot >> 7
        # M[s,d] = completed[d] & (b_slot[d] == s): no transpose needed
        M = jnp.where((jnp.broadcast_to(b_slot, (LANES, LANES)) == iota_s128)
                      & jnp.broadcast_to(completed, (LANES, LANES)),
                      1.0, 0.0)
        vals = jnp.concatenate(
            [t_best, tri_b.astype(jnp.float32), u_b, v_b,
             n_cur.astype(jnp.float32),
             (k_slot + 1).astype(jnp.float32)], axis=0)     # (6,128)
        scat = jax.lax.dot_general(
            vals, M, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # (6,128)
        wrote = scat[5:6] > 0.5
        k_scat = (scat[5:6] - 1.0).astype(jnp.int32)
        sel = (iota_k == jnp.broadcast_to(k_scat, (K, LANES))) \
            & jnp.broadcast_to(wrote, (K, LANES))
        out_t, out_tri, out_u, out_v, out_id = outs
        out_t = jnp.where(sel, jnp.broadcast_to(scat[0:1], (K, LANES)), out_t)
        out_tri = jnp.where(sel, jnp.broadcast_to(scat[1:2], (K, LANES)),
                            out_tri)
        out_u = jnp.where(sel, jnp.broadcast_to(scat[2:3], (K, LANES)), out_u)
        out_v = jnp.where(sel, jnp.broadcast_to(scat[3:4], (K, LANES)), out_v)
        out_id = jnp.where(sel, jnp.broadcast_to(scat[4:5], (K, LANES)),
                           out_id)
        out_ctr = out_ctr + jnp.broadcast_to(m, (1, LANES))

        # --- grab the next unstarted pool ray ---
        n_new = pool_ctr + rank
        have = completed & (n_new < pool_n)
        b_new = jnp.broadcast_to(n_new & (LANES - 1), (K, LANES))
        k_new = jnp.broadcast_to(n_new >> 7, (K, LANES))
        rays_g = rays_ref[:, :, g * LANES:(g + 1) * LANES]   # (12,K,128)
        sel_k = iota_k == k_new
        new = [jnp.sum(jnp.where(
                   sel_k, jnp.take_along_axis(rays_g[a], b_new, axis=1), 0.0),
                   axis=0, keepdims=True) for a in range(12)]
        regs = tuple(jnp.where(have, new[a], r)
                     for a, r in enumerate((ox, oy, oz, dx, dy, dz,
                                            ix, iy, iz, tmn)))
        t_best = jnp.where(have, new[10], t_best)
        tri_b = jnp.where(have, -1, tri_b)
        u_b = jnp.where(have, 0.0, u_b)
        v_b = jnp.where(have, 0.0, v_b)
        raw_n = _i32(new[11])
        anyh = jnp.where(have, (raw_n < 0).astype(jnp.int32), anyh)
        cur = jnp.where(have,
                        (jnp.where(raw_n < 0, ~raw_n, raw_n) << 8) | 0xFF,
                        cur)
        sp = jnp.where(have, 0, sp)
        n_cur = jnp.where(have, n_new, jnp.where(completed, -1, n_cur))
        pool_ctr = pool_ctr + jnp.broadcast_to(m, (1, LANES))
        return (cur, sp, stack, regs, t_best, tri_b, u_b, v_b, anyh, n_cur,
                pool_ctr, out_ctr,
                (out_t, out_tri, out_u, out_v, out_id), act)

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
        out_t, out_tri, out_u, out_v, out_id = tiles[g][12]
        sl = slice(g * LANES, (g + 1) * LANES)
        out_ref[0, :, sl] = out_t
        out_ref[1, :, sl] = out_tri
        out_ref[2, :, sl] = out_u
        out_ref[3, :, sl] = out_v
        out_ref[4, :, sl] = out_id
        out_ref[5, :, sl] = jnp.broadcast_to(
            it.astype(jnp.float32), (K, LANES))
        if with_util:
            out_ref[6, :, sl] = jnp.broadcast_to(tiles[g][13], (K, LANES))


@partial(jax.jit, static_argnames=("any_hit", "K", "G", "max_iters",
                                   "with_iters", "with_util"))
def intersect_pallas_pool(table_t: Array, rays: Rays, any_hit: bool = False,
                          K: int = DEFAULT_K, G: int = DEFAULT_G,
                          max_iters: int = 8192, roots: Array = None,
                          with_iters: bool = False, any_mask: Array = None,
                          with_util: bool = False):
    """intersect_pallas with the shared-pool kernel (same semantics).

    Outputs arrive in completion order tagged with local pool ids; one XLA
    scatter per call un-permutes them (unique indices by construction —
    every pool ray completes at most once).  Triangle ids and pool ids ride
    f32 rows through the one-hot MXU scatter: exact for values < 2^24,
    guaranteed here (a VMEM table has <= 2048 rows = 24k tris; pool ids
    < K*128)."""
    n_rows = table_t.shape[1]
    n_slabs = n_rows // LANES
    assert n_slabs <= MAX_SLABS, "table too large for the Pallas path"
    N = rays.o.shape[0]
    if roots is None:
        roots = jnp.zeros(N, jnp.int32)
    assert not (any_hit and any_mask is not None)
    if any_mask is not None:
        roots = jnp.where(any_mask, ~roots, roots)
    block = K * G * LANES
    Np = -(-N // block) * block
    pad = Np - N

    inv_d = _safe_inv(rays.d)
    attrs = jnp.stack([rays.o[:, 0], rays.o[:, 1], rays.o[:, 2],
                       rays.d[:, 0], rays.d[:, 1], rays.d[:, 2],
                       inv_d[:, 0], inv_d[:, 1], inv_d[:, 2],
                       rays.tmin, rays.tmax,
                       jax.lax.bitcast_convert_type(roots, jnp.float32)],
                      axis=0)                              # (12, N)
    if pad:
        fill = jnp.zeros((12, pad), attrs.dtype)
        fill = fill.at[5].set(1.0).at[8].set(1.0)          # dz=1 valid dir
        fill = fill.at[10].set(-1.0)                       # tmax<tmin: no hit
        attrs = jnp.concatenate([attrs, fill], axis=1)
    B = Np // K
    attrs = attrs.reshape(12, K, B)

    n_progs = B // (G * LANES)
    n_out = 7 if with_util else 6
    kern = partial(_traverse_kernel_pool, n_slabs=n_slabs, n_rows=n_rows,
                   any_hit=any_hit, K=K, G=G, max_iters=max_iters,
                   with_util=with_util)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kern,
        grid=(n_progs,),
        out_shape=jax.ShapeDtypeStruct((n_out, K, B), jnp.float32),
        in_specs=[
            pl.BlockSpec((128, n_rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, K, G * LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, K, G * LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(table_t, attrs)
    # un-permute: slot (k, col) in tile g holds ray (id>>7)*B + g*128 + (id&127)
    ids = out[4].astype(jnp.int32)                          # (K, B) local
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, B), 1)
    g_off = (cols >> 7) << 7
    flat = (ids >> 7) * B + g_off + (ids & (LANES - 1))
    flat = jnp.where(ids >= 0, flat, Np).ravel()            # unwritten -> pad
    t = jnp.zeros(Np + 1, jnp.float32).at[flat].set(out[0].ravel())[:N]
    tri_f = jnp.full(Np + 1, -1.0, jnp.float32).at[flat].set(out[1].ravel())
    tri = tri_f[:N].astype(jnp.int32)
    u = jnp.zeros(Np + 1, jnp.float32).at[flat].set(out[2].ravel())[:N]
    v = jnp.zeros(Np + 1, jnp.float32).at[flat].set(out[3].ravel())[:N]
    hit = Hit(t=t, tri=tri, u=u, v=v)
    if with_iters:
        its = out[5, 0].reshape(n_progs, G * LANES)[:, 0]
        it_sum = jnp.sum(its)
        if with_util:
            act_sum = jnp.sum(out[6, 0])
            return hit, it_sum, it_sum * jnp.float32(G * LANES), act_sum
        return hit, it_sum, it_sum * jnp.float32(G * LANES)
    return hit


def prep_table(table: np.ndarray) -> np.ndarray:
    """(R,128) unified fat-row table -> transposed, slab-padded (128, S*128)."""
    r = table.shape[0]
    s = max(1, -(-r // LANES))
    out = np.zeros((128, s * LANES), np.float32)
    out[:, :r] = table.T
    return out


def prep_table_jnp(table: Array) -> Array:
    """Traceable prep_table (transpose + pad); CSE'd across calls in one jit."""
    r = table.shape[0]
    s = max(1, -(-r // LANES))
    return jnp.pad(table.T, ((0, 0), (0, s * LANES - r)))


@partial(jax.jit, static_argnames=("any_hit", "K", "G", "max_iters",
                                   "with_iters", "with_util"))
def intersect_pallas(table_t: Array, rays: Rays, any_hit: bool = False,
                     K: int = DEFAULT_K, G: int = DEFAULT_G,
                     max_iters: int = 4096, roots: Array = None,
                     with_iters: bool = False, any_mask: Array = None,
                     with_util: bool = False):
    """Traverse with the Pallas kernel. table_t must be prep_table() output.

    Rays are padded to a multiple of K*G*128; grid programs each own G tiles.
    any_mask: optional (N,) bool — PER-LANE any-hit (sign-encoded into the
    root attr) so one call serves a mixed closest+shadow wavefront.
    """
    n_rows = table_t.shape[1]
    n_slabs = n_rows // LANES
    assert n_slabs <= MAX_SLABS, "table too large for the Pallas path"
    N = rays.o.shape[0]
    if roots is None:
        roots = jnp.zeros(N, jnp.int32)
    assert not (any_hit and any_mask is not None)
    if any_mask is not None:
        roots = jnp.where(any_mask, ~roots, roots)
    block = K * G * LANES
    Np = -(-N // block) * block
    pad = Np - N

    inv_d = _safe_inv(rays.d)
    attrs = jnp.stack([rays.o[:, 0], rays.o[:, 1], rays.o[:, 2],
                       rays.d[:, 0], rays.d[:, 1], rays.d[:, 2],
                       inv_d[:, 0], inv_d[:, 1], inv_d[:, 2],
                       rays.tmin, rays.tmax,
                       jax.lax.bitcast_convert_type(roots, jnp.float32)],
                      axis=0)                              # (12, N)
    if pad:
        fill = jnp.zeros((12, pad), attrs.dtype)
        fill = fill.at[5].set(1.0).at[8].set(1.0)          # dz=1 valid dir
        fill = fill.at[10].set(-1.0)                       # tmax<tmin: no hit
        attrs = jnp.concatenate([attrs, fill], axis=1)
    # slot-major: lane b of tile g, slot k handles ray k*(Np/K) + g*128 + b
    B = Np // K
    attrs = attrs.reshape(12, K, B)

    n_progs = B // (G * LANES)
    n_out = 6 if with_util else 5
    kern = partial(_traverse_kernel, n_slabs=n_slabs, n_rows=n_rows,
                   any_hit=any_hit, K=K, G=G, max_iters=max_iters,
                   with_util=with_util)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kern,
        grid=(n_progs,),
        out_shape=jax.ShapeDtypeStruct((n_out, K, B), jnp.float32),
        in_specs=[
            pl.BlockSpec((128, n_rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, K, G * LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, K, G * LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(table_t, attrs)
    t = out[0].reshape(Np)[:N]
    tri = _i32(out[1]).reshape(Np)[:N]
    u = out[2].reshape(Np)[:N]
    v = out[3].reshape(Np)[:N]
    hit = Hit(t=t, tri=tri, u=u, v=v)
    if with_iters:
        # row 4 holds each program's lockstep iteration count broadcast over
        # its block; sample lane 0 of slot 0 per program and sum.  Each
        # iteration fetches one (512B) row per lane for the G*128 lanes a
        # program owns; rows come from the VMEM-resident table.
        its = out[4, 0].reshape(n_progs, G * LANES)[:, 0]
        it_sum = jnp.sum(its)
        if with_util:
            # row 5: per-lane ACTIVE steps; utilization = sum / (iters*lanes)
            act_sum = jnp.sum(out[5, 0])
            return hit, it_sum, it_sum * jnp.float32(G * LANES), act_sum
        return hit, it_sum, it_sum * jnp.float32(G * LANES)
    return hit
