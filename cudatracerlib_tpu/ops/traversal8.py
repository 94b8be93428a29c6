"""Wide (8-ary) BVH traversal tuned to TPU gather/VPU characteristics.

Design, driven by microbenchmarks on v5e:
- A vector gather costs ~1 index-fetch regardless of row width (up to 128 f32 /
  512B), so the acceleration structure uses 128-float "fat rows" (scene/bvh8.py):
  a node row carries 8 child AABBs + links; a leaf row carries up to 12 whole
  triangles. One gather per traversal step fetches everything the step needs.
- The gathered (B, 128) block is immediately transposed to (128, B) so that the
  RAY batch occupies the 128-lane minor dimension: the 8-child slab test and the
  12-wide Moller-Trumbore run as (8, B)/(12, B) elementwise VPU ops at full lane
  utilization (slicing the row axis is free on the sublane dimension).
- The traversal stack is a shift-register of K per-lane int32 scalars updated
  with selects; a (B, K) scatter inside the loop would copy the whole buffer
  every iteration (measured ~1.3 ms/step).
- Stack entries pack (node index << 8 | unvisited-child bitmask) so revisiting
  a multi-hit node re-gathers and re-tests it instead of sorting children
  (Ylitie-style compressed traversal order).

Replaces the reference's Aila-Laine persistent-threads megakernel
(`Kernel/TraceHelper.cu:379-427`) as the production intersector.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .traversal import Hit, Rays, _safe_inv

Array = jax.Array

DONE = -1
POP = -0x40000000
STACK_DEPTH = 20
MAX_ITERS = 4096


def _bitcast_i32(x: Array) -> Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


@partial(jax.jit, static_argnames=("any_hit", "stack_depth", "max_iters",
                                   "with_iters"))
def intersect_wide(table: Array, rays: Rays, any_hit: bool = False,
                   stack_depth: int = STACK_DEPTH,
                   max_iters: int = MAX_ITERS, roots: Array = None,
                   with_iters: bool = False, any_mask: Array = None):
    """any_mask: optional (B,) bool giving PER-LANE any-hit semantics (lanes
    True exit on their first leaf hit) — lets one call trace a mixed
    closest+shadow wavefront (the merged bounce+NEE batch of models/path.py,
    mirroring the reference's deferred shadow-ray queue,
    `WavefrontPathTracer.cu:62-73`). Static any_hit must be False with it."""
    B = rays.o.shape[0]
    if roots is None:
        # varying-typed zero (check_vma; see intersect_wide_persistent)
        roots = jnp.where(rays.tmax > 0, 0, 0).astype(jnp.int32)
    assert not (any_hit and any_mask is not None)
    inv_d = _safe_inv(rays.d)
    ox, oy, oz = rays.o[:, 0], rays.o[:, 1], rays.o[:, 2]       # (B,)
    ix, iy, iz = inv_d[:, 0], inv_d[:, 1], inv_d[:, 2]
    dx, dy, dz = rays.d[:, 0], rays.d[:, 1], rays.d[:, 2]
    n_rows = table.shape[0]
    inf = jnp.float32(jnp.inf)
    bit8 = jnp.int32(1) << jnp.arange(8, dtype=jnp.int32)[:, None]   # (8,1)

    def body(state):
        it, cur, sp, stack, t_best, tri_best, u_best, v_best = state
        is_node = cur >= 0
        is_leaf = cur <= -2

        row_idx = jnp.where(is_node, cur >> 8, -2 - cur)
        row = jnp.take(table, jnp.clip(row_idx, 0, n_rows - 1), axis=0)  # (B,128)
        rt = row.T                                                        # (128,B)

        # ---------- node interpretation: slab test 8 children (8,B) ----------
        t0x = (rt[0:8] - ox) * ix
        t1x = (rt[24:32] - ox) * ix
        t0y = (rt[8:16] - oy) * iy
        t1y = (rt[32:40] - oy) * iy
        t0z = (rt[16:24] - oz) * iz
        t1z = (rt[40:48] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), rays.tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        links = _bitcast_i32(rt[48:56])                       # (8,B)
        mask = cur & 0xFF                                     # (B,)
        eligible = (tn <= tf) & (links != DONE) & ((mask & bit8) != 0)
        t_sel = jnp.where(eligible, tn, inf)
        best_j = jnp.argmin(t_sel, axis=0).astype(jnp.int32)  # (B,)
        has_child = jnp.isfinite(jnp.min(t_sel, axis=0))
        # per-lane picks via one-hot select reductions: take_along_axis on the
        # sublane axis lowers to a full (costly) gather on TPU
        oh8 = jnp.arange(8, dtype=jnp.int32)[:, None] == best_j
        link_best = jnp.sum(jnp.where(oh8, links, 0), axis=0)
        elig_bits = jnp.sum(jnp.where(eligible, bit8, 0), axis=0, dtype=jnp.int32)
        remaining = elig_bits & ~(jnp.int32(1) << best_j)
        descend = jnp.where(link_best >= 0, (link_best << 8) | 0xFF, link_best)
        node_next = jnp.where(has_child, descend, POP)
        push = is_node & has_child & (remaining != 0)
        push_val = ((cur >> 8) << 8) | remaining

        # ---------- leaf interpretation: 12-wide Moller-Trumbore (12,B) ------
        v0x, v0y, v0z = rt[0:12], rt[12:24], rt[24:36]
        e1x, e1y, e1z = rt[36:48], rt[48:60], rt[60:72]
        e2x, e2y, e2z = rt[72:84], rt[84:96], rt[96:108]
        ids = _bitcast_i32(rt[108:120])
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
                  & (u + v <= 1.0) & (t > rays.tmin) & (t < t_best))
        t_tri = jnp.where(tri_ok, t, inf)
        t_hit = jnp.min(t_tri, axis=0)
        oh12 = jnp.arange(12, dtype=jnp.int32)[:, None] == jnp.argmin(t_tri, axis=0)
        leaf_hit = is_leaf & jnp.isfinite(t_hit)
        t_best = jnp.where(leaf_hit, t_hit, t_best)
        tri_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, ids, 0), axis=0), tri_best)
        u_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, u, 0.0), axis=0), u_best)
        v_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, v, 0.0), axis=0), v_best)

        # ---------- combine, push, pop ----------
        nxt = jnp.where(is_node, node_next,
                        jnp.where(is_leaf, jnp.int32(POP), jnp.int32(DONE)))
        if any_hit:
            nxt = jnp.where(leaf_hit, jnp.int32(DONE), nxt)
        elif any_mask is not None:
            nxt = jnp.where(leaf_hit & any_mask, jnp.int32(DONE), nxt)

        new_stack = [jnp.where(push, push_val, stack[0])]
        for k in range(1, stack_depth):
            new_stack.append(jnp.where(push, stack[k - 1], stack[k]))
        sp = sp + push.astype(jnp.int32)

        want_pop = nxt == POP
        can_pop = want_pop & (sp > 0)
        popped = new_stack[0]
        final_stack = []
        for k in range(stack_depth - 1):
            final_stack.append(jnp.where(can_pop, new_stack[k + 1], new_stack[k]))
        final_stack.append(new_stack[stack_depth - 1])
        sp = jnp.where(can_pop, sp - 1, sp)
        cur = jnp.where(want_pop, jnp.where(can_pop, popped, DONE), nxt)
        return (it + 1, cur, sp, tuple(final_stack), t_best, tri_best, u_best, v_best)

    def cond(state):
        return (state[0] < max_iters) & jnp.any(state[1] != DONE)

    # constants derive from the rays' varying type (check_vma; see
    # intersect_wide_persistent)
    izero = roots * 0
    vzero = jnp.where(rays.tmax > 0, 0.0, 0.0)
    init = (jnp.int32(0),
            (roots << 8) | 0xFF,            # per-lane root, all children unvisited
            izero,
            tuple(izero for _ in range(stack_depth)),
            rays.tmax,
            izero - 1,
            vzero, vzero)
    out = jax.lax.while_loop(cond, body, init)
    hit = Hit(t=out[4], tri=out[5], u=out[6], v=out[7])
    if with_iters:
        # lockstep loop iterations + fat rows gathered (one 512B row per lane
        # per iteration) — the bench's bandwidth-accounting counters, matching
        # the reference's g_RayTracedCounter spirit (TraceHelper.cu:309-320)
        it = out[0].astype(jnp.float32)
        return hit, it, it * jnp.float32(B)
    return hit




@partial(jax.jit, static_argnames=("any_hit", "rays_per_lane", "stack_depth",
                                   "max_iters", "with_iters"))
def intersect_wide_persistent(table: Array, rays: Rays, rays_per_lane: int = 4,
                              any_hit: bool = False,
                              stack_depth: int = STACK_DEPTH,
                              max_iters: int = MAX_ITERS,
                              roots: Array = None,
                              with_iters: bool = False,
                              any_mask: Array = None):
    """Persistent-lane wide traversal: each lane processes K rays in sequence.

    The lockstep while_loop's cost is set by the WORST lane; with one ray per
    lane the whole batch waits on the slowest ray. Assigning K rays per lane
    (lane b handles rays b, B+b, 2B+b, ...) amortizes the tail: total
    iterations approach K * mean-steps instead of K * worst-steps — the TPU
    equivalent of Aila-Laine persistent threads fetching from the global ray
    queue, with the queue statically strided instead of atomic.
    """
    K = rays_per_lane
    N = rays.o.shape[0]
    assert N % K == 0, "ray count must divide rays_per_lane"
    B = N // K
    assert not (any_hit and any_mask is not None)
    if roots is None:
        # varying-typed zero (see pt_radiance): where(pred,0,0) is exactly 0
        # but carries the rays' device-varying type under check_vma (a
        # `rays.tmax * 0` would NaN on inf-tmax callers)
        roots = jnp.where(rays.tmax > 0, 0, 0).astype(jnp.int32)
    if K == 1:
        return intersect_wide(table, rays, any_hit=any_hit,
                              stack_depth=stack_depth, max_iters=max_iters,
                              roots=roots, with_iters=with_iters,
                              any_mask=any_mask)
    inv_all = _safe_inv(rays.d)
    # slot-major views: slot k of lane b is ray k*B + b
    oK = rays.o.reshape(K, B, 3)
    dK = rays.d.reshape(K, B, 3)
    iK = inv_all.reshape(K, B, 3)
    tminK = rays.tmin.reshape(K, B)
    tmaxK = rays.tmax.reshape(K, B)
    rootK = roots.reshape(K, B)
    use_mask = any_mask is not None
    anyK = (any_mask.reshape(K, B) if use_mask
            else rootK != rootK)   # all-False, varying-typed like the rays
    n_rows = table.shape[0]
    inf = jnp.float32(jnp.inf)
    bit8 = jnp.int32(1) << jnp.arange(8, dtype=jnp.int32)[:, None]

    def sel_slot(k_idx, stacked):
        out = stacked[0]
        for k in range(1, K):
            m = k_idx == k
            out = jnp.where(m[..., None] if stacked[k].ndim == 2 else m,
                            stacked[k], out)
        return out

    def body(state):
        (it, k_cur, cur, sp, stack, ox, oy, oz, ix, iy, iz, dx, dy, dz, tmn,
         t_best, tri_best, u_best, v_best, anyh, outs) = state
        is_node = cur >= 0
        is_leaf = cur <= -2

        row_idx = jnp.where(is_node, cur >> 8, -2 - cur)
        row = jnp.take(table, jnp.clip(row_idx, 0, n_rows - 1), axis=0)
        rt = row.T

        t0x = (rt[0:8] - ox) * ix
        t1x = (rt[24:32] - ox) * ix
        t0y = (rt[8:16] - oy) * iy
        t1y = (rt[32:40] - oy) * iy
        t0z = (rt[16:24] - oz) * iz
        t1z = (rt[40:48] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmn))
        tf_ = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                          jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        links = _bitcast_i32(rt[48:56])
        mask = cur & 0xFF
        eligible = (tn <= tf_) & (links != DONE) & ((mask & bit8) != 0)
        t_sel = jnp.where(eligible, tn, inf)
        best_j = jnp.argmin(t_sel, axis=0).astype(jnp.int32)
        has_child = jnp.isfinite(jnp.min(t_sel, axis=0))
        oh8 = jnp.arange(8, dtype=jnp.int32)[:, None] == best_j
        link_best = jnp.sum(jnp.where(oh8, links, 0), axis=0)
        elig_bits = jnp.sum(jnp.where(eligible, bit8, 0), axis=0, dtype=jnp.int32)
        remaining = elig_bits & ~(jnp.int32(1) << best_j)
        descend = jnp.where(link_best >= 0, (link_best << 8) | 0xFF, link_best)
        node_next = jnp.where(has_child, descend, POP)
        push = is_node & has_child & (remaining != 0)
        push_val = ((cur >> 8) << 8) | remaining

        v0x, v0y, v0z = rt[0:12], rt[12:24], rt[24:36]
        e1x, e1y, e1z = rt[36:48], rt[48:60], rt[60:72]
        e2x, e2y, e2z = rt[72:84], rt[84:96], rt[96:108]
        ids = _bitcast_i32(rt[108:120])
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
        t_hit = jnp.min(t_tri, axis=0)
        oh12 = jnp.arange(12, dtype=jnp.int32)[:, None] == jnp.argmin(t_tri, axis=0)
        leaf_hit = is_leaf & jnp.isfinite(t_hit)
        t_best = jnp.where(leaf_hit, t_hit, t_best)
        tri_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, ids, 0), axis=0), tri_best)
        u_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, u, 0.0), axis=0), u_best)
        v_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, v, 0.0), axis=0), v_best)

        nxt = jnp.where(is_node, node_next,
                        jnp.where(is_leaf, jnp.int32(POP), jnp.int32(DONE)))
        if any_hit:
            nxt = jnp.where(leaf_hit, jnp.int32(DONE), nxt)
        elif use_mask:
            nxt = jnp.where(leaf_hit & anyh, jnp.int32(DONE), nxt)

        new_stack = [jnp.where(push, push_val, stack[0])]
        for k in range(1, stack_depth):
            new_stack.append(jnp.where(push, stack[k - 1], stack[k]))
        sp = sp + push.astype(jnp.int32)
        want_pop = nxt == POP
        can_pop = want_pop & (sp > 0)
        popped = new_stack[0]
        final_stack = []
        for k in range(stack_depth - 1):
            final_stack.append(jnp.where(can_pop, new_stack[k + 1], new_stack[k]))
        final_stack.append(new_stack[stack_depth - 1])
        sp = jnp.where(can_pop, sp - 1, sp)
        cur = jnp.where(want_pop, jnp.where(can_pop, popped, DONE), nxt)

        # ---------- ray completion: record outputs, fetch the next ray ------
        completed = (cur == DONE) & (k_cur < K)
        out_t, out_tri, out_u, out_v = outs
        new_out_t, new_out_tri, new_out_u, new_out_v = [], [], [], []
        for k in range(K):
            mk = completed & (k_cur == k)
            new_out_t.append(jnp.where(mk, t_best, out_t[k]))
            new_out_tri.append(jnp.where(mk, tri_best, out_tri[k]))
            new_out_u.append(jnp.where(mk, u_best, out_u[k]))
            new_out_v.append(jnp.where(mk, v_best, out_v[k]))
        k_next = jnp.where(completed, k_cur + 1, k_cur)
        fetch = completed & (k_next < K)
        o_new = sel_slot(k_next, oK)
        d_new = sel_slot(k_next, dK)
        i_new = sel_slot(k_next, iK)
        tmin_new = sel_slot(k_next, tminK)
        tmax_new = sel_slot(k_next, tmaxK)
        root_new = sel_slot(k_next, rootK)
        ox = jnp.where(fetch, o_new[:, 0], ox)
        oy = jnp.where(fetch, o_new[:, 1], oy)
        oz = jnp.where(fetch, o_new[:, 2], oz)
        ix = jnp.where(fetch, i_new[:, 0], ix)
        iy = jnp.where(fetch, i_new[:, 1], iy)
        iz = jnp.where(fetch, i_new[:, 2], iz)
        dx = jnp.where(fetch, d_new[:, 0], dx)
        dy = jnp.where(fetch, d_new[:, 1], dy)
        dz = jnp.where(fetch, d_new[:, 2], dz)
        tmn = jnp.where(fetch, tmin_new, tmn)
        t_best = jnp.where(fetch, tmax_new, t_best)
        tri_best = jnp.where(fetch, -1, tri_best)
        u_best = jnp.where(fetch, 0.0, u_best)
        v_best = jnp.where(fetch, 0.0, v_best)
        anyh = jnp.where(fetch, sel_slot(k_next, anyK), anyh)
        cur = jnp.where(fetch, (root_new << 8) | 0xFF, cur)
        sp = jnp.where(fetch, 0, sp)
        return (it + 1, k_next, cur, sp, tuple(final_stack),
                ox, oy, oz, ix, iy, iz, dx, dy, dz, tmn,
                t_best, tri_best, u_best, v_best, anyh,
                (tuple(new_out_t), tuple(new_out_tri), tuple(new_out_u),
                 tuple(new_out_v)))

    def cond(state):
        return (state[0] < max_iters) & jnp.any(state[2] != DONE)

    # derive every zero/constant carry from a VARYING input so the carry
    # types are stable under shard_map's varying-axis checker (check_vma):
    # a fresh jnp.zeros is replicated, the body's updates are varying, and
    # lax.while_loop rejects the type mismatch (VERDICT r4 #7)
    vzero = jnp.where(tmaxK[0] > 0, 0.0, 0.0)  # (B,) f32 zero w/ input vma
    izero = rootK[0] * 0                       # (B,) i32 likewise
    zeros_f = tuple(vzero for _ in range(K))
    init = (jnp.int32(0), izero,
            (rootK[0] << 8) | 0xFF, izero,
            tuple(izero for _ in range(stack_depth)),
            oK[0, :, 0], oK[0, :, 1], oK[0, :, 2],
            iK[0, :, 0], iK[0, :, 1], iK[0, :, 2],
            dK[0, :, 0], dK[0, :, 1], dK[0, :, 2],
            tminK[0], tmaxK[0],
            izero - 1, vzero, vzero,
            anyK[0],
            (zeros_f, tuple(izero - 1 for _ in range(K)),
             zeros_f, zeros_f))
    out = jax.lax.while_loop(cond, body, init)
    out_t, out_tri, out_u, out_v = out[20]
    hit = Hit(t=jnp.stack(out_t).reshape(N),
              tri=jnp.stack(out_tri).reshape(N),
              u=jnp.stack(out_u).reshape(N),
              v=jnp.stack(out_v).reshape(N))
    if with_iters:
        it = out[0].astype(jnp.float32)
        return hit, it, it * jnp.float32(B)
    return hit


def pack_unified(bvh8_nodes, bvh8_leaves):
    """Concatenate node+leaf rows into one table, remapping leaf links."""
    import numpy as np
    n8 = bvh8_nodes.shape[0]
    nodes = bvh8_nodes.copy()
    links = nodes[:, 48:56].view(np.int32)
    leaf = links <= -2
    links[leaf] = -2 - (n8 + (-2 - links[leaf]))
    return np.concatenate([nodes, bvh8_leaves], axis=0)


DEFAULT_RAYS_PER_LANE = 16
# test hooks: exercise the treelet / VMEM-Pallas dispatch branches on the
# CPU backend (kernels fall back to interpret mode there)
FORCE_TREELET = False
FORCE_PALLAS = False
# dispatch INCOHERENT wavefronts (bounce/shadow rays) onto the treelet
# kernel too; the reference's one intersector serves ALL rays
# (`Kernel/TraceHelper.cu:379-427`) and the phase-2 visit sort restores
# slab-DMA coherence regardless of ray order. Env-overridable for A/B
# benching (tools/microbench_r4.py measured V>6 LOSING to the XLA loop on
# real bounce rays: the sort/glue cost scales with B*V while its benefit
# saturates — see docs/ROUND4_NOTES.md).
import os as _os
TREELET_INCOHERENT = _os.environ.get("CTL_TREELET_INCOHERENT", "1") == "1"
V_COHERENT = int(_os.environ.get("CTL_V_COHERENT", "6"))
V_INCOHERENT = int(_os.environ.get("CTL_V_INCOHERENT", "3"))
#                       bounce/shadow rays: the round-5 e2e sweep at
#                       TREELET_ROWS=512 measured V=3 best on san-miguel
#                       (1.208 vs 1.105 Mrays/s at the old ROWS=256/V=4;
#                       V=2's overflow fallback eats the win — r5_queue12)
# bucket-sort incoherent wavefronts before the VMEM Pallas kernel: the
# kernel's while_loop runs to the WORST lane of each G*128-lane program, so
# grouping rays by direction octant + origin cell equalizes per-program work
# (the round-4 looped profile measured bounce/shadow rays at ~4x the per-ray
# cost of camera rays on veach). O(B) counting sort — NOT jnp.argsort, whose
# bitonic network was measured at ~8 ms on 131k lanes. Default OFF until the
# e2e A/B on real hardware lands (tunnel outage blocked the measurement);
# flip via CTL_SORT_INCOHERENT=1.
SORT_INCOHERENT = _os.environ.get("CTL_SORT_INCOHERENT", "0") == "1"

# shared-pool VMEM Pallas kernel (traversal_pl.intersect_pallas_pool): lanes
# grab the next unstarted ray from the tile's K*128-ray queue instead of
# owning a fixed K-ray column — the Aila-Laine global work fetch rebuilt
# with lane prefix-sums. Attacks the measured 0.23-0.40 bounce/shadow
# lockstep utilization (bench_out/r5_util.log). A/B via CTL_PL_POOL.
PL_POOL = _os.environ.get("CTL_PL_POOL", "0") == "1"


SORT_IMPL = _os.environ.get("CTL_SORT_IMPL", "lax")


def _bucket_perm(key: Array, n_buckets: int):
    """Stable sort permutation for small integer keys.

    Returns (src, dest): `x[src]` is x in key-sorted order; `sorted_y[dest]`
    restores original order. Two implementations, selectable for A/B:
    - "lax" (default): ONE variadic lax.sort for src, a second to invert it
      (the arbitrary-index scatter that a counting sort needs to invert its
      dest lowers to a near-serial loop on TPU — see the measured note in
      ops/traversal_tt.py; sorting (order, iota) is the fast inverse).
    - "counting": O(B*n_buckets) one-hot cumsum + a unique-index scatter.
    """
    B = key.shape[0]
    iota = jnp.arange(B, dtype=jnp.int32)
    if SORT_IMPL == "lax":
        _, src = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
        _, dest = jax.lax.sort((src, iota), num_keys=1, is_stable=True)
        return src, dest
    onehot = (key[:, None] == jnp.arange(n_buckets, dtype=key.dtype)[None, :]
              ).astype(jnp.int32)                       # (B, nb)
    within = jnp.cumsum(onehot, axis=0) - onehot        # rank inside bucket
    counts = within[-1] + onehot[-1]
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    dest = jnp.take(offs, key) + jnp.sum(within * onehot, axis=1)
    src = jnp.zeros(B, jnp.int32).at[dest].set(iota, unique_indices=True)
    return src, dest


def _ray_sort_key(rays: Rays, n_buckets: int = 65) -> Array:
    """Coherence key: 3 direction-sign bits x 3 origin-half bits (halves of
    the wavefront's own bbox — no scene bounds needed), dead lanes
    (tmax <= tmin) in their own final bucket so they don't dilute live ones."""
    o, d = rays.o, rays.d
    oct_ = ((d[:, 0] > 0).astype(jnp.int32)
            + 2 * (d[:, 1] > 0).astype(jnp.int32)
            + 4 * (d[:, 2] > 0).astype(jnp.int32))
    mid = 0.5 * (jnp.min(o, axis=0) + jnp.max(o, axis=0))
    cell = ((o[:, 0] > mid[0]).astype(jnp.int32)
            + 2 * (o[:, 1] > mid[1]).astype(jnp.int32)
            + 4 * (o[:, 2] > mid[2]).astype(jnp.int32))
    key = oct_ * 8 + cell
    return jnp.where(rays.tmax <= rays.tmin, n_buckets - 1, key)


def _pallas_sorted(table_t, rays: Rays, any_hit: bool, roots, with_iters,
                   any_mask):
    """intersect_pallas behind a coherence-restoring permutation (exact: a
    pure reorder of independent per-ray queries).

    Permutes via STACKED multi-row lane gathers — separate per-field 1-D
    element gathers lower to a ~7ns/element serial path on TPU while
    gathering all rows of a (R, B) operand along axis 1 is ~17x faster
    (measured, see ops/traversal_tt.py)."""
    from . import traversal_pl
    src, dest = _bucket_perm(_ray_sort_key(rays), 65)
    B = rays.o.shape[0]
    stk = [rays.o[:, 0], rays.o[:, 1], rays.o[:, 2],
           rays.d[:, 0], rays.d[:, 1], rays.d[:, 2],
           rays.tmin, rays.tmax]
    if roots is not None:
        stk.append(jax.lax.bitcast_convert_type(roots, jnp.float32))
    if any_mask is not None:
        stk.append(any_mask.astype(jnp.float32))
    g = jnp.take(jnp.stack(stk, axis=0), src, axis=1)     # (R, B) one gather
    rs = Rays(o=g[0:3].T, d=g[3:6].T, tmin=g[6], tmax=g[7])
    i = 8
    roots_s = None
    if roots is not None:
        roots_s = jax.lax.bitcast_convert_type(g[i], jnp.int32)
        i += 1
    amask_s = None if any_mask is None else g[i] > 0.5
    res = traversal_pl.intersect_pallas(table_t, rs, any_hit=any_hit,
                                        roots=roots_s, with_iters=with_iters,
                                        any_mask=amask_s)
    hit = res[0] if with_iters else res
    hs = jnp.take(jnp.stack([hit.t,
                             jax.lax.bitcast_convert_type(hit.tri,
                                                          jnp.float32),
                             hit.u, hit.v], axis=0), dest, axis=1)
    hit = Hit(t=hs[0], tri=jax.lax.bitcast_convert_type(hs[1], jnp.int32),
              u=hs[2], v=hs[3])
    if with_iters:
        return (hit,) + tuple(res[1:])
    return hit


def treelet_would_dispatch(geom, coherent: bool = True,
                           roots: Array = None) -> bool:
    """True iff intersect_scene would route this geometry+wavefront onto the
    two-phase treelet kernel. Shared by the dispatch below and any caller
    that must mirror it (e.g. models/path.py's depth-0 peel) so the two can
    never silently desync (advisor finding, round 3)."""
    import jax as _jax
    on_tpu = _jax.default_backend() not in ("cpu",)
    return ((on_tpu or FORCE_TREELET) and geom.inst is None
            and geom.tt_top is not None and roots is None
            and (coherent or TREELET_INCOHERENT))


def intersect_scene(geom, rays: Rays, any_hit: bool = False,
                    roots: Array = None, with_iters: bool = False,
                    coherent: bool = False, any_mask: Array = None):
    """Production intersector over a GeometryTable (wide fat-row path).

    Dispatch (static, at trace time):
    - instanced scene (geom.inst) -> two-level TLAS/BLAS traversal
      (ops/instanced.py); hit carries local tri + instance id.
    - TPU + table fits VMEM -> Pallas on-chip traversal kernel
      (ops/traversal_pl.py): ~5x the XLA path on Cornell-class scenes by
      keeping the whole state machine in vregs (no per-iteration dispatch
      or loop-state round trips).
    - TPU + HBM-scale table -> two-phase treelet kernel (ops/traversal_tt.py)
      for EVERY wavefront (round 4; round 3 gated it to coherent=True). The
      visit sort restores slab-DMA coherence even for incoherent bounce and
      shadow rays; the `coherent` hint only selects the visit budget V
      (incoherent rays touch more treelets). Exactness is kept by the
      counted overflow fallback below.
    - otherwise -> XLA gather loop with persistent lanes (K rays per lane,
      amortizing the lockstep worst-lane tail).

    with_iters=True returns (hit, lockstep iterations, 512B fat rows
    gathered, clipped-overflow count). The fourth field is 0 BY CONSTRUCTION
    since round 4 (the fallback re-traverses overflow rays budgetless —
    compacted when they fit a lane-aligned batch, masked full-batch
    otherwise); it stays in the tuple only for interface stability across
    the pt/bench carry signatures."""
    import jax as _jax
    from . import traversal_pl
    if geom.inst is not None:
        from . import instanced
        return instanced.intersect_instanced(geom, rays, any_hit=any_hit,
                                             with_iters=with_iters,
                                             any_mask=any_mask)
    n_rows = geom.wide.shape[0]
    on_tpu = _jax.default_backend() not in ("cpu",)
    if ((on_tpu or FORCE_PALLAS)
            and n_rows <= traversal_pl.MAX_SLABS * traversal_pl.LANES):
        table_t = traversal_pl.prep_table_jnp(geom.wide)
        if SORT_INCOHERENT and not coherent:
            res = _pallas_sorted(table_t, rays, any_hit, roots, with_iters,
                                 any_mask)
        elif PL_POOL:
            res = traversal_pl.intersect_pallas_pool(
                table_t, rays, any_hit=any_hit, roots=roots,
                with_iters=with_iters, any_mask=any_mask)
        else:
            res = traversal_pl.intersect_pallas(table_t, rays,
                                                any_hit=any_hit, roots=roots,
                                                with_iters=with_iters,
                                                any_mask=any_mask)
        if with_iters:
            return res[0], res[1], res[2], jnp.float32(0.0)
        return res
    if treelet_would_dispatch(geom, coherent=coherent, roots=roots):
        return intersect_treelet_exact(geom, rays, any_hit=any_hit,
                                       coherent=coherent,
                                       with_iters=with_iters,
                                       any_mask=any_mask)
    K = DEFAULT_RAYS_PER_LANE
    if rays.o.shape[0] % K == 0 and rays.o.shape[0] >= 4 * K:
        res = intersect_wide_persistent(geom.wide, rays, rays_per_lane=K,
                                        any_hit=any_hit, roots=roots,
                                        with_iters=with_iters,
                                        any_mask=any_mask)
    else:
        res = intersect_wide(geom.wide, rays, any_hit=any_hit, roots=roots,
                             with_iters=with_iters, any_mask=any_mask)
    if with_iters:
        return res[0], res[1], res[2], jnp.float32(0.0)
    return res


def intersect_treelet_exact(geom, rays: Rays, any_hit: bool = False,
                            coherent: bool = False, with_iters: bool = False,
                            roots: Array = None, roots_top: Array = None,
                            any_mask: Array = None):
    """Treelet two-phase traversal + the COUNTED exactness fallback.

    Shared by the non-instanced dispatch above and the instanced BLAS path
    (ops/instanced.py): with per-lane `roots_top` (top-local start rows,
    treelet.TreeletTable.root_top) each lane traverses its own BLAS subtree
    of the forest-partitioned table; `roots` carries the matching GLOBAL
    wide-table rows for the overflow fallback's re-traversal. The fallback
    always re-traverses CLOSEST-hit (exact; a valid closest hit answers an
    any-hit lane's query too), so any_mask needs no fallback plumbing."""
    from . import traversal_tt
    res = traversal_tt.intersect_treelet(
        geom.tt_top, geom.tt_slabs, geom.tt_vid, rays, any_hit=any_hit,
        V=V_COHERENT if coherent else V_INCOHERENT,
        with_overflow=True, with_iters=with_iters, roots=roots_top,
        any_mask=any_mask)
    hit, ovf = res[0], res[1]
    # EXACTNESS: rays whose treelet-visit list overflowed the V budget may
    # have missed their closest hit. Re-traverse the WHOLE batch on the XLA
    # persistent-lane loop with tmax = treelet-t for overflow rays and 0 for
    # everyone else: non-overflow lanes die in one lockstep step, overflow
    # lanes re-traverse pruned by the treelet t, and the full-batch mask
    # needs NO compaction glue (round 4 replaced the fixed-M compacted batch:
    # dense san-miguel regions overflowed it by MILLIONS of rays per pass —
    # the clip counter did its job — and the sort+gather+scatter glue cost
    # about as much as the masked full-batch loop it was trying to avoid).
    # Exactness no longer depends on any budget; `clipped` is 0 by
    # construction and stays in the stats tuple for interface stability.
    B = rays.o.shape[0]
    K = DEFAULT_RAYS_PER_LANE
    # compacted-branch width: covers the measured ~8% overflow rate of
    # incoherent V=4 wavefronts with 2x headroom; lane-aligned for the
    # persistent loop
    M = max(4 * K, (B // 8) // K * K)

    def _merge(hit, fb, mask):
        # fb.valid implies fb.t < its tmax == treelet t, so it wins outright
        win = fb.valid & mask
        return Hit(t=jnp.where(win, fb.t, hit.t),
                   tri=jnp.where(win, fb.tri, hit.tri),
                   u=jnp.where(win, fb.u, hit.u),
                   v=jnp.where(win, fb.v, hit.v))

    def _full_fallback(hit):
        fb_rays = Rays(o=rays.o, d=rays.d, tmin=rays.tmin,
                       tmax=jnp.where(ovf, hit.t, 0.0))
        if B % K == 0 and B >= 4 * K:
            # persistent lanes amortize the lockstep worst-lane tail over
            # the (mostly dead) fallback batch
            fb = intersect_wide_persistent(geom.wide, fb_rays,
                                           rays_per_lane=K, any_hit=any_hit,
                                           roots=roots, any_mask=any_mask)
        else:
            fb = intersect_wide(geom.wide, fb_rays, any_hit=any_hit,
                                roots=roots, any_mask=any_mask)
        return _merge(hit, fb, ovf)

    def _compact_fallback(hit):
        # overflow rays only: the full-batch loop's gather traffic is
        # lanes x iterations x 512B even for dead lanes (measured round 4:
        # the fallback's gathers DOMINATED the san-miguel pass at ~2 GB per
        # call). Sort-compact the <= M overflow rays (stable variadic
        # lax.sort — arbitrary-index scatters lower near-serially on TPU),
        # re-traverse the M-lane batch, and merge back with a stacked
        # multi-row gather via the inverse permutation.
        iota = jnp.arange(B, dtype=jnp.int32)
        key = jnp.where(ovf, 0, 1).astype(jnp.int32)
        _, idx = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
        _, pos = jax.lax.sort((idx, iota), num_keys=1, is_stable=True)
        stk = [rays.o[:, 0], rays.o[:, 1], rays.o[:, 2],
               rays.d[:, 0], rays.d[:, 1], rays.d[:, 2],
               rays.tmin, jnp.where(ovf, hit.t, 0.0)]
        if roots is not None:
            stk.append(jax.lax.bitcast_convert_type(roots, jnp.float32))
        if any_mask is not None:
            # carry the per-lane any-hit flag into the compacted batch so
            # shadow lanes early-out instead of re-traversing to completion
            # (VERDICT r4 weak #6)
            stk.append(any_mask.astype(jnp.float32))
        g = jnp.take(jnp.stack(stk, axis=0), idx[:M], axis=1)
        fb_rays = Rays(o=g[0:3].T, d=g[3:6].T, tmin=g[6], tmax=g[7])
        i = 8
        roots_m = None
        if roots is not None:
            roots_m = jax.lax.bitcast_convert_type(g[i], jnp.int32)
            i += 1
        amask_m = None if any_mask is None else g[i] > 0.5
        fb_m = intersect_wide_persistent(geom.wide, fb_rays,
                                         rays_per_lane=K, any_hit=any_hit,
                                         roots=roots_m, any_mask=amask_m)
        # lane i's result sits at slot pos[i] (valid only when pos[i] < M,
        # i.e. the lane actually overflowed into the compacted batch)
        hs = jnp.take(jnp.stack(
            [fb_m.t, jax.lax.bitcast_convert_type(fb_m.tri, jnp.float32),
             fb_m.u, fb_m.v], axis=0), jnp.minimum(pos, M - 1), axis=1)
        fb = Hit(t=hs[0], tri=jax.lax.bitcast_convert_type(hs[1], jnp.int32),
                 u=hs[2], v=hs[3])
        return _merge(hit, fb, ovf & (pos < M))

    # runtime ladder (lax.cond executes only the taken branch on TPU):
    #   no overflow     -> skip everything (sky-heavy chunks)
    #   overflow <= M   -> compacted re-traversal (the common case)
    #   overflow > M    -> exact full-batch masked loop (never clips)
    n_ovf = jnp.sum(ovf.astype(jnp.int32))
    can_compact = B % K == 0 and B >= 4 * K and M % K == 0
    if can_compact:
        hit = jax.lax.cond(
            n_ovf == 0, lambda h: h,
            lambda h: jax.lax.cond(n_ovf <= M, _compact_fallback,
                                   _full_fallback, h),
            hit)
    else:
        hit = jax.lax.cond(n_ovf == 0, lambda h: h, _full_fallback, hit)
    if with_iters:
        return hit, res[2], res[3], jnp.float32(0.0)
    return hit
