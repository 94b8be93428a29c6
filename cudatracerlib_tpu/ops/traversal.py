"""BVH traversal + triangle intersection over ray batches.

TPU-native replacement for the reference's megakernel intersectors
(`Kernel/TraceHelper.cu:88-180` single-ray and `:379-427` Aila-Laine
persistent-threads kernel). Instead of per-thread work queues and warp ballots,
a whole ray batch traverses in lockstep under one `lax.while_loop`: every lane
holds a current "pointer" (internal node / in-leaf cursor / done) and a small
stack, and every iteration performs a masked node-step (fetch packed node row,
slab-test both children, push the far one) OR a masked leaf-step (one
Moller-Trumbore triangle test). Divergence cost is bounded by the slowest lane,
which sort-based ray batching keeps in check.

Data layout (see scene/bvh.py): nodes are (N, 16) f32 rows so one row-gather per
step fetches both child AABBs and links; triangles are (T, 12) f32 rows
[v0, e1, e2, pad] for a one-gather Moller-Trumbore test.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

DONE = -1  # also: INVALID child link
STACK_DEPTH = 48
MAX_ITERS = 10_000


class Rays(NamedTuple):
    o: Array      # (B, 3)
    d: Array      # (B, 3)
    tmin: Array   # (B,)
    tmax: Array   # (B,)


class Hit(NamedTuple):
    t: Array       # (B,) hit distance (tmax if miss)
    tri: Array     # (B,) int32 triangle id, -1 if miss
    u: Array       # (B,) barycentric
    v: Array       # (B,)
    # instance id for two-level (TLAS/BLAS) scenes; None when flattened
    inst: "Array | None" = None

    @property
    def valid(self) -> Array:
        return self.tri >= 0


def _safe_inv(d: Array) -> Array:
    eps = 1e-20
    safe_d = jnp.where(jnp.abs(d) < eps, jnp.where(d >= 0, eps, -eps), d)
    return 1.0 / safe_d


def _slab(lo, hi, o, inv_d, tmin, tmax):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), tmin)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), tmax)
    return tn <= tf, tn


def moller_trumbore(v0, e1, e2, o, d, tmin, tmax):
    """Returns (valid, t, u, v). All inputs batched (..., 3) / (...,)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = ((jnp.abs(det) >= 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
             & (t > tmin) & (t < tmax))
    return valid, t, u, v


def _bitcast_i32(x: Array) -> Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


@partial(jax.jit, static_argnames=("any_hit", "stack_depth", "max_iters"))
def intersect_bvh(nodes: Array, tris: Array, tri_order: Array, rays: Rays,
                  any_hit: bool = False, stack_depth: int = STACK_DEPTH,
                  max_iters: int = MAX_ITERS) -> Hit:
    """Closest-hit (or any-hit) intersection of a ray batch against the BVH."""
    B = rays.o.shape[0]
    inv_d = _safe_inv(rays.d)
    lane = jnp.arange(B)

    def body(state):
        it, cur, sp, stack, t_best, tri_best, u_best, v_best = state
        is_node = cur >= 0
        is_leaf = cur <= -2

        # ---- node step (masked) ----
        row = jnp.take(nodes, jnp.maximum(cur, 0), axis=0)           # (B, 16)
        link0 = _bitcast_i32(row[:, 12])
        link1 = _bitcast_i32(row[:, 13])
        h0, tn0 = _slab(row[:, 0:3], row[:, 3:6], rays.o, inv_d, rays.tmin, t_best)
        h1, tn1 = _slab(row[:, 6:9], row[:, 9:12], rays.o, inv_d, rays.tmin, t_best)
        h0 = h0 & (link0 != DONE)
        h1 = h1 & (link1 != DONE)
        both = h0 & h1
        first_is_0 = tn0 <= tn1
        near = jnp.where(first_is_0, link0, link1)
        far = jnp.where(first_is_0, link1, link0)
        POP = jnp.int32(-0x7FFFFFFF)  # marker: this lane needs to pop
        node_next = jnp.where(both, near,
                              jnp.where(h0, link0, jnp.where(h1, link1, POP)))
        push = both & is_node
        slot = jnp.minimum(sp, stack_depth - 1)
        old = jnp.take_along_axis(stack, slot[:, None], axis=1)[:, 0]
        stack = stack.at[lane, slot].set(jnp.where(push, far, old))
        sp = sp + push.astype(jnp.int32)

        # ---- leaf step (masked): one triangle per iteration ----
        code = -2 - cur
        first = code >> 4
        cnt = code & 15
        tid = jnp.take(tri_order, jnp.maximum(first, 0) % tri_order.shape[0])
        trow = jnp.take(tris, tid, axis=0)                            # (B, 12)
        valid, t, u, v = moller_trumbore(trow[:, 0:3], trow[:, 3:6], trow[:, 6:9],
                                         rays.o, rays.d, rays.tmin, t_best)
        hit_now = is_leaf & valid
        t_best = jnp.where(hit_now, t, t_best)
        tri_best = jnp.where(hit_now, tid, tri_best)
        u_best = jnp.where(hit_now, u, u_best)
        v_best = jnp.where(hit_now, v, v_best)
        leaf_next = jnp.where(cnt > 1, -2 - ((first + 1) << 4 | (cnt - 1)), POP)
        if any_hit:
            leaf_next = jnp.where(hit_now, jnp.int32(DONE), leaf_next)

        # ---- combine + pop ----
        nxt = jnp.where(is_node, node_next, jnp.where(is_leaf, leaf_next, DONE))
        want_pop = nxt == POP
        can_pop = want_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        popped = jnp.take_along_axis(stack, jnp.minimum(sp, stack_depth - 1)[:, None],
                                     axis=1)[:, 0]
        cur = jnp.where(want_pop, jnp.where(can_pop, popped, DONE), nxt)
        return it + 1, cur, sp, stack, t_best, tri_best, u_best, v_best

    def cond(state):
        it, cur = state[0], state[1]
        return (it < max_iters) & jnp.any(cur != DONE)

    init = (jnp.int32(0),
            jnp.zeros(B, jnp.int32),                       # cur = root node 0
            jnp.zeros(B, jnp.int32),                       # sp
            jnp.full((B, stack_depth), DONE, jnp.int32),   # stack
            rays.tmax,
            jnp.full(B, -1, jnp.int32),
            jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.float32))
    _, _, _, _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
    return Hit(t=t, tri=tri, u=u, v=v)


def occluded(nodes, tris, tri_order, rays: Rays) -> Array:
    """Boolean shadow-ray query (reference `KernelDynamicScene::Occluded`)."""
    hit = intersect_bvh(nodes, tris, tri_order, rays, any_hit=True)
    return hit.valid


def intersect_bruteforce(tris: Array, rays: Rays, chunk: int = 512) -> Hit:
    """Reference O(B*T) intersector for testing the BVH path."""
    T = tris.shape[0]

    def scan_chunk(carry, tri_block):
        t_best, tri_best, u_best, v_best = carry
        tids, trow = tri_block
        # trow: (C, 12); broadcast rays (B,1,3) vs tris (1,C,3)
        valid, t, u, v = moller_trumbore(
            trow[None, :, 0:3], trow[None, :, 3:6], trow[None, :, 6:9],
            rays.o[:, None, :], rays.d[:, None, :],
            rays.tmin[:, None], t_best[:, None])
        t = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t, axis=1)
        bi = jnp.arange(t.shape[0])
        better = t[bi, j] < t_best
        t_best = jnp.where(better, t[bi, j], t_best)
        tri_best = jnp.where(better, tids[j], tri_best)
        u_best = jnp.where(better, u[bi, j], u_best)
        v_best = jnp.where(better, v[bi, j], v_best)
        return (t_best, tri_best, u_best, v_best), None

    pad = (-T) % chunk
    tris_p = jnp.concatenate([tris, jnp.zeros((pad, tris.shape[1]), tris.dtype)], 0)
    tids_p = jnp.concatenate([jnp.arange(T, dtype=jnp.int32),
                              jnp.full(pad, -1, jnp.int32)])
    # zero-pad triangles are degenerate -> det==0 -> never valid
    tris_c = tris_p.reshape(-1, chunk, tris.shape[1])
    tids_c = tids_p.reshape(-1, chunk)
    B = rays.o.shape[0]
    init = (rays.tmax, jnp.full(B, -1, jnp.int32),
            jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.float32))
    (t, tri, u, v), _ = jax.lax.scan(scan_chunk, init, (tids_c, tris_c))
    return Hit(t=t, tri=tri, u=u, v=v)


def pack_tris(v0, v1, v2) -> Array:
    """Pack triangle vertices into the (T, 12) intersection layout."""
    import numpy as np
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(v1, np.float32) - v0
    e2 = np.asarray(v2, np.float32) - v0
    out = np.zeros((v0.shape[0], 12), np.float32)
    out[:, 0:3] = v0
    out[:, 3:6] = e1
    out[:, 6:9] = e2
    return out
