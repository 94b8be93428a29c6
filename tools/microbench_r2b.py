"""Profile the real traversal body: where do the microseconds go?

Strategy: run intersect_wide's body with a fixed iteration count (fori_loop,
cond stripped) and ablate pieces to find the dominant cost at various B.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make_body(n_rows, B, stack_depth=20, parts=("gather", "transpose", "node",
                                                "leaf", "stack")):
    table = jnp.asarray(np.random.rand(n_rows, 128).astype(np.float32))
    bit8 = jnp.int32(1) << jnp.arange(8, dtype=jnp.int32)[:, None]
    inf = jnp.float32(jnp.inf)

    def body(i, state):
        cur, sp, stack, t_best, tri_best, u_best, v_best, ox, oy, oz = state
        is_node = cur >= 0
        if "gather" in parts:
            row_idx = jnp.where(is_node, cur >> 8, -2 - cur)
            row = jnp.take(table, jnp.clip(row_idx, 0, n_rows - 1), axis=0)
        else:
            row = jnp.broadcast_to(table[0], (B, 128))
        if "transpose" in parts:
            rt = row.T
        else:
            rt = jnp.broadcast_to(table[:128, 0:1], (128, B))

        nxt = cur
        push = is_node
        push_val = cur
        if "node" in parts:
            t0x = (rt[0:8] - ox) * ox
            t1x = (rt[24:32] - ox) * ox
            t0y = (rt[8:16] - oy) * oy
            t1y = (rt[32:40] - oy) * oy
            t0z = (rt[16:24] - oz) * oz
            t1z = (rt[40:48] - oz) * oz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), t_best))
            links = jax.lax.bitcast_convert_type(rt[48:56], jnp.int32)
            mask = cur & 0xFF
            eligible = (tn <= tf) & (links != -1) & ((mask & bit8) != 0)
            t_sel = jnp.where(eligible, tn, inf)
            best_j = jnp.argmin(t_sel, axis=0).astype(jnp.int32)
            has_child = jnp.isfinite(jnp.min(t_sel, axis=0))
            oh8 = jnp.arange(8, dtype=jnp.int32)[:, None] == best_j
            link_best = jnp.sum(jnp.where(oh8, links, 0), axis=0)
            elig_bits = jnp.sum(jnp.where(eligible, bit8, 0), axis=0, dtype=jnp.int32)
            remaining = elig_bits & ~(jnp.int32(1) << best_j)
            descend = jnp.where(link_best >= 0, (link_best << 8) | 0xFF, link_best)
            nxt = jnp.where(has_child, descend, jnp.int32(-0x40000000))
            push = is_node & has_child & (remaining != 0)
            push_val = ((cur >> 8) << 8) | remaining

        if "leaf" in parts:
            dx, dy, dz = ox, oy, oz
            v0x, v0y, v0z = rt[0:12], rt[12:24], rt[24:36]
            e1x, e1y, e1z = rt[36:48], rt[48:60], rt[60:72]
            e2x, e2y, e2z = rt[72:84], rt[84:96], rt[96:108]
            ids = jax.lax.bitcast_convert_type(rt[108:120], jnp.int32)
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
            tri_ok = ((ids != -1) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
                      & (t > 0) & (t < t_best))
            t_tri = jnp.where(tri_ok, t, inf)
            t_hit = jnp.min(t_tri, axis=0)
            oh12 = jnp.arange(12, dtype=jnp.int32)[:, None] == jnp.argmin(t_tri, axis=0)
            leaf_hit = (~is_node) & jnp.isfinite(t_hit)
            t_best = jnp.where(leaf_hit, t_hit, t_best)
            tri_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, ids, 0), axis=0), tri_best)
            u_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, u, 0.0), axis=0), u_best)
            v_best = jnp.where(leaf_hit, jnp.sum(jnp.where(oh12, v, 0.0), axis=0), v_best)

        if "stack" in parts:
            new_stack = [jnp.where(push, push_val, stack[0])]
            for k in range(1, stack_depth):
                new_stack.append(jnp.where(push, stack[k - 1], stack[k]))
            sp = sp + push.astype(jnp.int32)
            want_pop = nxt == jnp.int32(-0x40000000)
            can_pop = want_pop & (sp > 0)
            popped = new_stack[0]
            final_stack = []
            for k in range(stack_depth - 1):
                final_stack.append(jnp.where(can_pop, new_stack[k + 1], new_stack[k]))
            final_stack.append(new_stack[stack_depth - 1])
            sp = jnp.where(can_pop, sp - 1, sp)
            cur = jnp.where(want_pop, jnp.where(can_pop, popped, -1), nxt)
            stack = tuple(final_stack)
        else:
            cur = (cur + 1) & 0x7FFFFFFF
        return (cur, sp, stack, t_best, tri_best, u_best, v_best, ox, oy, oz)

    return body


def run_case(n_rows, B, parts, iters=128, stack_depth=20):
    body = make_body(n_rows, B, stack_depth, parts)

    @jax.jit
    def run(cur0, o):
        init = (cur0, jnp.zeros(B, jnp.int32),
                tuple(jnp.zeros(B, jnp.int32) for _ in range(stack_depth)),
                jnp.full(B, 1e30), jnp.full(B, -1, jnp.int32),
                jnp.zeros(B), jnp.zeros(B), o[:, 0], o[:, 1], o[:, 2])
        out = jax.lax.fori_loop(0, iters, body, init)
        return out[3]

    cur0 = jnp.asarray((np.random.rand(B) * n_rows).astype(np.int32) << 8 | 0xFF)
    o = jnp.asarray(np.random.rand(B, 3).astype(np.float32))
    dt = timeit(run, cur0, o, n=5)
    return dt / iters


if __name__ == "__main__":
    ALL = ("gather", "transpose", "node", "leaf", "stack")
    for B in (4096, 16384, 65536):
        print(f"-- B={B} rows=4096 --")
        base = run_case(4096, B, ALL)
        print(f"  full body:        {base*1e6:8.1f} us/step  "
              f"({base/B*1e9:.2f} ns/ray-step)")
        for drop in ALL:
            parts = tuple(p for p in ALL if p != drop)
            dt = run_case(4096, B, parts)
            print(f"  minus {drop:10s}: {dt*1e6:8.1f} us/step  "
                  f"(saves {(base-dt)*1e6:7.1f})")
        dt = run_case(4096, B, ALL, stack_depth=12)
        print(f"  stack_depth=12:   {dt*1e6:8.1f} us/step")
