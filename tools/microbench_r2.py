"""Round-2 traversal microbenchmarks on the real TPU chip.

Questions to answer before rebuilding the traversal hot path:
 1. What is the while_loop per-iteration fixed overhead, and does manually
    unrolling the body U times amortize it?
 2. Inside a Pallas kernel, what does a dynamic row gather from a
    VMEM-resident table cost via (a) jnp.take, (b) one-hot matmul on MXU?
 3. What does a full traversal-step-shaped body cost inside Pallas vs. the
    jnp while_loop version?

Run: python tools/microbench_r2.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------- 1. while_loop
def bench_while_overhead():
    print("== while_loop overhead & unroll ==")
    B = 4096
    N_ROWS = 4096
    table = jnp.asarray(np.random.rand(N_ROWS, 128).astype(np.float32))

    def make(unroll, iters):
        def step(cur, acc):
            row = jnp.take(table, cur & (N_ROWS - 1), axis=0)   # (B,128)
            rt = row.T
            acc = acc + jnp.sum(rt[0:8], axis=0)
            cur = cur + _bitcast_i32_sum(rt)
            return cur, acc

        def body(state):
            it, cur, acc = state
            for _ in range(unroll):
                cur, acc = step(cur, acc)
            return it + 1, cur, acc

        def cond(state):
            return state[0] < iters // unroll

        @jax.jit
        def run(cur0):
            out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), cur0, jnp.zeros(B)))
            return out[2]
        return run

    def _bitcast_i32_sum(rt):
        return jax.lax.bitcast_convert_type(rt[48], jnp.int32) & 0

    cur0 = jnp.arange(B, dtype=jnp.int32)
    ITERS = 256
    for unroll in (1, 2, 4, 8):
        run = make(unroll, ITERS)
        dt = timeit(run, cur0, n=10)
        print(f"  B={B} iters={ITERS} unroll={unroll}: {dt*1e3:.2f} ms "
              f"({dt/ITERS*1e6:.1f} us/step)")


# ------------------------------------------------------- 2. pallas gather cost
def bench_pallas_gather():
    print("== pallas VMEM-table gather ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 1024          # rays per tile
    STEPS = 256

    for n_rows in (256, 1024, 4096):
        table_np = np.random.rand(n_rows, 128).astype(np.float32)
        table = jnp.asarray(table_np)

        # (a) jnp.take inside kernel
        def kern_take(table_ref, idx_ref, out_ref):
            def body(i, carry):
                idx, acc = carry
                row = jnp.take(table_ref[:], idx & (n_rows - 1), axis=0)
                acc = acc + row[:, 0]
                idx = idx + acc.astype(jnp.int32)
                return idx, acc
            idx0 = idx_ref[:, 0]
            _, acc = jax.lax.fori_loop(0, STEPS, body,
                                       (idx0, jnp.zeros((B,), jnp.float32)))
            out_ref[:, 0] = acc

        # (b) one-hot matmul gather
        def kern_onehot(table_ref, idx_ref, out_ref):
            tb = table_ref[:].astype(jnp.bfloat16)
            rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, n_rows), 1)
            def body(i, carry):
                idx, acc = carry
                oh = (rows_iota == (idx & (n_rows - 1))[:, None]).astype(jnp.bfloat16)
                row = jnp.dot(oh, tb, preferred_element_type=jnp.float32)
                acc = acc + row[:, 0]
                idx = idx + acc.astype(jnp.int32)
                return idx, acc
            idx0 = idx_ref[:, 0]
            _, acc = jax.lax.fori_loop(0, STEPS, body,
                                       (idx0, jnp.zeros((B,), jnp.float32)))
            out_ref[:, 0] = acc

        idx = jnp.asarray((np.random.rand(B, 1) * n_rows).astype(np.int32))
        for name, kern in (("take", kern_take), ("onehot", kern_onehot)):
            try:
                fn = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )
                fn = jax.jit(fn)
                dt = timeit(fn, table, idx, n=10)
                per = dt / STEPS / B * 1e9
                print(f"  rows={n_rows} {name}: {dt*1e3:.3f} ms total, "
                      f"{dt/STEPS*1e6:.2f} us/step ({per:.2f} ns/ray-fetch)")
            except Exception as e:
                print(f"  rows={n_rows} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


# ---------------------------------------------- 3. hbm gather baseline (jnp)
def bench_jnp_gather():
    print("== jnp (XLA) gather baseline ==")
    for n_rows in (1024, 65536):
        table = jnp.asarray(np.random.rand(n_rows, 128).astype(np.float32))
        for B in (4096, 65536):
            idx = jnp.asarray((np.random.rand(B) * n_rows).astype(np.int32))

            @jax.jit
            def run(idx):
                def body(i, carry):
                    idx, acc = carry
                    row = jnp.take(table, idx % n_rows, axis=0)
                    acc = acc + row[:, 0]
                    idx = idx + acc.astype(jnp.int32)
                    return idx, acc
                _, acc = jax.lax.fori_loop(0, 64, body,
                                           (idx, jnp.zeros(B)))
                return acc
            dt = timeit(run, idx, n=10)
            print(f"  rows={n_rows} B={B}: {dt/64*1e6:.1f} us/step "
                  f"({dt/64/B*1e9:.2f} ns/ray-fetch)")


if __name__ == "__main__":
    bench_jnp_gather()
    bench_while_overhead()
    bench_pallas_gather()
