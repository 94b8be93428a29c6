"""Pallas gather strategies for the traversal kernel.

 1. trivial in-kernel fori_loop cost (isolates Mosaic loop overhead)
 2. lane-dim dynamic gather: table stored transposed (128, n_rows) in VMEM,
    fetch via jnp.take_along_axis(tableT, idx, axis=1) -> (128, B), i.e. the
    already-transposed layout the traversal math wants
 3. one-hot MXU gather without loop-carried feedback (isolates MXU latency)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


STEPS = 256


def trivial_loop(B=1024):
    def kern(x_ref, out_ref):
        def body(i, acc):
            return acc * 1.000001 + 1.0
        out_ref[:] = jax.lax.fori_loop(0, STEPS, body, x_ref[:])
    fn = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    x = jnp.ones((8, B))
    dt = timeit(fn, x)
    print(f"  trivial loop B={B}: {dt/STEPS*1e6:.3f} us/step")


def lane_gather(n_rows, B=1024, feedback=True, dtype=jnp.float32):
    tableT_np = np.random.rand(128, n_rows).astype(np.float32)
    tableT = jnp.asarray(tableT_np, dtype=dtype)

    def kern(table_ref, idx_ref, out_ref):
        tb = table_ref[:]
        def body(i, carry):
            idx, acc = carry
            idx2 = jnp.broadcast_to(idx[None, :], (128, B)) & (n_rows - 1)
            rt = jnp.take_along_axis(tb, idx2, axis=1)  # (128, B)
            acc = acc + rt[0].astype(jnp.float32)
            if feedback:
                idx = idx + acc.astype(jnp.int32)
            else:
                idx = idx + i
            return idx, acc
        _, acc = jax.lax.fori_loop(0, STEPS, body,
                                   (idx_ref[0], jnp.zeros((B,), jnp.float32)))
        out_ref[0] = acc

    try:
        fn = jax.jit(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        idx = jnp.asarray((np.random.rand(1, B) * n_rows).astype(np.int32))
        dt = timeit(fn, tableT, idx)
        print(f"  lane-gather rows={n_rows} B={B} fb={feedback} {dtype.__name__}: "
              f"{dt/STEPS*1e6:.3f} us/step ({dt/STEPS/B*1e9:.2f} ns/fetch)")
    except Exception as e:
        print(f"  lane-gather rows={n_rows} B={B} {dtype.__name__}: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}")


def onehot_nofeedback(n_rows, B=1024):
    table = jnp.asarray(np.random.rand(n_rows, 128).astype(np.float32))

    def kern(table_ref, idx_ref, out_ref):
        tb = table_ref[:].astype(jnp.bfloat16)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, n_rows), 1)
        def body(i, carry):
            idx, acc = carry
            oh = (rows_iota == ((idx + i) & (n_rows - 1))[:, None]).astype(jnp.bfloat16)
            row = jnp.dot(oh, tb, preferred_element_type=jnp.float32)
            return idx, acc + row[:, 0]
        _, acc = jax.lax.fori_loop(0, STEPS, body,
                                   (idx_ref[:, 0], jnp.zeros((B,), jnp.float32)))
        out_ref[:, 0] = acc

    fn = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    idx = jnp.asarray((np.random.rand(B, 1) * n_rows).astype(np.int32))
    dt = timeit(fn, table, idx)
    print(f"  onehot-nofb rows={n_rows} B={B}: {dt/STEPS*1e6:.3f} us/step")


if __name__ == "__main__":
    print("== pallas loop overhead ==")
    trivial_loop(1024)
    trivial_loop(8192)
    print("== lane-dim dynamic gather in pallas ==")
    for rows in (256, 2048, 16384):
        lane_gather(rows, B=1024)
    lane_gather(2048, B=8192)
    lane_gather(2048, B=1024, feedback=False)
    lane_gather(2048, B=1024, dtype=jnp.bfloat16)
    print("== onehot matmul, no feedback ==")
    onehot_nofeedback(256)
    onehot_nofeedback(2048)
