"""Mosaic lowering probe for the shared-pool kernel's building blocks.

The pool redesign of traversal_pl needs three ops the current kernel doesn't
use: (a) a NARROW cross-lane gather (fetch 12-16 ray attrs by per-lane column
index — the table fetch gathers full 128-sublane columns), (b) a lane-axis
roll for the 128-lane prefix-sum rank, (c) a small (4K,128)x(128,128)
dot_general for the cross-lane output scatter (MXU one-hot trick).
Run on TPU: python tools/probe_mosaic_pool.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_one(name, kern, out_shape, *args):
    try:
        out = pl.pallas_call(kern, out_shape=out_shape)(*args)
        out = np.asarray(out)
        print(f"{name}: OK  sum={out.sum():.1f} sample={out.ravel()[:4]}",
              flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL {repr(e)[:300]}", flush=True)
        return None


def main():
    # (a) narrow lane gather: (16,128) source, per-lane column idx
    src = np.arange(16 * 128, dtype=np.float32).reshape(16, 128)
    idx = np.random.default_rng(0).integers(0, 128, size=(16, 128)).astype(np.int32)
    idx[:] = idx[:1]  # same column index for every sublane row

    def k_gather16(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    out = try_one("gather(16,128)ax1", k_gather16,
                  jax.ShapeDtypeStruct((16, 128), jnp.float32), src, idx)
    if out is not None:
        ref = np.take_along_axis(src, idx, axis=1)
        print("  exact:", bool((out == ref).all()), flush=True)

    # (a2) (8,128)
    def k_gather8(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    out = try_one("gather(8,128)ax1", k_gather8,
                  jax.ShapeDtypeStruct((8, 128), jnp.float32),
                  src[:8], idx[:8])
    if out is not None:
        print("  exact:", bool((out == np.take_along_axis(src[:8], idx[:8], 1)).all()))

    # (b) lane-axis roll on (1,128) + prefix sum
    x = np.ones((1, 128), np.int32)

    def k_prefix(x_ref, o_ref):
        v = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for sh in (1, 2, 4, 8, 16, 32, 64):
            r = pltpu.roll(v, sh, 1)
            v = v + jnp.where(lane >= sh, r, 0)
        o_ref[:] = v - x_ref[:]   # exclusive ranks 0..127

    out = try_one("prefix-sum lanes", k_prefix,
                  jax.ShapeDtypeStruct((1, 128), jnp.int32), x)
    if out is not None:
        print("  exact:", bool((out[0] == np.arange(128)).all()), flush=True)

    # (c) small dot_general: (32,128) x (128,128) contracting lanes
    a = np.random.default_rng(1).normal(size=(32, 128)).astype(np.float32)
    m = (np.random.default_rng(2).random((128, 128)) < 0.05).astype(np.float32)

    def k_dot(a_ref, m_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], m_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = try_one("dot(32,128)x(128,128)^T", k_dot,
                  jax.ShapeDtypeStruct((32, 128), jnp.float32), a, m)
    if out is not None:
        ref = a @ m.T
        print("  max err:", float(np.abs(out - ref).max()), flush=True)

    # (d) one-hot build from per-lane dest: (128,128) sub_iota == lane-vec
    db = np.random.default_rng(3).integers(0, 128, size=(1, 128)).astype(np.int32)

    def k_onehot(d_ref, o_ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        o_ref[:] = (sub == jnp.broadcast_to(d_ref[:], (128, 128))).astype(jnp.float32)

    out = try_one("onehot(sub==dest)", k_onehot,
                  jax.ShapeDtypeStruct((128, 128), jnp.float32), db)
    if out is not None:
        ref = (np.arange(128)[:, None] == db[0][None, :]).astype(np.float32)
        print("  exact:", bool((out == ref).all()), flush=True)


if __name__ == "__main__":
    main()
