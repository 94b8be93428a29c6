"""Does sorting incoherent rays recover traversal throughput on the XLA
gather loop? 131k random rays in the san-miguel stand-in AABB, traversed
(a) shuffled, (b) sorted by direction octant + origin Morton cell, with the
sort+permute cost included in (b). Timing ends at a real readback (see
bench.py docstring).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cudatracerlib_tpu.ops import traversal, traversal8
from cudatracerlib_tpu.utils import example_scenes


def _drain(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    return float(jnp.ravel(leaves[0])[0])


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / n


def morton3(x, y, z):
    """10-bit-per-axis Morton interleave (int32)."""
    def part(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & jnp.int32(0x30000FF)
        v = (v | (v << 8)) & jnp.int32(0x300F00F)
        v = (v | (v << 4)) & jnp.int32(0x30C30C3)
        v = (v | (v << 2)) & jnp.int32(0x9249249)
        return v
    return part(x) | (part(y) << 1) | (part(z) << 2)


def main():
    B = 1 << 17
    scene = example_scenes.san_miguel_stand_in(256, 256).build()
    geom = scene.geom
    lo = np.asarray(scene.world_lo)
    hi = np.asarray(scene.world_hi)
    rng = np.random.default_rng(0)
    o = (lo + rng.random((B, 3)) * (hi - lo)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = traversal.Rays(o=jnp.asarray(o), d=jnp.asarray(d),
                          tmin=jnp.zeros(B), tmax=jnp.full(B, 1e30))

    wlo = jnp.asarray(lo)
    span = jnp.asarray((hi - lo).astype(np.float32))

    @jax.jit
    def trav(r):
        h = traversal8.intersect_scene(geom, r)
        return h.t.sum()

    @jax.jit
    def trav_sorted(r):
        cell = jnp.clip(((r.o - wlo) / span) * 32.0, 0, 31).astype(jnp.int32)
        octant = ((r.d[:, 0] > 0).astype(jnp.int32)
                  | ((r.d[:, 1] > 0).astype(jnp.int32) << 1)
                  | ((r.d[:, 2] > 0).astype(jnp.int32) << 2))
        key = (morton3(cell[:, 0], cell[:, 1], cell[:, 2]) << 3) | octant
        idx = jnp.argsort(key).astype(jnp.int32)
        rs = traversal.Rays(o=jnp.take(r.o, idx, axis=0),
                            d=jnp.take(r.d, idx, axis=0),
                            tmin=jnp.take(r.tmin, idx),
                            tmax=jnp.take(r.tmax, idx))
        h = traversal8.intersect_scene(geom, rs)
        # scatter back (sorted+unique indices -> fast path)
        t = jnp.zeros(B).at[idx].set(h.t, unique_indices=True)
        return t.sum()

    t_a = timeit(trav, rays)
    t_b = timeit(trav_sorted, rays)
    print(f"random rays, XLA loop:          {t_a*1e3:8.1f} ms  "
          f"({B/t_a/1e6:.2f} Mrays/s)")
    print(f"morton+octant sorted (incl sort): {t_b*1e3:6.1f} ms  "
          f"({B/t_b/1e6:.2f} Mrays/s)")

    # sort cost alone
    @jax.jit
    def sort_only(r):
        cell = jnp.clip(((r.o - wlo) / span) * 32.0, 0, 31).astype(jnp.int32)
        octant = ((r.d[:, 0] > 0).astype(jnp.int32)
                  | ((r.d[:, 1] > 0).astype(jnp.int32) << 1)
                  | ((r.d[:, 2] > 0).astype(jnp.int32) << 2))
        key = (morton3(cell[:, 0], cell[:, 1], cell[:, 2]) << 3) | octant
        idx = jnp.argsort(key).astype(jnp.int32)
        return jnp.take(r.o, idx, axis=0).sum()
    t_s = timeit(sort_only, rays)
    print(f"sort+permute alone:             {t_s*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
