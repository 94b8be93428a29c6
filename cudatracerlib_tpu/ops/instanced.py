"""Two-level (TLAS/BLAS) instanced traversal.

Reference: ``Engine/SceneBVH.h:18`` (2-wide TLAS over scene nodes) and the
megakernel's inverse-transform hand-off at TLAS leaves
(``Kernel/TraceHelper.cu:88-180``). TPU redesign: instead of pushing TLAS
resume state on a per-thread stack, the TLAS pass is a *vectorized slab test*
over all instance AABBs that yields each lane's entry-ordered instance list;
the shared BLAS table is then traversed once per visited instance with a
per-lane root row (the fat-row machinery of ops/traversal8.py unchanged),
carrying the closest hit across visits so later instances are pruned by
t_best. Up to ``max_visits`` overlapping instances per ray are resolved —
the analogue of the reference's TLAS leaf loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene import schema
from .traversal import Hit, Rays

Array = jax.Array

MAX_VISITS = 8


def _transform_point(m34: Array, p: Array) -> Array:
    """(B,3,4) x (B,3) -> (B,3)."""
    return jnp.einsum("bij,bj->bi", m34[:, :, :3], p) + m34[:, :, 3]


def _transform_dir(m34: Array, d: Array) -> Array:
    return jnp.einsum("bij,bj->bi", m34[:, :, :3], d)


def intersect_instanced(geom: schema.GeometryTable, rays: Rays,
                        any_hit: bool = False,
                        max_visits: int = MAX_VISITS) -> Hit:
    """Closest-hit (or any-hit) over an instanced scene.

    Returns Hit with LOCAL triangle ids and the instance id in ``hit.inst``
    (shading resolves both via fill_dg's instanced branch).
    """
    from . import traversal8
    inst = geom.inst
    B = rays.o.shape[0]
    I = inst.root.shape[0]

    # ---- TLAS: slab-test every instance AABB (vectorized (B, I)) ----
    eps = 1e-12
    safe_d = jnp.where(jnp.abs(rays.d) < eps,
                      jnp.where(rays.d >= 0, eps, -eps), rays.d)
    inv_d = 1.0 / safe_d
    t0 = (inst.lo[None, :, :] - rays.o[:, None, :]) * inv_d[:, None, :]
    t1 = (inst.hi[None, :, :] - rays.o[:, None, :]) * inv_d[:, None, :]
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), rays.tmin[:, None])
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), rays.tmax[:, None])
    t_entry = jnp.where(tn <= tf, tn, jnp.inf)              # (B, I)

    best = Hit(t=rays.tmax, tri=jnp.full(B, -1, jnp.int32),
               u=jnp.zeros(B), v=jnp.zeros(B),
               inst=jnp.full(B, -1, jnp.int32))
    visited = jnp.zeros((B, I), bool)
    done = jnp.zeros(B, bool)

    for _ in range(min(max_visits, I)):
        # nearest unvisited instance whose entry beats the current best hit
        t_sel = jnp.where(visited, jnp.inf, t_entry)
        k = jnp.argmin(t_sel, axis=-1).astype(jnp.int32)    # (B,)
        t_k = jnp.take_along_axis(t_sel, k[:, None], axis=-1)[:, 0]
        active = ~done & jnp.isfinite(t_k) & (t_k <= best.t)
        visited = visited | (jax.lax.broadcasted_iota(jnp.int32, (B, I), 1)
                             == k[:, None])
        # transform rays into the instance's local space; directions stay
        # UNnormalized so the hit t parameterization matches world space
        w2l = jnp.take(inst.w2l, k, axis=0)                 # (B, 3, 4)
        o_l = _transform_point(w2l, rays.o)
        d_l = _transform_dir(w2l, rays.d)
        roots = jnp.take(inst.root, k)
        local = Rays(o=o_l, d=d_l, tmin=rays.tmin,
                     tmax=jnp.where(active, best.t, 0.0))
        h = traversal8.intersect_scene(
            geom._replace(inst=None), local, any_hit=any_hit, roots=roots)
        better = active & h.valid & (h.t < best.t)
        best = Hit(t=jnp.where(better, h.t, best.t),
                   tri=jnp.where(better, h.tri, best.tri),
                   u=jnp.where(better, h.u, best.u),
                   v=jnp.where(better, h.v, best.v),
                   inst=jnp.where(better, k, best.inst))
        if any_hit:
            done = done | (active & h.valid)
    return best
