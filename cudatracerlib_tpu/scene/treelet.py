"""Treelet decomposition of the unified fat-row BVH for HBM-scale scenes.

The on-chip Pallas traversal kernel (ops/traversal_pl.py) holds the whole
table in VMEM, which caps it at ~16*128 rows (~24k tris). Production scenes
(San Miguel class, >1M tris, ~60MB of rows) must stream from HBM. Per-lane
scattered row gathers from HBM are what the XLA fallback does — measured
~23 GB/s effective (2.8% of v5e HBM peak) because a lockstep while-loop
iteration costs ~100us of dispatch overhead for one 4MB gather.

The TPU-native answer (reference analogue: the Aila-Laine persistent-threads
megakernel streaming from L2, `Kernel/TraceHelper.cu:326-734`) is a two-phase
wavefront:

  phase 1  traverse a TOP tree (fits VMEM) whose cut edges are "virtual
           leaves" naming a TREELET id; emit per-ray visit lists (plus real
           hits for triangles living above the cut).
  sort     visits by treelet id (coherence: every visit block touches ONE
           treelet slab).
  phase 2  grid over visit blocks; the treelet slab for each block is chosen
           by a scalar-prefetched id and DMA'd by the Pallas pipeline
           (double-buffered, and re-fetch is skipped when consecutive blocks
           share a slab — the sort makes that the common case).
  reduce   segment-min of per-visit hits back onto rays.

This module is the HOST side: partition the unified table into a top table +
packed fixed-size treelet slabs, with links remapped.

Link encoding in the unified table (scene/bvh8.py): >=0 node row; -1 empty;
<=-2 leaf row (-2 - link). In the TOP table produced here, leaf codes beyond
the top table's own leaf rows are VIRTUAL: row = -2 - link >= top_rows means
"visit treelet (row - top_rows)".
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

LANES = 128
# rows per treelet slab (2 slabs of 128 by default). Env-tunable for perf
# A/Bs: larger treelets mean fewer visits per ray (fewer sort entries and
# phase-2 blocks) at more VMEM per visit; the tradeoff is scene-dependent.
import os as _os                                             # noqa: E402
TREELET_ROWS = int(_os.environ.get("CTL_TREELET_ROWS", "512"))
# The top table must stay on the VMEM Pallas path, so its cap is DERIVED from
# that kernel's budget (advisor finding, round 3: scenes whose table fits the
# VMEM kernel never reach the treelet dispatch, so a top cap above the VMEM
# cap would make depth-0 peels pure compile overhead — tying the constants
# keeps "has a tt table" == "too big for the VMEM kernel" an invariant).
from ..ops.traversal_pl import MAX_SLABS as _PL_MAX_SLABS  # noqa: E402

MAX_TOP_ROWS = _PL_MAX_SLABS * LANES

# Visit ids are BIT-PACKED (round 5): vid = (treelet id << VID_ROOT_BITS) |
# local root row. The traversal glue recovers (tid, root) with two shifts
# instead of a (2, B*V)-element table gather (measured 1.38 ms per 65k-ray
# call, ~17% of the glue), and the visit sort keys on the packed value
# directly — which also groups same-subtree visits adjacently inside a
# treelet block (better lane lockstep coherence in phase 2).
VID_ROOT_BITS = 14


class TreeletTable(NamedTuple):
    top: np.ndarray          # (R_top, 128) unified top table (nodes+leaves);
    #                          virtual leaf links encode VISIT ids (see below)
    slabs: np.ndarray        # (n_treelets, TREELET_ROWS, 128) packed treelets
    n_treelets: int
    treelet_rows: int        # rows per slab (static)
    # a visit id names one cut subtree, BIT-PACKED as
    # (treelet id << VID_ROOT_BITS) | local root row — the device glue
    # unpacks with two shifts, no table gather. Several sibling subtrees
    # share a slab (bin packing) but each visit traverses only its own
    # subtree. vid_map keeps the dense (tid, root) pairs in emission order
    # for host-side diagnostics; the kernels never read it.
    vid_map: np.ndarray      # (n_vids, 2) i32
    # multi-root forests (instanced scenes: one BLAS per shared mesh in the
    # same table): root_top[i] = top-local row of partition's roots[i]. The
    # traversal starts each lane at its instance's BLAS root (phase 1's
    # per-lane attrs slot 11). None/len-1 for single-root tables.
    root_top: "np.ndarray | None" = None


def _links_of(row: np.ndarray) -> np.ndarray:
    return row[48:56].view(np.int32)


def partition(table: np.ndarray, treelet_rows: int = TREELET_ROWS,
              max_top_rows: int = MAX_TOP_ROWS,
              roots: "tuple[int, ...]" = (0,)) -> "TreeletTable | None":
    """Partition a unified fat-row table into top + treelet slabs.

    Returns None when the table already fits the VMEM path (no treelets
    needed). Doubles treelet_rows until the top table fits max_top_rows.

    `roots` names the root node rows of a FOREST (instanced scenes keep one
    BLAS per shared mesh in the same table, disjoint row ranges); every root
    stays a top node and the result's root_top maps roots[i] -> its top row.
    """
    R = table.shape[0]
    if R <= max_top_rows:
        return None
    treelet_rows = max(128, treelet_rows)   # kernel needs whole 128-row slabs
    # children lists per row (row indices into `table`; leaves have none)
    links = table[:, 48:56].view(np.float32).copy().view(np.int32).reshape(R, 8)
    is_node = np.zeros(R, bool)
    child_rows = {}
    # a row is a node iff some link points at it as >=0; we detect node rows
    # as those reachable via >=0 links from the forest roots and leaf rows as
    # those reachable via <=-2 links.
    # subtree sizes via iterative post-order from every root
    size = np.ones(R, np.int64)
    state = [(int(r), False) for r in roots]
    order = []
    seen_node = np.zeros(R, bool)
    while state:
        row, done = state.pop()
        if done:
            order.append(row)
            continue
        if seen_node[row]:
            continue
        seen_node[row] = True
        is_node[row] = True
        state.append((row, True))
        kids = []
        for l in links[row]:
            if l == -1:
                continue
            if l >= 0:
                kids.append(l)
                state.append((int(l), False))
            else:
                kids.append(-2 - l)   # leaf row
        child_rows[row] = kids
    for row in order:
        s = 1
        for c in child_rows.get(row, ()):  # leaf child contributes its row
            s += size[c] if is_node[c] else 1
        size[row] = s

    while True:
        # cut candidates: (subtree root row, rows, parent AABB of the subtree)
        cut_cands: list[tuple] = []
        top_nodes: list[int] = []
        stack = [int(r) for r in roots]
        while stack:
            row = stack.pop()
            top_nodes.append(row)
            r = table[row]
            for i in range(8):
                l = links[row][i]
                if l == -1 or l < 0:
                    continue  # leaf children of top nodes stay top leaves
                if size[l] <= treelet_rows:
                    lo = (float(r[0 + i]), float(r[8 + i]), float(r[16 + i]))
                    hi = (float(r[24 + i]), float(r[32 + i]), float(r[40 + i]))
                    cut_cands.append((int(l), int(size[l]), lo, hi))
                else:
                    stack.append(int(l))
        top_leaves: list[int] = []
        for row in top_nodes:
            for l in links[row]:
                if l <= -2:
                    top_leaves.append(-2 - l)
        if len(top_nodes) + len(top_leaves) <= max_top_rows:
            break
        treelet_rows *= 2

    # greedy first-fit-decreasing bin packing of cut subtrees into shared
    # slabs: without merging a big scene shatters into thousands of
    # mostly-empty slabs, exploding the phase-2 block count and slab memory.
    # Each subtree keeps its own root (per-visit root rows), so a bin is just
    # a DMA-locality grouping with no structural constraint beyond capacity.
    cut_cands.sort(key=lambda c: -c[1])
    bins: list[list] = []       # [rows_used, [cands]]
    for c in cut_cands:
        for b in bins:
            if b[0] + c[1] <= treelet_rows:
                b[0] += c[1]
                b[1].append(c)
                break
        else:
            bins.append([c[1], [c]])
    n_treelets = len(bins)

    # ---- pack treelet slabs (BFS per subtree, sequential within a bin) ----
    slabs = np.zeros((n_treelets, treelet_rows, 128), np.float32)
    vid_of_root: dict[int, int] = {}
    vid_tid: list[int] = []
    vid_root: list[int] = []
    assert treelet_rows <= (1 << VID_ROOT_BITS), treelet_rows
    assert n_treelets < (1 << (30 - VID_ROOT_BITS)), n_treelets
    for t, (_, cands) in enumerate(bins):
        local: dict[int, int] = {}
        for root, _, _, _ in cands:
            vid_of_root[root] = (t << VID_ROOT_BITS) | len(local)
            vid_tid.append(t)
            vid_root.append(len(local))
            bfs = [root]
            local[root] = len(local)
            qi = 0
            while qi < len(bfs):
                row = bfs[qi]
                qi += 1
                for l in links[row]:
                    if l == -1:
                        continue
                    c = int(l) if l >= 0 else -2 - int(l)
                    if c not in local:
                        local[c] = len(local)
                    if l >= 0:
                        bfs.append(int(l))
        assert len(local) <= treelet_rows, (len(local), treelet_rows)
        for r, i in local.items():
            slabs[t, i] = table[r]
        for r, i in local.items():
            if not is_node[r]:
                continue
            lk = slabs[t, i, 48:56].view(np.int32)
            for s in range(8):
                l = lk[s]
                if l == -1:
                    continue
                lk[s] = local[int(l)] if l >= 0 else -2 - local[-2 - int(l)]

    # ---- pack top table: nodes first, then leaves; cut links -> visit ids --
    top_nodes_sorted = sorted(top_nodes)
    node_local = {r: i for i, r in enumerate(top_nodes_sorted)}
    leaf_local: dict[int, int] = {}
    for r in top_leaves:
        if r not in leaf_local:
            leaf_local[r] = len(top_nodes_sorted) + len(leaf_local)
    n_top = len(top_nodes_sorted) + len(leaf_local)
    top = np.zeros((n_top, 128), np.float32)
    for r, i in leaf_local.items():
        top[i] = table[r]
    for r, i in node_local.items():
        top[i] = table[r]
        lk = top[i, 48:56].view(np.int32)
        for s in range(8):
            l = lk[s]
            if l == -1:
                continue
            if l >= 0:
                if l in vid_of_root:
                    lk[s] = -2 - (n_top + vid_of_root[l])   # virtual leaf
                else:
                    lk[s] = node_local[l]
            else:
                lk[s] = -2 - leaf_local[-2 - l]

    vid_map = np.stack([np.asarray(vid_tid, np.int32),
                        np.asarray(vid_root, np.int32)], axis=1)
    root_top = np.asarray([node_local[int(r)] for r in roots], np.int32)
    return TreeletTable(top=top, slabs=slabs, n_treelets=n_treelets,
                        treelet_rows=treelet_rows, vid_map=vid_map,
                        root_top=root_top)


def partition_cached(table: np.ndarray, **kw) -> "TreeletTable | None":
    """Disk-cached partition (the Python BFS over ~100k rows costs seconds;
    scene rebuilds in bench subprocesses shouldn't pay it twice) — the same
    pattern as the compiled-mesh cache (scene/asset_cache.py)."""
    import hashlib
    import os
    R = table.shape[0]
    if R <= kw.get("max_top_rows", MAX_TOP_ROWS):
        return None
    roots = tuple(int(r) for r in kw.get("roots", (0,)))
    rows = int(kw.get("treelet_rows", TREELET_ROWS))
    hsh = hashlib.sha1(table[:: max(1, R // 997)].tobytes())
    # format version: 2 = bit-packed vids (stale caches must not be reused)
    hsh.update(np.asarray(roots + (rows, 2), np.int64).tobytes())
    h = hsh.hexdigest()[:16]
    cache_dir = os.path.join(os.path.dirname(__file__), "..", "..", ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    fn = os.path.join(cache_dir, f"treelet_{R}_{h}.npz")
    if os.path.exists(fn):
        z = np.load(fn)
        if "root_top" in z:
            return TreeletTable(top=z["top"], slabs=z["slabs"],
                                n_treelets=int(z["n_treelets"]),
                                treelet_rows=int(z["treelet_rows"]),
                                vid_map=z["vid_map"], root_top=z["root_top"])
        # stale pre-root_top cache entry: rebuild below
    part = partition(table, **kw)
    np.savez(fn, top=part.top, slabs=part.slabs,
             n_treelets=part.n_treelets, treelet_rows=part.treelet_rows,
             vid_map=part.vid_map, root_top=part.root_top)
    return part


def prep_device(tt: TreeletTable):
    """Device layouts: transposed top table (traversal_pl convention) and
    transposed slabs with the inert pad slab appended (its root row's links
    are all DONE so padded visit blocks die in one iteration)."""
    r = tt.top.shape[0]
    s = max(1, -(-r // LANES))
    padded = s * LANES
    top = tt.top.copy()
    if padded != r:
        # the kernel's virtual-leaf threshold is the PADDED row count (it only
        # sees the padded table) — rebase virtual links onto it
        for i in range(r):
            if top[i, 120] != 0.0:
                continue  # leaf row
            lk = top[i, 48:56].view(np.int32)
            for s_ in range(8):
                l = lk[s_]
                if l <= -2 and (-2 - l) >= r:
                    lk[s_] = -2 - (padded + ((-2 - l) - r))
    top_t = np.zeros((128, padded), np.float32)
    top_t[:, :r] = top.T
    pad = np.zeros((1, tt.treelet_rows, 128), np.float32)
    pad[0, 0, 48:56] = np.full(8, -1, np.int32).view(np.float32)
    all_slabs = np.concatenate([tt.slabs, pad], axis=0)
    slabs_t = np.ascontiguousarray(all_slabs.transpose(0, 2, 1))
    return top_t, slabs_t


def unified_equivalent(tt: TreeletTable) -> np.ndarray:
    """Rebuild a single unified table semantically identical to the original:
    virtual-leaf links become plain node links into the appended slab rows.
    Used by tests to validate the partition/remap round trip."""
    n_top = tt.top.shape[0]
    out = np.concatenate(
        [tt.top, tt.slabs.reshape(-1, 128)], axis=0).copy()
    for i in range(n_top):
        if out[i, 120] != 0.0:
            continue  # leaf row: [48:56] is e1y data, not links
        lk = out[i, 48:56].view(np.int32)
        for s_ in range(8):
            l = lk[s_]
            if l <= -2 and (-2 - l) >= n_top:
                vid = (-2 - l) - n_top
                tid, root = vid >> VID_ROOT_BITS, vid & ((1 << VID_ROOT_BITS) - 1)
                lk[s_] = n_top + tid * tt.treelet_rows + root  # node link
    for t in range(tt.slabs.shape[0]):
        base = n_top + t * tt.treelet_rows
        for rr in range(tt.treelet_rows):
            row = out[base + rr]
            # node rows are those whose links field was remapped locally; we
            # conservatively detect node rows by a nonzero child-count probe:
            lk = row[48:56].view(np.int32)
            # remap only when the row is a node row: leaf rows keep count at
            # [120] and ids at [108:120]; node rows have [120] == 0
            if row[120] != 0.0:
                continue
            if not np.any(lk != 0) and not np.any(row[:48] != 0):
                continue  # padding row
            for s_ in range(8):
                l = lk[s_]
                if l == -1:
                    continue
                lk[s_] = (base + l) if l >= 0 else (-2 - (base + (-2 - l)))
    return out
