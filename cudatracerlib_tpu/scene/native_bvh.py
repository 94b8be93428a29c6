"""ctypes bridge to the native BVH8 builder (native/bvh_builder.cpp).

Falls back to the numpy builder (scene/bvh8.py) when the shared library isn't
built. Build it with `make -C native` (g++, no external deps).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from . import bvh8 as bvh8mod

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libbvh.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # try building it once
        import subprocess
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.build_bvh8.restype = ctypes.c_int
        lib.build_bvh8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _build_cache_path(v0, v1, v2) -> str:
    """Content-keyed cache file for a finished SBVH build. Same pattern as
    the compiled-mesh cache (`DynamicScene.cpp:254-304` compiles meshes once
    to `.xmsh`): the large-scene SBVH costs tens of host seconds per bench
    child on this 1-core box, and every `python bench.py san_miguel` child
    re-paid it. Subsampled-content sha1 (like treelet.partition_cached);
    uncompressed savez — zlib on ~400MB of f32 geometry costs more than the
    build."""
    import hashlib
    T = v0.shape[0]
    step = max(1, T // 9973)
    h = hashlib.sha1()
    for a in (v0, v1, v2):
        h.update(np.ascontiguousarray(a[::step], np.float32).tobytes())
    d = os.path.join(os.path.dirname(__file__), "..", "..", ".cache")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"bvh8_{T}_{h.hexdigest()[:16]}.npz")


def build_bvh8(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               n_threads: int = 8) -> bvh8mod.BVH8:
    """Native binned-SAH + 8-wide collapse; numpy fallback when unavailable."""
    lib = _load()
    T = v0.shape[0]
    if lib is None or T < 4096:  # tiny scenes: python overhead is negligible
        return bvh8mod.build_bvh8(v0, v1, v2)
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    cp = _build_cache_path(v0, v1, v2)
    if os.path.exists(cp):
        try:
            z = np.load(cp)
            return bvh8mod.BVH8(nodes=z["nodes"], leaves=z["leaves"],
                                world_lo=z["lo"], world_hi=z["hi"])
        except Exception:
            pass   # unreadable/stale cache: rebuild below
    # SBVH spatial splits may duplicate references (budget 1.4x in the
    # native builder), so leaf rows can exceed the triangle count
    max_rows = int(T * 1.5) + 16
    nodes = np.zeros((max_rows, 128), np.float32)
    leaves = np.zeros((max_rows, 128), np.float32)
    counts = np.zeros(2, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.build_bvh8(
        v0.ctypes.data_as(fp), v1.ctypes.data_as(fp), v2.ctypes.data_as(fp),
        T, nodes.ctypes.data_as(fp), leaves.ctypes.data_as(fp), max_rows,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    if rc != 0:
        return bvh8mod.build_bvh8(v0, v1, v2)
    lo = np.minimum(np.minimum(v0, v1), v2).min(0)
    hi = np.maximum(np.maximum(v0, v1), v2).max(0)
    out = bvh8mod.BVH8(nodes=nodes[:counts[0]].copy(),
                       leaves=leaves[:counts[1]].copy(),
                       world_lo=lo.astype(np.float32),
                       world_hi=hi.astype(np.float32))
    try:
        tmp = cp + ".tmp.npz"
        np.savez(tmp, nodes=out.nodes, leaves=out.leaves,
                 lo=out.world_lo, hi=out.world_hi)
        os.replace(tmp, cp)
    except Exception:
        pass   # cache write is best-effort
    return out
