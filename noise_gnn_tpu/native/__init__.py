"""ctypes bridge to the native C++ graph runtime (csrc/graph_runtime.cpp).

The library is built on demand with g++ the first time it's needed and
cached next to the sources; every entry point has a pure-numpy fallback so
the framework works without a toolchain.

API:
  available()                          -> bool
  coo_to_csr(src, dst, n)              -> (indptr int64 [n+1], indices int32 [e])
  expand_rows(indptr, n)               -> dst int32 [e] (per-edge CSR row)
  sample_hop(indptr, indices, frontier, fanout, seed, frontier_mask=None)
                                       -> (children, mask) host fanout sample
  hash_i32(arr)                        -> FNV-1a checksum
  label_prop(src, dst, n, d, part, iters, sticky)
                                       -> part int32 [n] (shard locality)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src_dir = os.path.abspath(_SRC_DIR)
    so = os.path.join(src_dir, "libngt_graph.so")
    src = os.path.join(src_dir, "graph_runtime.cpp")
    try:
        if not os.path.exists(src):
            return None
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
                 "-pthread", src, "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ngt_coo_to_csr.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32, i64p, i32p]
    lib.ngt_expand_rows.argtypes = [i64p, ctypes.c_int32, i32p]
    lib.ngt_sample_hop.argtypes = [
        i64p, i32p, i32p, u8p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_uint64, i32p, u8p,
    ]
    lib.ngt_hash_i32.argtypes = [i32p, ctypes.c_int64]
    lib.ngt_hash_i32.restype = ctypes.c_uint64
    lib.ngt_label_prop.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, i32p,
    ]
    _LIB = lib
    return _LIB


def _p(arr, ct):
    return arr.ctypes.data_as(ctypes.POINTER(ct))


def available() -> bool:
    return _load() is not None


def coo_to_csr(src: np.ndarray, dst: np.ndarray, n: int):
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    e = src.shape[0]
    lib = _load()
    if lib is None:
        order = np.argsort(dst, kind="stable")
        indices = src[order]
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(dst, minlength=n), out=indptr[1:])
        return indptr, indices.astype(np.int32)
    indptr = np.zeros(n + 1, np.int64)
    indices = np.zeros(e, np.int32)
    lib.ngt_coo_to_csr(
        _p(src, ctypes.c_int32), _p(dst, ctypes.c_int32), e, n,
        _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int32),
    )
    return indptr, indices


def expand_rows(indptr: np.ndarray, n: int):
    """Per-edge dst row of a dst-major CSR (the compact SpMM pack's only
    materialized array). Returns None without the native lib — callers
    fall back to np.repeat."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    lib = _load()
    if lib is None:
        return None
    dst = np.zeros(int(indptr[-1]), np.int32)
    lib.ngt_expand_rows(_p(indptr, ctypes.c_int64), n, _p(dst, ctypes.c_int32))
    return dst


def sample_hop(indptr: np.ndarray, indices: np.ndarray, frontier: np.ndarray,
               fanout: int, seed: int, frontier_mask: np.ndarray | None = None):
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    frontier = np.ascontiguousarray(frontier, np.int32)
    nf = frontier.shape[0]
    children = np.zeros(nf * fanout, np.int32)
    mask = np.zeros(nf * fanout, np.uint8)
    lib = _load()
    if lib is None:
        rng = np.random.default_rng(seed)
        for i, node in enumerate(frontier):
            if frontier_mask is not None and not frontier_mask[i]:
                continue
            s, t = indptr[node], indptr[node + 1]
            deg = t - s
            for j in range(fanout):
                if deg <= fanout:
                    if j < deg:
                        children[i * fanout + j] = indices[s + j]
                        mask[i * fanout + j] = 1
                elif deg > 0:
                    children[i * fanout + j] = indices[s + rng.integers(deg)]
                    mask[i * fanout + j] = 1
        return children, mask.astype(bool)
    fm = None
    if frontier_mask is not None:
        fm = np.ascontiguousarray(frontier_mask, np.uint8)
    lib.ngt_sample_hop(
        _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int32),
        _p(frontier, ctypes.c_int32),
        _p(fm, ctypes.c_uint8) if fm is not None else None,
        nf, fanout, seed,
        _p(children, ctypes.c_int32), _p(mask, ctypes.c_uint8),
    )
    return children, mask.astype(bool)


def hash_i32(arr: np.ndarray) -> int:
    arr = np.ascontiguousarray(arr, np.int32)
    lib = _load()
    if lib is None:
        h = 1469598103934665603
        for v in arr.astype(np.uint32).tolist():
            h = ((h ^ int(v)) * 1099511628211) % (1 << 64)
        return h
    return int(lib.ngt_hash_i32(_p(arr, ctypes.c_int32), arr.shape[0]))


def label_prop(src: np.ndarray, dst: np.ndarray, n: int, d: int,
               part: np.ndarray, iters: int = 8, sticky: float = 1.1):
    """Balanced label propagation (parallel/halo.py locality_order's hot
    loop). Mutates and returns ``part`` [n] int32. Returns None without the
    native lib — the caller runs its numpy recurrence instead (same math;
    np.add.at over 2e votes costs minutes at products scale, the native
    path seconds)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    part = np.ascontiguousarray(part, np.int32)
    lib.ngt_label_prop(
        _p(src, ctypes.c_int32), _p(dst, ctypes.c_int32), src.shape[0],
        n, d, iters, ctypes.c_float(sticky), _p(part, ctypes.c_int32),
    )
    return part
