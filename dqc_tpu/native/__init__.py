"""Native host-planner bindings (C++ via ctypes, no pybind).

Compiled lazily on first use with the system toolchain; all callers have a
pure-numpy fallback, so the package works without a compiler too.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    src = os.path.join(here, "planner.cpp")
    so = os.path.join(here, "_planner.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", so], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.plan_pairs.restype = ctypes.c_int64
        lib.prune_pairs.restype = ctypes.c_int64
        _LIB = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        warnings.warn(f"native planner unavailable ({e}); using numpy fallback")
        _LIB = None
    return _LIB


def plan_pairs(na: int, nb: int, triangular: bool):
    """Shell-pair lists (ia, ib) — native if available, numpy otherwise."""
    lib = _build_and_load()
    if lib is not None:
        cap = na * nb
        ia = np.empty(cap, dtype=np.int32)
        ib = np.empty(cap, dtype=np.int32)
        n = lib.plan_pairs(
            ctypes.c_int64(na), ctypes.c_int64(nb),
            ctypes.c_int32(1 if triangular else 0),
            ia.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ib.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return ia[:n].copy(), ib[:n].copy()
    if triangular:
        iu = np.triu_indices(na)
        return iu[0].astype(np.int32), iu[1].astype(np.int32)
    ia, ib = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
    return ia.ravel().astype(np.int32), ib.ravel().astype(np.int32)


def prune_pairs(q: np.ndarray, qmax: float, thresh: float):
    """Indices of pairs surviving Schwarz screening."""
    lib = _build_and_load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    if lib is not None:
        keep = np.empty(len(q), dtype=np.int32)
        n = lib.prune_pairs(
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(len(q)), ctypes.c_double(qmax),
            ctypes.c_double(thresh),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return keep[:n].copy()
    return np.nonzero(q * qmax >= thresh)[0].astype(np.int32)


def pair_scatter_indices(row0, col0, nsph_a: int, nsph_b: int, nao: int):
    lib = _build_and_load()
    row0 = np.ascontiguousarray(row0, dtype=np.int32)
    col0 = np.ascontiguousarray(col0, dtype=np.int32)
    npair = len(row0)
    if lib is not None:
        out = np.empty(npair * nsph_a * nsph_b, dtype=np.int64)
        lib.pair_scatter_indices(
            row0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            col0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(npair), ctypes.c_int32(nsph_a),
            ctypes.c_int32(nsph_b), ctypes.c_int64(nao),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out.reshape(npair, nsph_a, nsph_b)
    rows = row0[:, None, None] + np.arange(nsph_a)[None, :, None]
    cols = col0[:, None, None] + np.arange(nsph_b)[None, None, :]
    return (rows.astype(np.int64) * nao + cols)


def transpose_add_4d(src, axes):
    """dst = src + src.transpose(axes) for an (n,n,n,n) f64 tensor with an
    involutive axes permutation — native blocked loops (numpy's strided
    ND-iterator is ~100x slower at n~100). Falls back to numpy."""
    src = np.ascontiguousarray(src, dtype=np.float64)
    n = src.shape[0]
    assert src.shape == (n, n, n, n)
    lib = _build_and_load()
    if lib is None:
        return src + src.transpose(*axes)
    dst = np.empty_like(src)
    ax = np.asarray(axes, dtype=np.int32)
    lib.transpose_add_4d(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n),
        ax.ctypes.data_as(ctypes.c_void_p))
    return dst
