"""ctypes bindings to the C++ preprocessing kernels (native/).

Auto-builds ``native/libhlhgat_native.so`` on first use (g++, one file, <1 s)
and falls back to the pure-NumPy implementations when no toolchain exists.
Both paths are bit-compatible (same visit order / stable ties); tests assert
equality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libhlhgat_native.so")

_lib = None
_build_attempted = False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.graclus_match.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i32p, i32p, ctypes.c_void_p, i64p,
    ]
    lib.graclus_match.restype = None
    lib.coarse_edges.argtypes = [
        ctypes.c_int64, i32p, i32p, i64p, i32p, i32p, i64p,
    ]
    lib.coarse_edges.restype = ctypes.c_int64
    lib.coo_to_ell.argtypes = [
        ctypes.c_int64, i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int64,
        i32p, f32p,
    ]
    lib.coo_to_ell.restype = ctypes.c_int32
    lib.max_row_nnz.argtypes = [ctypes.c_int64, i32p, f32p, ctypes.c_int64]
    lib.max_row_nnz.restype = ctypes.c_int64
    lib.hodge_l1.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i32p, i32p, ctypes.c_float,
        i32p, i32p, f32p,
    ]
    lib.hodge_l1.restype = ctypes.c_int64
    lib.l1_pair_count.argtypes = [ctypes.c_int64, ctypes.c_int64, i32p, i32p]
    lib.l1_pair_count.restype = ctypes.c_int64
    lib.packed_fill_level.argtypes = [
        ctypes.c_int64, i64p, i32p, i32p, i32p,
        i32p, i32p,
        i64p, i32p, i32p, f32p,
        i64p, i32p, i32p, f32p,
        i64p, i32p, i32p,
        i32p,
        ctypes.c_int64, ctypes.c_int64,
        f32p, f32p, f32p, f32p, f32p, f32p, i32p, i32p,
    ]
    lib.packed_fill_level.restype = None
    lib.packed_fill_rows.argtypes = [
        ctypes.c_int64, i64p, i32p, i32p, i64p, f32p,
        ctypes.c_int64, ctypes.c_int64, f32p,
    ]
    lib.packed_fill_rows.restype = None
    lib.packed_fill_pool.argtypes = [
        ctypes.c_int64, i64p, i32p, i32p, i32p, i32p, i32p,
        i64p, i64p, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        f32p, f32p,
    ]
    lib.packed_fill_pool.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load():
    """The raw ctypes library (None if unavailable) — for callers that
    drive the C kernels directly (data/fast_collate.py)."""
    return _load()


def graclus_match(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None,
    num_nodes: int,
) -> np.ndarray | None:
    """C++ greedy matching; None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    out = np.empty(num_nodes, np.int64)
    wp = (
        None
        if weight is None
        else np.ascontiguousarray(weight, np.float32).ctypes.data_as(
            ctypes.c_void_p
        )
    )
    lib.graclus_match(num_nodes, src.shape[0], src, dst, wp, out)
    return out


def coarse_edges(
    c_node: np.ndarray, src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    c_node = np.ascontiguousarray(c_node, np.int64)
    e = src.shape[0]
    out_src = np.empty(e, np.int32)
    out_dst = np.empty(e, np.int32)
    c_edge = np.empty(e, np.int64)
    n_coarse = lib.coarse_edges(e, src, dst, c_node, out_src, out_dst, c_edge)
    return out_src[:n_coarse].copy(), out_dst[:n_coarse].copy(), c_edge


def hodge_l1(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, scale: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """C++ L1 = B1ᵀB1 construction (coalesced COO, values × scale)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    e = src.shape[0]
    cap = int(lib.l1_pair_count(num_nodes, e, src, dst))
    rows = np.empty(max(cap, 1), np.int32)
    cols = np.empty(max(cap, 1), np.int32)
    vals = np.empty(max(cap, 1), np.float32)
    nnz = int(
        lib.hodge_l1(num_nodes, e, src, dst, float(scale), rows, cols, vals)
    )
    return rows[:nnz].copy(), cols[:nnz].copy(), vals[:nnz].copy()


def coo_to_ell(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    num_rows: int,
    width: int | None = None,
) -> tuple[np.ndarray, np.ndarray] | None:
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    if width is None:
        width = max(int(lib.max_row_nnz(rows.shape[0], rows, vals, num_rows)), 1)
    ell_cols = np.empty((num_rows, width), np.int32)
    ell_vals = np.empty((num_rows, width), np.float32)
    rc = lib.coo_to_ell(
        rows.shape[0], rows, cols, vals, num_rows, width, ell_cols, ell_vals
    )
    if rc != 0:
        raise ValueError(f"row exceeds ELL width {width}")
    return ell_cols, ell_vals
