"""Native (C++) host-side kernels with transparent Python fallback.

The TPU framework's device compute is XLA/Pallas; the host-side runtime hot
paths (batch partitioning, sequence packing — reference
utils/data_iter_utils.py and io_struct.BatchResizingIterator territory) are
C++ (src/batching.cc), compiled on first use via build.ensure_built() and
bound through ctypes. Every entry point falls back to the pure-Python
implementation when no compiler is available, and the test suite asserts
bit-identical outputs between the two.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from rlinf_tpu.native.build import ensure_built

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = ensure_built()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.bfd_partition.restype = ctypes.c_int64
    lib.bfd_partition.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.ffd_pack.restype = ctypes.c_int64
    lib.ffd_pack.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p]
    lib.pack_gather_plan.restype = ctypes.c_int64
    lib.pack_gather_plan.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, i64p, i64p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def _i64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def bfd_partition(lengths, max_tokens: int) -> List[List[int]]:
    """Best-fit-decreasing bins (list of row-index lists, creation order) —
    identical output to data.dynamic_batching.best_fit_decreasing."""
    lib = _lib()
    L = _i64(lengths)
    n = len(L)
    if lib is None or n == 0:
        from rlinf_tpu.data.dynamic_batching import best_fit_decreasing

        return best_fit_decreasing(list(lengths), max_tokens)
    bin_ids = np.empty(n, np.int64)
    n_bins = lib.bfd_partition(_ptr(L), n, int(max_tokens), _ptr(bin_ids))
    bins: List[List[int]] = [[] for _ in range(n_bins)]
    # reconstruct per-bin insertion order: decreasing length, ties by larger
    # original index first (the numpy argsort[::-1] convention)
    order = np.argsort(L, kind="stable")[::-1]
    for i in order:
        bins[bin_ids[i]].append(int(i))
    return bins


def ffd_pack(lengths, capacity: int) -> Tuple[int, np.ndarray, np.ndarray]:
    """First-fit-decreasing packing: → (num_rows, row_ids [n], offsets [n])."""
    lib = _lib()
    L = _i64(lengths)
    n = len(L)
    row_ids = np.empty(n, np.int64)
    offsets = np.empty(n, np.int64)
    if lib is not None:
        rows = lib.ffd_pack(_ptr(L), n, int(capacity), _ptr(row_ids),
                            _ptr(offsets))
        return int(rows), row_ids, offsets
    # Python fallback (same ordering + first-fit rule as batching.cc)
    order = np.argsort(L, kind="stable")[::-1]
    used: List[int] = []
    for i in order:
        ln = int(L[i])
        row = next((r for r, u in enumerate(used) if u + ln <= capacity), -1)
        if row < 0:
            used.append(0)
            row = len(used) - 1
        row_ids[i] = row
        offsets[i] = used[row]
        used[row] += ln
    return len(used), row_ids, offsets


def pack_sequences(
    arrays: dict, lengths, capacity: int
) -> Tuple[dict, np.ndarray, np.ndarray]:
    """Pack padded [n, T] arrays into [rows, capacity] matrices (SFT sequence
    packing). Returns (packed dict, row_ids, offsets); cell defaults are 0.
    One vectorized fancy-index per array via the native gather plan."""
    L = _i64(lengths)
    n = len(L)
    rows, row_ids, offsets = ffd_pack(L, capacity)
    total = int(L.sum())
    lib = _lib()
    if lib is not None:
        src = np.empty(total, np.int64)
        dst = np.empty(total, np.int64)
        any_arr = next(iter(arrays.values()))
        stride = any_arr.shape[1]
        lib.pack_gather_plan(_ptr(L), n, int(stride), int(capacity),
                             _ptr(_i64(row_ids)), _ptr(_i64(offsets)),
                             _ptr(src), _ptr(dst))
    else:
        src_list, dst_list = [], []
        any_arr = next(iter(arrays.values()))
        stride = any_arr.shape[1]
        for i in range(n):
            t = np.arange(L[i])
            src_list.append(i * stride + t)
            dst_list.append(row_ids[i] * capacity + offsets[i] + t)
        src = np.concatenate(src_list) if src_list else np.empty(0, np.int64)
        dst = np.concatenate(dst_list) if dst_list else np.empty(0, np.int64)
    packed = {}
    for k, v in arrays.items():
        flat = np.zeros((rows * capacity, *v.shape[2:]), v.dtype)
        flat[dst] = v.reshape(v.shape[0] * v.shape[1], *v.shape[2:])[src]
        packed[k] = flat.reshape(rows, capacity, *v.shape[2:])
    return packed, row_ids, offsets
