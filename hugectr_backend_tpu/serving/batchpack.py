"""Batch merge/regroup for the continuous batcher (native fast path).

The batcher's two data motions — concatenating N requests' per-table key
runs into merged per-table buffers, and splitting the flat table-major
device output back per request — are pure memcpy with precomputed
geometry. The Python slice/concatenate version costs ~90 us per table per
merged batch (26-table DLRM: ~2.4 ms/batch, below the v5e device rate —
bench_artifacts/frontend_saturation.json); the native version
(native/kvstore.cpp hps_merge_requests / hps_regroup_responses) does each
direction in ONE GIL-released call. Bit-identical numpy fallbacks keep
toolchain-free hosts working (CLAUDE.md host-hot-path rule).
"""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

_lib = None
_checked = False


def _native():
    global _lib, _checked
    if not _checked:
        _checked = True
        try:
            from hugectr_backend_tpu.native.kvstore import load_lib

            lib = load_lib()
            lib.hps_merge_requests.restype = None
            lib.hps_merge_requests.argtypes = [
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.hps_regroup_responses.restype = None
            lib.hps_regroup_responses.argtypes = [
                ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:  # no toolchain: numpy fallback
            _lib = None
    return _lib


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return ctypes.c_void_p(a.ctypes.data)


def merge_requests(
    keys_list: Sequence[np.ndarray],
    counts: np.ndarray,
    totals: Optional[np.ndarray] = None,
) -> "list[np.ndarray]":
    """-> merged per-table int64 key arrays.

    ``keys_list[r]``: request r's flat KEYS (table-major, contiguous int64);
    ``counts``: [n_reqs, n_tables] int64 NUMKEYS matrix.
    """
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n_reqs, n_tables = counts.shape
    if totals is None:
        totals = counts.sum(axis=0)
    starts = np.zeros(n_tables + 1, np.int64)
    np.cumsum(totals, out=starts[1:])
    buf = np.empty(int(starts[-1]), np.int64)
    merged = [buf[starts[t] : starts[t + 1]] for t in range(n_tables)]
    lib = _native()
    if lib is not None and n_reqs > 1:
        src = (ctypes.c_void_p * n_reqs)(
            *(k.ctypes.data for k in keys_list))
        lib.hps_merge_requests(n_reqs, n_tables, src, _ptr(counts),
                               _ptr(starts), _ptr(buf))
        return merged
    offs = np.zeros((n_reqs, n_tables + 1), np.int64)
    np.cumsum(counts, axis=1, out=offs[:, 1:])
    for t in range(n_tables):
        pos = 0
        m = merged[t]
        for r in range(n_reqs):
            n = int(counts[r, t])
            m[pos : pos + n] = keys_list[r][offs[r, t] : offs[r, t + 1]]
            pos += n
    return merged


def regroup_responses(
    flat: np.ndarray,
    tstarts: np.ndarray,
    dims: np.ndarray,
    counts: np.ndarray,
) -> "tuple[np.ndarray, np.ndarray]":
    """Table-major padded ``flat`` -> (request-major buffer, req offsets).

    Request r's response is the zero-copy view
    ``buf[offsets[r]:offsets[r+1]]``. ``tstarts[t]``: element offset of
    table t's (padded) run in ``flat``; ``dims[t]``: row width;
    ``counts``: [n_reqs, n_tables] rows per (request, table).
    """
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n_reqs, n_tables = counts.shape
    tstarts = np.ascontiguousarray(tstarts, dtype=np.int64)
    dims = np.ascontiguousarray(dims, dtype=np.int64)
    sizes = counts @ dims  # [n_reqs] floats per request
    offsets = np.zeros(n_reqs + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    out = np.empty(int(offsets[-1]), np.float32)
    flat = np.ascontiguousarray(flat, dtype=np.float32)
    lib = _native()
    if lib is not None:
        lib.hps_regroup_responses(
            n_reqs, n_tables, _ptr(flat), _ptr(tstarts), _ptr(dims),
            _ptr(counts), _ptr(out),
        )
        return out, offsets
    in_off = np.zeros(n_tables, np.int64)
    dst = 0
    for r in range(n_reqs):
        for t in range(n_tables):
            n = int(counts[r, t]) * int(dims[t])
            lo = int(tstarts[t]) + int(in_off[t]) * int(dims[t])
            out[dst : dst + n] = flat[lo : lo + n]
            in_off[t] += counts[r, t]
            dst += n
    return out, offsets
