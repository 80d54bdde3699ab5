"""Row-wise quantization for embedding tables (INT8 and FP8-e4m3).

The reference exposes ``fp8_quant`` as a per-model flag (reference
hps_backend/src/backend.cpp:500-504); its CUDA engine stores quantized rows in
the GPU cache. Here quantization is symmetric per-row absmax:

    scale[r]  = max(|row_r|) / Q          (Q = 127 for int8, 448 for fp8 e4m3)
    q[r, :]   = round(row_r / scale[r])
    row_r     ~= q[r, :] * scale[r]

Per-row (not per-tensor) scales keep the quantization error of a *lookup*
independent of which other rows live in the table — that is what makes the
AUC-parity gate (BASELINE north star: AUC delta < 0.001) achievable.

numpy implementations here are the host-side reference path (used when
materializing tables and in parity tests); the on-device dequant is fused into
the Pallas gather kernel (hugectr_backend_tpu/ops/dequant_gather.py).
"""

from __future__ import annotations

import numpy as np

INT8_QMAX = 127.0
INT4_QMAX = 7.0
FP8_E4M3_MAX = 448.0


def _row_scales(vectors: np.ndarray, qmax: float) -> np.ndarray:
    absmax = np.abs(vectors).max(axis=1)
    # Avoid zero scales for all-zero rows; any finite scale dequantizes 0 -> 0.
    absmax = np.where(absmax == 0.0, 1.0, absmax)
    return (absmax / qmax).astype(np.float32)


def quantize_rows_int8(vectors: np.ndarray, order: np.ndarray | None = None):
    """-> (q int8 [rows, dim], scales float32 [rows]).

    ``order`` (optional): output row i quantizes source row ``order[i]`` —
    folds the table's sorted-reorder gather into the quantization pass.
    Uses the native single-pass parallel quantizer (kvstore.cpp
    hps_quantize_rows, bit-identical) when built; the numpy op chain
    materializes five full-table temporaries and is ~30x slower at the
    million-row scale."""
    vectors = np.asarray(vectors, dtype=np.float32)
    out = _native_quantize(vectors, order, mode=8)
    if out is not None:
        return out
    if order is not None:
        vectors = vectors[order]
    scales = _row_scales(vectors, INT8_QMAX)
    q = np.rint(vectors / scales[:, None])
    q = np.clip(q, -127, 127).astype(np.int8)
    return q, scales


def _native_quantize(vectors: np.ndarray, order, mode: int):
    """Run hps_quantize_rows when the native lib is available; -> (q, scales)
    or None (fallback)."""
    import ctypes
    import os

    if os.environ.get("HPS_TPU_NATIVE_QUANTIZE", "1") != "1":
        return None
    n, dim = vectors.shape
    if n == 0 or (mode == 4 and dim % 2):
        return None
    try:
        from hugectr_backend_tpu.native.kvstore import load_lib

        lib = load_lib()
    except Exception:
        return None
    if not getattr(lib, "_quant_bound", False):
        lib.hps_quantize_rows.argtypes = [
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib._quant_bound = True
    vectors = np.ascontiguousarray(vectors, np.float32)
    # Output row count follows the order's length (the numpy fallback
    # quantizes vectors[order]); the native kernel reads sources through
    # order[r], so passing rows_out as its n gives identical semantics —
    # previously a shorter order made it read past the order array.
    rows_out = n
    if order is not None:
        order = np.ascontiguousarray(order, np.int64)
        rows_out = int(order.shape[0])
        op = order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    else:
        op = None
    q = np.empty((rows_out, dim if mode == 8 else dim // 2),
                 np.int8 if mode == 8 else np.uint8)
    scales = np.empty(rows_out, np.float32)
    lib.hps_quantize_rows(
        rows_out, dim,
        vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        op, q.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mode,
    )
    return q, scales


def quantize_rows_fp8(vectors: np.ndarray):
    """FP8 e4m3 row quantization -> (q float8_e4m3 stored as uint8 bits? No —
    returned as ml_dtypes float8_e4m3fn array, scales float32 [rows]).

    Uses ml_dtypes (shipped with jax) for the e4m3 rounding; the on-device
    table stores the raw e4m3 bytes.
    """
    import ml_dtypes  # shipped as a jax dependency

    vectors = np.asarray(vectors, dtype=np.float32)
    scales = _row_scales(vectors, FP8_E4M3_MAX)
    scaled = vectors / scales[:, None]
    q = scaled.astype(ml_dtypes.float8_e4m3fn)
    return q, scales


def dequantize_rows(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Host-side reference dequant: q * scale[:, None] -> float32."""
    return q.astype(np.float32) * np.asarray(scales, dtype=np.float32)[:, None]


def quantize_rows_int4(vectors: np.ndarray, order: np.ndarray | None = None):
    """Symmetric INT4 row quantization, nibble-packed.

    -> (packed uint8 [rows, dim//2], scales float32 [rows]); even columns in
    the LOW nibble, odd in the HIGH. Halves table HBM again vs int8 (the
    quantization win on TPU is *capacity*: the gather cost is flat in row
    width — ROOFLINE.md §3.6); meant for huge cold tables where 2x the rows
    resident beats the extra quantization error. Requires an even dim.
    """
    vectors = np.asarray(vectors, dtype=np.float32)
    if vectors.shape[1] % 2:
        raise ValueError("int4 quantization requires an even embedding dim")
    out = _native_quantize(vectors, order, mode=4)
    if out is not None:
        return out
    if order is not None:
        vectors = vectors[order]
    scales = _row_scales(vectors, INT4_QMAX)
    q = np.clip(np.rint(vectors / scales[:, None]), -7, 7).astype(np.int8)
    return pack_int4(q), scales


def pack_int4(q: np.ndarray) -> np.ndarray:
    """int8 values in [-8, 7], even dim -> packed uint8 [rows, dim//2]."""
    u = (q.astype(np.int16) & 0xF).astype(np.uint8)
    return (u[:, 0::2] | (u[:, 1::2] << 4)).astype(np.uint8)


def unpack_int4(p: np.ndarray) -> np.ndarray:
    """packed uint8 [rows, dim//2] -> int8 [rows, dim] (sign-extended)."""
    lo = (p & 0xF).astype(np.int8)
    hi = (p >> 4).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo).astype(np.int8)
    hi = np.where(hi >= 8, hi - 16, hi).astype(np.int8)
    out = np.empty((p.shape[0], p.shape[1] * 2), np.int8)
    out[:, 0::2] = lo
    out[:, 1::2] = hi
    return out


def dequantize_rows_int4(p: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return dequantize_rows(unpack_int4(p), scales)
