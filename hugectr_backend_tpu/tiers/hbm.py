"""HBM-resident embedding tables: the device tier.

Replaces the reference's GPU embedding cache storage (CUDA arrays owned by
``EmbeddingCacheBase``, reference docs/architecture.md:19-67) with JAX arrays
in TPU HBM, stored row-quantized (INT8 / FP8-e4m3 / BF16 / FP32).

Key -> slot translation is split off the device: embedding keys are arbitrary
int64s (reference docs/architecture.md:185-218 allows any order / any values),
so a host-side :class:`KeyIndex` maps query keys to dense row slots, and the
device side is a pure static-shape gather+dequant — exactly what XLA/Pallas
want. Misses map to a dedicated *default row* appended at slot ``capacity``
(reference behavior: missing key -> default value, docs/architecture.md:32),
so the gather needs no masking.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.ops.quantize import (
    FP8_E4M3_MAX,
    INT8_QMAX,
    quantize_rows_fp8,
    quantize_rows_int8,
)

Quant = str  # "fp32" | "bf16" | "int8" | "fp8"


class KeyIndex:
    """Host-side key -> slot map over a sorted key array.

    Lookup is a vectorized ``np.searchsorted`` (O(n log N), no Python loop).
    Misses return ``miss_slot`` (== capacity, the default row). When keys are
    already dense ``0..N-1`` ("direct" mode, the common case for bucketized
    Criteo-style tables) the binary search is skipped entirely and lookup is a
    bounds check.

    This plays the role of the reference engine's device hash table probe; the
    native C++ index (hugectr_backend_tpu/native) slots in behind the same
    interface for the DRAM tier.
    """

    def __init__(self, sorted_keys: np.ndarray, direct: bool):
        self.sorted_keys = sorted_keys
        self.direct = direct
        self.capacity = int(sorted_keys.shape[0])
        self.miss_slot = self.capacity

    @classmethod
    def build(cls, keys: np.ndarray):
        """-> (index, row_order) where row_order re-orders table rows to match."""
        keys = np.asarray(keys, dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        if sorted_keys.size > 1 and np.any(sorted_keys[1:] == sorted_keys[:-1]):
            raise ValueError("duplicate keys in embedding table")
        n = sorted_keys.shape[0]
        direct = bool(
            n > 0 and sorted_keys[0] == 0 and sorted_keys[-1] == n - 1
        )
        return cls(sorted_keys, direct), order

    def lookup(self, query_keys: np.ndarray) -> np.ndarray:
        """-> int32 slots; missing keys -> self.miss_slot."""
        q = np.asarray(query_keys, dtype=np.int64)
        if self.direct:
            slots = q.astype(np.int64)
            miss = (slots < 0) | (slots >= self.capacity)
            return np.where(miss, self.miss_slot, slots).astype(np.int32)
        pos = np.searchsorted(self.sorted_keys, q)
        pos_c = np.minimum(pos, max(self.capacity - 1, 0))
        if self.capacity == 0:
            return np.full(q.shape, self.miss_slot, dtype=np.int32)
        hit = self.sorted_keys[pos_c] == q
        return np.where(hit, pos_c, self.miss_slot).astype(np.int32)

    def contains(self, query_keys: np.ndarray) -> np.ndarray:
        return self.lookup(query_keys) != self.miss_slot


def _default_row_quant(dim: int, default_value: float, qmax: float):
    """Quantized representation of the all-``default_value`` miss row."""
    if default_value == 0.0:
        return np.zeros(dim, dtype=np.float32), np.float32(1.0)
    scale = abs(default_value) / qmax
    q = np.full(dim, np.sign(default_value) * qmax, dtype=np.float32)
    return q, np.float32(scale)


@dataclasses.dataclass
class DeviceTable:
    """One embedding table resident in device HBM.

    ``values`` has ``capacity + 1`` rows; row ``capacity`` is the default row
    returned for missing keys (reference docs/architecture.md:32).
    """

    values: jax.Array  # [capacity+1, dim] in quant dtype
    scales: Optional[jax.Array]  # [capacity+1] float32 (None for fp32/bf16)
    index: KeyIndex
    dim: int
    quant: Quant
    default_value: float

    @property
    def capacity(self) -> int:
        return self.index.capacity

    @classmethod
    def from_numpy(
        cls,
        keys: np.ndarray,
        vectors: np.ndarray,
        quant: Quant = "int8",
        default_value: float = 0.0,
        device: Optional[jax.Device] = None,
    ) -> "DeviceTable":
        vectors = np.asarray(vectors, dtype=np.float32)
        index, order = KeyIndex.build(keys)
        vectors = vectors[order]
        dim = int(vectors.shape[1])

        if quant == "int8":
            q, s = quantize_rows_int8(vectors)
            dq, ds = _default_row_quant(dim, default_value, INT8_QMAX)
            vals = np.concatenate([q, np.clip(dq, -127, 127)[None].astype(np.int8)])
            scales = np.concatenate([s, ds[None]])
        elif quant == "fp8":
            import ml_dtypes

            q, s = quantize_rows_fp8(vectors)
            dq, ds = _default_row_quant(dim, default_value, FP8_E4M3_MAX)
            vals = np.concatenate([q, dq[None].astype(ml_dtypes.float8_e4m3fn)])
            scales = np.concatenate([s, ds[None]])
        elif quant in ("fp32", "bf16"):
            dtype = np.float32 if quant == "fp32" else jnp.bfloat16
            drow = np.full((1, dim), default_value, dtype=np.float32)
            vals = np.concatenate([vectors, drow]).astype(dtype)
            scales = None
        else:
            raise ValueError(f"unknown quant mode {quant!r}")

        # Huge tables are stored blocked as [K, SUB, D]: a single XLA gather
        # over a many-million-row operand triggers pathological compile times
        # on the TPU AOT compiler (observed: 1M rows compiles in seconds,
        # 10M rows does not finish in >10 min). Blocking keeps every gather
        # operand at <= SUB rows; the lookup decomposes slot -> (block, row)
        # and gathers with 2-coordinate indices. Padding rows replicate the
        # default row, so out-of-range slots stay miss-safe.
        sub = max_rows_per_block()
        if vals.shape[0] > sub:
            k = -(-vals.shape[0] // sub)
            pad = k * sub - vals.shape[0]
            if pad:
                vals = np.concatenate([vals, np.repeat(vals[-1:], pad, axis=0)])
                if scales is not None:
                    scales = np.concatenate([scales, np.repeat(scales[-1:], pad)])
            vals = vals.reshape(k, sub, dim)
            if scales is not None:
                scales = scales.reshape(k, sub)

        put = (lambda x: jax.device_put(x, device)) if device is not None else jax.device_put
        return cls(
            values=put(vals),
            scales=put(scales) if scales is not None else None,
            index=index,
            dim=dim,
            quant=quant,
            default_value=default_value,
        )

    # -- host-side API ------------------------------------------------------

    def slots_for(self, keys: np.ndarray) -> np.ndarray:
        return self.index.lookup(keys)

    def nbytes(self) -> int:
        n = self.values.size * self.values.dtype.itemsize
        if self.scales is not None:
            n += self.scales.size * self.scales.dtype.itemsize
        return int(n)


def max_rows_per_block() -> int:
    """Rows-per-gather-operand cap (see DeviceTable.from_numpy blocking note).

    1,048,576 rows x 128 int8 = 128 MB per block — comfortably inside the
    fast-compiling region measured on v5e.
    """
    import os

    return int(os.environ.get("HPS_TPU_MAX_GATHER_ROWS", 1 << 20))


def _gather_rows(values: jax.Array, slots: jax.Array) -> jax.Array:
    """Row gather supporting flat [R, D] and blocked [K, SUB, D] layouts."""
    if values.ndim == 2:
        return jnp.take(values, slots, axis=0)
    k, sub, d = values.shape
    block = slots // sub
    row = slots % sub
    # Two-coordinate gather: operand [K, SUB, D], indices [N, 2],
    # slice (1, 1, D). Each gather touches one row; no operand dim exceeds
    # SUB, keeping the TPU AOT compiler in its fast region.
    idx = jnp.stack([block, row], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        values, idx, dnums, slice_sizes=(1, 1, d), mode=jax.lax.GatherScatterMode.CLIP
    )


def _gather_scales(scales: jax.Array, slots: jax.Array) -> jax.Array:
    if scales.ndim == 1:
        return jnp.take(scales, slots, axis=0)
    k, sub = scales.shape
    idx = jnp.stack([slots // sub, slots % sub], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0, 1), start_index_map=(0, 1)
    )
    return jax.lax.gather(
        scales, idx, dnums, slice_sizes=(1, 1), mode=jax.lax.GatherScatterMode.CLIP
    )


def scatter_rows(values: jax.Array, slots: jax.Array, rows: jax.Array) -> jax.Array:
    """values[slots] = rows (functional), both flat and blocked layouts.
    Out-of-range slots (padding) are dropped."""
    if values.ndim == 2:
        return values.at[slots].set(rows.astype(values.dtype), mode="drop")
    k, sub, d = values.shape
    return values.at[slots // sub, slots % sub].set(
        rows.astype(values.dtype), mode="drop"
    )


def scatter_scales(scales: jax.Array, slots: jax.Array, s: jax.Array) -> jax.Array:
    if scales.ndim == 1:
        return scales.at[slots].set(s, mode="drop")
    k, sub = scales.shape
    return scales.at[slots // sub, slots % sub].set(s, mode="drop")


def gather_dequant_xla(
    values: jax.Array, scales: Optional[jax.Array], slots: jax.Array
) -> jax.Array:
    """Reference gather+dequant as a pure XLA program (fusable, any dim).

    ``table[slots].astype(f32) * scales[slots][:, None]`` — XLA fuses the
    dequant multiply into the gather consumer; int8/fp8 storage halves/quarters
    the HBM bytes per row and doubles the rows that fit the fast-gather
    region. Accepts flat [R, D] or blocked [K, SUB, D] table layouts.
    The Pallas fused kernel (ops/dequant_gather.py) is the tuned alternative;
    both produce identical results.
    """
    out = _gather_rows(values, slots).astype(jnp.float32)
    if scales is not None:
        out = out * _gather_scales(scales, slots)[:, None]
    return out
