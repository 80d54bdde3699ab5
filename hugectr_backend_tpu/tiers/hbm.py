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
from typing import Optional, Sequence

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


def _native_index_min_rows() -> int:
    import os

    try:
        return int(os.environ.get("HPS_TPU_NATIVE_INDEX_MIN_ROWS", "1"))
    except ValueError:
        return 1


class _NativeStaticIndex:
    """ctypes view over kvstore.cpp's StaticMap (immutable key->slot hash).

    Bit-identical to the searchsorted path (slot i == position in the sorted
    key array); bulk ``translate`` is read-only, lock-free, and runs on the
    native persistent pool for large key runs. ~16 bytes of host RAM per
    hash bucket (load factor <= 0.75, power-of-two sizing).
    """

    def __init__(self, lib, handle, miss_slot: int):
        self.lib = lib
        self.handle = handle
        self.miss_slot = int(miss_slot)

    @staticmethod
    def bind(lib):
        import ctypes

        if getattr(lib, "_statmap_bound", False):
            return
        lib.hps_statmap_create.restype = ctypes.c_void_p
        lib.hps_statmap_create.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.hps_statmap_destroy.argtypes = [ctypes.c_void_p]
        lib.hps_statmap_nbytes.restype = ctypes.c_int64
        lib.hps_statmap_nbytes.argtypes = [ctypes.c_void_p]
        lib.hps_statmap_translate.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.hps_statmap_translate_batch.argtypes = [
            ctypes.c_int32, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib._statmap_bound = True

    def translate(self, keys: np.ndarray) -> np.ndarray:
        import ctypes

        keys = np.ascontiguousarray(keys, np.int64).reshape(-1)
        out = np.empty(keys.shape[0], np.int32)
        self.lib.hps_statmap_translate(
            self.handle, keys.shape[0],
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.miss_slot,
        )
        return out

    def __del__(self):
        try:
            self.lib.hps_statmap_destroy(self.handle)
        except Exception:
            pass


def _make_native_statmap(sorted_keys: np.ndarray):
    """Build the native static index, or None when the lib is unavailable
    (or disabled via HPS_TPU_NATIVE_INDEX=0)."""
    import ctypes
    import os

    if os.environ.get("HPS_TPU_NATIVE_INDEX", "1") != "1":
        return None
    # Hash memory is ~16 B/bucket at load <= 0.75 (pow2-rounded): cap it so a
    # billion-row table doesn't silently claim tens of GB of host RAM.
    max_rows = int(os.environ.get("HPS_TPU_NATIVE_INDEX_MAX_ROWS", str(64_000_000)))
    if sorted_keys.shape[0] > max_rows:
        return None
    try:
        from hugectr_backend_tpu.native.kvstore import load_lib

        lib = load_lib()
    except Exception:
        return None
    _NativeStaticIndex.bind(lib)
    keys = np.ascontiguousarray(sorted_keys, np.int64)
    handle = lib.hps_statmap_create(
        keys.shape[0], keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    )
    if not handle:
        return None
    return _NativeStaticIndex(lib, handle, miss_slot=keys.shape[0])


def dedup_int64(values: np.ndarray):
    """Dedup an int64 array: -> (uniq, inv) with ``uniq[inv] == values``.
    Native open-addressing pass (O(n), kvstore.cpp hps_dedup_i64) when the
    lib is built, np.unique otherwise. NOTE: uniq order differs between the
    two (first-seen vs sorted) — callers must not rely on it."""
    import ctypes

    values = np.ascontiguousarray(values, np.int64).reshape(-1)
    n = values.shape[0]
    if n == 0:
        return values, np.empty(0, np.int64)
    lib = None
    try:
        from hugectr_backend_tpu.native.kvstore import load_lib

        lib = load_lib()
    except Exception:
        pass
    if lib is None:
        uniq, inv = np.unique(values, return_inverse=True)
        return uniq, inv
    if not getattr(lib, "_dedup_bound", False):
        lib.hps_dedup_i64.restype = ctypes.c_int64
        lib.hps_dedup_i64.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
        lib._dedup_bound = True
    uniq = np.empty(n, np.int64)
    inv = np.empty(n, np.int32)
    r = lib.hps_dedup_i64(
        n,
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        uniq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return uniq[:r], inv.astype(np.int64)


def translate_indexes_batch(indexes, keys_list):
    """Translate many ``(KeyIndex, keys)`` pairs; ONE native call covers all
    native-backed indexes, so every table's chunks run in parallel on the
    persistent pool (a request's host translation is then bounded by its
    largest chunk, not the sum over tables). Non-native/direct/empty entries
    fall back to ``KeyIndex.lookup``. -> list of int32 slot arrays.
    Bit-identical to per-table ``lookup`` calls."""
    import ctypes

    out: list = [None] * len(indexes)
    nat = []
    keys_c = []
    for i, idx in enumerate(indexes):
        k = np.ascontiguousarray(keys_list[i], np.int64).reshape(-1)
        keys_c.append(k)
        if getattr(idx, "_native", None) is not None and k.shape[0] > 0:
            nat.append(i)
        else:
            out[i] = idx.lookup(k)
    if not nat:
        return out
    if len(nat) == 1:
        i = nat[0]
        out[i] = indexes[i]._native.translate(keys_c[i])
        return out
    from hugectr_backend_tpu.native.kvstore import batch_translate_args

    outs, args, keepalive = batch_translate_args(
        [indexes[i]._native.handle for i in nat],
        [keys_c[i] for i in nat],
        [indexes[i]._native.miss_slot for i in nat],
    )
    indexes[nat[0]]._native.lib.hps_statmap_translate_batch(*args)
    del keepalive
    for j, i in enumerate(nat):
        out[i] = outs[j]
    return out


class KeyIndex:
    """Host-side key -> slot map over a sorted key array.

    Misses return ``miss_slot`` (== capacity, the default row). Three access
    paths, fastest applicable wins, all bit-identical:

    - "direct" mode: keys are already dense ``0..N-1`` (common for bucketized
      Criteo-style tables) — lookup is a bounds check.
    - native hash index (``kvstore.cpp`` StaticMap): immutable open-addressing
      map probed lock-free and in parallel on a persistent pool. ~1.3 cache
      misses per key vs ~log2(N) for binary search — on multi-million-row
      tables this is the difference between the host translation dominating
      the serving hot path (~360 ns/key) and it pipelining under the device
      gather (~25-100 ns/key, parallel). Even cache-resident small tables
      win: one ctypes call beats the numpy searchsorted+where op chain's
      ~300 us of per-call overhead. Built for tables with
      >= ``HPS_TPU_NATIVE_INDEX_MIN_ROWS`` rows (default 1, i.e. every
      non-direct table) when the shared library is available.
    - numpy ``np.searchsorted`` fallback (always correct, no native dep).

    This plays the role of the reference engine's device hash table probe; the
    reference does the equivalent probe inside its CUDA cache kernels
    (reference docs/architecture.md:29-32).
    """

    def __init__(self, sorted_keys: np.ndarray, direct: bool):
        self.sorted_keys = sorted_keys
        self.direct = direct
        self.capacity = int(sorted_keys.shape[0])
        self.miss_slot = self.capacity
        self._native = None
        if not direct and self.capacity >= _native_index_min_rows():
            self._native = _make_native_statmap(sorted_keys)

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
        if self._native is not None:
            return self._native.translate(q)
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
        vals, scales = quantize_host_rows(vectors, quant, default_value,
                                          order=order)
        dim = int(vectors.shape[1])  # logical dim (int4 stores dim//2 bytes)
        vals, scales = _maybe_block(vals, scales, int(vals.shape[1]))

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


def quantize_host_rows(vectors_sorted: np.ndarray, quant: Quant,
                       default_value: float,
                       order: "np.ndarray | None" = None):
    """Quantize sorted rows + append the default (miss) row.
    -> (vals [n+1, dim], scales [n+1] or None), host numpy arrays.

    ``order`` (optional): output row i comes from source row ``order[i]`` —
    the int8/int4 native quantizer folds this gather into its single pass,
    skipping a full-table reorder copy on the load path."""
    dim = int(vectors_sorted.shape[1])
    if quant in ("fp32", "bf16", "fp8") and order is not None:
        vectors_sorted = vectors_sorted[order]
        order = None
    if quant == "int8":
        q, s = quantize_rows_int8(vectors_sorted, order=order)
        dq, ds = _default_row_quant(dim, default_value, INT8_QMAX)
        vals = np.concatenate([q, np.clip(dq, -127, 127)[None].astype(np.int8)])
        scales = np.concatenate([s, ds[None]])
    elif quant == "fp8":
        import ml_dtypes

        q, s = quantize_rows_fp8(vectors_sorted)
        dq, ds = _default_row_quant(dim, default_value, FP8_E4M3_MAX)
        vals = np.concatenate([q, dq[None].astype(ml_dtypes.float8_e4m3fn)])
        scales = np.concatenate([s, ds[None]])
    elif quant == "int4":
        from hugectr_backend_tpu.ops.quantize import (
            INT4_QMAX,
            pack_int4,
            quantize_rows_int4,
        )

        if dim % 2:
            raise ValueError("int4 tables require an even embedding dim")
        q, s = quantize_rows_int4(vectors_sorted, order=order)
        dq, ds = _default_row_quant(dim, default_value, INT4_QMAX)
        dpack = pack_int4(np.clip(dq, -7, 7).astype(np.int8)[None])
        vals = np.concatenate([q, dpack])
        scales = np.concatenate([s, ds[None]])
    elif quant in ("fp32", "bf16"):
        dtype = np.float32 if quant == "fp32" else jnp.bfloat16
        drow = np.full((1, dim), default_value, dtype=np.float32)
        vals = np.concatenate([vectors_sorted, drow]).astype(dtype)
        scales = None
    else:
        raise ValueError(f"unknown quant mode {quant!r}")
    return vals, scales


def _pad_rows(vals: np.ndarray, scales, n: int):
    """Append ``n`` copies of the LAST row (the default/miss row) and its
    scale — the shared pad idiom for both the blocked-layout tail and the
    one-hot arena's 128-row member alignment. Pad rows are never
    addressable (slots are always <= capacity == the default row)."""
    if n <= 0:
        return vals, scales
    vals = np.concatenate([vals, np.repeat(vals[-1:], n, axis=0)])
    if scales is not None:
        scales = np.concatenate([scales, np.repeat(scales[-1:], n)])
    return vals, scales


def _maybe_block(vals: np.ndarray, scales, dim: int):
    """Gigantic tables are stored blocked as [K, SUB, D]. Two reasons:
    (a) memory-layout safety for arbitrarily large arenas, and (b) on
    tunneled-TPU setups very large flat operands historically stressed the
    remote compile path (root cause was constant embedding — fixed by always
    passing tables as jit arguments — but blocked stays as the safe layout
    for >SUB tables at a measured ~7% gather cost). Padding rows replicate
    the default row, so out-of-range slots remain miss-safe."""
    sub = max_rows_per_block()
    if vals.shape[0] > sub:
        k = -(-vals.shape[0] // sub)
        vals, scales = _pad_rows(vals, scales, k * sub - vals.shape[0])
        vals = vals.reshape(k, sub, dim)
        if scales is not None:
            scales = scales.reshape(k, sub)
    return vals, scales


@dataclasses.dataclass
class DeviceArena:
    """One physical device allocation holding MANY logical tables of the same
    dim/quant, concatenated row-wise.

    Concatenating same-dim tables lets the whole multi-table lookup run as
    ONE device op over arena-global slots (= local slot + table offset). Each
    member keeps its own default row inside the arena, so per-table miss
    semantics are unchanged.

    ``lookup_kind`` selects the device access path (slope-timed v5e
    measurements, scripts/microbench_true.py / microbench_onehot_v2.py —
    the XLA gather floor is ~10 ns/access regardless of table size):

    - "arena":  XLA gather + DEVICE scales gather (small arrays: the scales
                gather fuses and is nearly free).
    - "solo":   XLA gather + HOST-gathered per-key scales passed as a program
                input (a device scales gather on a >100 MB scales array costs
                another ~14 ns/access — 60% of big-table lookup time).
    - "onehot": MXU one-hot matmul per member (no per-access gather at all;
                ~2 ps per key x arena-row, beating the 10 ns/access gather for
                tables under ~4k rows). Scales ride host-side like "solo".
    """

    values: jax.Array  # [R_total, D] or blocked [K, SUB, D]
    scales: Optional[jax.Array]
    dim: int
    quant: Quant
    total_rows: int  # logical rows incl. per-table default rows
    # Host copy of the per-row dequant scales (solo/onehot kinds): fetched
    # during key translation so the device program never gathers scales.
    scales_host: Optional[np.ndarray] = None
    lookup_kind: str = "arena"  # "arena" | "solo" | "onehot"


@dataclasses.dataclass
class ArenaView:
    """DeviceTable-compatible view of one member table inside a DeviceArena.

    ``block_rows`` is the member's PHYSICAL row count inside the arena
    (>= capacity + 1). One-hot arenas pad each member block to a multiple of
    128 rows so member offsets/sizes stay lane-aligned — the requirement for
    the in-kernel one-hot interaction variant (ops/fused_interaction.py
    ``fused_dot_interaction_oh``; Mosaic compiles misaligned static slices
    pathologically slowly). Pad rows replicate the default row and are never
    selected: local slots are always <= capacity."""

    arena: DeviceArena
    index: KeyIndex
    offset: int
    dim: int
    quant: Quant
    default_value: float
    block_rows: int = 0  # physical rows; 0 -> capacity + 1

    @property
    def capacity(self) -> int:
        return self.index.capacity

    @property
    def values(self) -> jax.Array:
        flat = self.arena.values
        if flat.ndim == 3:
            flat = flat.reshape(-1, flat.shape[-1])  # stored width (int4: dim//2)
        return flat[self.offset : self.offset + self.capacity + 1]

    @property
    def scales(self):
        if self.arena.scales is None:
            return None
        s = self.arena.scales
        if s.ndim == 2:
            s = s.reshape(-1)
        return s[self.offset : self.offset + self.capacity + 1]

    def slots_for(self, keys: np.ndarray) -> np.ndarray:
        return self.index.lookup(keys)

    def nbytes(self) -> int:
        # Stored width, not the logical dim (int4 packs dim//2 bytes/row);
        # PHYSICAL rows incl. the 128-alignment pad (one-hot arenas) —
        # what was actually allocated, not just capacity + 1.
        rows = self.block_rows or self.capacity + 1
        stored_w = int(self.arena.values.shape[-1])
        n = rows * stored_w * self.arena.values.dtype.itemsize
        if self.arena.scales is not None:
            n += rows * 4
        return int(n)


def build_arena_views(
    tables: "Sequence[tuple[np.ndarray, np.ndarray]]",
    quant: Quant = "int8",
    default_values: Optional[Sequence[float]] = None,
    device: Optional[jax.Device] = None,
    lookup_kind: str = "arena",
) -> list[ArenaView]:
    """Build one shared arena from [(keys, vectors), ...] of equal dim.

    Returns per-table views; ``view.offset + local_slot`` addresses the arena.
    ``lookup_kind`` ("arena" | "solo" | "onehot") selects the device access
    path (see :class:`DeviceArena`); solo/onehot keep a host copy of the
    scales for translation-time fetch.
    """
    if not tables:
        return []
    default_values = default_values or [0.0] * len(tables)
    dim = int(np.asarray(tables[0][1]).shape[1])

    def prep_member(args):
        """Index + quantize one member (the heavy per-table host work: the
        native quantizer/index release the GIL, so members overlap)."""
        (keys, vectors), dv = args
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.shape[1] != dim:
            raise ValueError("arena members must share the embedding dim")
        index, order = KeyIndex.build(keys)
        v, s = quantize_host_rows(vectors, quant, dv, order=order)
        return index, v, s

    if len(tables) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(len(tables), 8)) as ex:
            prepped = list(ex.map(prep_member, zip(tables, default_values)))
    else:
        prepped = [prep_member(a) for a in zip(tables, default_values)]

    vals_parts, scales_parts, views_meta = [], [], []
    offset = 0
    # One-hot arenas pad every member block to a 128-row multiple: member
    # offsets/sizes become lane-aligned, which (a) the in-kernel one-hot
    # interaction requires (see ArenaView.block_rows) and (b) keeps the
    # standalone one-hot MXU masks tile-aligned. Pad rows repeat the
    # member's default row; slots never land there (local <= capacity).
    align = 128 if lookup_kind == "onehot" else 1
    for (index, v, s), dv in zip(prepped, default_values):
        rows = v.shape[0]
        block = -(-rows // align) * align
        v, s = _pad_rows(v, s, block - rows)
        vals_parts.append(v)
        if s is not None:
            scales_parts.append(s)
        views_meta.append((index, offset, dv, block))
        offset += block
    vals = np.concatenate(vals_parts)
    scales = np.concatenate(scales_parts) if scales_parts else None
    total_rows = int(vals.shape[0])
    keep_host_scales = lookup_kind in ("solo", "onehot") and scales is not None
    scales_host = scales.copy() if keep_host_scales else None
    vals, scales = _maybe_block(vals, scales, int(vals.shape[1]))
    put = (lambda x: jax.device_put(x, device)) if device is not None else jax.device_put
    arena = DeviceArena(
        values=put(vals),
        scales=put(scales) if scales is not None else None,
        dim=dim,
        quant=quant,
        total_rows=total_rows,
        scales_host=scales_host,
        lookup_kind=lookup_kind,
    )
    return [
        ArenaView(arena=arena, index=index, offset=off, dim=dim, quant=quant,
                  default_value=dv, block_rows=block)
        for index, off, dv, block in views_meta
    ]


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
    region. A uint8 table is nibble-packed INT4 (ops/quantize.py pack_int4 —
    2x int8's rows per HBM byte): the gather fetches packed bytes and the
    sign-extend/interleave unpack is VPU elementwise work XLA fuses into the
    consumer. Accepts flat [R, D] or blocked [K, SUB, D] table layouts.
    The Pallas fused kernel (ops/dequant_gather.py) is the tuned alternative;
    both produce identical results.
    """
    out = _gather_rows(values, slots)
    if out.dtype == jnp.uint8:  # nibble-packed int4
        out = _unpack_int4_device(out)
    else:
        out = out.astype(jnp.float32)
    if scales is not None:
        out = out * _gather_scales(scales, slots)[:, None]
    return out


def _unpack_int4_device(packed: jax.Array) -> jax.Array:
    """[N, D//2] packed uint8 -> [N, D] f32 (even cols = low nibble)."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return (
        jnp.stack([lo, hi], axis=-1)
        .reshape(packed.shape[0], packed.shape[1] * 2)
        .astype(jnp.float32)
    )
