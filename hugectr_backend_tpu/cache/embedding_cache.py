"""HBM embedding cache: per-model, per-device hot-row store.

TPU-native replacement for the reference's GPU embedding cache
(``EmbeddingCacheBase``: per-model x per-GPU, shared by all lookup sessions of
that model on that device — reference docs/architecture.md:19-29). Flavors
(static / dynamic / uvm / stochastic, reference backend.cpp:483-491) share this
class; the flavor controls the online-insert policy:

- STATIC: resident set fixed at creation; no online insert.
- DYNAMIC: misses fetched from lower tiers are inserted, synchronously while
  the measured hit rate is below ``hit_rate_threshold`` and asynchronously
  above it (reference README.md:204-205, docs/architecture.md:65-67).
- STOCHASTIC: like DYNAMIC but inserts are sampled.
- UVM: full table in host DRAM; HBM holds hot rows; refill happens on refresh.

Device layout per table is a :class:`DeviceTable` whose row ``capacity`` is the
default/miss row; lookups are translate (host) -> gather+dequant (device) ->
miss merge (device scatter of tier-fetched rows).
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.config.params import EmbeddingCacheType, InferenceParams
from hugectr_backend_tpu.tiers.hbm import DeviceTable, gather_dequant_xla


@dataclasses.dataclass
class CacheConfig:
    """Mirror of the reference's cache config surface
    (``get_cache_config().num_emb_table_``, reference model_instance_state.cpp:169)."""

    num_emb_table: int
    embedding_vec_size: list[int]
    capacity_per_table: list[int]
    cache_type: EmbeddingCacheType


class _HitRateMeter:
    """EWMA hit-rate per table; drives the sync/async insert switch
    (reference docs/hierarchical_parameter_server.md:175-179)."""

    def __init__(self, num_tables: int, alpha: float = 0.05):
        self.rates = np.ones(num_tables, dtype=np.float64)
        self.alpha = alpha
        self._lock = threading.Lock()

    def update(self, table_idx: int, hits: int, total: int):
        if total == 0:
            return
        with self._lock:
            r = hits / total
            self.rates[table_idx] += self.alpha * (r - self.rates[table_idx])

    def rate(self, table_idx: int) -> float:
        return float(self.rates[table_idx])


def _bucket(n: int, minimum: int = 8) -> int:
    """Round up to the next power of two: bounds jit retraces per shape."""
    b = minimum
    while b < n:
        b *= 2
    return b


@jax.jit
def _scatter_rows(out, positions, rows):
    """out[positions] = rows; out-of-range positions (padding) are dropped."""
    return out.at[positions].set(rows, mode="drop")


class EmbeddingCache:
    """One model's embedding cache on one device."""

    def __init__(
        self,
        params: InferenceParams,
        tables: Sequence[DeviceTable],
        device: Optional[jax.Device] = None,
        tier_query: Optional[Callable[[int, np.ndarray], tuple[np.ndarray, np.ndarray]]] = None,
    ):
        self.params = params
        self.tables = list(tables)
        self.device = device
        # tier_query(table_idx, keys) -> (vectors, found): the path to the
        # DRAM/SSD tiers, injected by the parameter server.
        self.tier_query = tier_query
        self.hit_meter = _HitRateMeter(len(self.tables))
        # RLock: lookup takes it around translate+snapshot, and the dynamic
        # subclass's translate() takes it again (re-entrant).
        self._lock = threading.RLock()
        # Group member tables by physical arena; the group's lookup_kind
        # selects the device access path (tiers/hbm.py DeviceArena). The
        # structure is fixed at build time (inserts REPLACE arrays, they
        # never regroup).
        self._groups: list[tuple[object, str, list[int]]] = []
        seen: dict = {}
        for t, table in enumerate(self.tables):
            arena = getattr(table, "arena", None)
            gkey = id(arena) if arena is not None else ("solo-table", t)
            if gkey not in seen:
                kind = (
                    getattr(arena, "lookup_kind", "arena")
                    if arena is not None
                    else "arena"
                )
                if (
                    kind == "onehot"
                    and arena is not None
                    and arena.scales is not None
                    and getattr(arena, "scales_host", None) is None
                ):
                    # One-hot needs host-side scales for quantized arenas;
                    # demote to the plain gather path rather than dropping
                    # the dequant silently.
                    kind = "arena"
                seen[gkey] = len(self._groups)
                self._groups.append((arena, kind, []))
            self._groups[seen[gkey]][2].append(t)

    # -- reference-contract surface -----------------------------------------

    def get_cache_config(self) -> CacheConfig:
        return CacheConfig(
            num_emb_table=len(self.tables),
            embedding_vec_size=[t.dim for t in self.tables],
            capacity_per_table=[t.capacity for t in self.tables],
            cache_type=self.params.embedding_cache_type,
        )

    @property
    def num_tables(self) -> int:
        return len(self.tables)

    # -- lookup path ---------------------------------------------------------

    def translate(self, table_idx: int, keys: np.ndarray) -> np.ndarray:
        """Host-side key -> slot translation; misses -> default-row slot."""
        return self.tables[table_idx].slots_for(keys)

    def prepare_lookup(self, counts: Sequence[int], local_slots):
        """Host-side assembly of the device-program arguments (call under
        ``self._lock`` so slots and array snapshots stay consistent).

        -> (vals, dscales, slots_np, scin_np, meta, table_pos) where
        ``meta`` is the static per-group descriptor consumed by
        lookup_program.gather_rows_for_groups and ``table_pos[t]`` is the
        (group, start) of table t's rows in the group output.
        """
        vals_l, dscales_l, slots_l, scin_l, metas = [], [], [], [], []
        table_pos: dict[int, tuple[int, int]] = {}
        for g, (arena, kind, members) in enumerate(self._groups):
            t0 = members[0]
            table0 = self.tables[t0]
            if arena is None:
                vals, dev_scales = table0.values, table0.scales
                scales_host = None
            else:
                vals, dev_scales = arena.values, arena.scales
                scales_host = arena.scales_host
            if kind == "onehot":
                # Per-member bucket padding: member boundaries are static
                # trace parameters (the one-hot masks are built per member).
                offs, sizes, pcounts = [], [], []
                slot_parts, start = [], 0
                for t in members:
                    tb = self.tables[t]
                    n = counts[t]
                    pc = _bucket(max(n, 1))
                    arr = np.full(pc, tb.offset + tb.index.miss_slot, np.int64)
                    arr[:n] = local_slots[t].astype(np.int64) + tb.offset
                    slot_parts.append(arr)
                    offs.append(int(tb.offset))
                    sizes.append(int(tb.capacity) + 1)
                    pcounts.append(pc)
                    table_pos[t] = (g, start)
                    start += pc
                arr = np.concatenate(slot_parts)
                meta = ("onehot", tuple(offs), tuple(sizes), tuple(pcounts))
                dscales = None
            else:
                if arena is not None:
                    adj = np.concatenate(
                        [
                            local_slots[t].astype(np.int64)
                            + self.tables[t].offset
                            for t in members
                        ]
                    )
                    pad_slot = table0.offset + table0.index.miss_slot
                else:
                    adj = local_slots[t0].astype(np.int64)
                    pad_slot = table0.index.miss_slot
                total = adj.shape[0]
                padded = _bucket(max(total, 1))
                arr = np.full(padded, pad_slot, np.int64)
                arr[:total] = adj
                start = 0
                for t in members:
                    table_pos[t] = (g, start)
                    start += counts[t]
                meta = ("gather",)
                # "solo": scales ride host-side; "arena" (or a solo built
                # without a host copy): device scales gather.
                if kind == "solo" and scales_host is not None:
                    dscales = None
                else:
                    dscales = dev_scales
                    scales_host = None
            scin = scales_host[arr] if scales_host is not None else None
            vals_l.append(vals)
            dscales_l.append(dscales)
            slots_l.append(arr.astype(np.int32))
            scin_l.append(scin)
            metas.append(meta)
        return vals_l, dscales_l, slots_l, scin_l, tuple(metas), table_pos

    def lookup(self, keys_per_table: Sequence[np.ndarray]) -> list[jax.Array]:
        """Full lookup with miss-merge. Returns per-table f32 [n_t, dim_t]
        device arrays (un-padded views).

        Steps (cf. reference hot loop docs/hierarchical_parameter_server.md:67-87):
        cache probe -> hit: HBM gather / MXU one-hot; miss: query lower tiers
        -> scatter into the result -> default value if absent everywhere ->
        insert policy.
        """
        n_tables = len(self.tables)
        local_slots, counts, miss_info = [], [], []
        # Translation and the values snapshot happen under ONE lock hold:
        # table arrays are functional (inserts REPLACE them), so a snapshot
        # consistent with the translated slots stays valid even if an insert
        # lands while the gather runs.
        with self._lock:
            for t in range(n_tables):
                keys = np.asarray(keys_per_table[t], dtype=np.int64).reshape(-1)
                n = keys.shape[0]
                slots = self.translate(t, keys)
                miss_mask = slots == self.tables[t].index.miss_slot
                n_hit = int(n - miss_mask.sum())
                self.hit_meter.update(t, n_hit, n)
                local_slots.append(slots)
                counts.append(n)
                miss_info.append((keys, miss_mask))
            vals_l, dscales_l, slots_l, scin_l, metas, table_group = (
                self.prepare_lookup(counts, local_slots)
            )

        from hugectr_backend_tpu.cache.lookup_program import lookup_groups_jit

        gouts = list(
            lookup_groups_jit(
                vals_l,
                dscales_l,
                [jnp.asarray(a) for a in slots_l],
                [None if s is None else jnp.asarray(s) for s in scin_l],
                metas,
            )
        )

        # Miss merge: fetch rows the HBM tier doesn't hold from DRAM/SSD.
        # Scatters target the (bucket-padded) GROUP arrays so jit shapes stay
        # bounded by the bucket grid.
        if self.tier_query is not None:
            for t, (keys, miss_mask) in enumerate(miss_info):
                miss_pos = np.flatnonzero(miss_mask)
                if miss_pos.size == 0:
                    continue
                vecs, found = self.tier_query(t, keys[miss_pos])
                fnd_pos = miss_pos[found]
                if fnd_pos.size:
                    g, start = table_group[t]
                    pb = _bucket(int(fnd_pos.size))
                    oob = gouts[g].shape[0]
                    pos_padded = np.full(pb, oob, np.int32)
                    pos_padded[: fnd_pos.size] = start + fnd_pos
                    rows_padded = np.zeros((pb, self.tables[t].dim), np.float32)
                    rows_padded[: fnd_pos.size] = vecs[found]
                    gouts[g] = _scatter_rows(
                        gouts[g], jnp.asarray(pos_padded), jnp.asarray(rows_padded)
                    )
                    self._on_miss_fetched(t, keys[miss_pos][found], vecs[found])

        return [
            gouts[table_group[t][0]][
                table_group[t][1] : table_group[t][1] + counts[t]
            ]
            for t in range(n_tables)
        ]

    # -- insert policy (extended by the dynamic cache, milestone: hot cache) --

    def _on_miss_fetched(self, table_idx: int, keys: np.ndarray, vectors: np.ndarray):
        """Static cache: no online insert (reference static cache semantics)."""
        return

    def refresh(self, fraction: Optional[float] = None) -> int:
        """Re-pull the resident rows' values from the lower tiers.

        Implements ``refresh_embedding_cache`` for this device (reference
        model_state.cpp:145-178): refreshes ``cache_refresh_percentage_per_iteration``
        of the cache per call unless ``fraction`` overrides it. Returns rows
        refreshed.
        """
        if self.tier_query is None:
            return 0
        frac = self.params.cache_refresh_percentage_per_iteration if fraction is None else fraction
        refreshed = 0
        with self._lock:
            for t, table in enumerate(self.tables):
                cap = table.capacity
                if cap == 0:
                    continue
                n = max(int(cap * frac), 1) if frac < 1.0 else cap
                # Round-robin window over the sorted key space.
                start = getattr(table, "_refresh_cursor", 0)
                idx = (np.arange(n) + start) % cap
                setattr(table, "_refresh_cursor", int((start + n) % cap))
                keys = table.index.sorted_keys[idx]
                vecs, found = self.tier_query(t, keys)
                if not found.any():
                    continue
                self._write_rows(t, idx[found], vecs[found])
                refreshed += int(found.sum())
        return refreshed

    def _write_rows(self, table_idx: int, slots: np.ndarray, vectors: np.ndarray):
        """Quantize + scatter rows into the device table (functional update)."""
        from hugectr_backend_tpu.ops.quantize import (
            quantize_rows_fp8,
            quantize_rows_int8,
        )
        from hugectr_backend_tpu.tiers.hbm import scatter_rows, scatter_scales

        table = self.tables[table_idx]
        arena = getattr(table, "arena", None)
        slots_np = np.asarray(slots, dtype=np.int64)
        if arena is not None:
            slots_np = slots_np + table.offset
        slots = jnp.asarray(slots_np.astype(np.int32))
        holder = arena if arena is not None else table
        if table.quant in ("int8", "fp8"):
            quantize = quantize_rows_int8 if table.quant == "int8" else quantize_rows_fp8
            q, s = quantize(vectors)
            holder.values = scatter_rows(holder.values, slots, jnp.asarray(q))
            holder.scales = scatter_scales(holder.scales, slots, jnp.asarray(s))
            # Keep the host scales copy (solo/onehot translation-time fetch)
            # in sync; called under self._lock like every writer.
            sh = getattr(holder, "scales_host", None)
            if sh is not None:
                sh[slots_np] = s
        else:
            holder.values = scatter_rows(holder.values, slots, jnp.asarray(vectors))

    def nbytes(self) -> int:
        return sum(t.nbytes() for t in self.tables)


class DynamicEmbeddingCache(EmbeddingCache):
    """DYNAMIC / STOCHASTIC / UVM cache flavors: online insert on miss.

    Implements the reference's dynamic GPU-cache behavior (reference
    README.md:204-205; docs/architecture.md:65-67):
    - misses fetched from the lower tiers are INSERTED into the HBM cache;
    - while the measured hit rate is below ``hit_rate_threshold`` inserts are
      synchronous (cold cache fills fast); above it they are asynchronous on
      a worker pool (hot cache never blocks the lookup stream);
    - STOCHASTIC inserts a random subset (bounds insert bandwidth);
    - capacity is fixed (``gpucacheper`` x table rows); the LRU resident is
      evicted (host-side SlotMap owns the index, device rows are stable).
    """

    def __init__(self, params, tables, device=None, tier_query=None):
        super().__init__(params, tables, device=device, tier_query=tier_query)
        from concurrent.futures import ThreadPoolExecutor

        from hugectr_backend_tpu.cache.slotmap import make_slotmap

        self.slotmaps = []
        for t in self.tables:
            sm = make_slotmap(t.capacity)
            if t.capacity:
                # Resident rows were written sorted: slot i == i-th sorted key.
                slots, _ = sm.acquire(t.index.sorted_keys)
                assert slots[0] == 0 if t.capacity else True
            self.slotmaps.append(sm)
        self._insert_pool = ThreadPoolExecutor(
            max_workers=max(params.num_of_worker_buffer_in_pool, 1),
            thread_name_prefix=f"hps-insert-{params.model_name}",
        )
        self._rng = np.random.default_rng(0)

    def translate(self, table_idx: int, keys: np.ndarray) -> np.ndarray:
        # Taken under the cache lock so a key never becomes visible between
        # slot acquisition and the row write in _insert (stale-row race).
        with self._lock:
            return self.slotmaps[table_idx].translate(keys)

    def _on_miss_fetched(self, table_idx, keys, vectors):
        if keys.shape[0] == 0:
            return
        from hugectr_backend_tpu.config.params import EmbeddingCacheType

        if self.params.embedding_cache_type == EmbeddingCacheType.STOCHASTIC:
            pick = self._rng.random(keys.shape[0]) < 0.5
            keys, vectors = keys[pick], vectors[pick]
            if keys.shape[0] == 0:
                return
        # Sync below the hit-rate threshold, async above
        # (docs/hierarchical_parameter_server.md:175-179).
        if self.hit_meter.rate(table_idx) < self.params.hit_rate_threshold:
            self._insert(table_idx, keys, vectors)
        else:
            self._insert_pool.submit(self._insert, table_idx, keys.copy(), vectors.copy())

    def _insert(self, table_idx, keys, vectors):
        with self._lock:
            slots, _evicted = self.slotmaps[table_idx].acquire(keys)
            self._write_rows(table_idx, slots, vectors)

    def refresh(self, fraction=None) -> int:
        """Refresh resident rows from the tiers, slotmap-aware."""
        if self.tier_query is None:
            return 0
        frac = (
            self.params.cache_refresh_percentage_per_iteration
            if fraction is None
            else fraction
        )
        refreshed = 0
        for t in range(len(self.tables)):
            keys, slots = self.slotmaps[t].resident()
            n_res = keys.shape[0]
            if n_res == 0:
                continue
            n = max(int(n_res * frac), 1) if frac < 1.0 else n_res
            start = getattr(self.tables[t], "_refresh_cursor", 0) % n_res
            idx = (np.arange(n) + start) % n_res
            setattr(self.tables[t], "_refresh_cursor", int((start + n) % n_res))
            vecs, found = self.tier_query(t, keys[idx])
            if not found.any():
                continue
            with self._lock:
                # Inserts may have reassigned slots while the tier query ran;
                # only write rows whose key still owns the same slot.
                cur = self.slotmaps[t].translate(keys[idx], touch=False)
                ok = found & (cur == slots[idx])
                if ok.any():
                    self._write_rows(t, slots[idx][ok], vecs[ok])
                    refreshed += int(ok.sum())
        return refreshed

    def shutdown(self):
        self._insert_pool.shutdown(wait=False)
