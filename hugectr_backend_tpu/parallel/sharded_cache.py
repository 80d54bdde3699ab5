"""ShardedEmbeddingCache: the EmbeddingCache surface over mesh-sharded tables.

Makes capacity partitioning a CONFIG action, not a library exercise: when a
model's ps.json sets ``shard_tables`` (config/params.py), the parameter
server builds this cache instead of a per-device EmbeddingCache, and the
standard serving stack — LookupSession, ContinuousBatcher, the HTTP/gRPC
frontends, ModelManager lifecycle — runs on top of it unchanged. That is
the TPU equivalent of the reference scaling capacity by config alone: there
``num_partitions`` spreads the volatile DB over Redis nodes queried by RPC
per lookup (reference docs/hierarchical_parameter_server.md:435-444,
docs/architecture.md:131-137); here each table is row-sharded over the mesh's
aggregate HBM (interleaved placement, parallel/sharded_table.py) and a batch
is served by ONE XLA program whose all-to-all exchange rides ICI.

Serving-facing contract (what scheduler.py / session.py / model_manager.py
touch): ``tables`` (with .capacity/.dim), ``num_tables``, ``hit_meter``,
``lookup``, ``lookup_flat(pad_counts=...)``, ``refresh``, ``shutdown``.
"""

from __future__ import annotations

import functools
import threading
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hugectr_backend_tpu.cache.embedding_cache import _HitRateMeter, _bucket
from hugectr_backend_tpu.config.params import ConfigError, InferenceParams
from hugectr_backend_tpu.parallel.sharded_table import (
    ShardedTable,
    plan_all_to_all,
)
from hugectr_backend_tpu.utils.logging import get_logger

log = get_logger("hps_tpu.sharded")


def build_shard_mesh(params: InferenceParams) -> Mesh:
    """Mesh over the model's ``shard_devices`` (= deployed_device_list or
    its first ``num_shards`` entries), axis named ``table_shard_axis``.

    On a multi-chip host/pod these are real accelerator devices; under the
    test/dryrun harness they are the virtual CPU devices of
    ``xla_force_host_platform_device_count``."""
    devices = jax.devices()
    ids = params.shard_devices
    missing = [d for d in ids if d >= len(devices)]
    if missing:
        raise ConfigError(
            f"model {params.model_name!r}: deployed_device_list entries "
            f"{missing} out of range; {len(devices)} devices visible"
        )
    return Mesh(
        np.asarray([devices[d] for d in ids]), (params.table_shard_axis,)
    )


def _shardmap_for(mesh: Mesh, axis: str, strategy: str, has_scales: bool,
                  rows_padded: int):
    """Collective-lookup builder — the sharded_table lru-cached builders,
    keyed per axis (rows_padded only matters for psum's shard_rows bound;
    a refresh that changes the padded row count gets a correctly-rebuilt
    program instead of a stale constant)."""
    from hugectr_backend_tpu.parallel.sharded_table import (
        _cached_a2a,
        _cached_lookup,
    )

    if strategy == "psum":
        return _cached_lookup(mesh, has_scales, rows_padded, axis)
    return _cached_a2a(mesh, has_scales, axis)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "strategy", "rows_padded",
                              "flat")
)
def _sharded_lookup_program(vals, scales, routed, *, mesh, axis, strategy,
                            rows_padded, flat):
    """ALL tables' collective lookups in ONE compiled mesh program.

    ``routed[t]`` is (slots,) for psum or (buckets, expand) for all_to_all;
    output is either the per-table row list or the single flat table-major
    f32 vector (the serving OUTPUT0 layout). jit-cached per (shapes,
    statics) — bounded by the batcher's pow2 bucket grid."""
    outs = []
    for v, s, r, rp in zip(vals, scales, routed, rows_padded):
        lk = _shardmap_for(mesh, axis, strategy, s is not None, rp)
        rows = lk(v, s, *r) if s is not None else lk(v, *r)
        outs.append(rows.reshape(-1) if flat else rows)
    if not flat:
        return outs
    return jnp.concatenate(outs) if outs else jnp.zeros((0,), jnp.float32)


class ShardedEmbeddingCache:
    """One model's embedding tables row-sharded over a device mesh.

    Fully resident by construction — config validation requires
    gpucacheper 1.0 + a static cache type for shard_tables, so every
    tier-resident row lives on some shard and misses resolve to the
    default row (there is no per-request tier miss-merge on the
    collective path; ``refresh`` is how streamed-in NEW keys arrive, via
    ``tier_keys`` discovery). The hit meter tracks key-translation hits —
    the same signal the single-chip cache exports.

    Concurrency follows the architecture invariant: tables are FUNCTIONAL
    (refresh REPLACES a table object); each request snapshots the table
    list once under the lock and uses that snapshot for both translation
    and the device operands, so slots and arrays always agree.
    """

    def __init__(
        self,
        params: InferenceParams,
        tables: Sequence[ShardedTable],
        mesh: Mesh,
        tier_query: Optional[Callable] = None,
        tier_keys: Optional[Callable] = None,
    ):
        self.params = params
        self.tables = list(tables)
        self.mesh = mesh
        self.tier_query = tier_query
        # tier_keys(table_idx) -> all keys currently in the lower tiers:
        # lets refresh DISCOVER streamed-in new keys (the single-chip
        # dynamic cache admits them through miss-merge; the collective
        # path has no per-request tier hop, so refresh grows the table).
        self.tier_keys = tier_keys
        self.hit_meter = _HitRateMeter(len(self.tables))
        self._lock = threading.Lock()
        self.strategy = params.shard_strategy
        self.axis = params.table_shard_axis
        for t in self.tables:
            if self.axis not in t.mesh.axis_names:
                raise ConfigError(
                    f"model {params.model_name!r}: sharded table not on "
                    f"axis {self.axis!r}"
                )

    @property
    def num_tables(self) -> int:
        return len(self.tables)

    # ----------------------------------------------------------- translation

    def _route(self, table: ShardedTable, t: int, keys,
               pad_to: Optional[int]):
        """keys -> routed device args for one table's collective lookup.
        Padding (to the batcher's pow2 bucket) happens at the SLOT level
        with the miss slot — identical to the single-chip path, so pads
        never miss and never skew results."""
        keys = np.asarray(keys, dtype=np.int64).reshape(-1)
        slots = table.slots_for(keys)
        self.hit_meter.update(
            t, int((slots != table.index.miss_slot).sum()), keys.shape[0]
        )
        if pad_to is not None and pad_to > slots.shape[0]:
            slots = np.concatenate([
                slots,
                np.full(pad_to - slots.shape[0], table.index.miss_slot,
                        slots.dtype),
            ])
        if self.strategy == "psum":
            return (jnp.asarray(slots.astype(np.int32)),)
        n_shards = table.mesh.shape[self.axis]
        buckets, expand = plan_all_to_all(
            slots, n_shards, table.rows_padded // n_shards
        )
        return (jnp.asarray(buckets), jnp.asarray(expand))

    def _run(self, keys_per_table, pad_counts, flat: bool):
        if len(keys_per_table) != self.num_tables:
            raise ValueError(
                f"got {len(keys_per_table)} key arrays for "
                f"{self.num_tables} tables"
            )
        with self._lock:
            tables = list(self.tables)
        routed = [
            self._route(
                tables[t], t, keys_per_table[t],
                None if pad_counts is None else pad_counts[t],
            )
            for t in range(len(tables))
        ]
        return _sharded_lookup_program(
            [t.values for t in tables],
            [t.scales for t in tables],
            routed,
            mesh=self.mesh,
            axis=self.axis,
            strategy=self.strategy,
            rows_padded=tuple(t.rows_padded for t in tables),
            flat=flat,
        )

    # ---------------------------------------------------------------- lookup

    def lookup(self, keys_per_table: Sequence[np.ndarray]) -> list[jax.Array]:
        """Per-table replicated [n_t, dim_t] f32 lookup — one XLA program
        over the mesh, all-to-all (or psum) collectives over ICI. Counts
        pad to the pow2 bucket grid (miss-slot pads) so compiled-program
        signatures stay bounded — same as the single-chip cache."""
        counts = [np.asarray(k).reshape(-1).shape[0] for k in keys_per_table]
        pad_counts = [_bucket(max(n, 1)) for n in counts]
        outs = self._run(keys_per_table, pad_counts, flat=False)
        return [o[:n] for o, n in zip(outs, counts)]

    def lookup_flat(self, keys_per_table, pad_counts=None) -> jax.Array:
        """Single flat f32 OUTPUT0 vector (table-major, runs padded to
        ``pad_counts`` rows) in one compiled mesh program + one transfer —
        the serving frontend's hot path, same contract as
        EmbeddingCache.lookup_flat."""
        if pad_counts is None:
            pad_counts = [
                _bucket(max(np.asarray(k).reshape(-1).shape[0], 1))
                for k in keys_per_table
            ]
        return self._run(keys_per_table, pad_counts, flat=True)

    # ------------------------------------------------------------- lifecycle

    def refresh(self, fraction: Optional[float] = None) -> int:
        """Re-pull values from the lower tiers and REPLACE each table's
        sharded arrays. Sharded tables refresh whole (quantize+device_put
        is one bulk pass per table; a windowed scatter into a sharded array
        would serialize through host-side reshards anyway); ``fraction`` is
        accepted for interface parity and ignored.

        Resident keys the tiers no longer hold KEEP their current values
        (fetched from the old table via the collective lookup before the
        rebuild) — the same don't-drop-on-partial-tier semantics as the
        single-chip EmbeddingCache refresh, which scatters only found
        rows."""
        import jax.numpy as jnp

        from hugectr_backend_tpu.parallel.sharded_table import sharded_lookup

        if self.tier_query is None:
            return 0
        total = 0
        for t in range(self.num_tables):
            old = self.tables[t]
            keys = old.index.sorted_keys
            if self.tier_keys is not None:
                # Union in keys streamed into the tiers since the build —
                # refresh is how the sharded table grows (no per-request
                # miss-merge on the collective path).
                keys = np.union1d(keys, np.asarray(self.tier_keys(t)))
            vecs, found = self.tier_query(t, keys)
            if not found.any():
                continue
            vecs = np.asarray(vecs, np.float32)
            if not found.all():
                missing = keys[~found]
                slots = old.slots_for(missing)
                # A key absent from BOTH the tiers and the old table
                # (tier_keys listed it but it was evicted before
                # tier_query ran) must be DROPPED, not rebuilt from the
                # default row — it would otherwise become resident with a
                # silently-wrong zero embedding forever.
                in_old = slots != old.index.miss_slot
                if not in_old.all():
                    drop = np.zeros(len(keys), bool)
                    drop[np.flatnonzero(~found)[~in_old]] = True
                    keys = keys[~drop]
                    vecs = vecs[~drop]
                    found = found[~drop]
                    missing = missing[in_old]
                    slots = slots[in_old]
                if missing.size:
                    rows = np.asarray(
                        sharded_lookup(old, jnp.asarray(slots),
                                       strategy=self.strategy)
                    )
                    vecs = vecs.copy()
                    vecs[~found] = rows
            rebuilt = ShardedTable.from_numpy(
                keys, vecs, old.mesh, quant=old.quant,
                default_value=float(self.params.default_value_for_table(t)),
            )
            with self._lock:
                self.tables[t] = rebuilt
            total += int(found.sum())
        return total

    def shutdown(self):
        return None
