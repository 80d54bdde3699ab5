"""Hierarchical parameter server: table manager over HBM / DRAM / SSD tiers.

TPU-native implementation of the reference engine's
``HierParameterServerBase`` contract (reference docs/architecture.md:232-326;
call sites hps_backend/src/backend.cpp:69-71, model_state.cpp:111-411):

    create(ps_json)                        -> loads all models' sparse files
    get_hps_model_configuration_map()      -> {model: InferenceParams}
    update_database_per_model(params)      -> (re)load a model's tables
    create_embedding_cache_per_model(name) -> allocate + warm HBM caches
    destory_embedding_cache_per_model      -> (reference spelling kept as alias)
    get_embedding_cache(model, device)     -> EmbeddingCache
    refresh_embedding_cache(model, device) -> re-pull resident rows from tiers

Tier layout: the volatile DB of the reference (CPU hash maps / Redis) becomes
the host-DRAM tier; the persistent DB (RocksDB) becomes the local-SSD tier;
the GPU cache becomes the HBM :class:`EmbeddingCache`.
"""

from __future__ import annotations

import logging
import threading
from typing import Optional

import numpy as np

import jax

from hugectr_backend_tpu.cache.embedding_cache import EmbeddingCache
from hugectr_backend_tpu.config.params import (
    ConfigError,
    DatabaseType,
    EmbeddingCacheType,
    InferenceParams,
    ParameterServerConfig,
)
from hugectr_backend_tpu.io.sparse_model import read_sparse_model
from hugectr_backend_tpu.tiers.base import KVTier, table_tag
from hugectr_backend_tpu.tiers.dram import make_dram_tier
from hugectr_backend_tpu.tiers.hbm import DeviceTable


def arena_member_max_rows() -> int:
    """Tables with at most this many resident rows join a shared per-dim
    "arena"-kind group (XLA gather + fused device scales gather); larger
    tables go "solo" (XLA gather + host-gathered scales).

    Slope-timed on v5e (2026-08, scripts/microbench_true.py): the XLA gather
    floor is ~10 ns/access at ANY table size, but a device scales gather on a
    large (>100 MB) scales array adds ~14 ns/access — 60% of big-table
    lookup cost — while on small arenas it fuses and is nearly free. So the
    boundary is about where the scales array stops being cache-friendly;
    64k rows x 128d int8 keeps the shared arena + scales under ~8.5 MB."""
    import os

    return int(os.environ.get("HPS_TPU_ARENA_MEMBER_MAX_ROWS", 1 << 16))


def onehot_member_max_rows() -> int:
    """Tables with at most this many resident rows are served by the MXU
    one-hot matmul path instead of any per-access gather.

    Slope-timed on v5e (scripts/microbench_onehot_v2.py): the pure-XLA
    one-hot costs ~2 ps per (key x member row) vs the ~10 ns/access gather
    floor, so the break-even is ~4.9k rows; 4096 is the conservative
    default."""
    import os

    return int(os.environ.get("HPS_TPU_ONEHOT_MAX_ROWS", 1 << 12))

log = logging.getLogger("hps_tpu.ps")


class HierParameterServer:
    """Single shared parameter server for all models (one per process, like the
    reference's single `parameter_server_` shared across models,
    reference backend.hpp:102-117)."""

    def __init__(self, config: ParameterServerConfig):
        self.config = config
        self.dram: KVTier = make_dram_tier(config.volatile_db)
        self.ssd: Optional[KVTier] = None
        if config.persistent_db.type == DatabaseType.ROCKS_DB:
            from hugectr_backend_tpu.tiers.ssd import SsdKVTier

            self.ssd = SsdKVTier(config.persistent_db)
        # Streaming update ingestion (reference Kafka consumer, README.md:213-218).
        self.update_consumer = None
        from hugectr_backend_tpu.config.params import UpdateSourceType

        if config.update_source.type != UpdateSourceType.NONE:
            from hugectr_backend_tpu.update.source import (
                UpdateConsumer,
                make_update_source,
            )

            source = make_update_source(config.update_source)
            self.update_consumer = UpdateConsumer(
                source, self._apply_update_by_tag, config.update_source
            ).start()
        # Async tier-promotion pool: SSD-hit write-backs into DRAM and
        # explicit prefetches run off the request thread (reference
        # worker/refresher buffer pools, doc:217-238; BASELINE config 5
        # "async prefetch").
        from concurrent.futures import ThreadPoolExecutor

        self._prefetch_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="hps-prefetch"
        )
        # caches[model_name][device_id] -> EmbeddingCache
        self._caches: dict[str, dict[int, EmbeddingCache]] = {}
        # Raw (keys, vectors) kept per table while tiers don't cover them:
        # row geometry registry (dim per table tag).
        self._table_dims: dict[str, int] = {}
        # Authoritative row count per table (from the last sparse-file
        # load) — dynamic-cache capacity sizes from THIS, not from however
        # many rows happen to be tier-resident at cache-build time.
        self._table_rows: dict[str, int] = {}
        self._model_versions: dict[str, int] = {}
        self._lock = threading.Lock()

    # ------------------------------------------------------------------ create

    @classmethod
    def create(cls, source) -> "HierParameterServer":
        """``HierParameterServerBase::create(ps_json_path)`` equivalent
        (reference backend.cpp:69). Loads every model's sparse files into the
        DRAM/SSD tiers and builds the HBM caches (the reference's cold-start
        path, SURVEY call stack 3.1)."""
        config = ParameterServerConfig.create(source)
        ps = cls(config)
        if config.volatile_db.initialize_after_startup:
            for params in config.models.values():
                ps.update_database_per_model(params)
                if params.init_ec:
                    ps.create_embedding_cache_per_model(params.model_name)
        else:
            # Resume path (reference docs/hierarchical_parameter_server.md:488):
            # skip the sparse-file load and reconnect to the pre-materialized
            # persistent tier (the SSD store is durable across restarts, like
            # the reference's Redis/RocksDB); caches warm from the tiers.
            for params in config.models.values():
                for t in range(params.num_tables):
                    tag = table_tag(params.model_name, params.table_name(t))
                    dim = params.embedding_vecsize_per_table[t]
                    ps._table_dims[tag] = dim
                    ps.dram.create_table(tag, dim)
                    if ps.ssd is not None:
                        ps.ssd.create_table(tag, dim)
                if params.init_ec:
                    ps.create_embedding_cache_per_model(params.model_name)
        return ps

    # ---------------------------------------------------- reference contract

    def get_hps_model_configuration_map(self) -> dict[str, InferenceParams]:
        return dict(self.config.models)

    def get_model_params(self, model_name: str) -> InferenceParams:
        return self.config.model_params(model_name)

    def update_database_per_model(self, params: InferenceParams) -> None:
        """Load (or re-load) a model's sparse files into the DRAM + SSD tiers
        (reference model_state.cpp:132,389)."""
        self.config.models[params.model_name] = params
        init_rate = self.config.volatile_db.initial_cache_rate
        # UVM flavor: the FULL table is pinned in host DRAM regardless of
        # initial_cache_rate (reference backend.cpp:483-491 UVM = table in
        # unified/host memory; misses must never fall to SSD in steady
        # state).
        if params.embedding_cache_type == EmbeddingCacheType.UVM:
            init_rate = 1.0
        # Tables load serially ON PURPOSE: the bulk insert underneath is
        # already partition-parallel (native parallel_parts), so k-wide
        # table parallelism just multiplies thread count and peak RSS —
        # measured 4x SLOWER than serial at 4 x 512 MB tables (core
        # oversubscription + k in-flight full-size read buffers).
        for t, path in enumerate(params.sparse_files):
            tag = table_tag(params.model_name, params.table_name(t))
            dim = params.embedding_vecsize_per_table[t]
            tbl = read_sparse_model(path, embedding_dim=dim)
            self._table_dims[tag] = dim
            self._table_rows[tag] = int(tbl.num_rows)
            self.dram.create_table(tag, dim)
            # Version re-load: evict tier keys the NEW version dropped —
            # otherwise a key removed in v(N+1) keeps serving v(N)'s vector
            # through the tier-merge path forever (stale-model leakage).
            stale = np.setdiff1d(self._tier_keys(tag), tbl.keys,
                                 assume_unique=False)
            if stale.size:
                self.dram.evict(tag, stale)
                if self.ssd is not None:
                    self.ssd.evict(tag, stale)
                log.info("evicted %d stale rows from %s on re-load",
                         stale.size, tag)
            n_dram = int(tbl.num_rows * min(max(init_rate, 0.0), 1.0))
            # Version re-load: DRAM rows promoted during the OLD version's
            # serving (cache_missed_embeddings write-backs) may sit outside
            # the fresh insert window below — overwrite the retained ones
            # with the NEW version's vectors, or the DRAM-first tier merge
            # keeps serving v(N) values for them forever.
            if tag in self.dram.tables():
                resident = self.dram.keys(tag)
                if resident.size:
                    retained = np.intersect1d(resident, tbl.keys)
                    extra = np.setdiff1d(retained, tbl.keys[:n_dram])
                    if extra.size:
                        order = np.argsort(tbl.keys, kind="stable")
                        idx = order[np.searchsorted(tbl.keys[order], extra)]
                        self.dram.insert(tag, extra, tbl.vectors[idx])
                        log.info(
                            "refreshed %d promoted DRAM rows of %s to the "
                            "new version", extra.size, tag,
                        )
            if n_dram > 0:
                self.dram.insert(tag, tbl.keys[:n_dram], tbl.vectors[:n_dram])
            if self.ssd is not None:
                self.ssd.create_table(tag, dim)
                self.ssd.insert(tag, tbl.keys, tbl.vectors)
            log.info(
                "loaded table %s: %d rows x %d dim (%d rows -> DRAM%s)",
                tag, tbl.num_rows, dim, n_dram, ", all -> SSD" if self.ssd else "",
            )

    def create_embedding_cache_per_model(self, model_name: str) -> None:
        """Allocate per-device HBM caches and warm ``gpucacheper`` of each
        table (reference model_state.cpp:391; docs/architecture.md:49-50)."""
        params = self.get_model_params(model_name)
        with self._lock:
            per_device: dict[int, EmbeddingCache] = {}
            devices = jax.devices()
            host_tables = self._prep_model_tables(params)
            if params.shard_tables:
                # Capacity partitioning by config (the reference's
                # ``num_partitions`` Redis partitioning, docs/
                # hierarchical_parameter_server.md:435-444): ONE mesh-wide
                # sharded cache spanning deployed_device_list, served by a
                # single instance through the standard scheduler path.
                cache = self._build_sharded_cache(params, host_tables)
                per_device[params.instance_devices[0]] = cache
            else:
                for dev_id in params.deployed_devices:
                    if dev_id >= len(devices):
                        raise ConfigError(
                            f"deployed_device_list entry {dev_id} out of "
                            f"range; {len(devices)} devices visible"
                        )
                    per_device[dev_id] = self._build_cache(
                        params, devices[dev_id], host_tables)
            self._caches[model_name] = per_device
            self._model_versions.setdefault(model_name, 1)

    def _build_sharded_cache(self, params: InferenceParams, host_tables):
        """Row-shard every table over the mesh built from the model's
        deployed_device_list (parallel/sharded_cache.py)."""
        from hugectr_backend_tpu.parallel.sharded_cache import (
            ShardedEmbeddingCache,
            build_shard_mesh,
        )
        from hugectr_backend_tpu.parallel.sharded_table import ShardedTable

        quant = self._quant_mode(params)
        mesh = build_shard_mesh(params)
        tables = []
        for t, (keys, vecs) in enumerate(host_tables):
            try:
                tables.append(
                    ShardedTable.from_numpy(
                        keys, vecs, mesh, quant=quant,
                        default_value=params.default_value_for_table(t),
                    )
                )
            except NotImplementedError as e:
                raise ConfigError(
                    f"model {params.model_name!r} table {t}: {e}"
                ) from None
        tier_query = lambda ti, keys, m=params.model_name, p=params: (
            self._query_tiers(table_tag(m, p.table_name(ti)), keys)
        )
        tier_keys = lambda ti, m=params.model_name, p=params: (
            self._tier_keys(table_tag(m, p.table_name(ti)))
        )
        log.info(
            "sharded model %s: %d tables over %d-device mesh (axis %r, "
            "%s, %s), %.1f MB/shard",
            params.model_name, len(tables), mesh.shape[params.table_shard_axis],
            params.table_shard_axis, params.shard_strategy, quant,
            sum(t.nbytes_per_shard() for t in tables) / 1e6,
        )
        return ShardedEmbeddingCache(params, tables, mesh,
                                     tier_query=tier_query,
                                     tier_keys=tier_keys)

    def _quant_mode(self, params: InferenceParams) -> str:
        if not params.use_gpu_embedding_cache:
            # Cache off -> serve full-precision from device anyway (TPU has no
            # "CPU lookup" fallback worth having; HBM full residency is used).
            return "fp32"
        if params.fp8_quant:
            return "fp8"
        return {4: "int4", 8: "int8", 16: "bf16", 32: "fp32"}.get(
            params.quant_bits, "int8"
        )

    #: capacity-reserve sentinel key base for dynamic caches — far outside
    #: any practical trainer id space (kEmpty itself is INT64_MIN).
    _RESERVE_KEY_BASE = np.iinfo(np.int64).min + 16

    def _prep_model_tables(self, params: InferenceParams):
        """Device-INDEPENDENT host prep for one model's tables: tier fetch
        of resident rows (+ dynamic-cache capacity reserve). Hoisted out of
        the per-device build so an N-device deployment pays the tier reads
        once, not N times. (Quantization + key-index build still run per
        device inside build_arena_views — an acceptable cost for the
        common 1-device-per-process deployment; hoisting them too would
        thread the prepped (index, qvals, scales) through the arena
        builder and the dynamic-cache reserve path.)"""

        def prep_table(t: int):
            """Fetch one table's resident rows from the tiers (worker-pool
            parallel across tables, reference worker-buffer semantics — the
            tier stores take shared locks for bulk reads)."""
            tag = table_tag(params.model_name, params.table_name(t))
            all_keys = self._tier_keys(tag)
            frac = params.cache_size_percentage if params.use_gpu_embedding_cache else 1.0
            frac = min(max(frac, 0.0), 1.0)
            if params.embedding_cache_type == EmbeddingCacheType.STATIC and frac >= 1.0:
                n_resident = all_keys.shape[0]
            else:
                n_resident = int(np.ceil(all_keys.shape[0] * frac))
            resident_keys = all_keys[:n_resident]
            dim = params.embedding_vecsize_per_table[t]
            if n_resident > 0:
                vecs, found = self._query_tiers(tag, resident_keys)
                if not found.all():  # skip two full-table copies when cold
                    resident_keys = resident_keys[found]
                    vecs = vecs[found]
            else:
                vecs = np.zeros((0, dim), np.float32)
            if (params.embedding_cache_type != EmbeddingCacheType.STATIC
                    and params.use_gpu_embedding_cache):
                # Dynamic/stochastic/UVM capacity contract: gpucacheper x
                # TABLE rows — not "x rows tier-resident right now" (a
                # partial initial_cache_rate or a streamed-resume start
                # would permanently cap the hit rate otherwise). Missing
                # capacity is reserved with sentinel-keyed default rows:
                # sorted first, they fill the slotmap's LRU cold end and
                # evict before any real key.
                total_rows = max(self._table_rows.get(tag, 0),
                                 all_keys.shape[0])
                cap = max(int(np.ceil(total_rows * frac)),
                          resident_keys.shape[0], 1)
                pad = cap - resident_keys.shape[0]
                if pad > 0:
                    sentinels = self._RESERVE_KEY_BASE + np.arange(
                        pad, dtype=np.int64)
                    resident_keys = np.concatenate(
                        [resident_keys, sentinels])
                    vecs = np.concatenate([
                        vecs,
                        np.full((pad, dim),
                                params.default_value_for_table(t),
                                np.float32),
                    ])
            return resident_keys, vecs

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(max(params.num_of_worker_buffer_in_pool, 1), 8)
        ) as ex:
            return list(ex.map(prep_table, range(params.num_tables)))

    def _build_cache(self, params: InferenceParams, device,
                     host_tables=None) -> EmbeddingCache:
        from hugectr_backend_tpu.tiers.hbm import build_arena_views

        quant = self._quant_mode(params)
        if host_tables is None:
            host_tables = self._prep_model_tables(params)
        defaults = [params.default_value_for_table(t) for t in range(params.num_tables)]
        dims = list(params.embedding_vecsize_per_table)

        # Grouping policy (slope-timed v5e measurements — see
        # tiers/hbm.py DeviceArena and cache/lookup_program.py):
        #   tiny tables  -> per-dim "onehot" arena (MXU matmul, no gather)
        #   small tables -> per-dim "arena" (one gather + fused dev scales)
        #   huge tables  -> "solo" (gather + host-side per-key scales)
        tables: list = [None] * params.num_tables
        groups: dict = {}
        for t, d in enumerate(dims):
            n_res = host_tables[t][0].shape[0]
            # int4 tables never take the one-hot kind: the MXU matmul reads
            # stored values directly and packed nibbles aren't summable.
            if n_res + 1 <= onehot_member_max_rows() and quant != "int4":
                groups.setdefault(("onehot", d), []).append(t)
            elif n_res <= arena_member_max_rows():
                groups.setdefault(("arena", d), []).append(t)
            else:
                groups.setdefault(("solo", t), []).append(t)
        for (gkind, _), members in groups.items():
            views = build_arena_views(
                [host_tables[t] for t in members],
                quant=quant,
                default_values=[defaults[t] for t in members],
                device=device,
                lookup_kind=gkind,
            )
            for t, v in zip(members, views):
                tables[t] = v
        tier_query = lambda ti, keys, m=params.model_name, p=params: self._query_tiers(
            table_tag(m, p.table_name(ti)), keys
        )
        if params.embedding_cache_type == EmbeddingCacheType.STATIC:
            return EmbeddingCache(params, tables, device=device, tier_query=tier_query)
        if params.embedding_cache_type == EmbeddingCacheType.UVM:
            from hugectr_backend_tpu.cache.embedding_cache import (
                UvmEmbeddingCache,
            )

            return UvmEmbeddingCache(
                params, tables, device=device, tier_query=tier_query
            )
        from hugectr_backend_tpu.cache.embedding_cache import DynamicEmbeddingCache

        return DynamicEmbeddingCache(
            params, tables, device=device, tier_query=tier_query
        )

    def _tier_keys(self, tag: str) -> np.ndarray:
        keys = self.dram.keys(tag) if tag in self.dram.tables() else np.empty(0, np.int64)
        if self.ssd is not None and tag in self.ssd.tables():
            ssd_keys = self.ssd.keys(tag)
            keys = np.union1d(keys, ssd_keys)
        return np.sort(keys)

    def _query_tiers(self, tag: str, keys: np.ndarray):
        """Cascade DRAM -> SSD (reference VDB -> PDB fallback,
        docs/hierarchical_parameter_server.md:40-43)."""
        from hugectr_backend_tpu.serving import metrics

        vecs, found = self.dram.query(tag, keys)
        n_dram_hit = int(found.sum())
        metrics.TIER_HIT.inc(n_dram_hit, tier="dram")
        metrics.TIER_MISS.inc(keys.shape[0] - n_dram_hit, tier="dram")
        if self.ssd is not None and not found.all():
            missing = np.flatnonzero(~found)
            v2, f2 = self.ssd.query(tag, keys[missing])
            n_ssd_hit = int(f2.sum())
            metrics.TIER_HIT.inc(n_ssd_hit, tier="ssd")
            metrics.TIER_MISS.inc(missing.size - n_ssd_hit, tier="ssd")
            hit2 = missing[f2]
            vecs[hit2] = v2[f2]
            found[hit2] = True
            if self.config.volatile_db.cache_missed_embeddings and hit2.size:
                # Optional write-back of SSD hits into DRAM (doc:488-512),
                # asynchronously — the requester already has its rows.
                self._prefetch_pool.submit(
                    self.dram.insert, tag, keys[hit2].copy(), vecs[hit2].copy()
                )
        return vecs, found

    def prefetch(self, model_name: str, table_idx: int, keys: np.ndarray) -> None:
        """Asynchronously promote ``keys`` from the SSD tier into DRAM (the
        BASELINE config-5 "async prefetch" hook for terabyte-scale tables:
        callers warm the DRAM tier ahead of expected traffic without
        touching request latency)."""
        if self.ssd is None:
            return
        params = self.get_model_params(model_name)
        tag = table_tag(model_name, params.table_name(table_idx))
        keys = np.asarray(keys, np.int64).copy()

        def _promote():
            _, have = self.dram.query(tag, keys)
            want = keys[~have]
            if want.size == 0:
                return
            vecs, found = self.ssd.query(tag, want)
            if found.any():
                self.dram.insert(tag, want[found], vecs[found])

        self._prefetch_pool.submit(_promote)

    def get_embedding_cache(self, model_name: str, device_id: int) -> EmbeddingCache:
        """Reference model_state.cpp:411."""
        try:
            return self._caches[model_name][device_id]
        except KeyError:
            raise KeyError(
                f"no embedding cache for model {model_name!r} on device {device_id}; "
                "call create_embedding_cache_per_model first"
            ) from None

    def destroy_embedding_cache_per_model(self, model_name: str) -> None:
        """Reference model_state.cpp:111 (there spelled `destory_...`)."""
        with self._lock:
            per_device = self._caches.pop(model_name, None)
        # Stop cache worker threads (async-insert drainer, refresh pool) —
        # repeated load/unload cycles must not accumulate threads.
        for cache in (per_device or {}).values():
            shutdown = getattr(cache, "shutdown", None)
            if shutdown is not None:
                shutdown()

    # Reference API spelling kept as an alias for drop-in familiarity.
    destory_embedding_cache_per_model = destroy_embedding_cache_per_model

    def refresh_embedding_cache(self, model_name: str, device_id: int) -> int:
        """Reference model_state.cpp:135,160."""
        return self.get_embedding_cache(model_name, device_id).refresh()

    # ------------------------------------------------------------- versioning

    def get_model_version(self, model_name: str) -> int:
        """Reference backend.cpp:83-90."""
        return self._model_versions.get(model_name, 0)

    def update_model_version(self, model_name: str, version: int) -> None:
        """Reference backend.cpp:94-99."""
        with self._lock:
            self._model_versions[model_name] = version

    # ------------------------------------------------------------- update path

    def _apply_update_by_tag(self, tag: str, keys: np.ndarray, vectors: np.ndarray):
        """Route one streamed update batch into the tiers, honoring the
        per-tier ``update_filters`` regexes (reference
        docs/hierarchical_parameter_server.md update-filter semantics)."""
        import re

        if any(re.match(f, tag) for f in self.config.volatile_db.update_filters):
            if tag not in self.dram.tables():
                self.dram.create_table(tag, int(np.asarray(vectors).shape[-1]))
            self.dram.insert(tag, keys, vectors)
        if self.ssd is not None and any(
            re.match(f, tag) for f in self.config.persistent_db.update_filters
        ):
            self.ssd.insert(tag, keys, vectors)

    def shutdown(self):
        if self.update_consumer is not None:
            self.update_consumer.stop()
        self._prefetch_pool.shutdown(wait=False)

    def apply_updates(self, model_name: str, table_idx: int,
                      keys: np.ndarray, vectors: np.ndarray) -> None:
        """Apply streaming parameter updates to the DRAM + SSD tiers (the
        reference's Kafka-consumer write path, README.md:213-218). HBM caches
        pick the new values up on the next refresh cycle."""
        params = self.get_model_params(model_name)
        tag = table_tag(model_name, params.table_name(table_idx))
        self.dram.insert(tag, keys, vectors)
        if self.ssd is not None:
            self.ssd.insert(tag, keys, vectors)
