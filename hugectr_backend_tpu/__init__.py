"""hugectr_backend_tpu — a TPU-native Hierarchical Parameter Server (HPS) serving framework.

A from-scratch rebuild of the capabilities of triton-inference-server/hugectr_backend
(the HPS backend for Triton + the HugeCTR HPS engine it drives), redesigned TPU-first:

- Embedding tables live row-quantized (INT8/FP8) in TPU HBM; lookup is a Pallas
  fused dequant+gather kernel (replacing the reference's CUDA GPU embedding cache,
  cf. reference docs/architecture.md:19-67).
- The storage hierarchy is HBM hot cache -> host DRAM -> local SSD (replacing the
  reference's GPU cache -> volatile DB (hash map / Redis) -> RocksDB, cf. reference
  docs/hierarchical_parameter_server.md:400-573).
- Multi-chip scale-out shards tables over a `jax.sharding.Mesh` and exchanges
  keys/vectors with ICI collectives inside `shard_map` (replacing the reference's
  Redis-cluster key partitioning, cf. reference docs/architecture.md:131-137).
- A continuous-batching serving frontend replaces Triton's request scheduler
  (reference hps_backend/src/hps.cc:349-788).

Public entry points mirror the reference engine contract
(reference docs/architecture.md:232-326):

    from hugectr_backend_tpu import HierParameterServer, LookupSession
    ps = HierParameterServer.create("ps.json")
    cache = ps.get_embedding_cache("dlrm", 0)
    session = LookupSession.create(ps.get_model_params("dlrm"), cache)
    vectors = session.lookup(keys_per_table, num_keys_per_table)
"""

from hugectr_backend_tpu.config.params import (
    DatabaseType,
    DatabaseOverflowPolicy,
    EmbeddingCacheType,
    InferenceParams,
    ParameterServerConfig,
    PersistentDatabaseParams,
    UpdateSourceParams,
    UpdateSourceType,
    VolatileDatabaseParams,
)

__version__ = "0.1.0"

__all__ = [
    "DatabaseType",
    "DatabaseOverflowPolicy",
    "EmbeddingCacheType",
    "InferenceParams",
    "ParameterServerConfig",
    "PersistentDatabaseParams",
    "UpdateSourceParams",
    "UpdateSourceType",
    "VolatileDatabaseParams",
    "HierParameterServer",
    "LookupSession",
]


def __getattr__(name):
    # Lazy imports so that config/io utilities stay importable without jax.
    if name == "HierParameterServer":
        from hugectr_backend_tpu.ps.parameter_server import HierParameterServer

        return HierParameterServer
    if name == "LookupSession":
        from hugectr_backend_tpu.lookup.session import LookupSession

        return LookupSession
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
