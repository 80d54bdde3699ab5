"""Config schema tests — ps.json contract parity.

Exercises the key set / defaults / enum aliases that the reference parses in
HPSBackend::ParseParameterServer (reference hps_backend/src/backend.cpp:103-526).
"""

import json

import pytest

from hugectr_backend_tpu.config.params import (
    ConfigError,
    DatabaseOverflowPolicy,
    DatabaseType,
    EmbeddingCacheType,
    InferenceParams,
    ParameterServerConfig,
    UpdateSourceType,
)

REFERENCE_STYLE_PS_JSON = {
    "supportlonglong": True,
    "volatile_db": {
        "type": "parallel_hash_map",
        "num_partitions": 4,
        "overflow_margin": 100000,
        "overflow_policy": "evict_oldest",
        "overflow_resolution_target": 0.9,
        "initial_cache_rate": 0.5,
        "cache_missed_embeddings": True,
        "update_filters": ["^hps_.+$"],
    },
    "persistent_db": {"type": "rocks_db", "path": "/tmp/ssd_tier", "num_threads": 8},
    "update_source": {
        "type": "kafka_message_queue",
        "brokers": "b1:9092,b2:9092",
        "poll_timeout_ms": 100,
    },
    "models": [
        {
            "model": "wdl",
            "sparse_files": ["/tmp/wdl0", "/tmp/wdl1"],
            "num_of_worker_buffer_in_pool": 3,
            "embedding_table_names": ["table1", "table2"],
            "embedding_vecsize_per_table": [1, 16],
            "maxnum_catfeature_query_per_table_per_sample": [2, 26],
            "deployed_device_list": [0],
            "max_batch_size": 1024,
            "default_value_for_each_table": [0.0, 0.0],
            "hit_rate_threshold": 0.9,
            "gpucacheper": 0.5,
            "gpucache": True,
            "cache_refresh_percentage_per_iteration": 0.2,
            "embedding_cache_type": "dynamic",
            "fp8_quant": False,
            "label_dim": 1,
            "slot_num": 28,
        }
    ],
}


def test_full_reference_style_config_parses():
    cfg = ParameterServerConfig.from_json(REFERENCE_STYLE_PS_JSON)
    assert cfg.support_long_long is True
    assert cfg.volatile_db.type == DatabaseType.PARALLEL_HASH_MAP
    assert cfg.volatile_db.num_partitions == 4
    assert cfg.volatile_db.overflow_policy == DatabaseOverflowPolicy.EVICT_OLDEST
    assert cfg.volatile_db.cache_missed_embeddings is True
    assert cfg.persistent_db.type == DatabaseType.ROCKS_DB
    assert cfg.persistent_db.path == "/tmp/ssd_tier"
    assert cfg.update_source.type == UpdateSourceType.KAFKA_MESSAGE_QUEUE
    assert cfg.update_source.poll_timeout_ms == 100

    wdl = cfg.model_params("wdl")
    assert wdl.max_batch_size == 1024
    assert wdl.embedding_vecsize_per_table == [1, 16]
    assert wdl.cat_num == 28  # 2 + 26, cf. reference model_state.cpp:337-344
    assert wdl.embedding_size == 17  # 1 + 16, model_state.cpp:352-356
    assert wdl.max_result_floats_per_sample == 2 * 1 + 26 * 16
    assert wdl.embedding_cache_type == EmbeddingCacheType.DYNAMIC


def test_mandatory_keys_raise():
    # 'model' and table geometry are mandatory in the reference parser too
    # (triton_helpers.cpp:36-40 required-key errors).
    with pytest.raises(ConfigError):
        InferenceParams.from_json({"sparse_files": ["x"]})
    with pytest.raises(ConfigError):
        InferenceParams.from_json({"model": "m"})
    with pytest.raises(ConfigError):
        ParameterServerConfig.from_json({})  # no models


def test_enum_aliases():
    assert DatabaseType.parse("hashmap") == DatabaseType.HASH_MAP
    assert DatabaseType.parse("rocksdb") == DatabaseType.ROCKS_DB
    assert DatabaseType.parse("redis") == DatabaseType.REDIS_CLUSTER
    assert DatabaseOverflowPolicy.parse("lru") == DatabaseOverflowPolicy.EVICT_LEAST_USED
    assert UpdateSourceType.parse("none") == UpdateSourceType.NONE
    with pytest.raises(ConfigError):
        DatabaseType.parse("bogus")


def test_geometry_validation():
    with pytest.raises(ConfigError):
        InferenceParams.from_json(
            {
                "model": "m",
                "sparse_files": ["a", "b"],
                "embedding_vecsize_per_table": [16],  # wrong arity
                "maxnum_catfeature_query_per_table_per_sample": [26, 2],
            }
        )


def test_from_string_and_file(tmp_path):
    p = tmp_path / "ps.json"
    p.write_text(json.dumps(REFERENCE_STYLE_PS_JSON))
    cfg1 = ParameterServerConfig.create(str(p))
    cfg2 = ParameterServerConfig.create(json.dumps(REFERENCE_STYLE_PS_JSON))
    assert cfg1.model_params("wdl").slot_num == cfg2.model_params("wdl").slot_num == 28


def test_default_value_broadcast():
    p = InferenceParams.from_json(
        {
            "model": "m",
            "sparse_files": ["a", "b", "c"],
            "embedding_vecsize_per_table": [8, 8, 8],
            "maxnum_catfeature_query_per_table_per_sample": [1, 1, 1],
            "default_value_for_each_table": [1.5],
        }
    )
    assert p.default_value_for_table(0) == 1.5
    assert p.default_value_for_table(2) == 1.5
