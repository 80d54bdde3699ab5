"""Config-driven sharded serving: ps.json ``shard_tables`` deploys tables
row-sharded over the device mesh THROUGH the standard serving stack
(ModelManager -> ContinuousBatcher -> ShardedEmbeddingCache), HTTP included.

The reference scales capacity by config alone (``num_partitions`` volatile-db
partitioning over Redis nodes, docs/hierarchical_parameter_server.md:435-444);
this is the TPU equivalent on the 8-device virtual mesh.
"""

import json

import numpy as np
import pytest

from hugectr_backend_tpu.config.params import ConfigError, InferenceParams
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.serving.model_manager import ModelManager


def _model_cfg(root, name, dims, extra):
    cfg = {
        "model": name,
        "sparse_files": [str(root / f"{name}_t{t}") for t in range(len(dims))],
        "embedding_vecsize_per_table": list(dims),
        "maxnum_catfeature_query_per_table_per_sample": [1] * len(dims),
        "gpucacheper": 1.0,
        "embedding_cache_type": "static",
        "shard_tables": True,
        "deployed_device_list": [0, 1, 2, 3, 4, 5, 6, 7],
    }
    cfg.update(extra)
    return cfg


def test_config_validation():
    base = dict(
        model="m", sparse_files=["x"], embedding_vecsize_per_table=[8],
        maxnum_catfeature_query_per_table_per_sample=[1],
        embedding_cache_type="static", gpucacheper=1.0,
    )
    # partial residency unsupported (no tier miss-merge on the
    # collective path — default rows would serve silently)
    with pytest.raises(ConfigError, match="gpucacheper 1.0"):
        InferenceParams.from_json(
            {**base, "shard_tables": True, "gpucacheper": 0.5,
             "deployed_device_list": [0, 1]}
        )
    # <2 shards
    with pytest.raises(ConfigError, match=">= 2"):
        InferenceParams.from_json(
            {**base, "shard_tables": True, "deployed_device_list": [0]}
        )
    # num_shards > devices
    with pytest.raises(ConfigError, match="num_shards"):
        InferenceParams.from_json(
            {**base, "shard_tables": True, "num_shards": 4,
             "deployed_device_list": [0, 1]}
        )
    # bad strategy
    with pytest.raises(ConfigError, match="shard_strategy"):
        InferenceParams.from_json(
            {**base, "shard_tables": True, "shard_strategy": "rpc",
             "deployed_device_list": [0, 1]}
        )
    # fp8 unsupported
    with pytest.raises(ConfigError, match="fp8"):
        InferenceParams.from_json(
            {**base, "shard_tables": True, "fp8_quant": True,
             "deployed_device_list": [0, 1]}
        )
    # dynamic cache type unsupported
    with pytest.raises(ConfigError, match="static"):
        InferenceParams.from_json(
            {**base, "shard_tables": True, "deployed_device_list": [0, 1],
             "embedding_cache_type": "dynamic"}
        )
    # instance_devices: sharded -> one mesh-wide instance
    p = InferenceParams.from_json(
        {**base, "shard_tables": True, "deployed_device_list": [0, 1, 2]}
    )
    assert p.instance_devices == [0]
    assert p.shard_devices == [0, 1, 2]
    p2 = InferenceParams.from_json(
        {**base, "shard_tables": True, "num_shards": 2,
         "deployed_device_list": [0, 1, 2]}
    )
    assert p2.shard_devices == [0, 1]


@pytest.fixture(scope="module", params=["all_to_all", "psum"])
def sharded_mgr(tmp_path_factory, request):
    root = tmp_path_factory.mktemp("sharded_repo")
    dim = 16
    sizes = [5000, 300]
    tbls = [make_synthetic_table(n, dim, seed=t) for t, n in enumerate(sizes)]
    for t, tbl in enumerate(tbls):
        write_sparse_model(root / f"m_t{t}", tbl.keys, tbl.vectors)
    cfg = {"models": [_model_cfg(root, "m", [dim, dim], {
        "quant_bits": 8, "shard_strategy": request.param,
        "maxnum_catfeature_query_per_table_per_sample": [1, 2],
    })]}
    mgr = ModelManager.create(json.dumps(cfg))
    yield mgr, tbls, sizes, dim
    mgr.shutdown()


def test_sharded_infer_parity(sharded_mgr):
    mgr, tbls, sizes, dim = sharded_mgr
    rng = np.random.default_rng(0)
    b = 8
    k0 = tbls[0].keys[rng.integers(0, sizes[0], b)]
    k1 = tbls[1].keys[rng.integers(0, sizes[1], 2 * b)]
    resp = mgr.infer("m", np.concatenate([k0, k1]), np.array([b, 2 * b]))
    out = np.asarray(resp.output)
    want = np.concatenate([
        expected_vector(k0, dim).reshape(-1),
        expected_vector(k1, dim).reshape(-1),
    ])
    rel = np.abs(out - want).max() / np.abs(want).max()
    assert rel < 2e-2, rel  # int8 row quantization tolerance


def test_sharded_miss_defaults(sharded_mgr):
    mgr, tbls, sizes, dim = sharded_mgr
    b = 4
    k0 = np.full(b, -12345, np.int64)  # misses
    k1 = tbls[1].keys[:2 * b]
    resp = mgr.infer("m", np.concatenate([k0, k1]), np.array([b, 2 * b]))
    out = np.asarray(resp.output)
    assert np.abs(out[: b * dim]).max() == 0.0
    want1 = expected_vector(k1, dim).reshape(-1)
    rel = np.abs(out[b * dim:] - want1).max() / np.abs(want1).max()
    assert rel < 2e-2


def test_sharded_update_then_refresh(sharded_mgr):
    """Streamed updates land in the tiers; refresh replaces the sharded
    arrays (functional writers) and the new values serve."""
    mgr, tbls, sizes, dim = sharded_mgr
    keys = tbls[0].keys[:16]
    new_vecs = np.full((16, dim), 2.5, np.float32)
    mgr.ps.apply_updates("m", 0, keys, new_vecs)
    n = mgr.ps.refresh_embedding_cache("m", 0)
    assert n > 0
    resp = mgr.infer(
        "m", np.concatenate([keys[:4], tbls[1].keys[:8]]), np.array([4, 8])
    )
    out = np.asarray(resp.output)[: 4 * dim]
    np.testing.assert_allclose(out, 2.5, rtol=2e-2)


def test_sharded_http_frontend(tmp_path_factory):
    """The KServe HTTP surface serves a sharded model unchanged."""
    import urllib.request

    from hugectr_backend_tpu.serving.server import HpsHttpServer

    root = tmp_path_factory.mktemp("sharded_http")
    dim = 8
    tbl = make_synthetic_table(2000, dim, seed=9)
    write_sparse_model(root / "h_t0", tbl.keys, tbl.vectors)
    cfg = {"models": [_model_cfg(root, "h", [dim], {"quant_bits": 32})]}
    mgr = ModelManager.create(json.dumps(cfg))
    server = HpsHttpServer(mgr, port=0).start()
    try:
        q = tbl.keys[:13]
        req = {
            "inputs": [
                {"name": "KEYS", "datatype": "INT64", "shape": [len(q)],
                 "data": [int(k) for k in q]},
                {"name": "NUMKEYS", "datatype": "INT32", "shape": [1],
                 "data": [len(q)]},
            ]
        }
        r = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v2/models/h/infer",
            data=json.dumps(req).encode(), method="POST",
        )
        with urllib.request.urlopen(r) as resp:
            body = json.loads(resp.read())
        out = np.asarray(body["outputs"][0]["data"], np.float32).reshape(-1, dim)
        np.testing.assert_allclose(out, expected_vector(q, dim), rtol=1e-5)
    finally:
        server.stop()
        mgr.shutdown()


def test_sharded_load_unload_reload(tmp_path_factory):
    root = tmp_path_factory.mktemp("sharded_cycle")
    dim = 8
    tbl = make_synthetic_table(1000, dim, seed=11)
    write_sparse_model(root / "c_t0", tbl.keys, tbl.vectors)
    cfg = {"models": [_model_cfg(root, "c", [dim],
                                 {"quant_bits": 8, "num_shards": 4})]}
    mgr = ModelManager.create(json.dumps(cfg))
    try:
        assert mgr.is_loaded("c")
        mgr.unload("c")
        assert not mgr.is_loaded("c")
        mgr.ps.create_embedding_cache_per_model("c")
        mgr.load("c")
        q = tbl.keys[:6]
        resp = mgr.infer("c", q, np.array([6]))
        want = expected_vector(q, dim).reshape(-1)
        rel = np.abs(np.asarray(resp.output) - want).max() / np.abs(want).max()
        assert rel < 2e-2
        # num_shards=4 -> mesh spans 4 of the 8 listed devices
        cache = mgr.ps.get_embedding_cache("c", 0)
        assert cache.mesh.shape["table"] == 4
    finally:
        mgr.shutdown()


def test_sharded_int4(tmp_path_factory):
    """int4 nibble-packed sharded serving (2x capacity per shard byte)."""
    root = tmp_path_factory.mktemp("sharded_i4")
    dim = 8
    tbl = make_synthetic_table(3000, dim, seed=13)
    write_sparse_model(root / "q_t0", tbl.keys, tbl.vectors)
    cfg = {"models": [_model_cfg(root, "q", [dim], {"quant_bits": 4})]}
    mgr = ModelManager.create(json.dumps(cfg))
    try:
        q = tbl.keys[100:110]
        resp = mgr.infer("q", q, np.array([10]))
        want = expected_vector(q, dim).reshape(-1)
        rel = np.abs(np.asarray(resp.output) - want).max() / np.abs(want).max()
        assert rel < 0.15, rel  # int4 tolerance
    finally:
        mgr.shutdown()


def test_sharded_refresh_keeps_tier_dropped_keys(tmp_path_factory):
    """Partial-tier refresh must not drop resident keys the tiers no
    longer hold: they keep serving their current values (the single-chip
    refresh's scatter-only-found semantics)."""
    root = tmp_path_factory.mktemp("sharded_keep")
    dim = 8
    tbl = make_synthetic_table(600, dim, seed=17)
    write_sparse_model(root / "k_t0", tbl.keys, tbl.vectors)
    cfg = {"models": [_model_cfg(root, "k", [dim], {"quant_bits": 32})]}
    mgr = ModelManager.create(json.dumps(cfg))
    try:
        ps = mgr.ps
        cache = ps.get_embedding_cache("k", 0)
        # Simulate tier loss of half the keys: rebuild the DRAM table with
        # only the surviving half (new values), no SSD tier configured.
        from hugectr_backend_tpu.ps.parameter_server import table_tag

        params = ps.get_model_params("k")
        tag = table_tag("k", params.table_name(0))
        keep = tbl.keys[::2]
        new_vecs = np.full((len(keep), dim), 3.25, np.float32)
        ps.dram.drop_table(tag)
        ps.dram.create_table(tag, dim)
        ps.dram.insert(tag, keep, new_vecs)

        n = cache.refresh()
        assert n == len(keep)
        # Survivors serve the refreshed values; dropped keys keep their
        # ORIGINAL values instead of reverting to the default row.
        q_keep = keep[:5]
        q_drop = tbl.keys[1::2][:5]
        resp = mgr.infer("k", np.concatenate([q_keep, q_drop]),
                         np.array([10]))
        out = np.asarray(resp.output).reshape(10, dim)
        np.testing.assert_allclose(out[:5], 3.25, rtol=1e-5)
        want_old = expected_vector(q_drop, dim)
        np.testing.assert_allclose(out[5:], want_old, rtol=1e-5)
    finally:
        mgr.shutdown()


def test_sharded_refresh_discovers_streamed_new_keys(tmp_path_factory):
    """Keys streamed into the tiers AFTER the build (Kafka/apply_updates)
    must start serving after a refresh — the collective path has no
    per-request miss-merge, so refresh is how the sharded table grows."""
    root = tmp_path_factory.mktemp("sharded_grow")
    dim = 8
    tbl = make_synthetic_table(400, dim, seed=23)
    write_sparse_model(root / "g_t0", tbl.keys, tbl.vectors)
    cfg = {"models": [_model_cfg(root, "g", [dim], {"quant_bits": 32})]}
    mgr = ModelManager.create(json.dumps(cfg))
    try:
        new_keys = np.array([10**12 + 7, 10**12 + 9], np.int64)
        new_vecs = np.full((2, dim), 4.5, np.float32)
        mgr.ps.apply_updates("g", 0, new_keys, new_vecs)
        resp0 = mgr.infer("g", new_keys, np.array([2]))
        assert np.abs(np.asarray(resp0.output)).max() == 0.0  # miss pre-refresh
        mgr.ps.refresh_embedding_cache("g", 0)
        resp = mgr.infer("g", new_keys, np.array([2]))
        np.testing.assert_allclose(np.asarray(resp.output), 4.5, rtol=1e-5)
        # Old keys still serve.
        q = tbl.keys[:4]
        resp2 = mgr.infer("g", q, np.array([4]))
        np.testing.assert_allclose(
            np.asarray(resp2.output), expected_vector(q, dim).reshape(-1),
            rtol=1e-5)
    finally:
        mgr.shutdown()
