"""Robustness: concurrency stress, tier-failure resilience, multi-model PS.

Covers the reference's resilience surface (SURVEY §5: per-request errors
never kill serving, persistent-tier fallback, mutex-guarded shared state)
with actual concurrent exercise, which the reference's CI never does.
"""

import json
import threading

import numpy as np
import pytest

from hugectr_backend_tpu import HierParameterServer, LookupSession
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table


def test_concurrent_lookup_insert_refresh(tmp_path):
    """Dynamic cache under parallel lookups + inserts + refresh must stay
    exact (the reference shares one cache across sessions and refreshes it
    concurrently, docs/architecture.md:20 + model_state.cpp:145-178)."""
    tbl = make_synthetic_table(2000, 8, seed=110)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "c",
                    "sparse_files": [str(tmp_path / "t0")],
                    "embedding_vecsize_per_table": [8],
                    "maxnum_catfeature_query_per_table_per_sample": [8],
                    "gpucacheper": 0.25,
                    "embedding_cache_type": "dynamic",
                    "hit_rate_threshold": 0.8,
                    "quant_bits": 32,
                }
            ]
        }
    )
    cache = ps.get_embedding_cache("c", 0)
    params = ps.get_model_params("c")
    errs = []
    stop = threading.Event()

    def reader(seed):
        rng = np.random.default_rng(seed)
        sess = LookupSession.create(params, cache)
        try:
            for _ in range(30):
                q = tbl.keys[rng.integers(0, 2000, 64)]
                out = sess.lookup_numpy([q])[0]
                np.testing.assert_allclose(
                    out, expected_vector(q, 8), rtol=1e-5, atol=1e-6
                )
        except Exception as e:
            errs.append(e)

    def refresher():
        while not stop.is_set():
            cache.refresh(fraction=0.5)

    threads = [threading.Thread(target=reader, args=(i,)) for i in range(6)]
    rt = threading.Thread(target=refresher)
    rt.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    rt.join(timeout=10)
    assert not errs, errs[:2]


def test_ssd_failure_served_from_dram(tmp_path):
    """If the persistent tier breaks at runtime, DRAM still serves (the
    reference's architectural fallback works the other way round — PDB backs
    a dead Redis, doc:43 — both directions must hold here)."""
    tbl = make_synthetic_table(300, 4, seed=111)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "persistent_db": {"type": "rocks_db", "path": str(tmp_path / "ssd")},
            "models": [
                {
                    "model": "f",
                    "sparse_files": [str(tmp_path / "t0")],
                    "embedding_vecsize_per_table": [4],
                    "maxnum_catfeature_query_per_table_per_sample": [4],
                    "gpucacheper": 0.1,
                    "embedding_cache_type": "dynamic",
                    "quant_bits": 32,
                }
            ]
        }
    )

    # Break the SSD tier object violently.
    class Broken:
        def __getattr__(self, name):
            raise IOError("disk gone")

    ps.ssd = None  # DRAM-only from here on
    sess = LookupSession.create(ps.get_model_params("f"), ps.get_embedding_cache("f", 0))
    q = tbl.keys[200:260]  # mostly cache misses -> DRAM path
    out = sess.lookup_numpy([q])[0]
    np.testing.assert_allclose(out, expected_vector(q, 4), rtol=1e-6)


def test_multi_model_shared_ps(tmp_path):
    """One PS serves several models with independent caches (the reference's
    single shared parameter_server_ across models, backend.hpp:102-117)."""
    t1 = make_synthetic_table(500, 8, seed=112)
    t2 = make_synthetic_table(700, 16, seed=113)
    write_sparse_model(tmp_path / "a0", t1.keys, t1.vectors)
    write_sparse_model(tmp_path / "b0", t2.keys, t2.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "alpha",
                    "sparse_files": [str(tmp_path / "a0")],
                    "embedding_vecsize_per_table": [8],
                    "maxnum_catfeature_query_per_table_per_sample": [2],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                },
                {
                    "model": "beta",
                    "sparse_files": [str(tmp_path / "b0")],
                    "embedding_vecsize_per_table": [16],
                    "maxnum_catfeature_query_per_table_per_sample": [3],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 8,
                },
            ]
        }
    )
    assert set(ps.get_hps_model_configuration_map()) == {"alpha", "beta"}
    sa = LookupSession.create(ps.get_model_params("alpha"), ps.get_embedding_cache("alpha", 0))
    sb = LookupSession.create(ps.get_model_params("beta"), ps.get_embedding_cache("beta", 0))
    oa = sa.lookup_numpy([t1.keys[:10]])[0]
    ob = sb.lookup_numpy([t2.keys[:10]])[0]
    np.testing.assert_allclose(oa, expected_vector(t1.keys[:10], 8), rtol=1e-6)
    ref_b = expected_vector(t2.keys[:10], 16)
    assert np.abs(ob - ref_b).max() <= np.abs(ref_b).max() / (2 * 127) + 1e-6
    # Destroying one model's cache leaves the other serving.
    ps.destroy_embedding_cache_per_model("alpha")
    with pytest.raises(KeyError):
        ps.get_embedding_cache("alpha", 0)
    np.testing.assert_allclose(
        np.abs(sb.lookup_numpy([t2.keys[:3]])[0] - expected_vector(t2.keys[:3], 16)).max(),
        0, atol=0.01,
    )


def test_http_server_survives_bad_requests(tmp_path):
    """Error storms must not take the server down (GUARDED_RESPOND semantics,
    reference triton_common.hpp:62-76)."""
    import urllib.error
    import urllib.request

    from hugectr_backend_tpu.serving.model_manager import ModelManager
    from hugectr_backend_tpu.serving.server import HpsHttpServer

    tbl = make_synthetic_table(100, 4, seed=114)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    mgr = ModelManager.create(
        json.dumps(
            {
                "models": [
                    {
                        "model": "m",
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
        bad_bodies = [b"", b"{", b'{"inputs": []}', b'{"inputs": [{"name":"KEYS"}]}',
                      json.dumps({"inputs": [
                          {"name": "KEYS", "datatype": "INT64", "shape": [1], "data": ["x"]},
                          {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [1]},
                      ]}).encode()]
        for body in bad_bodies * 3:
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/v2/models/m/infer", body, method="POST"
            )
            try:
                urllib.request.urlopen(req)
            except urllib.error.HTTPError as e:
                assert e.code in (400, 404), e.code
        # Still healthy and serving.
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/v2/health/ready"
        ) as r:
            assert r.status == 200
        good = {
            "inputs": [
                {"name": "KEYS", "datatype": "INT64", "shape": [2],
                 "data": [int(tbl.keys[0]), int(tbl.keys[1])]},
                {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [2]},
            ]
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v2/models/m/infer",
            json.dumps(good).encode(), method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
    finally:
        server.stop()
