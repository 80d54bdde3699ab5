"""End-to-end lookup engine tests: PS create -> cache -> session -> vectors.

Replicates the behaviors the reference validates via its CI clients
(known key->vector mapping, default-value-on-miss, KEYS/NUMKEYS wire format —
reference .gitlab-ci.yml:58-88, docs/architecture.md:220-231).
"""

import json

import numpy as np
import pytest

from hugectr_backend_tpu import HierParameterServer, LookupSession
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table


@pytest.fixture(scope="module")
def deployed(tmp_path_factory):
    """A 2-table WDL-style model served from a temp dir (vecsize [4, 16])."""
    root = tmp_path_factory.mktemp("model_repo")
    tables = []
    for t, (rows, dim) in enumerate([(500, 4), (2000, 16)]):
        tbl = make_synthetic_table(rows, dim, seed=t)
        write_sparse_model(root / f"t{t}", tbl.keys, tbl.vectors)
        tables.append(tbl)
    ps_json = {
        "models": [
            {
                "model": "wdl",
                "sparse_files": [str(root / "t0"), str(root / "t1")],
                "embedding_vecsize_per_table": [4, 16],
                "maxnum_catfeature_query_per_table_per_sample": [2, 26],
                "embedding_table_names": ["wide", "deep"],
                "max_batch_size": 64,
                "gpucache": True,
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
                "default_value_for_each_table": [0.0, 0.0],
                "deployed_device_list": [0],
                "quant_bits": 32,
            }
        ]
    }
    ps = HierParameterServer.create(json.dumps(ps_json))
    return ps, tables


def test_known_keys_return_exact_vectors(deployed):
    ps, tables = deployed
    cache = ps.get_embedding_cache("wdl", 0)
    sess = LookupSession.create(ps.get_model_params("wdl"), cache)
    q0 = tables[0].keys[[3, 10, 200]]
    q1 = tables[1].keys[[0, 999, 1500, 7]]
    out = sess.lookup_numpy([q0, q1])
    np.testing.assert_allclose(out[0], expected_vector(q0, 4), rtol=1e-6)
    np.testing.assert_allclose(out[1], expected_vector(q1, 16), rtol=1e-6)


def test_missing_key_returns_default(deployed):
    ps, tables = deployed
    sess = LookupSession.create(
        ps.get_model_params("wdl"), ps.get_embedding_cache("wdl", 0)
    )
    bogus = np.array([-1, 10**15], dtype=np.int64)
    out = sess.lookup_numpy([bogus, bogus])
    # Reference: miss -> default value 0.0 (docs/architecture.md:32).
    np.testing.assert_array_equal(out[0], np.zeros((2, 4), np.float32))
    np.testing.assert_array_equal(out[1], np.zeros((2, 16), np.float32))


def test_mixed_hit_miss(deployed):
    ps, tables = deployed
    sess = LookupSession.create(
        ps.get_model_params("wdl"), ps.get_embedding_cache("wdl", 0)
    )
    q = np.array([tables[0].keys[5], -42, tables[0].keys[9]], dtype=np.int64)
    out = sess.lookup_numpy([q, tables[1].keys[:1]])
    np.testing.assert_allclose(
        out[0][[0, 2]], expected_vector(q[[0, 2]], 4), rtol=1e-6
    )
    np.testing.assert_array_equal(out[0][1], np.zeros(4, np.float32))


def test_wire_format_request(deployed):
    ps, tables = deployed
    params = ps.get_model_params("wdl")
    sess = LookupSession.create(params, ps.get_embedding_cache("wdl", 0))
    batch = 3
    q0 = tables[0].keys[: 2 * batch]
    q1 = tables[1].keys[: 26 * batch]
    flat = np.concatenate([q0, q1])
    numkeys = np.array([2 * batch, 26 * batch], dtype=np.int32)
    assert sess.num_samples_of(flat) == batch  # cat_num = 28
    out = sess.lookup_from_request(flat, numkeys)
    assert out.shape[0] == 2 * batch * 4 + 26 * batch * 16
    np.testing.assert_allclose(
        out[: 2 * batch * 4].reshape(-1, 4), expected_vector(q0, 4), rtol=1e-6
    )


def test_wire_format_errors(deployed):
    ps, _ = deployed
    sess = LookupSession.create(
        ps.get_model_params("wdl"), ps.get_embedding_cache("wdl", 0)
    )
    with pytest.raises(ValueError):
        sess.split_request(np.zeros(5, np.int64), np.array([2, 2]))  # sum mismatch
    with pytest.raises(ValueError):
        sess.split_request(np.zeros(4, np.int64), np.array([4]))  # table arity
    with pytest.raises(ValueError):
        sess.num_samples_of(np.zeros(27, np.int64))  # not divisible by cat_num


def test_int8_quantized_cache_accuracy(tmp_path):
    tbl = make_synthetic_table(1000, 32, seed=9)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "m8",
                    "sparse_files": [str(tmp_path / "t0")],
                    "embedding_vecsize_per_table": [32],
                    "maxnum_catfeature_query_per_table_per_sample": [10],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 8,
                }
            ]
        }
    )
    sess = LookupSession.create(ps.get_model_params("m8"), ps.get_embedding_cache("m8", 0))
    q = tbl.keys[:100]
    out = sess.lookup_numpy([q])[0]
    ref = expected_vector(q, 32)
    absmax = np.abs(ref).max(axis=1, keepdims=True)
    assert np.all(np.abs(out - ref) <= absmax / (2 * 127.0) + 1e-6)


def test_partial_cache_miss_merge(tmp_path):
    """gpucacheper=0.3: 70% of rows live only in DRAM; lookups must still be
    exact via the tier miss-merge path."""
    tbl = make_synthetic_table(1000, 8, seed=11)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "part",
                    "sparse_files": [str(tmp_path / "t0")],
                    "embedding_vecsize_per_table": [8],
                    "maxnum_catfeature_query_per_table_per_sample": [10],
                    "gpucacheper": 0.3,
                    "embedding_cache_type": "dynamic",
                    "quant_bits": 32,
                }
            ]
        }
    )
    cache = ps.get_embedding_cache("part", 0)
    assert cache.tables[0].capacity == 300
    sess = LookupSession.create(ps.get_model_params("part"), cache)
    q = tbl.keys  # all 1000 keys, most missing from HBM
    out = sess.lookup_numpy([q])[0]
    np.testing.assert_allclose(out, expected_vector(q, 8), rtol=1e-6)


def test_multi_device_caches(tmp_path, cpu_devices):
    tbl = make_synthetic_table(100, 8)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "md",
                    "sparse_files": [str(tmp_path / "t0")],
                    "embedding_vecsize_per_table": [8],
                    "maxnum_catfeature_query_per_table_per_sample": [1],
                    "deployed_device_list": [0, 1, 2],
                    "gpucacheper": 1.0,
                    "quant_bits": 32,
                }
            ]
        }
    )
    for dev in (0, 1, 2):
        cache = ps.get_embedding_cache("md", dev)
        out = cache.lookup([tbl.keys[:5]])[0]
        assert out.devices() == {cpu_devices[dev]}
        np.testing.assert_allclose(np.asarray(out), expected_vector(tbl.keys[:5], 8), rtol=1e-6)


def test_refresh_picks_up_tier_updates(tmp_path):
    tbl = make_synthetic_table(200, 4, seed=5)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "r",
                    "sparse_files": [str(tmp_path / "t0")],
                    "embedding_vecsize_per_table": [4],
                    "maxnum_catfeature_query_per_table_per_sample": [1],
                    "gpucacheper": 1.0,
                    "quant_bits": 32,
                    "embedding_cache_type": "static",
                }
            ]
        }
    )
    # Stream an update into the DRAM tier, then refresh the full cache.
    new_vec = np.full((1, 4), 7.5, np.float32)
    ps.apply_updates("r", 0, tbl.keys[:1], new_vec)
    sess = LookupSession.create(ps.get_model_params("r"), ps.get_embedding_cache("r", 0))
    stale = sess.lookup_numpy([tbl.keys[:1]])[0]
    np.testing.assert_allclose(stale, expected_vector(tbl.keys[:1], 4), rtol=1e-6)
    n = ps.get_embedding_cache("r", 0).refresh(fraction=1.0)
    assert n == 200
    fresh = sess.lookup_numpy([tbl.keys[:1]])[0]
    np.testing.assert_allclose(fresh, new_vec, rtol=1e-6)


def test_ssd_tier_roundtrip(tmp_path):
    from hugectr_backend_tpu.config.params import PersistentDatabaseParams
    from hugectr_backend_tpu.tiers.ssd import SsdKVTier

    tier = SsdKVTier(PersistentDatabaseParams(path=str(tmp_path / "ssd")))
    keys = np.array([5, 9, 123456789], dtype=np.int64)
    vecs = np.arange(9, dtype=np.float32).reshape(3, 3)
    tier.insert("hps_et.m.t", keys, vecs)
    out, found = tier.query("hps_et.m.t", np.array([9, 7, 5], dtype=np.int64))
    assert found.tolist() == [True, False, True]
    np.testing.assert_array_equal(out[0], vecs[1])
    np.testing.assert_array_equal(out[2], vecs[0])
    # Upsert + durability across reopen.
    tier.insert("hps_et.m.t", keys[:1], vecs[:1] + 100)
    tier2 = SsdKVTier(PersistentDatabaseParams(path=str(tmp_path / "ssd")))
    out2, found2 = tier2.query("hps_et.m.t", keys[:1])
    assert found2[0]
    np.testing.assert_array_equal(out2[0], vecs[0] + 100)
    assert tier2.size("hps_et.m.t") == 3
    tier2.compact()
    out3, _ = tier2.query("hps_et.m.t", keys[:1])
    np.testing.assert_array_equal(out3[0], vecs[0] + 100)


def test_dram_tier_eviction():
    from hugectr_backend_tpu.config.params import (
        DatabaseOverflowPolicy,
        VolatileDatabaseParams,
    )
    from hugectr_backend_tpu.tiers.dram import DramKVTier

    p = VolatileDatabaseParams(
        num_partitions=2,
        overflow_margin=100,
        overflow_policy=DatabaseOverflowPolicy.EVICT_OLDEST,
        overflow_resolution_target=0.5,
    )
    tier = DramKVTier(p)
    keys = np.arange(200, dtype=np.int64)
    vecs = np.tile(np.arange(200, dtype=np.float32)[:, None], (1, 4))
    tier.insert("t", keys, vecs)
    # margin 100 over 2 partitions -> each partition capped near 50.
    assert tier.size("t") <= 100
    live = tier.keys("t")
    out, found = tier.query("t", live[:10])
    assert found.all()
    np.testing.assert_array_equal(out, np.tile(live[:10].astype(np.float32)[:, None], (1, 4)))


def test_criteo_like_batch_serves_hot_keys(deployed):
    """make_criteo_like_batch builds a wire-format request whose keys come
    from the REAL table key space (rank indices are not keys — the helper
    now requires table_keys), so the Zipf batch actually exercises the
    hot path it claims to model."""
    from hugectr_backend_tpu.io import make_criteo_like_batch

    ps, tables = deployed
    keys, numkeys = make_criteo_like_batch(
        4, [500, 2000], [2, 3],
        table_keys=[tables[0].keys, tables[1].keys], seed=1)
    assert numkeys.tolist() == [8, 12]
    sess = LookupSession.create(
        ps.get_model_params("wdl"), ps.get_embedding_cache("wdl", 0))
    out = sess.lookup_from_request(keys, numkeys)
    # Every key resolves (no default rows): compare against ground truth.
    want = np.concatenate([
        expected_vector(keys[:8], 4).ravel(),
        expected_vector(keys[8:], 16).ravel(),
    ])
    np.testing.assert_allclose(out, want, rtol=1e-5)
    with pytest.raises(ValueError, match="table_keys is required"):
        make_criteo_like_batch(4, [500], [2])
