"""Native static key index (kvstore.cpp StaticMap) parity + wiring.

The serving hot path translates keys to slots on the host before the device
gather; the native open-addressing index replaces numpy searchsorted for
non-direct tables (tiers/hbm.py KeyIndex). These tests pin the bit-exactness
contract: identical slots (including miss -> miss_slot) on every path —
per-table native, one-call batch, and the numpy fallback.
"""

import os

import numpy as np
import pytest

from hugectr_backend_tpu.tiers.hbm import (
    KeyIndex,
    translate_indexes_batch,
)


def _numpy_reference(sorted_keys: np.ndarray, q: np.ndarray) -> np.ndarray:
    n = sorted_keys.shape[0]
    if n == 0:
        return np.full(q.shape, 0, np.int32)
    pos = np.searchsorted(sorted_keys, q)
    pos_c = np.minimum(pos, n - 1)
    hit = sorted_keys[pos_c] == q
    return np.where(hit, pos_c, n).astype(np.int32)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(3)
    idxs, all_keys = [], []
    for n in [7, 583, 14992, 142572]:
        keys = np.sort(rng.choice(n * 4 + 10, size=n, replace=False).astype(np.int64))
        idx, _ = KeyIndex.build(keys)
        idxs.append(idx)
        all_keys.append(keys)
    return idxs, all_keys


def test_native_index_built_for_nondirect_tables(built):
    idxs, _ = built
    # sparse keys (chosen from 4x the row space) are never direct
    for idx in idxs:
        assert not idx.direct
        assert idx._native is not None, "native static index should be active"


def test_native_lookup_matches_numpy_including_misses(built):
    idxs, all_keys = built
    rng = np.random.default_rng(4)
    for idx, keys in zip(idxs, all_keys):
        n = keys.shape[0]
        q = np.concatenate([
            keys[rng.integers(0, n, 300)],
            rng.integers(keys[-1] + 1, keys[-1] + 10_000, 100).astype(np.int64),
            np.array([-1, 0, np.iinfo(np.int64).min, np.iinfo(np.int64).max]),
        ])
        rng.shuffle(q)
        np.testing.assert_array_equal(idx.lookup(q), _numpy_reference(keys, q))


def test_batch_translate_matches_per_table(built):
    idxs, all_keys = built
    rng = np.random.default_rng(5)
    qs = []
    for keys in all_keys:
        n = keys.shape[0]
        qs.append(np.concatenate([
            keys[rng.integers(0, n, 200)],
            rng.integers(keys[-1] + 1, keys[-1] + 5_000, 56).astype(np.int64),
        ]))
    got = translate_indexes_batch(idxs, qs)
    for g, idx, q in zip(got, idxs, qs):
        np.testing.assert_array_equal(g, idx.lookup(q))


def test_batch_translate_mixed_native_direct_and_empty(built):
    idxs, all_keys = built
    # a direct-mode table (keys 0..N-1) has no native index by design
    direct_idx, _ = KeyIndex.build(np.arange(512, dtype=np.int64))
    assert direct_idx.direct and direct_idx._native is None
    mixed = [idxs[0], direct_idx, idxs[1]]
    qs = [
        all_keys[0][:64],
        np.array([0, 511, 512, -3], np.int64),  # last two are misses
        np.empty(0, np.int64),
    ]
    got = translate_indexes_batch(mixed, qs)
    np.testing.assert_array_equal(got[0], idxs[0].lookup(qs[0]))
    np.testing.assert_array_equal(got[1], np.array([0, 511, 512, 512], np.int32))
    assert got[2].shape == (0,)


def test_env_disables_native_index(monkeypatch):
    monkeypatch.setenv("HPS_TPU_NATIVE_INDEX", "0")
    keys = np.sort(np.random.default_rng(6).choice(40_000, 9_000, replace=False).astype(np.int64))
    idx, _ = KeyIndex.build(keys)
    assert idx._native is None
    q = np.concatenate([keys[:50], np.array([keys[-1] + 7], np.int64)])
    np.testing.assert_array_equal(idx.lookup(q), _numpy_reference(keys, q))


def test_max_rows_guard(monkeypatch):
    monkeypatch.setenv("HPS_TPU_NATIVE_INDEX_MAX_ROWS", "100")
    keys = np.sort(np.random.default_rng(7).choice(4_000, 1_000, replace=False).astype(np.int64))
    idx, _ = KeyIndex.build(keys)
    assert idx._native is None  # above the memory cap -> numpy fallback


def test_static_cache_lookup_uses_batch_path(tmp_path):
    """End-to-end: a static-cache lookup with sparse (non-direct) keys returns
    exact vectors through the native batch translation."""
    import json

    from hugectr_backend_tpu import HierParameterServer, LookupSession
    from hugectr_backend_tpu.io.sparse_model import write_sparse_model
    from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table

    tbls = []
    for t, (rows, dim) in enumerate([(3000, 8), (9000, 16)]):
        tbl = make_synthetic_table(rows, dim, seed=40 + t)
        write_sparse_model(tmp_path / f"t{t}", tbl.keys, tbl.vectors)
        tbls.append(tbl)
    ps = HierParameterServer.create(json.dumps({"models": [{
        "model": "m",
        "sparse_files": [str(tmp_path / "t0"), str(tmp_path / "t1")],
        "embedding_vecsize_per_table": [8, 16],
        "maxnum_catfeature_query_per_table_per_sample": [2, 3],
        "max_batch_size": 64,
        "gpucacheper": 1.0,
        "embedding_cache_type": "static",
        "quant_bits": 32,
    }]}))
    cache = ps.get_embedding_cache("m", 0)
    sess = LookupSession.create(ps.get_model_params("m"), cache)
    rng = np.random.default_rng(41)
    q0 = tbls[0].keys[rng.integers(0, 3000, 37)]
    q1 = tbls[1].keys[rng.integers(0, 9000, 53)]
    out = sess.lookup_numpy([q0, q1])
    np.testing.assert_allclose(out[0], expected_vector(q0, 8), rtol=1e-6)
    np.testing.assert_allclose(out[1], expected_vector(q1, 16), rtol=1e-6)
    # miss -> default row (zeros)
    out = sess.lookup_numpy([np.array([-99], np.int64), q1[:1]])
    np.testing.assert_allclose(out[0], np.zeros((1, 8), np.float32))


def test_dedup_int64_parity():
    from hugectr_backend_tpu.tiers.hbm import dedup_int64

    rng = np.random.default_rng(8)
    v = np.concatenate([
        rng.integers(0, 500, 4000).astype(np.int64),       # duplicate-heavy
        rng.integers(-2**62, 2**62, 100).astype(np.int64),  # wide range
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).min], np.int64),
    ])
    uniq, inv = dedup_int64(v)
    np.testing.assert_array_equal(uniq[inv], v)
    assert uniq.size == np.unique(v).size
    assert np.unique(uniq).size == uniq.size  # no duplicates in uniq
    u0, i0 = dedup_int64(np.empty(0, np.int64))
    assert u0.size == 0 and i0.size == 0


def test_dynamic_cache_batch_translate_matches_per_table():
    from hugectr_backend_tpu.cache.slotmap import (
        make_slotmap,
        translate_slotmaps_batch,
    )

    rng = np.random.default_rng(9)
    maps, key_lists = [], []
    for cap in [64, 300, 1000]:
        m = make_slotmap(cap)
        resident = rng.choice(100_000, cap // 2, replace=False).astype(np.int64)
        m.acquire(resident)
        maps.append(m)
        key_lists.append(np.concatenate([
            resident[rng.integers(0, resident.size, 50)],
            rng.integers(200_000, 300_000, 20).astype(np.int64),  # misses
        ]))
    expected = [m.translate(k, touch=False) if "touch" in type(m).translate.__code__.co_varnames
                else m.translate(k) for m, k in zip(maps, key_lists)]
    got = translate_slotmaps_batch(maps, key_lists)
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(g, e)
