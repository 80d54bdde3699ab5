"""INT4 nibble-packed table storage (quant_bits=4).

Capacity extension beyond the reference's int8/fp8 flavors (reference
backend.cpp:500-504 fp8_quant): on TPU the gather cost is flat in row width
(ROOFLINE.md §3.6), so halving bytes/row again doubles the rows resident per
chip's HBM at the same lookup speed — the right trade for huge cold tables.
"""

import json

import numpy as np
import pytest

from hugectr_backend_tpu.ops.quantize import (
    dequantize_rows_int4,
    pack_int4,
    quantize_rows_int4,
    unpack_int4,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, (100, 32)).astype(np.int8)
    np.testing.assert_array_equal(unpack_int4(pack_int4(q)), q)


def test_quantize_error_bound():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((500, 16)).astype(np.float32)
    p, s = quantize_rows_int4(v)
    assert p.dtype == np.uint8 and p.shape == (500, 8)
    back = dequantize_rows_int4(p, s)
    # symmetric int4: max error is half a quant step = absmax/14
    bound = np.abs(v).max(axis=1) / 14 + 1e-6
    assert (np.abs(back - v).max(axis=1) <= bound).all()


def test_quantize_rejects_odd_dim():
    with pytest.raises(ValueError):
        quantize_rows_int4(np.zeros((4, 7), np.float32))


def test_device_table_int4_lookup_matches_host_dequant():
    from hugectr_backend_tpu.tiers.hbm import DeviceTable, gather_dequant_xla

    rng = np.random.default_rng(2)
    keys = np.sort(rng.choice(40_000, 3_000, replace=False).astype(np.int64))
    vecs = rng.standard_normal((3_000, 16)).astype(np.float32)
    dt = DeviceTable.from_numpy(keys, vecs, quant="int4")
    assert dt.dim == 16 and dt.values.shape[-1] == 8  # packed bytes
    q = keys[rng.integers(0, 3_000, 200)]
    slots = dt.slots_for(q)
    out = np.asarray(gather_dequant_xla(dt.values, dt.scales, slots))
    bound = np.abs(vecs).max() / 14 + 1e-5
    order = np.argsort(keys, kind="stable")
    exact = vecs[order][slots]
    assert np.abs(out - exact).max() <= bound
    # miss -> default row (zeros)
    mslots = dt.slots_for(np.array([keys[-1] + 123], np.int64))
    mout = np.asarray(gather_dequant_xla(dt.values, dt.scales, mslots))
    np.testing.assert_allclose(mout, 0.0)


def test_blocked_int4_table(monkeypatch):
    """Tables above the blocked-layout threshold keep int4 semantics."""
    monkeypatch.setenv("HPS_TPU_MAX_GATHER_ROWS", "1024")
    import importlib

    import hugectr_backend_tpu.tiers.hbm as hbm

    rng = np.random.default_rng(3)
    keys = np.sort(rng.choice(40_000, 5_000, replace=False).astype(np.int64))
    vecs = rng.standard_normal((5_000, 8)).astype(np.float32)
    dt = hbm.DeviceTable.from_numpy(keys, vecs, quant="int4")
    assert dt.values.ndim == 3, "expected the blocked [K, SUB, D] layout"
    q = keys[rng.integers(0, 5_000, 64)]
    slots = dt.slots_for(q)
    out = np.asarray(hbm.gather_dequant_xla(dt.values, dt.scales, slots))
    order = np.argsort(keys, kind="stable")
    bound = np.abs(vecs).max() / 14 + 1e-5
    assert np.abs(out - vecs[order][slots]).max() <= bound


def test_ps_serves_int4_end_to_end(tmp_path):
    """quant_bits=4 in ps.json serves whole lookups within the int4 bound,
    through the arena grouping (one-hot is bypassed for packed tables)."""
    from hugectr_backend_tpu import HierParameterServer, LookupSession
    from hugectr_backend_tpu.io.sparse_model import write_sparse_model
    from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table

    tbls = []
    for t, rows in enumerate([700, 5_000]):  # one tiny (would be one-hot), one arena
        tbl = make_synthetic_table(rows, 16, seed=50 + t)
        write_sparse_model(tmp_path / f"t{t}", tbl.keys, tbl.vectors)
        tbls.append(tbl)
    ps = HierParameterServer.create(json.dumps({"models": [{
        "model": "m",
        "sparse_files": [str(tmp_path / "t0"), str(tmp_path / "t1")],
        "embedding_vecsize_per_table": [16, 16],
        "maxnum_catfeature_query_per_table_per_sample": [2, 2],
        "max_batch_size": 64,
        "gpucacheper": 1.0,
        "embedding_cache_type": "static",
        "quant_bits": 4,
    }]}))
    cache = ps.get_embedding_cache("m", 0)
    for t in cache.tables:
        assert getattr(t, "arena", None) is None or t.arena.lookup_kind != "onehot"
    sess = LookupSession.create(ps.get_model_params("m"), cache)
    rng = np.random.default_rng(51)
    q0 = tbls[0].keys[rng.integers(0, 700, 20)]
    q1 = tbls[1].keys[rng.integers(0, 5_000, 30)]
    out = sess.lookup_numpy([q0, q1])
    # sin() vectors have absmax <= 1 -> error bound 1/14 per component
    assert np.abs(out[0] - expected_vector(q0, 16)).max() <= 1 / 14 + 1e-5
    assert np.abs(out[1] - expected_vector(q1, 16)).max() <= 1 / 14 + 1e-5


def test_auc_parity_int4_vs_fp32(tmp_path):
    """Looser gate than the int8 one (BASELINE: int8 delta < 0.001): int4's
    quant step is 18x coarser than int8's, and it is a capacity trade for
    cold tables, not the default serving precision. Measured delta on this
    synthetic ranking task (untrained random DLRM — the worst case, no
    robustness from training): ~0.006; gate at 0.01."""
    import jax
    import jax.numpy as jnp

    from hugectr_backend_tpu import LookupSession
    from hugectr_backend_tpu.io.synthetic import make_synthetic_table
    from hugectr_backend_tpu.models.dlrm import DLRM
    from tests.test_parity_and_resume import _auc, _deploy

    rng = np.random.default_rng(0)
    tbl = make_synthetic_table(5000, 32, seed=100, deterministic_fn=False)
    ps32 = _deploy(tmp_path, tbl, 32, "fp32")
    ps4 = _deploy(tmp_path, tbl, 4, "int4")

    model = DLRM(bottom_widths=(64, 32), top_widths=(64, 1))
    n, keys_per = 4096, 8
    dense = rng.standard_normal((n, 13)).astype(np.float32)
    mp = model.init(
        jax.random.PRNGKey(1), jnp.zeros((n, 13)), jnp.zeros((n, keys_per, 32))
    )
    keys = tbl.keys[rng.integers(0, 5000, (n, keys_per))]

    def score(ps, name):
        sess = LookupSession.create(
            ps.get_model_params(name), ps.get_embedding_cache(name, 0)
        )
        emb = sess.lookup_numpy([keys.reshape(-1)])[0].reshape(n, keys_per, 32)
        return np.asarray(model.apply(mp, jnp.asarray(dense), jnp.asarray(emb)))

    s32 = score(ps32, "fp32")
    s4 = score(ps4, "int4")
    labels = (s32 + rng.standard_normal(n) * np.std(s32) > np.median(s32)).astype(int)
    assert abs(_auc(labels, s32) - _auc(labels, s4)) < 1e-2


def test_dynamic_int4_cache_insert_on_miss(tmp_path):
    """Online insert/refresh on a quant_bits=4 table must pack rows before
    the scatter (regression: raw f32 [n, dim] rows scattered into the packed
    [rows, dim//2] uint8 array crashed the first lookup below the hit-rate
    threshold)."""
    from hugectr_backend_tpu import HierParameterServer, LookupSession
    from hugectr_backend_tpu.io.sparse_model import write_sparse_model
    from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table

    tbl = make_synthetic_table(2_000, 16, seed=60)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(json.dumps({"models": [{
        "model": "m",
        "sparse_files": [str(tmp_path / "t0")],
        "embedding_vecsize_per_table": [16],
        "maxnum_catfeature_query_per_table_per_sample": [4],
        "max_batch_size": 64,
        "gpucacheper": 0.2,           # 80% of keys start as cache misses
        "embedding_cache_type": "uvm",  # the example-06 configuration
        "hit_rate_threshold": 1.0,      # miss inserts stay synchronous
        "quant_bits": 4,
    }]}))
    sess = LookupSession.create(ps.get_model_params("m"), ps.get_embedding_cache("m", 0))
    rng = np.random.default_rng(61)
    q = tbl.keys[rng.integers(0, 2_000, 200)]
    out = sess.lookup_numpy([q])[0]   # crashes without the int4 branch
    assert np.abs(out - expected_vector(q, 16)).max() <= 1 / 14 + 1e-5
    # the re-lookup serves the now-cached rows with the same bound
    out2 = sess.lookup_numpy([q])[0]
    assert np.abs(out2 - expected_vector(q, 16)).max() <= 1 / 14 + 1e-5
