"""Blocked [K, SUB, D] device-table layout for huge tables.

A single XLA gather over a many-million-row operand triggers pathological
TPU AOT compile times (measured: 1M rows = seconds, 10M rows > 10 min), so
DeviceTable blocks huge tables and gathers with 2-coordinate indices. These
tests force a tiny block size so the blocked path runs under CPU tests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.tiers.hbm import (
    DeviceTable,
    gather_dequant_xla,
    scatter_rows,
)


@pytest.fixture
def small_blocks(monkeypatch):
    monkeypatch.setenv("HPS_TPU_MAX_GATHER_ROWS", "64")


def test_blocked_layout_created(small_blocks):
    tbl = make_synthetic_table(300, 8, seed=81)
    dt = DeviceTable.from_numpy(tbl.keys, tbl.vectors, quant="fp32")
    assert dt.values.ndim == 3
    assert dt.values.shape[1] == 64  # SUB
    assert dt.values.shape[0] == -(-301 // 64)  # ceil((rows+default)/SUB)


def test_blocked_lookup_exact_fp32(small_blocks):
    tbl = make_synthetic_table(300, 8, seed=82)
    dt = DeviceTable.from_numpy(tbl.keys, tbl.vectors, quant="fp32")
    q = tbl.keys[np.random.default_rng(0).integers(0, 300, 111)]
    slots = dt.slots_for(q)
    out = np.asarray(gather_dequant_xla(dt.values, dt.scales, jnp.asarray(slots)))
    np.testing.assert_allclose(out, expected_vector(q, 8), rtol=1e-6)


def test_blocked_lookup_int8_and_miss(small_blocks):
    tbl = make_synthetic_table(200, 16, seed=83)
    dt = DeviceTable.from_numpy(tbl.keys, tbl.vectors, quant="int8")
    q = np.concatenate([tbl.keys[:5], np.array([-1], np.int64)])
    slots = dt.slots_for(q)
    out = np.asarray(gather_dequant_xla(dt.values, dt.scales, jnp.asarray(slots)))
    ref = expected_vector(tbl.keys[:5], 16)
    absmax = np.abs(ref).max(axis=1, keepdims=True)
    assert np.all(np.abs(out[:5] - ref) <= absmax / (2 * 127.0) + 1e-6)
    np.testing.assert_array_equal(out[5], np.zeros(16, np.float32))


def test_blocked_matches_flat(small_blocks, monkeypatch):
    tbl = make_synthetic_table(500, 8, seed=84)
    dt_blocked = DeviceTable.from_numpy(tbl.keys, tbl.vectors, quant="int8")
    monkeypatch.setenv("HPS_TPU_MAX_GATHER_ROWS", str(1 << 20))
    dt_flat = DeviceTable.from_numpy(tbl.keys, tbl.vectors, quant="int8")
    assert dt_blocked.values.ndim == 3 and dt_flat.values.ndim == 2
    q = tbl.keys[np.random.default_rng(1).integers(0, 500, 77)]
    a = np.asarray(
        gather_dequant_xla(dt_blocked.values, dt_blocked.scales,
                           jnp.asarray(dt_blocked.slots_for(q)))
    )
    b = np.asarray(
        gather_dequant_xla(dt_flat.values, dt_flat.scales,
                           jnp.asarray(dt_flat.slots_for(q)))
    )
    np.testing.assert_array_equal(a, b)


def test_blocked_cache_refresh_writes(small_blocks, tmp_path):
    """Cache refresh must scatter into the blocked layout correctly."""
    from hugectr_backend_tpu import HierParameterServer, LookupSession
    from hugectr_backend_tpu.io.sparse_model import write_sparse_model

    tbl = make_synthetic_table(150, 4, seed=85)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "b",
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
    cache = ps.get_embedding_cache("b", 0)
    # The shared arena is blocked under the tiny cap (views expose flat rows).
    assert cache.tables[0].arena.values.ndim == 3
    new_vec = np.full((1, 4), 2.25, np.float32)
    ps.apply_updates("b", 0, tbl.keys[:1], new_vec)
    cache.refresh(fraction=1.0)
    sess = LookupSession.create(ps.get_model_params("b"), cache)
    out = sess.lookup_numpy([tbl.keys[:1]])[0]
    np.testing.assert_allclose(out, new_vec, rtol=1e-6)
