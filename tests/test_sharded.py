"""Multi-chip sharded-table lookup on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.parallel.mesh import make_mesh
from hugectr_backend_tpu.parallel.sharded_table import ShardedTable, sharded_lookup


@pytest.fixture(scope="module")
def mesh8(cpu_devices):
    return make_mesh(table=8, data=1)


@pytest.fixture(scope="module")
def mesh_2x4(cpu_devices):
    return make_mesh(table=4, data=2)


def test_sharded_fp32_lookup_exact(mesh8):
    tbl = make_synthetic_table(1000, 16, seed=31)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="fp32")
    # Each shard holds rows_padded/8 rows.
    assert st.rows_padded % 8 == 0
    q = tbl.keys[np.random.default_rng(0).integers(0, 1000, 333)]
    slots = st.slots_for(q)
    out = np.asarray(sharded_lookup(st, jnp.asarray(slots)))
    np.testing.assert_allclose(out, expected_vector(q, 16), rtol=1e-6)


def test_sharded_miss_returns_default(mesh8):
    tbl = make_synthetic_table(100, 8, seed=32)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="fp32")
    slots = st.slots_for(np.array([-1, 10**12], dtype=np.int64))
    out = np.asarray(sharded_lookup(st, jnp.asarray(slots)))
    np.testing.assert_array_equal(out, np.zeros((2, 8), np.float32))


def test_sharded_int8_quantized(mesh8):
    tbl = make_synthetic_table(2000, 32, seed=33)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="int8")
    q = tbl.keys[:500]
    out = np.asarray(sharded_lookup(st, jnp.asarray(st.slots_for(q))))
    ref = expected_vector(q, 32)
    absmax = np.abs(ref).max(axis=1, keepdims=True)
    assert np.all(np.abs(out - ref) <= absmax / (2 * 127.0) + 1e-6)


def test_sharded_on_data_table_mesh(mesh_2x4):
    tbl = make_synthetic_table(512, 16, seed=34)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh_2x4, quant="fp32")
    q = tbl.keys[:64]
    out = np.asarray(sharded_lookup(st, jnp.asarray(st.slots_for(q))))
    np.testing.assert_allclose(out, expected_vector(q, 16), rtol=1e-6)


def test_shard_memory_is_split(mesh8):
    tbl = make_synthetic_table(8000, 64, seed=35)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="int8")
    total = st.values.size * st.values.dtype.itemsize + st.scales.size * 4
    assert st.nbytes_per_shard() == total // 8
    # The values array is physically distributed over the table axis.
    assert len(st.values.sharding.device_set) == 8


# ---------------------------------------------------------------- all_to_all

def test_a2a_matches_psum_and_truth(mesh8):
    tbl = make_synthetic_table(1000, 16, seed=41)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="fp32")
    q = tbl.keys[np.random.default_rng(1).integers(0, 1000, 333)]
    slots = st.slots_for(q)
    a2a = np.asarray(sharded_lookup(st, slots, strategy="all_to_all"))
    psum = np.asarray(sharded_lookup(st, jnp.asarray(slots)))
    np.testing.assert_allclose(a2a, expected_vector(q, 16), rtol=1e-6)
    np.testing.assert_allclose(a2a, psum, rtol=1e-6)


def test_a2a_duplicates_dedup(mesh8):
    """A hot key repeated many times costs one bucket entry, not N."""
    from hugectr_backend_tpu.parallel.sharded_table import plan_all_to_all

    tbl = make_synthetic_table(800, 8, seed=42)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="fp32")
    hot = tbl.keys[3]
    q = np.concatenate([np.full(500, hot, np.int64), tbl.keys[:20]])
    slots = st.slots_for(q)
    buckets, expand = plan_all_to_all(slots, 8, st.rows_padded // 8)
    assert buckets.shape[1] <= 32  # ~21 unique slots, pow2-bucketed
    out = np.asarray(sharded_lookup(st, slots, strategy="all_to_all"))
    np.testing.assert_allclose(out, expected_vector(q, 8), rtol=1e-6)


def test_a2a_skewed_all_on_one_shard(mesh8):
    """Adversarial skew: every queried slot owned by shard 0 — capacity
    grows to the unique count, correctness unaffected."""
    tbl = make_synthetic_table(4000, 8, seed=43)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="fp32")
    shard_rows = st.rows_padded // 8
    # slots 0..shard_rows-1 all live on shard 0; map back to their keys.
    n = min(100, shard_rows)
    keys = st.index.sorted_keys[:n]
    slots = st.slots_for(keys)
    assert (slots // shard_rows == 0).all()
    out = np.asarray(sharded_lookup(st, slots, strategy="all_to_all"))
    np.testing.assert_allclose(out, expected_vector(keys, 8), rtol=1e-6)


def test_a2a_misses_and_int8(mesh8):
    tbl = make_synthetic_table(2000, 32, seed=44)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="int8")
    q = np.concatenate([tbl.keys[:50], np.array([-5, 10**12], np.int64)])
    out = np.asarray(sharded_lookup(st, st.slots_for(q), strategy="all_to_all"))
    ref = expected_vector(tbl.keys[:50], 32)
    absmax = np.abs(ref).max(axis=1, keepdims=True)
    assert np.all(np.abs(out[:50] - ref) <= absmax / (2 * 127.0) + 1e-6)
    np.testing.assert_array_equal(out[50:], np.zeros((2, 32), np.float32))


def test_a2a_on_data_table_mesh(mesh_2x4):
    tbl = make_synthetic_table(512, 16, seed=45)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh_2x4, quant="fp32")
    q = tbl.keys[np.random.default_rng(2).integers(0, 512, 77)]
    out = np.asarray(sharded_lookup(st, st.slots_for(q), strategy="all_to_all"))
    np.testing.assert_allclose(out, expected_vector(q, 16), rtol=1e-6)


def test_sharded_int4_both_strategies(mesh8):
    """int4 nibble-packed sharded tables (the capacity pairing: sharding is
    the huge-table path, int4 is the huge-table flavor): both strategies
    unpack on-device and agree with the host dequant bound."""
    tbl = make_synthetic_table(3000, 16, seed=36)
    st = ShardedTable.from_numpy(tbl.keys, tbl.vectors, mesh8, quant="int4")
    assert st.values.dtype == jnp.uint8 and st.values.shape[1] == 8
    q = tbl.keys[np.random.default_rng(6).integers(0, 3000, 400)]
    slots = st.slots_for(q)
    ref = expected_vector(q, 16)
    for strategy in ("psum", "all_to_all"):
        out = np.asarray(sharded_lookup(st, jnp.asarray(slots),
                                        strategy=strategy))
        assert np.abs(out - ref).max() <= 1 / 14 + 1e-5, strategy
    # misses -> zeros via the zero-packed padding rows
    mslots = st.slots_for(np.array([-7, 10**12], np.int64))
    out = np.asarray(sharded_lookup(st, jnp.asarray(mslots)))
    np.testing.assert_array_equal(out, np.zeros((2, 16), np.float32))
