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
