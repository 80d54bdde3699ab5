"""Sharded fused serving: multi-table DCN-v2 over a (data x table) mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.models.dcn import DCNv2
from hugectr_backend_tpu.parallel.fused_sharded import make_sharded_dcn_server
from hugectr_backend_tpu.parallel.mesh import make_mesh
from hugectr_backend_tpu.parallel.sharded_table import ShardedTable


@pytest.fixture(scope="module")
def sharded_dcn(cpu_devices):
    mesh = make_mesh(table=4, data=2)
    tbls = [make_synthetic_table(600 + 100 * t, 8, seed=120 + t) for t in range(3)]
    stables = [
        ShardedTable.from_numpy(t.keys, t.vectors, mesh, quant="int8") for t in tbls
    ]
    keys_per_sample = [1, 1, 2]
    b, nd = 8, 4
    model = DCNv2(num_cross_layers=2, cross_rank=8, deep_widths=(32,), head_widths=(16, 1))
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)), jnp.zeros((b, 4, 8)))
    srv = make_sharded_dcn_server(mesh, stables, keys_per_sample, model, mp)
    return srv, tbls, mesh, model, mp


def test_sharded_dcn_forward(sharded_dcn):
    srv, tbls, mesh, model, mp = sharded_dcn
    rng = np.random.default_rng(0)
    b = 8
    keys = [
        tbls[0].keys[rng.integers(0, 600, (b, 1))],
        tbls[1].keys[rng.integers(0, 700, (b, 1))],
        tbls[2].keys[rng.integers(0, 800, (b, 2))],
    ]
    dense = rng.standard_normal((b, 4)).astype(np.float32)
    logits = np.asarray(srv.predict(keys, dense))
    assert logits.shape == (b,) and np.isfinite(logits).all()

    # Parity: identical logits vs single-device unsharded execution with the
    # SAME quantized tables (int8 round-trip must match across paths).
    embs = []
    for t, k in enumerate(keys):
        flat = np.asarray(
            __import__("hugectr_backend_tpu.parallel.sharded_table", fromlist=["sharded_lookup"]).sharded_lookup(
                srv.tables[t], jnp.asarray(srv.tables[t].slots_for(k.reshape(-1)))
            )
        )
        embs.append(flat.reshape(b, -1, 8))
    emb = np.concatenate(embs, axis=1)
    ref = np.asarray(model.apply(mp, jnp.asarray(dense), jnp.asarray(emb)))
    np.testing.assert_allclose(logits, ref, rtol=2e-2, atol=2e-2)


def test_sharded_dcn_miss_defaults(sharded_dcn):
    srv, tbls, _, _, _ = sharded_dcn
    b = 4
    keys = [
        np.full((b, 1), -1, np.int64),  # all misses
        tbls[1].keys[:b].reshape(b, 1),
        tbls[2].keys[: 2 * b].reshape(b, 2),
    ]
    logits = np.asarray(srv.predict(keys, np.zeros((b, 4), np.float32)))
    assert np.isfinite(logits).all()


def test_sharded_dcn_psum_vs_a2a_parity(sharded_dcn, cpu_devices):
    """Both collective strategies must produce identical logits."""
    from hugectr_backend_tpu.parallel.fused_sharded import ShardedFusedServer

    srv, tbls, mesh, model, mp = sharded_dcn

    def assemble(dense, embs):
        emb = jnp.concatenate(embs, axis=1)
        return model.apply(mp, dense, emb)

    srv_psum = ShardedFusedServer(
        mesh, srv.tables, srv.keys_per_sample, assemble, strategy="psum"
    )
    rng = np.random.default_rng(3)
    b = 8
    keys = [
        tbls[0].keys[rng.integers(0, 600, (b, 1))],
        tbls[1].keys[rng.integers(0, 700, (b, 1))],
        tbls[2].keys[rng.integers(0, 800, (b, 2))],
    ]
    dense = rng.standard_normal((b, 4)).astype(np.float32)
    a2a = np.asarray(srv.predict(keys, dense))      # default all_to_all
    psum = np.asarray(srv_psum.predict(keys, dense))
    np.testing.assert_allclose(a2a, psum, rtol=1e-5, atol=1e-5)
