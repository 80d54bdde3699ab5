"""MMoE multi-task serving (models/mmoe.py, make_mmoe_server)."""

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.models import MMoE
from hugectr_backend_tpu.serving.program import make_mmoe_server


def test_mmoe_gates_mix_experts():
    """Gates are a proper softmax mixture: with num_experts=1 the gate is
    degenerate and both tasks see the same expert output; with more
    experts the tasks can diverge."""
    b, t, d, nd = 4, 3, 8, 2
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.standard_normal((b, nd)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    model = MMoE(num_experts=4, num_tasks=3, expert_widths=(16, 8),
                 tower_widths=(8, 1))
    p = model.init(jax.random.PRNGKey(0), dense, emb)
    y = np.asarray(model.apply(p, dense, emb))
    assert y.shape == (b, 3) and np.isfinite(y).all()
    # Task outputs differ (independent towers + gates).
    assert np.abs(y[:, 0] - y[:, 1]).max() > 1e-6


def test_mmoe_fused_serving(tmp_path):
    b, nd, d = 5, 3, 8
    tbls = [make_synthetic_table(300 + 100 * i, d, seed=60 + i)
            for i in range(3)]
    for i, tbl in enumerate(tbls):
        write_sparse_model(tmp_path / f"t{i}", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create({
        "models": [{
            "model": "mmoe",
            "sparse_files": [str(tmp_path / f"t{i}") for i in range(3)],
            "embedding_vecsize_per_table": [d] * 3,
            "maxnum_catfeature_query_per_table_per_sample": [1, 1, 2],
            "gpucacheper": 1.0, "embedding_cache_type": "static",
            "quant_bits": 32,
        }]
    })
    model = MMoE(num_experts=2, num_tasks=2, expert_widths=(16,),
                 tower_widths=(8, 1))
    rng = np.random.default_rng(1)
    mp = model.init(jax.random.PRNGKey(1), jnp.zeros((b, nd)),
                    jnp.zeros((b, 4, d)))
    srv = make_mmoe_server(ps.get_model_params("mmoe"),
                           ps.get_embedding_cache("mmoe", 0), model, mp)
    keys = [
        tbls[0].keys[rng.integers(0, 300, (b, 1))],
        tbls[1].keys[rng.integers(0, 400, (b, 1))],
        tbls[2].keys[rng.integers(0, 500, (b, 2))],
    ]
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    got = np.asarray(srv.predict(keys, dense))
    assert got.shape == (b, 2)
    emb_true = np.concatenate([
        expected_vector(keys[0].reshape(-1), d).reshape(b, 1, d),
        expected_vector(keys[1].reshape(-1), d).reshape(b, 1, d),
        expected_vector(keys[2].reshape(-1), d).reshape(b, 2, d),
    ], axis=1)
    want = np.asarray(model.apply(mp, jnp.asarray(dense),
                                  jnp.asarray(emb_true)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
