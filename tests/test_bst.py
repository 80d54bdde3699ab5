"""BST (Behavior Sequence Transformer): mask correctness + fused serving
parity through the shared DIN-signature server (models/bst.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.models import BST


def _init(b, s, d, nd, seed=0):
    model = BST(num_heads=4, num_layers=1, head_widths=(32, 1))
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((b, nd)), jnp.zeros((b, d)), jnp.zeros((b, s, d)),
        jnp.zeros((b,), jnp.int32),
    )
    return model, params


def test_bst_padding_invariance():
    """Logits must not depend on PAD positions of the sequence (the
    attention mask + masked mean must fully exclude them)."""
    b, s, d, nd = 4, 6, 16, 3
    model, params = _init(b, s, d, nd)
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    target = rng.standard_normal((b, d)).astype(np.float32)
    seq = rng.standard_normal((b, s, d)).astype(np.float32)
    seq_len = np.array([0, 2, 4, 6], np.int32)
    y1 = np.asarray(model.apply(params, dense, target, seq, seq_len))
    seq2 = seq.copy()
    for i, n in enumerate(seq_len):
        seq2[i, n:] = 777.0  # scribble over every padded position
    y2 = np.asarray(model.apply(params, dense, target, seq2, seq_len))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)
    assert np.isfinite(y1).all()


def test_bst_position_and_history_sensitivity():
    """Order matters (positional embeddings) and history content matters
    (the transformer actually reads the sequence)."""
    b, s, d, nd = 2, 5, 16, 2
    model, params = _init(b, s, d, nd, seed=1)
    rng = np.random.default_rng(1)
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    target = rng.standard_normal((b, d)).astype(np.float32)
    seq = rng.standard_normal((b, s, d)).astype(np.float32)
    seq_len = np.full(b, s, np.int32)
    y = np.asarray(model.apply(params, dense, target, seq, seq_len))
    y_rev = np.asarray(model.apply(params, dense, target, seq[:, ::-1],
                                   seq_len))
    y_other = np.asarray(model.apply(
        params, dense, target, seq + 0.5, seq_len))
    assert np.abs(y - y_rev).max() > 1e-5   # position-sensitive
    assert np.abs(y - y_other).max() > 1e-5  # content-sensitive


def test_bst_fused_serving(tmp_path):
    """FusedDinServer drives BST (shared (dense, target, seq, seq_len)
    signature): fused logits equal the model over ground-truth embeddings."""
    from hugectr_backend_tpu.serving.pooled import FusedDinServer

    d, s, b, nd = 16, 6, 5, 3
    items = make_synthetic_table(800, d, seed=51)
    hist = make_synthetic_table(1200, d, seed=52)
    write_sparse_model(tmp_path / "t0", items.keys, items.vectors)
    write_sparse_model(tmp_path / "t1", hist.keys, hist.vectors)
    ps = HierParameterServer.create({
        "models": [{
            "model": "bst",
            "sparse_files": [str(tmp_path / "t0"), str(tmp_path / "t1")],
            "embedding_vecsize_per_table": [d, d],
            "maxnum_catfeature_query_per_table_per_sample": [1, s],
            "gpucacheper": 1.0, "embedding_cache_type": "static",
            "quant_bits": 32,
        }]
    })
    model, params = _init(b, s, d, nd, seed=2)
    srv = FusedDinServer(
        ps.get_model_params("bst"), ps.get_embedding_cache("bst", 0),
        model, params, target_table=0, seq_table=1,
    )
    rng = np.random.default_rng(3)
    tkeys = items.keys[rng.integers(0, 800, b)]
    skeys = hist.keys[rng.integers(0, 1200, (b, s))]
    seq_len = rng.integers(0, s + 1, b).astype(np.int32)
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    got = np.asarray(srv.predict(tkeys, skeys, seq_len, dense))

    want = np.asarray(model.apply(
        params, jnp.asarray(dense),
        jnp.asarray(expected_vector(tkeys, d)),
        jnp.asarray(expected_vector(skeys.reshape(-1), d).reshape(b, s, d)),
        jnp.asarray(seq_len),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
