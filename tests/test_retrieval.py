"""Two-tower retrieval serving: fused user-tower + corpus scoring + top-k
(models/two_tower.py, serving/retrieval.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import make_synthetic_table
from hugectr_backend_tpu.models.two_tower import TwoTowerUser
from hugectr_backend_tpu.serving.retrieval import RetrievalServer


def _deploy(tmp_path, name, n_users, n_items, dim, quant_bits):
    users = make_synthetic_table(n_users, dim, seed=31)
    items = make_synthetic_table(n_items, dim, seed=32)
    write_sparse_model(tmp_path / f"{name}_u", users.keys, users.vectors)
    write_sparse_model(tmp_path / f"{name}_i", items.keys, items.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": name,
                    "sparse_files": [str(tmp_path / f"{name}_u"),
                                     str(tmp_path / f"{name}_i")],
                    "embedding_vecsize_per_table": [dim, dim],
                    "maxnum_catfeature_query_per_table_per_sample": [1, 1],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": quant_bits,
                }
            ]
        }
    )
    return ps, users, items


def test_retrieval_exact_fp32(tmp_path):
    """fp32 corpus: scores and top-k must match the brute-force numpy
    reference exactly (f32 matmul both sides)."""
    dim, nd, b, k = 16, 4, 6, 8
    ps, users, items = _deploy(tmp_path, "tt", 800, 600, dim, 32)
    model = TwoTowerUser(widths=(32, dim), normalize=True)
    rng = np.random.default_rng(0)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, 1, dim)))
    srv = RetrievalServer(
        ps.get_model_params("tt"), ps.get_embedding_cache("tt", 0),
        model, mp, user_table=0, item_table=1, k=k,
    )
    ukeys = users.keys[rng.integers(0, 800, b)]
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    got_keys, got_scores = srv.retrieve(ukeys, dense)
    assert got_keys.shape == (b, k) and got_scores.shape == (b, k)

    # Brute force over the ground-truth vectors through the same tower.
    from hugectr_backend_tpu.io.synthetic import expected_vector

    uemb = expected_vector(ukeys, dim).reshape(b, 1, dim)
    q = np.asarray(model.apply(mp, jnp.asarray(dense), jnp.asarray(uemb)))
    corpus_keys = np.sort(items.keys)
    corpus = expected_vector(corpus_keys, dim)
    scores = q @ corpus.T  # [b, n_items]
    order = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_array_equal(got_keys, corpus_keys[order])
    np.testing.assert_allclose(
        got_scores, np.take_along_axis(scores, order, axis=1),
        rtol=1e-4, atol=1e-5,
    )
    # Scores are descending.
    assert (np.diff(got_scores, axis=1) <= 1e-6).all()


def test_retrieval_int8_recall(tmp_path):
    """int8 corpus (bf16 MXU scoring + columnwise dequant scales): high
    recall vs the fp32 brute-force top-k, scores within quantization
    tolerance."""
    dim, nd, b, k = 16, 0, 4, 20
    ps, users, items = _deploy(tmp_path, "tq", 500, 400, dim, 8)
    model = TwoTowerUser(widths=(32, dim), normalize=True)
    rng = np.random.default_rng(1)
    mp = model.init(jax.random.PRNGKey(1), jnp.zeros((b, nd)),
                    jnp.zeros((b, 1, dim)))
    srv = RetrievalServer(
        ps.get_model_params("tq"), ps.get_embedding_cache("tq", 0),
        model, mp, k=k,
    )
    ukeys = users.keys[rng.integers(0, 500, b)]
    dense = np.zeros((b, nd), np.float32)
    got_keys, got_scores = srv.retrieve(ukeys, dense)

    from hugectr_backend_tpu.io.synthetic import expected_vector

    uemb = expected_vector(ukeys, dim).reshape(b, 1, dim)
    q = np.asarray(model.apply(mp, jnp.asarray(dense), jnp.asarray(uemb)))
    corpus_keys = np.sort(items.keys)
    corpus = expected_vector(corpus_keys, dim)
    scores = q @ corpus.T
    want_top = corpus_keys[np.argsort(-scores, axis=1)[:, :k]]
    recalls = [
        len(set(got_keys[i]) & set(want_top[i])) / k for i in range(b)
    ]
    assert min(recalls) >= 0.8, recalls
    # Retrieved scores agree with the exact score of the same item.
    key_pos = {int(kk): j for j, kk in enumerate(corpus_keys)}
    for i in range(b):
        exact = scores[i, [key_pos[int(kk)] for kk in got_keys[i]]]
        np.testing.assert_allclose(got_scores[i], exact, rtol=0, atol=0.05)


def test_retrieval_rejects_int4(tmp_path):
    dim = 16
    ps, *_ = _deploy(tmp_path, "t4", 300, 300, dim, 4)
    model = TwoTowerUser(widths=(16, dim))
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 0)),
                    jnp.zeros((2, 1, dim)))
    with pytest.raises(ValueError, match="int4"):
        RetrievalServer(
            ps.get_model_params("t4"), ps.get_embedding_cache("t4", 0),
            model, mp,
        )
