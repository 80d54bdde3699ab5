"""Variable-length pooled lookups + fused DIN serving (BASELINE config 4)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.models.din import DIN
from hugectr_backend_tpu.serving.pooled import FusedDinServer, pooled_lookup


@pytest.fixture(scope="module")
def din_deploy(tmp_path_factory):
    root = tmp_path_factory.mktemp("din_repo")
    target_tbl = make_synthetic_table(800, 16, seed=51)
    seq_tbl = make_synthetic_table(1200, 16, seed=52)
    write_sparse_model(root / "target", target_tbl.keys, target_tbl.vectors)
    write_sparse_model(root / "seq", seq_tbl.keys, seq_tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "din",
                    "sparse_files": [str(root / "target"), str(root / "seq")],
                    "embedding_vecsize_per_table": [16, 16],
                    "maxnum_catfeature_query_per_table_per_sample": [1, 20],
                    "embedding_table_names": ["target", "behavior"],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                    "max_batch_size": 32,
                }
            ]
        }
    )
    return ps, target_tbl, seq_tbl


def test_pooled_sum_masks_padding(din_deploy):
    ps, _, seq_tbl = din_deploy
    cache = ps.get_embedding_cache("din", 0)
    b, s = 3, 6
    rng = np.random.default_rng(0)
    keys = seq_tbl.keys[rng.integers(0, 1200, (b, s))]
    seq_len = np.array([2, 6, 0], np.int32)
    out = np.asarray(pooled_lookup(cache, 1, keys, seq_len, mode="sum"))
    ref = expected_vector(keys.reshape(-1), 16).reshape(b, s, 16)
    for i in range(b):
        np.testing.assert_allclose(
            out[i], ref[i, : seq_len[i]].sum(axis=0), rtol=1e-5, atol=1e-6
        )


def test_pooled_mean(din_deploy):
    ps, _, seq_tbl = din_deploy
    cache = ps.get_embedding_cache("din", 0)
    keys = seq_tbl.keys[:8].reshape(2, 4)
    seq_len = np.array([4, 3], np.int32)
    out = np.asarray(pooled_lookup(cache, 1, keys, seq_len, mode="mean"))
    ref = expected_vector(keys.reshape(-1), 16).reshape(2, 4, 16)
    np.testing.assert_allclose(out[0], ref[0].mean(axis=0), rtol=1e-5)
    np.testing.assert_allclose(out[1], ref[1, :3].mean(axis=0), rtol=1e-5)


def test_pooled_unknown_keys_contribute_default(din_deploy):
    ps, _, seq_tbl = din_deploy
    cache = ps.get_embedding_cache("din", 0)
    keys = np.array([[seq_tbl.keys[0], -999]], np.int64)  # 1 known + 1 miss
    out = np.asarray(pooled_lookup(cache, 1, keys, np.array([2], np.int32)))
    # miss adds the default row (zeros): sum == the known vector alone
    np.testing.assert_allclose(
        out[0], expected_vector(seq_tbl.keys[:1], 16)[0], rtol=1e-5
    )


def test_fused_din_end_to_end(din_deploy):
    ps, target_tbl, seq_tbl = din_deploy
    params = ps.get_model_params("din")
    cache = ps.get_embedding_cache("din", 0)
    b, s, d, nd = 4, 20, 16, 8
    model = DIN(mlp_widths=(32, 1), att_hidden=8)
    rng = np.random.default_rng(1)
    mp = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, nd)), jnp.zeros((b, d)), jnp.zeros((b, s, d)),
        jnp.ones((b,), jnp.int32),
    )
    srv = FusedDinServer(params, cache, model, mp)
    tkeys = target_tbl.keys[rng.integers(0, 800, b)]
    skeys = seq_tbl.keys[rng.integers(0, 1200, (b, s))]
    seq_len = rng.integers(1, s + 1, b).astype(np.int32)
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    logits = np.asarray(srv.predict(tkeys, skeys, seq_len, dense))
    assert logits.shape == (b,)
    assert np.isfinite(logits).all()
    # Masking matters: zeroing the tail beyond seq_len must not change output.
    skeys2 = skeys.copy()
    for i in range(b):
        skeys2[i, seq_len[i]:] = -12345  # all-miss padding
    logits2 = np.asarray(srv.predict(tkeys, skeys2, seq_len, dense))
    np.testing.assert_allclose(logits, logits2, rtol=1e-4, atol=1e-5)


def test_pooled_solo_host_scales(tmp_path, monkeypatch):
    """Force the 'solo' arena kind (host-side scales) and check the pooled
    path routes per-key scales as a program input, numerically identical to
    the device-scales route (the production big-table policy)."""
    monkeypatch.setenv("HPS_TPU_ONEHOT_MAX_ROWS", "4")
    monkeypatch.setenv("HPS_TPU_ARENA_MEMBER_MAX_ROWS", "8")
    tbl = make_synthetic_table(300, 16, seed=77)
    write_sparse_model(tmp_path / "t", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "m",
                    "sparse_files": [str(tmp_path / "t")],
                    "embedding_vecsize_per_table": [16],
                    "maxnum_catfeature_query_per_table_per_sample": [8],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 8,
                    "max_batch_size": 32,
                }
            ]
        }
    )
    cache = ps.get_embedding_cache("m", 0)
    table = cache.tables[0]
    arena = getattr(table, "arena", None)
    assert arena is not None and arena.scales_host is not None, (
        "test precondition: table must land on a host-scales arena kind"
    )
    b, s = 4, 5
    rng = np.random.default_rng(3)
    keys = tbl.keys[rng.integers(0, 300, (b, s))]
    seq_len = np.array([5, 2, 0, 4], np.int32)
    out = np.asarray(pooled_lookup(cache, 0, keys, seq_len, mode="mean"))
    ref = expected_vector(keys.reshape(-1), 16).reshape(b, s, 16)
    for i in range(b):
        n = int(seq_len[i])
        want = ref[i, :n].mean(axis=0) if n else np.zeros(16)
        np.testing.assert_allclose(out[i], want, rtol=0.02, atol=0.02)


def test_din_empty_history_pools_to_zero():
    """seq_len == 0: softmax over a fully-masked score row returns UNIFORM
    weights — without the post-softmax mask, arbitrary padding-position
    embeddings averaged into the prediction. An empty history must pool to
    zeros."""
    import jax
    import jax.numpy as jnp

    from hugectr_backend_tpu.models.din import DinAttentionPool

    rng = np.random.default_rng(0)
    b, s, d = 4, 6, 8
    target = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    seq = jnp.asarray(rng.standard_normal((b, s, d)) * 100, jnp.float32)
    seq_len = jnp.asarray([0, 3, 0, 6], jnp.int32)
    m = DinAttentionPool(hidden=8)
    pooled = m.apply(m.init(jax.random.PRNGKey(0), target, seq, seq_len),
                     target, seq, seq_len)
    pooled = np.asarray(pooled)
    np.testing.assert_array_equal(pooled[0], 0.0)
    np.testing.assert_array_equal(pooled[2], 0.0)
    assert np.abs(pooled[1]).max() > 0 and np.abs(pooled[3]).max() > 0
