"""AUC-parity gate (BASELINE: int8 vs fp32 AUC delta < 0.001), quantized
dense layers, and the checkpoint/resume (initialize_after_startup=false) path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer, LookupSession
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import make_synthetic_table
from hugectr_backend_tpu.models.dlrm import DLRM


def _auc(labels: np.ndarray, scores: np.ndarray) -> float:
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def _deploy(tmp_path, tbl, quant_bits, name):
    write_sparse_model(tmp_path / f"t_{name}", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": name,
                    "sparse_files": [str(tmp_path / f"t_{name}")],
                    "embedding_vecsize_per_table": [32],
                    "maxnum_catfeature_query_per_table_per_sample": [8],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": quant_bits,
                    "max_batch_size": 4096,
                }
            ]
        }
    )
    return ps


def test_auc_parity_int8_vs_fp32(tmp_path):
    """The BASELINE acceptance gate: serving from int8 row-quantized tables
    must keep model AUC within 0.001 of fp32 serving."""
    rng = np.random.default_rng(0)
    tbl = make_synthetic_table(5000, 32, seed=100, deterministic_fn=False)
    ps32 = _deploy(tmp_path, tbl, 32, "fp32")
    ps8 = _deploy(tmp_path, tbl, 8, "int8")

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
    s8 = score(ps8, "int8")
    # Labels from an independent teacher signal correlated with the scores.
    labels = (s32 + rng.standard_normal(n) * np.std(s32) > np.median(s32)).astype(int)
    auc32, auc8 = _auc(labels, s32), _auc(labels, s8)
    assert abs(auc32 - auc8) < 1e-3, f"AUC drift {auc32} vs {auc8}"
    # And raw score agreement is tight.
    denom = np.abs(s32).max() + 1e-9
    assert np.abs(s32 - s8).max() / denom < 0.05


def test_quant_dense_close_to_fp32():
    from hugectr_backend_tpu.models.quant_dense import quantize_dense_params
    from hugectr_backend_tpu.models.dlrm import MLP

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    ref = MLP(widths=(64, 16), compute_dtype=jnp.float32)
    p = ref.init(jax.random.PRNGKey(0), x)
    y_ref = np.asarray(ref.apply(p, x))

    # e4m3 has 3 mantissa bits (~6% step) so its tolerance is wider; int8 with
    # per-column scales stays within ~3%.
    for fmt, tol in (("int8", 0.03), ("fp8", 0.09), ("w8a8", 0.05)):
        qmlp = MLP(widths=(64, 16), compute_dtype=jnp.float32, quant_fmt=fmt)
        qp = {"params": _to_quant_tree(p["params"], fmt)}
        y_q = np.asarray(qmlp.apply(qp, x))
        rel = np.abs(y_q - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        assert rel < tol, f"{fmt}: rel err {rel}"


def _to_quant_tree(params, fmt):
    from hugectr_backend_tpu.models.quant_dense import quantize_dense_params

    # MLP uses Dense_0, Dense_1...; QuantMLP uses QuantDense_0...
    out = {}
    for i, (k, v) in enumerate(sorted(params.items())):
        out[f"QuantDense_{i}"] = quantize_dense_params(v, fmt)
    return out


def test_quant_dlrm_whole_model_parity():
    """The config-selectable quantized dense path: DLRM(quant_fmt=...) +
    quantize_model_params converts a trained fp32 checkpoint in one call and
    stays close to the fp32 logits (the serving analogue of the reference's
    fp8_quant flag, reference backend.cpp:500-504)."""
    from hugectr_backend_tpu.models.dlrm import DLRM
    from hugectr_backend_tpu.models.quant_dense import quantize_model_params

    B, T, D = 32, 8, 16
    model = DLRM(bottom_widths=(32, D), top_widths=(32, 16, 1),
                 compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.standard_normal((B, 13)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dense, emb)
    ref = np.asarray(model.apply(params, dense, emb))
    for fmt, tol in (("int8", 0.03), ("fp8", 0.12), ("w8a8", 0.06)):
        qm = DLRM(bottom_widths=(32, D), top_widths=(32, 16, 1),
                  compute_dtype=jnp.float32, quant_fmt=fmt)
        out = np.asarray(qm.apply(quantize_model_params(params, fmt),
                                  dense, emb))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < tol, f"{fmt}: rel err {rel}"


def test_resume_from_persistent_tier(tmp_path):
    """initialize_after_startup=false: a restarted PS serves from the durable
    SSD tier without re-reading the sparse model files (reference
    docs/hierarchical_parameter_server.md:488)."""
    from hugectr_backend_tpu.io.synthetic import expected_vector

    tbl = make_synthetic_table(400, 8, seed=101)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    base_cfg = {
        "persistent_db": {"type": "rocks_db", "path": str(tmp_path / "ssd")},
        "models": [
            {
                "model": "m",
                "sparse_files": [str(tmp_path / "t0")],
                "embedding_vecsize_per_table": [8],
                "maxnum_catfeature_query_per_table_per_sample": [4],
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
                "quant_bits": 32,
            }
        ],
    }
    ps1 = HierParameterServer.create(base_cfg)  # cold start, materializes SSD
    del ps1
    # Simulate restart with the model files GONE: only the SSD tier remains.
    import shutil

    shutil.rmtree(tmp_path / "t0")
    cfg2 = dict(base_cfg)
    cfg2["volatile_db"] = {"initialize_after_startup": False}
    ps2 = HierParameterServer.create(cfg2)
    sess = LookupSession.create(ps2.get_model_params("m"), ps2.get_embedding_cache("m", 0))
    q = tbl.keys[:25]
    out = sess.lookup_numpy([q])[0]
    np.testing.assert_allclose(out, expected_vector(q, 8), rtol=1e-6)


def test_reload_refreshes_promoted_dram_rows(tmp_path):
    """Version re-load must overwrite DRAM rows that were PROMOTED during
    the old version's serving (write-backs outside the fresh insert
    window) — the DRAM-first tier merge would otherwise serve v1 vectors
    for them forever."""
    import json

    import numpy as np

    from hugectr_backend_tpu import HierParameterServer
    from hugectr_backend_tpu.io.sparse_model import write_sparse_model
    from hugectr_backend_tpu.io.synthetic import make_synthetic_table
    from hugectr_backend_tpu.ps.parameter_server import table_tag

    dim = 8
    tbl = make_synthetic_table(100, dim, seed=41)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create({
        "volatile_db": {"initial_cache_rate": 0.1},
        "models": [{
            "model": "m", "sparse_files": [str(tmp_path / "t0")],
            "embedding_vecsize_per_table": [dim],
            "maxnum_catfeature_query_per_table_per_sample": [1],
            "gpucacheper": 1.0, "embedding_cache_type": "static",
            "quant_bits": 32,
        }],
    })
    params = ps.get_model_params("m")
    tag = table_tag("m", params.table_name(0))
    # Simulate an old-version write-back promotion OUTSIDE the 10% window:
    # key K sits in DRAM with a stale vector.
    k = tbl.keys[-1:]
    ps.dram.insert(tag, k, np.full((1, dim), -7.0, np.float32))
    # Re-load the (new-version) files: the promoted row must be refreshed
    # to the file's value, not left serving -7.
    ps.update_database_per_model(params)
    vecs, found = ps.dram.query(tag, k)
    assert found.all()
    from hugectr_backend_tpu.io.synthetic import expected_vector

    np.testing.assert_allclose(vecs, expected_vector(k, dim), rtol=1e-6)
