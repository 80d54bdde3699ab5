"""Fused WDL / DCN-v2 serving (multi-table lookup + dense in one program)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.models.dcn import DCNv2
from hugectr_backend_tpu.models.wdl import WideAndDeep
from hugectr_backend_tpu.serving.program import make_dcn_server, make_wdl_server


@pytest.fixture(scope="module")
def wdl_deploy(tmp_path_factory):
    """The reference WDL demo shape: 2 tables, vecsize [1, 16], 2+26 keys."""
    root = tmp_path_factory.mktemp("wdl_repo")
    wide = make_synthetic_table(400, 1, seed=61)
    deep = make_synthetic_table(900, 16, seed=62)
    write_sparse_model(root / "wide", wide.keys, wide.vectors)
    write_sparse_model(root / "deep", deep.keys, deep.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "wdl",
                    "sparse_files": [str(root / "wide"), str(root / "deep")],
                    "embedding_vecsize_per_table": [1, 16],
                    "maxnum_catfeature_query_per_table_per_sample": [2, 26],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                }
            ]
        }
    )
    return ps, wide, deep


def test_fused_wdl(wdl_deploy):
    ps, wide, deep = wdl_deploy
    b, nd = 4, 13
    model = WideAndDeep(deep_widths=(64, 1))
    rng = np.random.default_rng(2)
    mp = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, nd)), jnp.zeros((b, 2, 1)), jnp.zeros((b, 26, 16)),
    )
    srv = make_wdl_server(
        ps.get_model_params("wdl"), ps.get_embedding_cache("wdl", 0), model, mp
    )
    wkeys = wide.keys[rng.integers(0, 400, (b, 2))]
    dkeys = deep.keys[rng.integers(0, 900, (b, 26))]
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    logits = np.asarray(srv.predict([wkeys, dkeys], dense))
    assert logits.shape == (b,) and np.isfinite(logits).all()
    # The wide part contributes sum of its scalar embeddings — check the
    # contribution is exactly reflected by shifting wide keys to misses.
    logits_nowide = np.asarray(
        srv.predict([np.full((b, 2), -1, np.int64), dkeys], dense)
    )
    wide_contrib = expected_vector(wkeys.reshape(-1), 1).reshape(b, 2).sum(axis=1)
    np.testing.assert_allclose(logits - logits_nowide, wide_contrib, rtol=1e-3, atol=1e-4)


def test_fused_dcn(tmp_path):
    tbls = [make_synthetic_table(300 + 100 * t, 8, seed=70 + t) for t in range(3)]
    for t, tbl in enumerate(tbls):
        write_sparse_model(tmp_path / f"t{t}", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "dcn",
                    "sparse_files": [str(tmp_path / f"t{t}") for t in range(3)],
                    "embedding_vecsize_per_table": [8, 8, 8],
                    "maxnum_catfeature_query_per_table_per_sample": [1, 1, 2],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                }
            ]
        }
    )
    b, nd = 5, 4
    model = DCNv2(num_cross_layers=2, cross_rank=8, deep_widths=(32,), head_widths=(16, 1))
    rng = np.random.default_rng(3)
    mp = model.init(
        jax.random.PRNGKey(0), jnp.zeros((b, nd)), jnp.zeros((b, 4, 8))
    )
    srv = make_dcn_server(
        ps.get_model_params("dcn"), ps.get_embedding_cache("dcn", 0), model, mp
    )
    keys = [
        tbls[0].keys[rng.integers(0, 300, (b, 1))],
        tbls[1].keys[rng.integers(0, 400, (b, 1))],
        tbls[2].keys[rng.integers(0, 500, (b, 2))],
    ]
    logits = np.asarray(srv.predict(keys, rng.standard_normal((b, nd)).astype(np.float32)))
    assert logits.shape == (b,) and np.isfinite(logits).all()
    # Deterministic: same keys + same dense -> same logits.
    logits2 = np.asarray(srv.predict(keys, np.zeros((b, nd), np.float32)))
    logits3 = np.asarray(srv.predict(keys, np.zeros((b, nd), np.float32)))
    np.testing.assert_allclose(logits2, logits3, rtol=1e-5)


def test_fused_multi_table_dlrm_chunked(tmp_path_factory):
    """make_dlrm_multi_server: Criteo-style layout (T tables x 1 key, uniform
    dim) hands the dense graph EmbParts — output must equal the plain DLRM
    forward over the stacked ground-truth embeddings (reference serves this
    through the HPS->dense ensemble, samples/hps-triton-ensemble)."""
    from hugectr_backend_tpu.models.dlrm import DLRM
    from hugectr_backend_tpu.serving.program import make_dlrm_multi_server

    root = tmp_path_factory.mktemp("dlrm_multi")
    dim, ntab = 8, 5
    tbls = [make_synthetic_table(300 + 100 * t, dim, seed=70 + t)
            for t in range(ntab)]
    for t, tbl in enumerate(tbls):
        write_sparse_model(root / f"t{t}", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "dlrm",
                    "sparse_files": [str(root / f"t{t}") for t in range(ntab)],
                    "embedding_vecsize_per_table": [dim] * ntab,
                    "maxnum_catfeature_query_per_table_per_sample": [1] * ntab,
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                }
            ]
        }
    )
    b, nd = 6, 4
    model = DLRM(bottom_widths=(16, dim), top_widths=(16, 1))
    rng = np.random.default_rng(4)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, ntab, dim)))
    srv = make_dlrm_multi_server(
        ps.get_model_params("dlrm"), ps.get_embedding_cache("dlrm", 0),
        model, mp)
    keys = [tbls[t].keys[rng.integers(0, 200, (b, 1))] for t in range(ntab)]
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    got = np.asarray(srv.predict(keys, dense))

    emb_true = np.stack(
        [expected_vector(keys[t].reshape(-1), dim) for t in range(ntab)],
        axis=1)
    want = np.asarray(model.apply(mp, jnp.asarray(dense),
                                  jnp.asarray(emb_true)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # Mixed keys-per-table falls back to the stacked tensor path.
    ps2 = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "dlrm2",
                    "sparse_files": [str(root / "t0"), str(root / "t1")],
                    "embedding_vecsize_per_table": [dim, dim],
                    "maxnum_catfeature_query_per_table_per_sample": [1, 2],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                }
            ]
        }
    )
    model2 = DLRM(bottom_widths=(16, dim), top_widths=(16, 1))
    mp2 = model2.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                      jnp.zeros((b, 3, dim)))
    srv2 = make_dlrm_multi_server(
        ps2.get_model_params("dlrm2"), ps2.get_embedding_cache("dlrm2", 0),
        model2, mp2)
    keys2 = [tbls[0].keys[rng.integers(0, 200, (b, 1))],
             tbls[1].keys[rng.integers(0, 200, (b, 2))]]
    got2 = np.asarray(srv2.predict(keys2, dense))
    emb2 = np.concatenate(
        [expected_vector(keys2[0].reshape(-1), dim).reshape(b, 1, dim),
         expected_vector(keys2[1].reshape(-1), dim).reshape(b, 2, dim)],
        axis=1)
    want2 = np.asarray(model2.apply(mp2, jnp.asarray(dense),
                                    jnp.asarray(emb2)))
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-5)


def test_fused_deepfm_serving(tmp_path_factory):
    """DeepFM (FM second-order + deep MLP, shared embeddings): fused
    serving output equals the model applied to ground-truth embeddings,
    and the FM term matches its O(T^2) pairwise definition."""
    from hugectr_backend_tpu.models.deepfm import DeepFM
    from hugectr_backend_tpu.serving.program import make_deepfm_server

    root = tmp_path_factory.mktemp("deepfm")
    first = make_synthetic_table(500, 1, seed=81)
    second = make_synthetic_table(500, 8, seed=82)
    write_sparse_model(root / "first", first.keys, first.vectors)
    write_sparse_model(root / "second", second.keys, second.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "deepfm",
                    "sparse_files": [str(root / "first"), str(root / "second")],
                    "embedding_vecsize_per_table": [1, 8],
                    "maxnum_catfeature_query_per_table_per_sample": [5, 5],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                }
            ]
        }
    )
    b, nd, t, d = 6, 4, 5, 8
    model = DeepFM(deep_widths=(32, 1))
    rng = np.random.default_rng(8)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, t, 1)), jnp.zeros((b, t, d)))
    srv = make_deepfm_server(
        ps.get_model_params("deepfm"), ps.get_embedding_cache("deepfm", 0),
        model, mp)
    kidx = rng.integers(0, 400, (b, t))
    keys = [first.keys[kidx], second.keys[kidx]]
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    got = np.asarray(srv.predict(keys, dense))

    e1 = expected_vector(keys[0].reshape(-1), 1).reshape(b, t, 1)
    e2 = expected_vector(keys[1].reshape(-1), 8).reshape(b, t, d)
    want = np.asarray(model.apply(mp, jnp.asarray(dense), jnp.asarray(e1),
                                  jnp.asarray(e2)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # FM term == explicit pairwise-dot sum.
    s = e2.sum(axis=1)
    fm_fast = 0.5 * ((s * s).sum(-1) - (e2 * e2).sum(1).sum(-1))
    fm_pair = np.zeros(b)
    for i in range(t):
        for j in range(i + 1, t):
            fm_pair += (e2[:, i] * e2[:, j]).sum(-1)
    np.testing.assert_allclose(fm_fast, fm_pair, rtol=1e-4, atol=1e-5)


def test_fused_xdeepfm_serving(tmp_path_factory):
    """xDeepFM (CIN + deep MLP over shared embeddings): fused serving output
    equals the model applied to ground-truth embeddings, and the CIN layer
    matches its explicit O(H*T) pairwise definition."""
    from hugectr_backend_tpu.models.xdeepfm import CINLayer, XDeepFM
    from hugectr_backend_tpu.serving.program import make_xdeepfm_server

    root = tmp_path_factory.mktemp("xdeepfm")
    tbls = [make_synthetic_table(300 + 50 * t, 8, seed=90 + t) for t in range(2)]
    for t, tbl in enumerate(tbls):
        write_sparse_model(root / f"t{t}", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "xdeepfm",
                    "sparse_files": [str(root / f"t{t}") for t in range(2)],
                    "embedding_vecsize_per_table": [8, 8],
                    "maxnum_catfeature_query_per_table_per_sample": [2, 3],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                }
            ]
        }
    )
    b, nd, d = 6, 4, 8
    model = XDeepFM(cin_feature_maps=(8, 4), deep_widths=(16, 1))
    rng = np.random.default_rng(9)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, 5, d)))
    srv = make_xdeepfm_server(
        ps.get_model_params("xdeepfm"), ps.get_embedding_cache("xdeepfm", 0),
        model, mp)
    keys = [tbls[0].keys[rng.integers(0, 250, (b, 2))],
            tbls[1].keys[rng.integers(0, 300, (b, 3))]]
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    got = np.asarray(srv.predict(keys, dense))

    emb = np.concatenate(
        [expected_vector(keys[0].reshape(-1), d).reshape(b, 2, d),
         expected_vector(keys[1].reshape(-1), d).reshape(b, 3, d)], axis=1)
    want = np.asarray(model.apply(mp, jnp.asarray(dense), jnp.asarray(emb)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # CIN layer == explicit pairwise definition.
    layer = CINLayer(feature_maps=3)
    x0 = jnp.asarray(rng.standard_normal((b, 4, d)).astype(np.float32))
    lp = layer.init(jax.random.PRNGKey(1), x0, x0)
    out = np.asarray(layer.apply(lp, x0, x0))
    w = np.asarray(lp["params"]["w"]).reshape(3, 4, 4)  # [G, H, T]
    x0n = np.asarray(x0)
    want_cin = np.einsum("ght,bhd,btd->bgd", w, x0n, x0n)
    np.testing.assert_allclose(out, want_cin, rtol=1e-4, atol=1e-5)


def test_fused_ncf_serving(tmp_path_factory):
    """NCF/NeuMF (GMF + MLP towers over user/item tables): fused serving
    output equals the model applied to ground-truth embeddings, including
    with a zero-width dense input."""
    from hugectr_backend_tpu.models.ncf import NCF
    from hugectr_backend_tpu.serving.program import make_ncf_server

    root = tmp_path_factory.mktemp("ncf")
    users = make_synthetic_table(600, 16, seed=95)
    items = make_synthetic_table(800, 16, seed=96)
    write_sparse_model(root / "users", users.keys, users.vectors)
    write_sparse_model(root / "items", items.keys, items.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "ncf",
                    "sparse_files": [str(root / "users"), str(root / "items")],
                    "embedding_vecsize_per_table": [16, 16],
                    "maxnum_catfeature_query_per_table_per_sample": [1, 1],
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                }
            ]
        }
    )
    b, d = 7, 16
    model = NCF(mlp_widths=(32, 16))
    rng = np.random.default_rng(11)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, 0)),
                    jnp.zeros((b, 1, d)), jnp.zeros((b, 1, d)))
    srv = make_ncf_server(
        ps.get_model_params("ncf"), ps.get_embedding_cache("ncf", 0),
        model, mp)
    ukeys = users.keys[rng.integers(0, 600, (b, 1))]
    ikeys = items.keys[rng.integers(0, 800, (b, 1))]
    dense = np.zeros((b, 0), np.float32)
    got = np.asarray(srv.predict([ukeys, ikeys], dense))

    ue = expected_vector(ukeys.reshape(-1), d).reshape(b, 1, d)
    ie = expected_vector(ikeys.reshape(-1), d).reshape(b, 1, d)
    want = np.asarray(model.apply(mp, jnp.asarray(dense), jnp.asarray(ue),
                                  jnp.asarray(ie)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.shape == (b,) and np.isfinite(got).all()


def test_fused_dlrm_part_major_reorder_exact(tmp_path_factory):
    """Interleaved lookup groups (alternating one-hot / arena tables)
    produce a NON-part-major chunk feature map; the server then reorders
    features part-major for the cheaper _fm interaction kernel and
    permutes the first top-MLP kernel to compensate — logits must equal
    the plain DLRM forward in ORIGINAL table order exactly
    (ops/fused_interaction.py part_major_order / permute_dlrm_top_params;
    bench_artifacts/parts_fm_ab.json measured the kernel win on v5e)."""
    from hugectr_backend_tpu.models.dlrm import DLRM
    from hugectr_backend_tpu.serving.program import make_dlrm_multi_server

    root = tmp_path_factory.mktemp("dlrm_pm")
    dim = 8
    # Alternate below/above the one-hot threshold (4096 rows) so the
    # one-hot and arena groups interleave in table order.
    sizes = [300, 8000, 400, 9000, 500]
    tbls = [make_synthetic_table(n, dim, seed=90 + t)
            for t, n in enumerate(sizes)]
    for t, tbl in enumerate(tbls):
        write_sparse_model(root / f"t{t}", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": "dlrm",
                    "sparse_files": [str(root / f"t{t}")
                                     for t in range(len(sizes))],
                    "embedding_vecsize_per_table": [dim] * len(sizes),
                    "maxnum_catfeature_query_per_table_per_sample":
                        [1] * len(sizes),
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": 32,
                }
            ]
        }
    )
    cache = ps.get_embedding_cache("dlrm", 0)
    kinds = {getattr(getattr(tbl, "arena", None), "lookup_kind", "solo")
             for tbl in cache.tables}
    assert len(kinds) > 1, f"expected mixed lookup kinds, got {kinds}"
    b, nd = 6, 4
    model = DLRM(bottom_widths=(16, dim), top_widths=(16, 1))
    rng = np.random.default_rng(8)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, len(sizes), dim)))
    srv = make_dlrm_multi_server(ps.get_model_params("dlrm"), cache,
                                 model, mp)
    keys = [tbls[t].keys[rng.integers(0, sizes[t], (b, 1))]
            for t in range(len(sizes))]
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    got = np.asarray(srv.predict(keys, dense))
    emb_true = np.stack(
        [expected_vector(keys[t].reshape(-1), dim)
         for t in range(len(sizes))], axis=1)
    want = np.asarray(model.apply(mp, jnp.asarray(dense),
                                  jnp.asarray(emb_true)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _mk_dlrm_mixed(tmp_path, name, dim, sizes, quant_bits):
    tbls = [make_synthetic_table(n, dim, seed=90 + t)
            for t, n in enumerate(sizes)]
    for t, tbl in enumerate(tbls):
        write_sparse_model(tmp_path / f"{name}_t{t}", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(
        {
            "models": [
                {
                    "model": name,
                    "sparse_files": [str(tmp_path / f"{name}_t{t}")
                                     for t in range(len(sizes))],
                    "embedding_vecsize_per_table": [dim] * len(sizes),
                    "maxnum_catfeature_query_per_table_per_sample":
                        [1] * len(sizes),
                    "gpucacheper": 1.0,
                    "embedding_cache_type": "static",
                    "quant_bits": quant_bits,
                }
            ]
        }
    )
    return ps, tbls


def test_fused_dlrm_oh_fold_exact_cpu(tmp_path_factory):
    """Folding the one-hot group into the interaction (serving/program.py
    _fold_oh_plan) must preserve logits EXACTLY vs the kill-switch path:
    on CPU both run the identical XLA math, differing only in feature
    order + the compensating top-MLP row permutation."""
    from hugectr_backend_tpu.models.dlrm import DLRM
    from hugectr_backend_tpu.serving.program import make_dlrm_multi_server

    root = tmp_path_factory.mktemp("dlrm_ohfold")
    dim = 8
    sizes = [300, 8000, 400, 9000, 500]
    ps, tbls = _mk_dlrm_mixed(root, "dlrm", dim, sizes, 32)
    cache = ps.get_embedding_cache("dlrm", 0)
    # One-hot arena member blocks are 128-row aligned (the in-kernel
    # variant's layout requirement; tiers/hbm.py build_arena_views).
    for tbl in cache.tables:
        ar = getattr(tbl, "arena", None)
        if ar is not None and ar.lookup_kind == "onehot":
            assert tbl.offset % 128 == 0 and tbl.block_rows % 128 == 0
            assert tbl.block_rows >= tbl.capacity + 1
    b, nd = 8, 4
    model = DLRM(bottom_widths=(16, dim), top_widths=(16, 1))
    rng = np.random.default_rng(8)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, len(sizes), dim)))
    keys = [tbls[t].keys[rng.integers(0, sizes[t], (b, 1))]
            for t in range(len(sizes))]
    dense = rng.standard_normal((b, nd)).astype(np.float32)

    srv = make_dlrm_multi_server(ps.get_model_params("dlrm"), cache,
                                 model, mp)
    got = np.asarray(srv.predict(keys, dense))
    import os
    os.environ["HPS_OH_IN_KERNEL"] = "0"
    try:
        srv2 = make_dlrm_multi_server(ps.get_model_params("dlrm"), cache,
                                      model, mp)
        want = np.asarray(srv2.predict(keys, dense))
    finally:
        del os.environ["HPS_OH_IN_KERNEL"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # And vs ground truth embeddings.
    emb_true = np.stack(
        [expected_vector(keys[t].reshape(-1), dim)
         for t in range(len(sizes))], axis=1)
    full = np.asarray(model.apply(mp, jnp.asarray(dense),
                                  jnp.asarray(emb_true)))
    np.testing.assert_allclose(got, full, rtol=1e-4, atol=1e-5)


def test_fused_dlrm_oh_fold_kernel_interpret(tmp_path_factory, monkeypatch):
    """HPS_PALLAS_INTERPRET=1 drives the REAL one-hot-in-kernel Pallas body
    (interpreted) through the full serving path: the fold plan must be
    taken, fused_dot_interaction_oh_parts must actually run, and logits
    must match the unfused path to bf16-contraction tolerance."""
    import hugectr_backend_tpu.ops.fused_interaction as fi
    from hugectr_backend_tpu.models.dlrm import DLRM
    from hugectr_backend_tpu.serving.program import make_dlrm_multi_server

    root = tmp_path_factory.mktemp("dlrm_ohk")
    dim = 128  # kernel requires lane-aligned dim
    sizes = [300, 8000, 400, 500]
    ps, tbls = _mk_dlrm_mixed(root, "dlrmk", dim, sizes, 8)
    cache = ps.get_embedding_cache("dlrmk", 0)
    b, nd = 8, 4
    model = DLRM(bottom_widths=(16, dim), top_widths=(16, 1))
    rng = np.random.default_rng(9)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, len(sizes), dim)))
    keys = [tbls[t].keys[rng.integers(0, sizes[t], (b, 1))]
            for t in range(len(sizes))]
    dense = rng.standard_normal((b, nd)).astype(np.float32)

    calls = {"n": 0}
    orig = fi.fused_dot_interaction_oh_parts

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(fi, "fused_dot_interaction_oh_parts", spy)
    monkeypatch.setenv("HPS_PALLAS_INTERPRET", "1")
    srv = make_dlrm_multi_server(ps.get_model_params("dlrmk"), cache,
                                 model, mp)
    got = np.asarray(srv.predict(keys, dense))
    assert calls["n"] >= 1, "one-hot-in-kernel path was not taken"

    monkeypatch.delenv("HPS_PALLAS_INTERPRET")
    monkeypatch.setenv("HPS_OH_IN_KERNEL", "0")
    srv2 = make_dlrm_multi_server(ps.get_model_params("dlrmk"), cache,
                                  model, mp)
    want = np.asarray(srv2.predict(keys, dense))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 5e-3, rel


def test_fused_dlrm_all_onehot_fold(tmp_path_factory):
    """Every table tiny (single one-hot group, zero parts): the fold must
    still serve exact logits through the empty-parts EmbParts."""
    from hugectr_backend_tpu.models.dlrm import DLRM
    from hugectr_backend_tpu.serving.program import make_dlrm_multi_server

    root = tmp_path_factory.mktemp("dlrm_allon")
    dim = 8
    sizes = [30, 50, 20]
    ps, tbls = _mk_dlrm_mixed(root, "dlrmo", dim, sizes, 32)
    cache = ps.get_embedding_cache("dlrmo", 0)
    kinds = {getattr(getattr(tbl, "arena", None), "lookup_kind", "solo")
             for tbl in cache.tables}
    assert kinds == {"onehot"}
    b, nd = 8, 4
    model = DLRM(bottom_widths=(16, dim), top_widths=(16, 1))
    rng = np.random.default_rng(10)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, len(sizes), dim)))
    srv = make_dlrm_multi_server(ps.get_model_params("dlrmo"), cache,
                                 model, mp)
    keys = [tbls[t].keys[rng.integers(0, sizes[t], (b, 1))]
            for t in range(len(sizes))]
    dense = rng.standard_normal((b, nd)).astype(np.float32)
    got = np.asarray(srv.predict(keys, dense))
    emb_true = np.stack(
        [expected_vector(keys[t].reshape(-1), dim)
         for t in range(len(sizes))], axis=1)
    want = np.asarray(model.apply(mp, jnp.asarray(dense),
                                  jnp.asarray(emb_true)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
