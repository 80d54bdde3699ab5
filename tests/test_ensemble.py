"""Ensemble serving tests (serving/ensemble.py, io/dense_model.py).

Mirrors the reference's ensemble deployment (reference
hps_backend/samples/hps-triton-ensemble/02_model_inference_hps_tf_ensemble.ipynb:
an HPS sparse model + a dense model composed via ``platform: "ensemble"``
config.pbtxt), plus the TPU-only fused single-XLA-program path.
"""

import json
import urllib.request

import numpy as np
import pytest

from hugectr_backend_tpu.config.params import ConfigError
from hugectr_backend_tpu.io.dense_model import (
    DenseModel,
    convert_torch_sequential,
    save_dense_model,
)
from hugectr_backend_tpu.io.model_repo import load_repository, parse_pbtxt
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.serving.ensemble import EnsembleServer, EnsembleSpec
from hugectr_backend_tpu.serving.model_manager import ModelManager
from hugectr_backend_tpu.serving.scheduler import RequestError
from hugectr_backend_tpu.serving.server import HpsHttpServer

DIM = 16
KEYS_PER_SAMPLE = 4
HIDDEN = 8

# The exact shape the reference notebook writes (02_…_tf_ensemble.ipynb).
ENSEMBLE_PBTXT = """
name: "ensemble_model"
platform: "ensemble"
max_batch_size: 0
input [
  { name: "EMB_KEY" data_type: TYPE_INT64 dims: [ -1, -1 ] },
  { name: "EMB_N_KEY" data_type: TYPE_INT32 dims: [ -1, -1 ] }
]
output [
  { name: "DENSE_OUTPUT" data_type: TYPE_FP32 dims: [-1, 1] }
]
ensemble_scheduling {
  step [
    {
      model_name: "hps_embedding"
      model_version: -1
      input_map { key: "KEYS" value: "EMB_KEY" }
      input_map { key: "NUMKEYS" value: "EMB_N_KEY" }
      output_map { key: "OUTPUT0" value: "LOOKUP_VECTORS" }
    },
    {
      model_name: "dense_model"
      model_version: -1
      input_map { key: "input_1" value: "LOOKUP_VECTORS" }
      output_map { key: "output_1" value: "DENSE_OUTPUT" }
    }
  ]
}
"""

HPS_PBTXT = """
name: "hps_embedding"
backend: "hps"
max_batch_size: 64
input [
  { name: "KEYS" data_type: TYPE_INT64 dims: [ -1 ] },
  { name: "NUMKEYS" data_type: TYPE_INT32 dims: [ -1 ] }
]
output [ { name: "OUTPUT0" data_type: TYPE_FP32 dims: [ -1 ] } ]
instance_group [ { count: 1 kind: KIND_GPU gpus: [ 0 ] } ]
"""

DENSE_PBTXT = """
name: "dense_model"
platform: "hps_tpu_dense"
max_batch_size: 0
input [ { name: "input_1" data_type: TYPE_FP32 dims: [ -1 ] } ]
output [ { name: "output_1" data_type: TYPE_FP32 dims: [ -1, 1 ] } ]
"""


def _mlp_weights(rng, in_dim=DIM * KEYS_PER_SAMPLE):
    w0 = rng.normal(size=(in_dim, HIDDEN)).astype(np.float32) * 0.1
    b0 = rng.normal(size=(HIDDEN,)).astype(np.float32) * 0.1
    w1 = rng.normal(size=(HIDDEN, 1)).astype(np.float32) * 0.1
    b1 = np.zeros((1,), np.float32)
    return [(w0, b0), (w1, b1)]


def _np_mlp(weights, x):
    (w0, b0), (w1, b1) = weights
    h = np.maximum(x @ w0 + b0, 0.0)
    return 1.0 / (1.0 + np.exp(-(h @ w1 + b1)))


def _build_repo(tmp_path, rng, rows=3000, gpucacheper=1.0,
                cache_type="static", dense_quant=None, extra_ps=None,
                hps_pbtxt=HPS_PBTXT):
    # hps model
    mdir = tmp_path / "hps_embedding"
    mdir.mkdir()
    (mdir / "config.pbtxt").write_text(hps_pbtxt)
    tbl = make_synthetic_table(rows, DIM, seed=3)
    write_sparse_model(mdir / "1" / "sparse0.model", tbl.keys, tbl.vectors)
    # dense model
    ddir = tmp_path / "dense_model"
    ddir.mkdir()
    (ddir / "config.pbtxt").write_text(DENSE_PBTXT)
    weights = _mlp_weights(rng)
    save_dense_model(
        ddir / "1", weights, ["relu", "sigmoid"],
        reshape=[-1, DIM * KEYS_PER_SAMPLE], quant=dense_quant,
    )
    # ensemble
    edir = tmp_path / "ensemble_model"
    edir.mkdir()
    (edir / "config.pbtxt").write_text(ENSEMBLE_PBTXT)
    (edir / "1").mkdir()
    ps = {
        "models": [
            {
                "model": "hps_embedding",
                "sparse_files": ["sparse0.model"],
                "embedding_vecsize_per_table": [DIM],
                "maxnum_catfeature_query_per_table_per_sample": [KEYS_PER_SAMPLE],
                "max_batch_size": 64,
                "gpucacheper": gpucacheper,
                "embedding_cache_type": cache_type,
                "quant_bits": 32,
            }
        ]
    }
    if extra_ps:
        ps["models"][0].update(extra_ps)
    (tmp_path / "ps.json").write_text(json.dumps(ps))
    return tbl, weights


def _serve_bundle(tmp_path):
    bundle = load_repository(tmp_path)
    mgr = ModelManager.create(bundle.ps_config, load_all=False)
    for name, v in bundle.hps_versions.items():
        mgr.load(name, version=v)
    ensembles = {
        n: EnsembleServer(s, mgr, bundle.dense)
        for n, s in bundle.ensembles.items()
    }
    return bundle, mgr, ensembles


# ------------------------------------------------------------------- parsing


def test_spec_parse_topo_and_maps():
    cfg = parse_pbtxt(ENSEMBLE_PBTXT)
    spec = EnsembleSpec.from_config("ensemble_model", cfg)
    assert [s.model_name for s in spec.steps] == ["hps_embedding", "dense_model"]
    assert spec.steps[0].input_map == {"KEYS": "EMB_KEY", "NUMKEYS": "EMB_N_KEY"}
    assert spec.steps[0].output_map == {"OUTPUT0": "LOOKUP_VECTORS"}
    assert [i["name"] for i in spec.inputs] == ["EMB_KEY", "EMB_N_KEY"]
    assert spec.outputs[0]["datatype"] == "FP32"


def test_spec_topo_reorders_and_rejects_cycles():
    # Steps listed dense-first must still topo-sort sparse-first.
    cfg = parse_pbtxt(ENSEMBLE_PBTXT)
    cfg["ensemble_scheduling"]["step"].reverse()
    spec = EnsembleSpec.from_config("e", cfg)
    assert [s.model_name for s in spec.steps] == ["hps_embedding", "dense_model"]
    # A step consuming a tensor nobody produces is unreachable.
    cfg2 = parse_pbtxt(ENSEMBLE_PBTXT)
    cfg2["ensemble_scheduling"]["step"][0]["input_map"][0]["value"] = "GHOST"
    with pytest.raises(ConfigError, match="unreachable"):
        EnsembleSpec.from_config("e", cfg2)
    # Declared ensemble output nobody produces.
    cfg3 = parse_pbtxt(ENSEMBLE_PBTXT)
    cfg3["output"][0]["name"] = "MISSING"
    with pytest.raises(ConfigError, match="never produced"):
        EnsembleSpec.from_config("e", cfg3)


# --------------------------------------------------------------- dense model


def test_dense_model_roundtrip(tmp_path, rng):
    weights = _mlp_weights(rng)
    save_dense_model(tmp_path / "1", weights, ["relu", "sigmoid"],
                     reshape=[-1, DIM * KEYS_PER_SAMPLE])
    dm = DenseModel.load(tmp_path / "1", "dense_model")
    x = rng.normal(size=(5, DIM * KEYS_PER_SAMPLE)).astype(np.float32)
    np.testing.assert_allclose(
        dm.forward(x), _np_mlp(weights, x), rtol=1e-5, atol=1e-6
    )
    # Flat input goes through the spec reshape.
    np.testing.assert_allclose(
        dm.forward(x.reshape(-1)), _np_mlp(weights, x), rtol=1e-5, atol=1e-6
    )


def test_dense_model_quantized_roundtrip(tmp_path, rng):
    """Weight-only quantized dense files (spec "quant") load and serve close
    to the fp32 forward — the ensemble-path analogue of the reference's
    fp8_quant flag (reference backend.cpp:500-504)."""
    weights = _mlp_weights(rng)
    x = rng.normal(size=(5, DIM * KEYS_PER_SAMPLE)).astype(np.float32)
    want = _np_mlp(weights, x)
    for fmt, tol in (("int8", 0.02), ("fp8", 0.08), ("w8a8", 0.04)):
        save_dense_model(tmp_path / fmt, weights, ["relu", "sigmoid"],
                         reshape=[-1, DIM * KEYS_PER_SAMPLE], quant=fmt)
        dm = DenseModel.load(tmp_path / fmt, "dense_model")
        assert dm.spec["quant"] == fmt and dm.scales is not None
        got = dm.forward(x)
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < tol, f"{fmt}: rel err {rel}"


def test_dense_model_foreign_format_hint(tmp_path):
    vdir = tmp_path / "1"
    vdir.mkdir()
    (vdir / "model.pt").write_bytes(b"not a real torchscript")
    with pytest.raises(ConfigError, match="convert_dense_model"):
        DenseModel.load(vdir)


def test_torch_converter_parity(tmp_path, rng):
    torch = pytest.importorskip("torch")
    mlp = torch.nn.Sequential(
        torch.nn.Linear(DIM * KEYS_PER_SAMPLE, HIDDEN),
        torch.nn.ReLU(),
        torch.nn.Linear(HIDDEN, 1),
        torch.nn.Sigmoid(),
    )
    weights, acts = convert_torch_sequential(mlp)
    assert acts == ["relu", "sigmoid"]
    save_dense_model(tmp_path / "1", weights, acts,
                     reshape=[-1, DIM * KEYS_PER_SAMPLE])
    dm = DenseModel.load(tmp_path / "1")
    x = rng.normal(size=(3, DIM * KEYS_PER_SAMPLE)).astype(np.float32)
    with torch.no_grad():
        want = mlp(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(dm.forward(x), want, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------- e2e


def test_ensemble_e2e_fused_matches_staged_and_numpy(tmp_path, rng):
    tbl, weights = _build_repo(tmp_path, rng)
    bundle, mgr, ensembles = _serve_bundle(tmp_path)
    try:
        es = ensembles["ensemble_model"]
        b = 6
        keys = tbl.keys[: b * KEYS_PER_SAMPLE].astype(np.int64)
        inputs = {
            "EMB_KEY": keys,
            "EMB_N_KEY": np.asarray([b * KEYS_PER_SAMPLE], np.int32),
        }
        out = es.infer(inputs)["DENSE_OUTPUT"]
        # Fused path must have engaged (full static cache, canonical chain).
        assert es._fused is not None
        x = expected_vector(keys, DIM).reshape(b, DIM * KEYS_PER_SAMPLE)
        want = _np_mlp(weights, x)
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
        # Staged path (the reference's actual execution model) agrees.
        staged = es.infer_staged(dict(inputs))["DENSE_OUTPUT"]
        np.testing.assert_allclose(
            staged.reshape(out.shape), out, rtol=1e-4, atol=1e-5
        )
    finally:
        mgr.shutdown()


def test_ensemble_partial_cache_uses_staged_path(tmp_path, rng):
    # gpucacheper < 1 means an HBM miss may exist in DRAM: the fused
    # translate-only shortcut would wrongly return default rows, so the
    # server must refuse to fuse.
    tbl, weights = _build_repo(tmp_path, rng, gpucacheper=0.5,
                               cache_type="dynamic")
    bundle, mgr, ensembles = _serve_bundle(tmp_path)
    try:
        es = ensembles["ensemble_model"]
        b = 4
        keys = tbl.keys[-b * KEYS_PER_SAMPLE:].astype(np.int64)
        out = es.infer(
            {"EMB_KEY": keys,
             "EMB_N_KEY": np.asarray([b * KEYS_PER_SAMPLE], np.int32)}
        )["DENSE_OUTPUT"]
        assert es._fused is None
        x = expected_vector(keys, DIM).reshape(b, DIM * KEYS_PER_SAMPLE)
        np.testing.assert_allclose(
            out.reshape(b, 1), _np_mlp(weights, x), rtol=1e-4, atol=1e-5
        )
    finally:
        mgr.shutdown()


def test_ensemble_missing_input_and_unknown_step(tmp_path, rng):
    _build_repo(tmp_path, rng)
    bundle, mgr, ensembles = _serve_bundle(tmp_path)
    try:
        es = ensembles["ensemble_model"]
        with pytest.raises(RequestError, match="missing input"):
            es.infer({"EMB_KEY": np.asarray([1, 2, 3, 4], np.int64)})
    finally:
        mgr.shutdown()


def test_ensemble_over_http(tmp_path, rng):
    tbl, weights = _build_repo(tmp_path, rng)
    bundle, mgr, ensembles = _serve_bundle(tmp_path)
    server = HpsHttpServer(
        mgr, port=0, ensembles=ensembles, dense_models=bundle.dense
    ).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        b = 3
        keys = tbl.keys[: b * KEYS_PER_SAMPLE].astype(np.int64)
        req = {
            "inputs": [
                {"name": "EMB_KEY", "datatype": "INT64",
                 "shape": [b * KEYS_PER_SAMPLE], "data": keys.tolist()},
                {"name": "EMB_N_KEY", "datatype": "INT32", "shape": [1],
                 "data": [b * KEYS_PER_SAMPLE]},
            ]
        }
        r = urllib.request.urlopen(
            urllib.request.Request(
                f"{base}/v2/models/ensemble_model/infer",
                data=json.dumps(req).encode(),
                headers={"Content-Type": "application/json"},
            )
        )
        resp = json.loads(r.read())
        out = np.asarray(resp["outputs"][0]["data"], np.float32).reshape(
            resp["outputs"][0]["shape"]
        )
        x = expected_vector(keys, DIM).reshape(b, DIM * KEYS_PER_SAMPLE)
        np.testing.assert_allclose(out, _np_mlp(weights, x), rtol=1e-4, atol=1e-5)

        # Metadata + readiness + repository index cover the ensemble.
        meta = json.loads(
            urllib.request.urlopen(f"{base}/v2/models/ensemble_model").read()
        )
        assert meta["platform"] == "ensemble"
        assert meta["steps"] == ["hps_embedding", "dense_model"]
        # Triton config endpoint (tritonclient get_model_config parity).
        cfg = json.loads(
            urllib.request.urlopen(
                f"{base}/v2/models/ensemble_model/config"
            ).read()
        )
        assert cfg["ensemble_scheduling"]["step"][0]["model_name"] == "hps_embedding"
        hcfg = json.loads(
            urllib.request.urlopen(f"{base}/v2/models/hps_embedding/config").read()
        )
        assert hcfg["backend"] == "hps"
        assert hcfg["input"][0]["data_type"] == "TYPE_INT64"
        urllib.request.urlopen(f"{base}/v2/models/ensemble_model/ready")
        idx = json.loads(
            urllib.request.urlopen(
                urllib.request.Request(f"{base}/v2/repository/index", data=b"")
            ).read()
        )
        assert {m["name"] for m in idx} >= {
            "hps_embedding", "dense_model", "ensemble_model"
        }

        # Standalone dense model serves too (Triton serves every repo model).
        dreq = {
            "inputs": [
                {"name": "input_1", "datatype": "FP32",
                 "shape": [1, DIM * KEYS_PER_SAMPLE],
                 "data": x[0].tolist()}
            ]
        }
        r2 = urllib.request.urlopen(
            urllib.request.Request(
                f"{base}/v2/models/dense_model/infer",
                data=json.dumps(dreq).encode(),
            )
        )
        d = json.loads(r2.read())
        np.testing.assert_allclose(
            np.asarray(d["outputs"][0]["data"]).reshape(1, 1),
            _np_mlp(weights, x[:1]),
            rtol=1e-4, atol=1e-5,
        )
    finally:
        server.stop()


def test_server_boot_from_repo_with_ensemble(tmp_path, rng):
    """serve(model_repository=…) wires ensembles without a ps_json arg."""
    from hugectr_backend_tpu.serving.server import serve

    tbl, weights = _build_repo(tmp_path, rng)
    server = serve(model_repository=tmp_path, port=0, block=False)
    try:
        base = f"http://127.0.0.1:{server.port}"
        urllib.request.urlopen(f"{base}/v2/models/ensemble_model/ready")
    finally:
        server.stop()


@pytest.mark.parametrize("fmt", ["int8", "fp8", "w8a8"])
def test_ensemble_fused_quantized_dense_matches_staged(tmp_path, rng, fmt):
    """The fused ensemble must apply the dense model's DEQUANT semantics —
    round 4's review found it multiplying raw int8/fp8 kernels without
    scales (silently wrong outputs); it now reuses DenseModel.apply."""
    tbl, weights = _build_repo(tmp_path, rng, dense_quant=fmt)
    bundle, mgr, ensembles = _serve_bundle(tmp_path)
    try:
        es = ensembles["ensemble_model"]
        b = 5
        keys = tbl.keys[: b * KEYS_PER_SAMPLE].astype(np.int64)
        inputs = {
            "EMB_KEY": keys,
            "EMB_N_KEY": np.asarray([b * KEYS_PER_SAMPLE], np.int32),
        }
        out = es.infer(inputs)["DENSE_OUTPUT"]
        assert es._fused is not None  # fused path engaged
        staged = es.infer_staged(dict(inputs))["DENSE_OUTPUT"]
        np.testing.assert_allclose(
            out, staged.reshape(out.shape), rtol=2e-2, atol=2e-2)
        # And both sit near the fp32 ground truth (quantization tolerance).
        x = expected_vector(keys, DIM).reshape(b, DIM * KEYS_PER_SAMPLE)
        want = _np_mlp(weights, x)
        np.testing.assert_allclose(out, want, rtol=0.1, atol=0.05)


    finally:
        mgr.shutdown()


def test_ensemble_fused_tracks_reload(tmp_path, rng):
    """After unload the fused path must NOT keep serving the destroyed
    cache's embeddings (it previously captured the cache object at first
    build and never refreshed it)."""
    tbl, weights = _build_repo(tmp_path, rng)
    bundle, mgr, ensembles = _serve_bundle(tmp_path)
    try:
        es = ensembles["ensemble_model"]
        b = 3
        keys = tbl.keys[: b * KEYS_PER_SAMPLE].astype(np.int64)
        inputs = {
            "EMB_KEY": keys,
            "EMB_N_KEY": np.asarray([b * KEYS_PER_SAMPLE], np.int32),
        }
        out1 = es.infer(inputs)["DENSE_OUTPUT"]
        assert es._fused is not None
        mgr.unload("hps_embedding")
        with pytest.raises(Exception):
            es.infer(dict(inputs))  # staged path reports not-loaded
        mgr.load("hps_embedding")
        out2 = es.infer(dict(inputs))["DENSE_OUTPUT"]
        np.testing.assert_allclose(out2, out1, rtol=1e-5)
    finally:
        mgr.shutdown()


SHARDED_HPS_PBTXT = HPS_PBTXT.replace(
    "gpus: [ 0 ]", "gpus: [ 0, 1, 2, 3, 4, 5, 6, 7 ]"
)


def test_ensemble_fused_sharded(tmp_path, rng):
    """A SHARDED sparse model fuses its collective lookup + the dense
    forward into one mesh program (the multi-chip analogue of the flat
    fused chain); output matches the numpy reference and the staged
    path."""
    tbl, weights = _build_repo(
        tmp_path, rng,
        extra_ps={"shard_tables": True,
                  "deployed_device_list": [0, 1, 2, 3, 4, 5, 6, 7]},
        hps_pbtxt=SHARDED_HPS_PBTXT,
    )
    bundle, mgr, ensembles = _serve_bundle(tmp_path)
    try:
        from hugectr_backend_tpu.parallel.sharded_cache import (
            ShardedEmbeddingCache,
        )

        assert isinstance(
            mgr.ps.get_embedding_cache("hps_embedding", 0),
            ShardedEmbeddingCache,
        )
        es = ensembles["ensemble_model"]
        b = 6
        keys = tbl.keys[: b * KEYS_PER_SAMPLE].astype(np.int64)
        inputs = {
            "EMB_KEY": keys,
            "EMB_N_KEY": np.asarray([b * KEYS_PER_SAMPLE], np.int32),
        }
        out = es.infer(inputs)["DENSE_OUTPUT"]
        assert es._fused is not None and es._fused[0] == "sharded"
        x = expected_vector(keys, DIM).reshape(b, DIM * KEYS_PER_SAMPLE)
        want = _np_mlp(weights, x)
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
        staged = es.infer_staged(dict(inputs))["DENSE_OUTPUT"]
        np.testing.assert_allclose(
            staged.reshape(out.shape), out, rtol=1e-4, atol=1e-5)
        # Misses through the fused sharded path resolve to default rows.
        km = keys.copy()
        km[:KEYS_PER_SAMPLE] = -999
        out_m = es.infer({
            "EMB_KEY": km,
            "EMB_N_KEY": np.asarray([b * KEYS_PER_SAMPLE], np.int32),
        })["DENSE_OUTPUT"]
        xm = x.copy()
        xm[0, : KEYS_PER_SAMPLE * DIM] = 0.0
        np.testing.assert_allclose(out_m, _np_mlp(weights, xm),
                                   rtol=1e-4, atol=1e-5)
    finally:
        mgr.shutdown()


def test_instance_group_cannot_shrink_sharded_mesh(tmp_path, rng):
    """config.pbtxt instance_group naming a single device must not
    silently shrink a sharded model's mesh below 2 devices."""
    from hugectr_backend_tpu.config.params import ConfigError
    from hugectr_backend_tpu.io.model_repo import load_repository

    _build_repo(
        tmp_path, rng,
        extra_ps={"shard_tables": True,
                  "deployed_device_list": [0, 1, 2, 3]},
    )  # HPS_PBTXT pins gpus: [0]
    with pytest.raises(ConfigError, match="shard_tables needs >= 2"):
        load_repository(tmp_path)
