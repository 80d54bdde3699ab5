"""Triton model-repository compatibility tests (io/model_repo.py).

Covers the config.pbtxt text-proto parser, schema validation parity with the
reference's ModelState::ValidateModelConfig (model_state.cpp:180-261), the
instance_group / parameters rules (model_state.cpp:263-371), and end-to-end
serving from a Triton-layout repository.
"""

import json

import numpy as np
import pytest

from hugectr_backend_tpu.config.params import ConfigError
from hugectr_backend_tpu.io.model_repo import (
    load_model_repository,
    parse_pbtxt,
    scan_repository,
    validate_model_config,
)
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.serving.model_manager import ModelManager

GOOD_PBTXT = """
# Triton model config (reference samples/hps-triton-ensemble config.pbtxt)
name: "wdl"
backend: "hps"
max_batch_size: 64
input [
  { name: "KEYS"    data_type: TYPE_INT64 dims: [ -1 ] },
  { name: "NUMKEYS" data_type: TYPE_INT32 dims: [ -1 ] }
]
output [
  { name: "OUTPUT0" data_type: TYPE_FP32 dims: [ -1 ] }
]
instance_group [ { count: 1 kind: KIND_GPU gpus: [ 0 ] } ]
parameters [
  { key: "refresh_interval" value: { string_value: "0" } },
  { key: "freeze_sparse"    value: { string_value: "true" } }
]
version_policy: { latest { num_versions: 1 } }
"""


# --------------------------------------------------------------------- parser


def test_parse_pbtxt_shapes():
    cfg = parse_pbtxt(GOOD_PBTXT)
    assert cfg["name"] == "wdl" and cfg["backend"] == "hps"
    assert cfg["max_batch_size"] == 64
    assert [i["name"] for i in cfg["input"]] == ["KEYS", "NUMKEYS"]
    assert cfg["input"][0]["data_type"] == "TYPE_INT64"
    assert cfg["input"][0]["dims"] == [-1]
    assert cfg["instance_group"][0]["kind"] == "KIND_GPU"
    assert cfg["instance_group"][0]["gpus"] == [0]
    assert cfg["parameters"][1]["value"]["string_value"] == "true"
    assert cfg["version_policy"]["latest"]["num_versions"] == 1


def test_parse_pbtxt_block_style_and_repeats():
    # Newline-separated repeated message blocks (no brackets/commas).
    cfg = parse_pbtxt(
        'name: "m"\n'
        'input { name: "KEYS" data_type: TYPE_INT64 dims: -1 }\n'
        'input { name: "NUMKEYS" data_type: TYPE_INT32 dims: -1 }\n'
        'output { name: "OUT" data_type: TYPE_FP32 dims: -1 }\n'
        'parameters { key: "refresh_delay" value { string_value: "1.5" } }\n'
    )
    assert [i["name"] for i in cfg["input"]] == ["KEYS", "NUMKEYS"]
    assert cfg["output"]["dims"] == -1  # single block stays scalar
    validate_model_config(cfg, "m")


def test_parse_pbtxt_strings_escapes_comments():
    cfg = parse_pbtxt('a: "x \\"q\\" y" # trailing comment\nb: 3.5\nc: true\n')
    assert cfg["a"] == 'x "q" y' and cfg["b"] == 3.5 and cfg["c"] is True


def test_parse_pbtxt_bad_syntax():
    with pytest.raises(ConfigError):
        parse_pbtxt('input { name: "KEYS" ')  # unclosed message


# ----------------------------------------------------------------- validation


def _cfg(**over):
    base = parse_pbtxt(GOOD_PBTXT)
    base.update(over)
    return base


def test_validate_rejects_wrong_schema():
    with pytest.raises(ConfigError, match="2 inputs"):
        validate_model_config(_cfg(input=[{"name": "KEYS"}]), "m")
    bad = _cfg()
    bad["input"][0]["data_type"] = "TYPE_INT32"
    with pytest.raises(ConfigError, match="TYPE_INT64"):
        validate_model_config(bad, "m")
    bad = _cfg()
    bad["output"][0]["data_type"] = "TYPE_FP16"
    with pytest.raises(ConfigError, match="TYPE_FP32"):
        validate_model_config(bad, "m")
    bad = _cfg()
    bad["input"][1]["dims"] = [2, -1]
    with pytest.raises(ConfigError, match="dims"):
        validate_model_config(bad, "m")
    bad = _cfg()
    bad["input"][1]["name"] = "NKEYS"
    with pytest.raises(ConfigError, match="KEYS and NUMKEYS"):
        validate_model_config(bad, "m")


# ------------------------------------------------------------------ repo scan


def _make_repo(root, versions=(1,), pbtxt=GOOD_PBTXT, model="wdl",
               rows=2000, dim=16):
    mdir = root / model
    mdir.mkdir(parents=True, exist_ok=True)
    (mdir / "config.pbtxt").write_text(pbtxt)
    tbl = make_synthetic_table(rows, dim, seed=7)
    for v in versions:
        write_sparse_model(mdir / str(v) / "sparse0.model", tbl.keys, tbl.vectors)
    ps = {
        "models": [
            {
                "model": model,
                "sparse_files": ["sparse0.model"],  # relative -> version dir
                "embedding_vecsize_per_table": [dim],
                "maxnum_catfeature_query_per_table_per_sample": [2],
                "max_batch_size": 32,
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
                "quant_bits": 32,
            }
        ]
    }
    (root / "ps.json").write_text(json.dumps(ps))
    return tbl


def test_scan_and_latest_version(tmp_path):
    _make_repo(tmp_path, versions=(1, 3, 2))
    models = scan_repository(tmp_path)
    assert models["wdl"].versions == [1, 2, 3]
    assert models["wdl"].latest_version == 3
    cfg, versions = load_model_repository(tmp_path)
    assert versions == {"wdl": 3}
    p = cfg.models["wdl"]
    assert p.sparse_files == [str(tmp_path / "wdl" / "3" / "sparse0.model")]
    # config.pbtxt parameters applied (model_state.cpp:313-335)
    assert p.freeze_sparse is True and p.refresh_interval == 0.0
    # ps.json max_batch_size wins over config.pbtxt (model_state.cpp:359-366)
    assert p.max_batch_size == 32
    # instance_group gpus -> deployed devices
    assert p.deployed_devices == [0]


def test_scan_rejects_name_mismatch_and_missing_versions(tmp_path):
    mdir = tmp_path / "dirname"
    mdir.mkdir()
    (mdir / "config.pbtxt").write_text('name: "othername"\n')
    (mdir / "1").mkdir()
    with pytest.raises(ConfigError, match="disagrees"):
        scan_repository(tmp_path)
    (mdir / "config.pbtxt").write_text('name: "dirname"\n')
    import shutil

    shutil.rmtree(mdir / "1")
    with pytest.raises(ConfigError, match="version"):
        scan_repository(tmp_path)


def test_instance_group_worker_pool_bound(tmp_path):
    pbtxt = GOOD_PBTXT.replace("count: 1", "count: 9")
    _make_repo(tmp_path, pbtxt=pbtxt)
    with pytest.raises(ConfigError, match="worker_buffer_in_pool"):
        load_model_repository(tmp_path)


def test_repo_model_missing_from_ps_json_is_skipped(tmp_path):
    _make_repo(tmp_path)
    # Second repo dir without a ps.json entry -> warn + skip (hps.cc:300-305).
    other = tmp_path / "orphan"
    other.mkdir()
    (other / "config.pbtxt").write_text(GOOD_PBTXT.replace('"wdl"', '"orphan"'))
    (other / "1").mkdir()
    cfg, versions = load_model_repository(tmp_path)
    assert set(versions) == {"wdl"}


# ------------------------------------------------------------------------ e2e


def test_serve_from_triton_repository(tmp_path):
    tbl = _make_repo(tmp_path, versions=(1, 2), dim=16)
    cfg, versions = load_model_repository(tmp_path)
    mgr = ModelManager.create(cfg, load_all=False)
    for name, v in versions.items():
        mgr.load(name, version=v)
    try:
        assert mgr.is_loaded("wdl")
        assert mgr.loaded_models()[0]["version"] == "2"
        keys = tbl.keys[:8].astype(np.int64)
        resp = mgr.infer("wdl", keys, np.asarray([8], np.int64))
        got = np.asarray(resp.output).reshape(8, 16)
        np.testing.assert_allclose(got, expected_vector(keys, 16), rtol=1e-5)
    finally:
        mgr.shutdown()


def test_version_bump_rereads_new_version_files(tmp_path):
    """A repository version bump through load(version=N) must re-read the
    NEW version dir's sparse files (previously the paths stayed pinned to
    the startup-latest dir, serving old weights under the new version
    number) — and an unload -> load(new version) sequence must also
    trigger the re-parse (previously gated on the model being loaded)."""
    tbl = _make_repo(tmp_path, versions=(1,), dim=16)
    cfg, versions = load_model_repository(tmp_path)
    mgr = ModelManager.create(cfg, load_all=False)
    try:
        mgr.load("wdl", version=1)
        keys = tbl.keys[:4].astype(np.int64)
        got1 = np.asarray(mgr.infer("wdl", keys, np.asarray([4], np.int64))
                          .output).reshape(4, 16)
        np.testing.assert_allclose(got1, expected_vector(keys, 16),
                                   rtol=1e-5)
        # Version 2 appears AFTER startup with different vectors.
        write_sparse_model(tmp_path / "wdl" / "2" / "sparse0.model",
                           tbl.keys, tbl.vectors * 3.0)
        mgr.load("wdl", version=2)
        # The version bump re-parses the TIERS synchronously; the HBM cache
        # catches up on the (scheduled) refresh cycle — drive it here.
        mgr.ps.get_embedding_cache("wdl", 0).refresh(fraction=1.0)
        got2 = np.asarray(mgr.infer("wdl", keys, np.asarray([4], np.int64))
                          .output).reshape(4, 16)
        np.testing.assert_allclose(got2, 3.0 * expected_vector(keys, 16),
                                   rtol=1e-5)
        # unload -> load(newer version): the tier re-parse must still fire.
        write_sparse_model(tmp_path / "wdl" / "5" / "sparse0.model",
                           tbl.keys, tbl.vectors * 5.0)
        mgr.unload("wdl")
        mgr.load("wdl", version=5)
        got5 = np.asarray(mgr.infer("wdl", keys, np.asarray([4], np.int64))
                          .output).reshape(4, 16)
        np.testing.assert_allclose(got5, 5.0 * expected_vector(keys, 16),
                                   rtol=1e-5)
    finally:
        mgr.shutdown()


def test_write_sparse_model_rejects_remote_uri(tmp_path):
    """Writes to remote URIs must fail loudly — they previously landed in
    the local fetch cache and were silently lost."""
    tbl = make_synthetic_table(10, 4, seed=1)
    with pytest.raises(ValueError, match="remote URI"):
        write_sparse_model("s3://bucket/table", tbl.keys, tbl.vectors)
