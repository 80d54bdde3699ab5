"""Serve a full Triton model repository: HPS sparse model + torch dense model
+ ensemble DAG — the reference's hps-triton-ensemble deployment
(reference samples/hps-triton-ensemble/02_model_inference_hps_tf_ensemble.ipynb
and HPS_Pytorch_ensemble_deployment.ipynb), TPU-native.

Flow: train-side torch MLP -> TorchScript -> convert to the native dense
format -> write config.pbtxt files -> boot the server on the repository ->
KServe infer against the ensemble. The hps->dense chain compiles into ONE
XLA program (no device round-trip between the "backends").

Runs on CPU:  python examples/05_triton_repo_ensemble.py
"""

import json
import os
import subprocess
import sys
import tempfile
import urllib.request
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
import jax

if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")

import torch

from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.serving.server import serve

DIM, KEYS_PER_SAMPLE = 16, 4
root = Path(tempfile.mkdtemp(prefix="hps_ensemble_repo_"))

# 1. Sparse half: HPS model dir (config.pbtxt + version dir with sparse files).
mdir = root / "hps_embedding"
mdir.mkdir()
(mdir / "config.pbtxt").write_text("""
name: "hps_embedding"
backend: "hps"
input [
  { name: "KEYS" data_type: TYPE_INT64 dims: [ -1 ] },
  { name: "NUMKEYS" data_type: TYPE_INT32 dims: [ -1 ] }
]
output [ { name: "OUTPUT0" data_type: TYPE_FP32 dims: [ -1 ] } ]
instance_group [ { count: 1 kind: KIND_GPU gpus: [ 0 ] } ]
""")
tbl = make_synthetic_table(5000, DIM, seed=42)
write_sparse_model(mdir / "1" / "emb.model", tbl.keys, tbl.vectors)

# 2. Dense half: a torch MLP, TorchScript'd like the reference's sample, then
#    converted to the native JAX-executable format.
mlp = torch.nn.Sequential(
    torch.nn.Linear(DIM * KEYS_PER_SAMPLE, 32), torch.nn.ReLU(),
    torch.nn.Linear(32, 1), torch.nn.Sigmoid(),
)
ddir = root / "dense_model"
(ddir / "1").mkdir(parents=True)
torch.jit.save(torch.jit.script(mlp), str(ddir / "1" / "model.pt"))
(ddir / "config.pbtxt").write_text("""
name: "dense_model"
platform: "pytorch_libtorch"
input [ { name: "input_1" data_type: TYPE_FP32 dims: [ -1 ] } ]
output [ { name: "output_1" data_type: TYPE_FP32 dims: [ -1, 1 ] } ]
""")
subprocess.run(
    [sys.executable, str(REPO_ROOT / "tools" / "convert_dense_model.py"),
     str(ddir / "1" / "model.pt"), str(ddir / "1"),
     "--reshape", "-1", str(DIM * KEYS_PER_SAMPLE)],
    check=True,
)

# 3. Ensemble DAG wiring the two (same config shape as the reference sample).
edir = root / "ensemble_model"
(edir / "1").mkdir(parents=True)
(edir / "config.pbtxt").write_text("""
name: "ensemble_model"
platform: "ensemble"
input [
  { name: "EMB_KEY" data_type: TYPE_INT64 dims: [ -1, -1 ] },
  { name: "EMB_N_KEY" data_type: TYPE_INT32 dims: [ -1, -1 ] }
]
output [ { name: "DENSE_OUTPUT" data_type: TYPE_FP32 dims: [-1, 1] } ]
ensemble_scheduling {
  step [
    { model_name: "hps_embedding" model_version: -1
      input_map { key: "KEYS" value: "EMB_KEY" }
      input_map { key: "NUMKEYS" value: "EMB_N_KEY" }
      output_map { key: "OUTPUT0" value: "LOOKUP_VECTORS" } },
    { model_name: "dense_model" model_version: -1
      input_map { key: "input_1" value: "LOOKUP_VECTORS" }
      output_map { key: "output_1" value: "DENSE_OUTPUT" } }
  ]
}
""")

# 4. ps.json at the repo root (full static cache -> the fused path engages).
(root / "ps.json").write_text(json.dumps({
    "models": [{
        "model": "hps_embedding",
        "sparse_files": ["emb.model"],
        "embedding_vecsize_per_table": [DIM],
        "maxnum_catfeature_query_per_table_per_sample": [KEYS_PER_SAMPLE],
        "max_batch_size": 64,
        "gpucacheper": 1.0,
        "embedding_cache_type": "static",
        "quant_bits": 32,
    }]
}))

# 5. Serve the repository and infer against the ensemble.
server = serve(model_repository=root, port=0, block=False)
try:
    base = f"http://127.0.0.1:{server.port}"
    b = 3
    keys = tbl.keys[: b * KEYS_PER_SAMPLE].astype(np.int64)
    req = {"inputs": [
        {"name": "EMB_KEY", "datatype": "INT64",
         "shape": [b * KEYS_PER_SAMPLE], "data": keys.tolist()},
        {"name": "EMB_N_KEY", "datatype": "INT32", "shape": [1],
         "data": [b * KEYS_PER_SAMPLE]},
    ]}
    resp = json.loads(urllib.request.urlopen(urllib.request.Request(
        f"{base}/v2/models/ensemble_model/infer",
        data=json.dumps(req).encode())).read())
    out = np.asarray(resp["outputs"][0]["data"], np.float32).reshape(b, 1)

    x = expected_vector(keys, DIM).reshape(b, DIM * KEYS_PER_SAMPLE)
    with torch.no_grad():
        want = mlp(torch.from_numpy(x)).numpy()
    assert np.allclose(out, want, rtol=1e-4, atol=1e-5), (out, want)
    print("ensemble predictions:", out.ravel())
    print("torch ground truth:  ", want.ravel())
    print("OK: fused TPU ensemble matches the torch reference")
finally:
    server.stop()
