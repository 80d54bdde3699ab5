"""Deploy a model and serve lookups — the reference's
`Hierarchical_Parameter_Server_Deployment.ipynb` flow, self-contained.

Runs on CPU:  python examples/01_deploy_and_lookup.py
"""

import json
import os
import sys
import tempfile
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# Examples default to CPU so they run anywhere; set HPS_EXAMPLES_TPU=1 to use
# a real TPU.
if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")

from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import make_synthetic_table
from hugectr_backend_tpu.serving.model_manager import ModelManager
from hugectr_backend_tpu.serving.server import HpsHttpServer

root = tempfile.mkdtemp(prefix="hps_example_")

# 1. "Training" writes the sparse model in the HPS binary format.
table = make_synthetic_table(10_000, 16, seed=0)
write_sparse_model(f"{root}/dlrm_table0", table.keys, table.vectors)

# 2. ps.json — same schema as the reference's.
ps_json = {
    "supportlonglong": True,
    "models": [
        {
            "model": "dlrm",
            "sparse_files": [f"{root}/dlrm_table0"],
            "embedding_vecsize_per_table": [16],
            "maxnum_catfeature_query_per_table_per_sample": [26],
            "max_batch_size": 1024,
            "gpucache": True,
            "gpucacheper": 0.5,
            "hit_rate_threshold": 0.9,
            "embedding_cache_type": "dynamic",
            "quant_bits": 8,
        }
    ],
}

# 3. Serve (the `tritonserver --backend-config=hps,ps=...` equivalent).
server = HpsHttpServer(ModelManager.create(json.dumps(ps_json)), port=0).start()
print(f"serving on port {server.port}")

# 4. Health check + inference, as the reference notebooks do with curl/tritonclient.
with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/v2/health/ready") as r:
    print("ready:", r.status)

batch = 2
keys = table.keys[: 26 * batch]
req = {
    "inputs": [
        {"name": "KEYS", "datatype": "INT64", "shape": [len(keys)],
         "data": [int(k) for k in keys]},
        {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [len(keys)]},
    ]
}
resp = json.loads(
    urllib.request.urlopen(
        urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v2/models/dlrm/infer",
            json.dumps(req).encode(),
            method="POST",
        )
    ).read()
)
out = np.asarray(resp["outputs"][0]["data"], np.float32).reshape(-1, 16)
print("NumSample:", resp["parameters"]["NumSample"], "output:", out.shape)
print("first vector:", out[0][:4], "...")
server.stop()
