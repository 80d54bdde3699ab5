"""Multi-chip table sharding AS A CONFIG ACTION: ps.json ``shard_tables``
deploys every table row-sharded over the device mesh, served through the
standard stack (ModelManager -> continuous batcher -> HTTP frontend), with
lookups riding ICI collectives — the TPU replacement for the reference's
Redis-cluster ``num_partitions`` capacity partitioning
(reference docs/hierarchical_parameter_server.md:435-444).

Runs on CPU with 8 virtual devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/04_sharded_multichip.py
"""

import json
import os
import sys
import tempfile
import urllib.request

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# Examples default to CPU so they run anywhere; set HPS_EXAMPLES_TPU=1 to use
# a real TPU.
if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.serving.model_manager import ModelManager
from hugectr_backend_tpu.serving.server import HpsHttpServer

n_dev = len(jax.devices())
root = tempfile.mkdtemp()
dim = 32
table = make_synthetic_table(100_000, dim, seed=0)
write_sparse_model(os.path.join(root, "emb0"), table.keys, table.vectors)

# The whole deployment is this config — no sharding code on the user side.
ps_json = {
    "models": [
        {
            "model": "dlrm",
            "sparse_files": [os.path.join(root, "emb0")],
            "embedding_vecsize_per_table": [dim],
            "maxnum_catfeature_query_per_table_per_sample": [4],
            "gpucacheper": 1.0,
            "embedding_cache_type": "static",
            "quant_bits": 8,
            "shard_tables": True,                      # <- the feature
            "deployed_device_list": list(range(n_dev)),  # the mesh
            "shard_strategy": "all_to_all",
        }
    ]
}

mgr = ModelManager.create(json.dumps(ps_json))
cache = mgr.ps.get_embedding_cache("dlrm", 0)
per_shard = sum(t.nbytes_per_shard() for t in cache.tables) / 1e6
print(f"table: {table.num_rows} rows x {dim}d int8, "
      f"{per_shard:.1f} MB per shard across {n_dev} shards "
      f"(strategy={cache.strategy})")

# Serve over the KServe HTTP frontend like any other model.
server = HpsHttpServer(mgr, port=0).start()
q = table.keys[np.random.default_rng(0).integers(0, table.num_rows, 64)]
req = {
    "inputs": [
        {"name": "KEYS", "datatype": "INT64", "shape": [len(q)],
         "data": [int(k) for k in q]},
        {"name": "NUMKEYS", "datatype": "INT32", "shape": [1],
         "data": [len(q)]},
    ]
}
r = urllib.request.Request(
    f"http://127.0.0.1:{server.port}/v2/models/dlrm/infer",
    data=json.dumps(req).encode(), method="POST",
)
with urllib.request.urlopen(r) as resp:
    out = np.asarray(json.loads(resp.read())["outputs"][0]["data"],
                     np.float32).reshape(-1, dim)
err = np.abs(out - expected_vector(q, dim)).max()
print(f"HTTP lookup of {len(q)} keys through the sharded path: "
      f"max int8 error {err:.5f}")
server.stop()
mgr.shutdown()
