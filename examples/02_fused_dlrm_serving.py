"""Fused sparse+dense serving — replaces the reference's Triton ensemble
(`02_model_inference_hps_tf_ensemble.ipynb`): lookup and dense forward run as
ONE XLA program.

Runs on CPU:  python examples/02_fused_dlrm_serving.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# Examples default to CPU so they run anywhere; set HPS_EXAMPLES_TPU=1 to use
# a real TPU.
if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import make_synthetic_table
from hugectr_backend_tpu.models import DLRM
from hugectr_backend_tpu.serving.program import FusedDlrmServer

root = tempfile.mkdtemp(prefix="hps_example_")
table = make_synthetic_table(50_000, 64, seed=0)
write_sparse_model(f"{root}/t0", table.keys, table.vectors)

ps = HierParameterServer.create(
    {
        "models": [
            {
                "model": "dlrm",
                "sparse_files": [f"{root}/t0"],
                "embedding_vecsize_per_table": [64],
                "maxnum_catfeature_query_per_table_per_sample": [26],
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
                "quant_bits": 8,
            }
        ]
    }
)

batch = 32
model = DLRM(bottom_widths=(128, 64), top_widths=(128, 1))
params = model.init(
    jax.random.PRNGKey(0),
    jnp.zeros((batch, 13)),
    jnp.zeros((batch, 26, 64)),
)
srv = FusedDlrmServer(
    ps.get_model_params("dlrm"), ps.get_embedding_cache("dlrm", 0), model, params
)

rng = np.random.default_rng(0)
keys = table.keys[rng.integers(0, 50_000, (batch, 26))]
dense = rng.standard_normal((batch, 13)).astype(np.float32)
logits = srv.predict(keys, dense)
print("logits:", np.asarray(logits)[:8])
