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

# --- Variant: one table PER categorical feature (the Criteo layout) --------
# make_dlrm_multi_server hands the dense graph the lookup outputs CHUNKED
# (EmbParts), so on TPU the Pallas interaction assembles z in VMEM instead
# of materializing the [B, T, D] stack (ROOFLINE.md §6.4). Pass
# quant_fmt="w8a8" to DLRM (+ quantize_model_params) for int8-MXU dense.
from hugectr_backend_tpu.serving.program import make_dlrm_multi_server

ntab, dim = 6, 64
tabs = [make_synthetic_table(10_000, dim, seed=10 + t) for t in range(ntab)]
for t, tbl in enumerate(tabs):
    write_sparse_model(f"{root}/mt{t}", tbl.keys, tbl.vectors)
ps2 = HierParameterServer.create(
    {
        "models": [
            {
                "model": "dlrm_multi",
                "sparse_files": [f"{root}/mt{t}" for t in range(ntab)],
                "embedding_vecsize_per_table": [dim] * ntab,
                "maxnum_catfeature_query_per_table_per_sample": [1] * ntab,
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
                "quant_bits": 8,
            }
        ]
    }
)
model2 = DLRM(bottom_widths=(128, dim), top_widths=(128, 1))
params2 = model2.init(
    jax.random.PRNGKey(1), jnp.zeros((batch, 13)),
    jnp.zeros((batch, ntab, dim)),
)
srv2 = make_dlrm_multi_server(
    ps2.get_model_params("dlrm_multi"),
    ps2.get_embedding_cache("dlrm_multi", 0), model2, params2,
)
keys2 = [tabs[t].keys[rng.integers(0, 10_000, (batch, 1))] for t in range(ntab)]
print("multi-table logits:", np.asarray(srv2.predict(keys2, dense))[:8])
