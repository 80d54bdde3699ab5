"""Two-tower retrieval: user tower + full-corpus scoring + top-k, fused.

The item corpus IS the resident (int8-quantized) embedding table; one XLA
program runs the user-embedding gather, the query-tower MLP, a [B, N]
MXU matmul against the quantized corpus (dequant scales fold into a
columnwise multiply), and the on-device top-k — only the winners reach
the host.

Runs on CPU:  python examples/09_retrieval_topk.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# Examples default to CPU so they run anywhere; set HPS_EXAMPLES_TPU=1 to use
# a real TPU.
if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import tempfile

import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import make_synthetic_table
from hugectr_backend_tpu.models import TwoTowerUser
from hugectr_backend_tpu.serving.retrieval import RetrievalServer

root = tempfile.mkdtemp()
dim, n_users, n_items = 32, 10_000, 50_000
users = make_synthetic_table(n_users, dim, seed=1)
items = make_synthetic_table(n_items, dim, seed=2)
write_sparse_model(f"{root}/users", users.keys, users.vectors)
write_sparse_model(f"{root}/items", items.keys, items.vectors)

ps = HierParameterServer.create({
    "models": [{
        "model": "retrieval",
        "sparse_files": [f"{root}/users", f"{root}/items"],
        "embedding_vecsize_per_table": [dim, dim],
        "maxnum_catfeature_query_per_table_per_sample": [1, 1],
        "gpucacheper": 1.0,
        "embedding_cache_type": "static",
        "quant_bits": 8,
    }]
})

model = TwoTowerUser(widths=(64, dim))
b, nd = 8, 4
params = model.init(jax.random.PRNGKey(0), jnp.zeros((b, nd)),
                    jnp.zeros((b, 1, dim)))
srv = RetrievalServer(
    ps.get_model_params("retrieval"),
    ps.get_embedding_cache("retrieval", 0),
    model, params, user_table=0, item_table=1, k=10,
)

rng = np.random.default_rng(0)
ukeys = users.keys[rng.integers(0, n_users, b)]
dense = rng.standard_normal((b, nd)).astype(np.float32)
item_keys, scores = srv.retrieve(ukeys, dense)
print(f"retrieved top-10 of {n_items} items for {b} users "
      f"(int8 corpus, one fused program)")
print("user", int(ukeys[0]), "-> items", item_keys[0][:5].tolist(),
      "scores", np.round(scores[0][:5], 4).tolist())
assert (np.diff(scores, axis=1) <= 1e-6).all()
print("ok")
