"""Model zoo tour — every fused dense family served behind the same lookup
engine (the reference serves these via HPS → TF/TRT Triton ensembles,
samples/hps-triton-ensemble/README.md; here each is ONE XLA program).

Families: WDL, DCN-v2, DeepFM, xDeepFM, NCF. DLRM has its own example
(02_fused_dlrm_serving.py); DIN's variable-length pooled lookups are in the
pooled-serving path (serving/pooled.py).

Runs on CPU:  python examples/07_model_zoo.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from hugectr_backend_tpu import HierParameterServer
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import make_synthetic_table
from hugectr_backend_tpu.models import BST, NCF, DCNv2, DeepFM, WideAndDeep, XDeepFM
from hugectr_backend_tpu.serving.program import (
    make_dcn_server,
    make_deepfm_server,
    make_ncf_server,
    make_wdl_server,
    make_xdeepfm_server,
)

root = tempfile.mkdtemp(prefix="hps_zoo_")
rng = np.random.default_rng(0)
B, ND = 8, 13

# One shared deployment: a vecsize-1 "wide/first-order" table and two
# vecsize-16 feature tables.
wide = make_synthetic_table(5_000, 1, seed=1)
feat_a = make_synthetic_table(20_000, 16, seed=2)
feat_b = make_synthetic_table(30_000, 16, seed=3)
for name, tbl in [("wide", wide), ("a", feat_a), ("b", feat_b)]:
    write_sparse_model(f"{root}/{name}", tbl.keys, tbl.vectors)

ps = HierParameterServer.create(
    {
        "models": [
            {
                "model": "pair",  # wide + deep (WDL, DeepFM)
                "sparse_files": [f"{root}/wide", f"{root}/a"],
                "embedding_vecsize_per_table": [1, 16],
                "maxnum_catfeature_query_per_table_per_sample": [4, 4],
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
            },
            {
                "model": "stack",  # equal-dim tables (DCN-v2, xDeepFM)
                "sparse_files": [f"{root}/a", f"{root}/b"],
                "embedding_vecsize_per_table": [16, 16],
                "maxnum_catfeature_query_per_table_per_sample": [2, 3],
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
            },
            {
                "model": "two_tower",  # user/item (NCF)
                "sparse_files": [f"{root}/a", f"{root}/b"],
                "embedding_vecsize_per_table": [16, 16],
                "maxnum_catfeature_query_per_table_per_sample": [1, 1],
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
            },
        ]
    }
)

dense = rng.standard_normal((B, ND)).astype(np.float32)
wkeys = wide.keys[rng.integers(0, 5_000, (B, 4))]
akeys = feat_a.keys[rng.integers(0, 20_000, (B, 4))]


def show(name, logits):
    print(f"{name:8s} logits[:4] = {np.asarray(logits)[:4].round(4)}")


# --- WDL ------------------------------------------------------------------
model = WideAndDeep(deep_widths=(64, 1))
mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, ND)),
                jnp.zeros((B, 4, 1)), jnp.zeros((B, 4, 16)))
srv = make_wdl_server(ps.get_model_params("pair"),
                      ps.get_embedding_cache("pair", 0), model, mp)
show("WDL", srv.predict([wkeys, akeys], dense))

# --- DeepFM (first-order table + shared second-order embeddings) ----------
model = DeepFM(deep_widths=(64, 1))
mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, ND)),
                jnp.zeros((B, 4, 1)), jnp.zeros((B, 4, 16)))
srv = make_deepfm_server(ps.get_model_params("pair"),
                         ps.get_embedding_cache("pair", 0), model, mp)
show("DeepFM", srv.predict([wkeys, akeys], dense))

# --- DCN-v2 / xDeepFM over stacked equal-dim tables -----------------------
skeys = [feat_a.keys[rng.integers(0, 20_000, (B, 2))],
         feat_b.keys[rng.integers(0, 30_000, (B, 3))]]
model = DCNv2(num_cross_layers=2, cross_rank=16, deep_widths=(64,),
              head_widths=(32, 1))
mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, ND)),
                jnp.zeros((B, 5, 16)))
srv = make_dcn_server(ps.get_model_params("stack"),
                      ps.get_embedding_cache("stack", 0), model, mp)
show("DCN-v2", srv.predict(skeys, dense))

model = XDeepFM(cin_feature_maps=(16, 8), deep_widths=(64, 1))
mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, ND)),
                jnp.zeros((B, 5, 16)))
srv = make_xdeepfm_server(ps.get_model_params("stack"),
                          ps.get_embedding_cache("stack", 0), model, mp)
show("xDeepFM", srv.predict(skeys, dense))

# --- NCF (two-tower user/item) --------------------------------------------
ukeys = feat_a.keys[rng.integers(0, 20_000, (B, 1))]
ikeys = feat_b.keys[rng.integers(0, 30_000, (B, 1))]
model = NCF(mlp_widths=(64, 32))
mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, 0)),
                jnp.zeros((B, 1, 16)), jnp.zeros((B, 1, 16)))
srv = make_ncf_server(ps.get_model_params("two_tower"),
                      ps.get_embedding_cache("two_tower", 0), model, mp)
show("NCF", srv.predict([ukeys, ikeys], np.zeros((B, 0), np.float32)))

# --- BST (behavior-sequence transformer over the DIN serving path) --------
from hugectr_backend_tpu.serving.pooled import FusedDinServer

tkeys = feat_b.keys[rng.integers(0, 30_000, B)]
hkeys = feat_b.keys[rng.integers(0, 30_000, (B, 6))]
seq_len = rng.integers(0, 7, B).astype(np.int32)
model = BST(num_heads=4, num_layers=1, head_widths=(32, 1))
mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, ND)),
                jnp.zeros((B, 16)), jnp.zeros((B, 6, 16)),
                jnp.zeros((B,), jnp.int32))
srv = FusedDinServer(ps.get_model_params("two_tower"),
                     ps.get_embedding_cache("two_tower", 0), model, mp,
                     target_table=1, seq_table=1)
show("BST", srv.predict(tkeys, hkeys, seq_len, dense))

print("model zoo OK — six families served through one lookup engine")
