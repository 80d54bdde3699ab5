"""Online updates: trainer -> queue -> tiers -> HBM cache refresh — the
reference's Kafka pipeline (README.md:213-218) on the file-queue transport.

Runs on CPU:  python examples/03_online_updates.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# Examples default to CPU so they run anywhere; set HPS_EXAMPLES_TPU=1 to use
# a real TPU.
if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")

from hugectr_backend_tpu import HierParameterServer, LookupSession
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import make_synthetic_table
from hugectr_backend_tpu.tiers.base import table_tag
from hugectr_backend_tpu.update import FileQueueSource

root = tempfile.mkdtemp(prefix="hps_example_")
table = make_synthetic_table(1_000, 8, seed=0)
write_sparse_model(f"{root}/t0", table.keys, table.vectors)

ps = HierParameterServer.create(
    {
        "update_source": {
            "type": "file_queue",
            "brokers": f"{root}/updates",
            "poll_timeout_ms": 50,
        },
        "models": [
            {
                "model": "m",
                "sparse_files": [f"{root}/t0"],
                "embedding_vecsize_per_table": [8],
                "maxnum_catfeature_query_per_table_per_sample": [4],
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
                "quant_bits": 32,
            }
        ],
    }
)
sess = LookupSession.create(ps.get_model_params("m"), ps.get_embedding_cache("m", 0))
key = table.keys[:1]
print("before update:", sess.lookup_numpy([key])[0][0][:4])

# Trainer side: publish new weights (Message Producer API).
producer = FileQueueSource(f"{root}/updates")
producer.post(table_tag("m", "sparse_embedding0"), key, np.full((1, 8), 7.0, np.float32))

# Wait for the async consumer, then refresh the cache (the periodic
# refresh_interval cycle does this automatically in production).
time.sleep(1.0)
ps.get_embedding_cache("m", 0).refresh(fraction=1.0)
print("after update: ", sess.lookup_numpy([key])[0][0][:4])
ps.shutdown()
