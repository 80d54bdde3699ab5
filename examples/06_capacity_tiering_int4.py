"""Capacity tiering: a table bigger than the HBM budget served from a UVM
cache over DRAM + SSD tiers, with INT4 rows doubling the resident capacity.

The reference serves terabyte-scale tables the same way (GPU cache over
CPU-memory + RocksDB tiers, docs/hierarchical_parameter_server.md:40-43,
548-573); the TPU build swaps CUDA cache kernels for static-shape device
gathers, and adds int4 nibble packing (quant_bits: 4 — ~2x int8's rows per
HBM byte at the same measured gather speed, see ROOFLINE.md §3.6).

Runs on CPU:  python examples/06_capacity_tiering_int4.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")

from hugectr_backend_tpu import HierParameterServer, LookupSession
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table

root = tempfile.mkdtemp(prefix="hps_example_")
ROWS, DIM = 50_000, 32
table = make_synthetic_table(ROWS, DIM, seed=0)
write_sparse_model(f"{root}/big", table.keys, table.vectors)

ps = HierParameterServer.create(
    {
        # SSD tier holds the full copy (reference persistent_db); DRAM holds
        # the volatile working set. UVM pins the whole table in DRAM too, so
        # steady-state misses never reach the SSD.
        "persistent_db": {"type": "rocks_db", "path": f"{root}/ssd"},
        "volatile_db": {"type": "parallel_hash_map"},
        "models": [
            {
                "model": "big",
                "sparse_files": [f"{root}/big"],
                "embedding_vecsize_per_table": [DIM],
                "maxnum_catfeature_query_per_table_per_sample": [8],
                "max_batch_size": 256,
                # Only 10% of rows fit the device budget -> hot cache.
                "gpucacheper": 0.1,
                "embedding_cache_type": "uvm",
                "hit_rate_threshold": 0.9,
                "quant_bits": 4,  # int4: 2x the resident rows per HBM byte
            }
        ],
    }
)

sess = LookupSession.create(ps.get_model_params("big"), ps.get_embedding_cache("big", 0))
rng = np.random.default_rng(1)

# Zipf-hot traffic: most hits come from the 10% HBM-resident slice after
# warm-up; cold keys read through the DRAM (UVM-pinned) tier.
hot = table.keys[rng.zipf(1.3, 2_000) % ROWS]
out = sess.lookup_numpy([hot])[0]
err = np.abs(out - expected_vector(hot, DIM)).max()
print(f"zipf batch of {hot.size}: max int4 error {err:.4f} (bound {1/14:.4f})")
assert err <= 1 / 14 + 1e-5

cache = ps.get_embedding_cache("big", 0)
print(f"cache hit-rate after warm-up: {cache.hit_meter.rate(0):.2f}")

# A key absent everywhere returns the default row (zeros).
miss = sess.lookup_numpy([np.array([-12345], np.int64)])[0]
assert np.allclose(miss, 0.0)
print("missing key -> default row OK")

# Capacity math this configuration buys per chip (both flavors carry f32
# per-row scales; the ratio approaches 2x as DIM grows past the scale cost).
int8_bytes = ROWS * DIM + ROWS * 4       # 1 B/element + f32 scales
int4_bytes = ROWS * DIM // 2 + ROWS * 4  # packed nibbles + f32 scales
print(
    f"full-table bytes: int8 {int8_bytes/1e6:.1f} MB vs int4 "
    f"{int4_bytes/1e6:.1f} MB ({int8_bytes/int4_bytes:.2f}x more rows per byte"
    f" at dim {DIM}; -> 2x asymptotically)"
)
