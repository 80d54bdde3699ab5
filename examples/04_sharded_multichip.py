"""Multi-chip table sharding: rows distributed over a device mesh, lookups via
ICI collectives — replaces the reference's Redis-cluster partitioning.

Runs on CPU with 8 virtual devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/04_sharded_multichip.py
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# Examples default to CPU so they run anywhere; set HPS_EXAMPLES_TPU=1 to use
# a real TPU.
if not os.environ.get("HPS_EXAMPLES_TPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.parallel import ShardedTable, make_mesh, sharded_lookup

mesh = make_mesh(table=len(jax.devices()))
print("mesh:", mesh)

table = make_synthetic_table(100_000, 32, seed=0)
st = ShardedTable.from_numpy(table.keys, table.vectors, mesh, quant="int8")
print(
    f"table: {table.num_rows} rows x 32d int8, "
    f"{st.nbytes_per_shard() / 1e6:.1f} MB per shard across "
    f"{mesh.shape['table']} shards"
)

q = table.keys[np.random.default_rng(0).integers(0, table.num_rows, 4096)]
out = np.asarray(sharded_lookup(st, jnp.asarray(st.slots_for(q))))
err = np.abs(out - expected_vector(q, 32)).max()
print(f"lookup of {len(q)} keys: max int8 error {err:.5f}")
