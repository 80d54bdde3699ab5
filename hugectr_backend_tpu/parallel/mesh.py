"""Device mesh construction for sharded embedding serving.

The multi-chip scale-out model (replacing the reference's Redis-cluster key
partitioning across nodes, reference docs/architecture.md:131-137, and its
NCCL-free multi-GPU data parallelism, SURVEY §2.3):

- axis ``table``: embedding-table rows sharded across chips (capacity
  scaling — a pod's HBM in aggregate, like the reference's "RAM of the whole
  cluster");
- axis ``data``: request batches replicated/split (throughput scaling, like
  the reference's ``deployed_device_list`` per-GPU instances).

Collectives ride ICI inside ``shard_map``; there is no host-side RPC in the
lookup path (the reference pays a network hop to Redis for every distributed
lookup, docs/hierarchical_parameter_server.md:36).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    table: int = 1,
    data: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data x table) mesh from the first data*table devices."""
    if table < 1 or data < 1:
        raise ValueError(
            f"mesh axes must be >= 1 (got table={table}, data={data})"
        )
    devices = devices if devices is not None else jax.devices()
    need = table * data
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, table)
    return Mesh(arr, ("data", "table"))
