"""Sharded fused serving: multi-chip lookup + dense forward in ONE program.

BASELINE config 3: "DCN-v2 with multi-table embeddings sharded across 2 hosts
(all-to-all lookup over ICI)" — generalized to any of the model zoo. The
whole step is a single jitted program over the mesh:

- tables row-sharded over the ``table`` axis (ShardedTable);
- the batch sharded over the ``data`` axis;
- each chip gathers its local rows for the full slot vector; the psum that
  combines shard partials rides ICI, and XLA's latency-hiding scheduler
  overlaps it with the dense bottom-MLP compute that does not depend on the
  embeddings (the "collective overlapped with dense forward" requirement —
  the program structure makes the overlap legal; XLA schedules it).

The reference achieves multi-node capacity with Redis-cluster RPC per lookup
(reference docs/architecture.md:131-137) and cannot overlap it with dense
compute, which lives in a different ensemble step.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hugectr_backend_tpu.parallel.sharded_table import (
    ShardedTable,
    _a2a_shardmap,
    _lookup_shardmap,
    plan_all_to_all,
)


class ShardedFusedServer:
    """Fused sharded serving for models consuming per-table [B, K_t, D_t].

    ``assemble_fn(dense, embs) -> logits`` receives replicated embeddings;
    the dense forward runs data-parallel over the ``data`` axis.

    ``strategy`` selects the collective lookup (parallel/sharded_table.py):
    "all_to_all" (default — host dedup + bucket routing; the host translates
    keys anyway, and the deduped row blocks ride one all_gather that XLA
    overlaps with the bottom-MLP compute) or "psum" (host-free fallback).
    """

    def __init__(
        self,
        mesh: Mesh,
        tables: Sequence[ShardedTable],
        keys_per_sample: Sequence[int],
        assemble_fn: Callable,
        strategy: str = "all_to_all",
    ):
        if strategy not in ("psum", "all_to_all"):
            raise ValueError(f"unknown strategy {strategy!r}")
        self.mesh = mesh
        self.tables = list(tables)
        self.keys_per_sample = list(keys_per_sample)
        self.strategy = strategy
        axis = self.tables[0].shard_axis if self.tables else "table"
        self.shard_axis = axis
        if strategy == "psum":
            lookups = [
                _lookup_shardmap(mesh, t.scales is not None, t.rows_padded,
                                 axis=axis)
                for t in self.tables
            ]
        else:
            lookups = [
                _a2a_shardmap(mesh, t.scales is not None, axis=axis)
                for t in self.tables
            ]

        @functools.partial(jax.jit, static_argnames=("batch",))
        def fwd(values_list, scales_list, routed_list, dense, batch: int):
            embs = []
            for lk, v, s, routed, k in zip(
                lookups, values_list, scales_list, routed_list,
                self.keys_per_sample,
            ):
                if strategy == "psum":
                    (sl,) = routed
                    flat = lk(v, s, sl) if s is not None else lk(v, sl)
                else:
                    bkt, exp = routed
                    flat = lk(v, s, bkt, exp) if s is not None else lk(v, bkt, exp)
                embs.append(flat.reshape(batch, k, flat.shape[-1]))
            dense = jax.lax.with_sharding_constraint(
                dense, NamedSharding(mesh, P("data", None))
            )
            return assemble_fn(dense, embs)

        self._fwd = fwd

    def predict(self, keys_per_table, dense: np.ndarray) -> jax.Array:
        from hugectr_backend_tpu.parallel.sharded_table import _bucket_pow2

        dense = np.asarray(dense, dtype=np.float32)
        b = dense.shape[0]
        # Pad the batch to the pow2 bucket grid (miss-slot pads + zero
        # dense rows, sliced off below): `batch` is a static jit arg and
        # the routed shapes key the compile cache, so unbucketed sizes
        # would compile the whole fused model once per distinct batch —
        # ruinous on a shared serial compile queue.
        b_pad = _bucket_pow2(b)
        if b_pad != b:
            dense = np.concatenate(
                [dense, np.zeros((b_pad - b, dense.shape[1]), np.float32)]
            )
        n_shards = self.mesh.shape[self.shard_axis]
        routed_list = []
        for t, keys in enumerate(keys_per_table):
            k = self.keys_per_sample[t]
            keys = np.asarray(keys, np.int64).reshape(b * k)
            slots = self.tables[t].slots_for(keys)
            if b_pad != b:
                slots = np.concatenate([
                    slots,
                    np.full((b_pad - b) * k, self.tables[t].index.miss_slot,
                            slots.dtype),
                ])
            if self.strategy == "psum":
                routed_list.append((jnp.asarray(slots),))
            else:
                buckets, expand = plan_all_to_all(
                    slots, n_shards, self.tables[t].rows_padded // n_shards
                )
                routed_list.append(
                    (jnp.asarray(buckets), jnp.asarray(expand))
                )
        out = self._fwd(
            [t.values for t in self.tables],
            [t.scales for t in self.tables],
            routed_list,
            jnp.asarray(dense),
            batch=b_pad,
        )
        return out if b_pad == b else out[:b]


def make_sharded_stacked_server(mesh, tables, keys_per_sample, model,
                                model_params):
    """Fused sharded serving for any model consuming the per-table
    embeddings stacked on the feature axis (DLRM, DCN-v2, xDeepFM, ...)."""

    def assemble(dense, embs):
        emb = jnp.concatenate(embs, axis=1)
        return model.apply(model_params, dense, emb)

    return ShardedFusedServer(mesh, tables, keys_per_sample, assemble)


# Model-family aliases (identical assembly; kept for call-site clarity).
make_sharded_dcn_server = make_sharded_stacked_server
make_sharded_dlrm_server = make_sharded_stacked_server
