"""Fused serving programs: lookup + dense forward as one XLA executable.

The reference composes the sparse HPS backend with a separate dense backend
via a Triton ensemble DAG (reference samples/hps-triton-ensemble/README.md:4-8)
— two engines, a device round-trip between them. On TPU both halves fuse into
ONE jitted program: dequant+gather feeds the dense MLP/interaction directly in
HBM (BASELINE: "Fused single XLA program ... overlapped with dense DNN
forward"), so the embedding result never re-enters host memory.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.cache.embedding_cache import EmbeddingCache
from hugectr_backend_tpu.config.params import InferenceParams
from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla


def make_dlrm_forward(model, keys_per_sample: int):
    """Build the fused (params, table, slots, dense) -> logits program.

    ``slots`` is [B * keys_per_sample] int32 (host-translated); the gather,
    dequant, reshape and the full dense graph compile into a single XLA
    executable, jitted once per batch bucket.
    """

    @jax.jit
    def forward(params, values, scales, slots, dense):
        flat = gather_dequant_xla(values, scales, slots)
        emb = flat.reshape(dense.shape[0], keys_per_sample, flat.shape[-1])
        return model.apply(params, dense, emb)

    return forward


class FusedDlrmServer:
    """Serve DLRM end-to-end against an :class:`EmbeddingCache`.

    One instance per (model, device); thread-safe like a LookupSession. The
    host does key->slot translation; everything else runs on device.
    """

    def __init__(
        self,
        params: InferenceParams,
        cache: EmbeddingCache,
        model,
        model_params,
        table_idx: int = 0,
    ):
        if cache.num_tables <= table_idx:
            raise ValueError("cache does not hold the requested table")
        self.params = params
        self.cache = cache
        self.model = model
        self.model_params = model_params
        self.table_idx = table_idx
        self.keys_per_sample = params.maxnum_catfeature_query_per_table_per_sample[
            table_idx
        ]
        self._forward = make_dlrm_forward(model, self.keys_per_sample)

    def predict(self, keys: np.ndarray, dense: np.ndarray) -> jax.Array:
        """keys [B, keys_per_sample] or flat; dense [B, num_dense]."""
        dense = np.asarray(dense, dtype=np.float32)
        b = dense.shape[0]
        keys = np.asarray(keys, dtype=np.int64).reshape(b * self.keys_per_sample)
        slots = self.cache.translate(self.table_idx, keys).astype(np.int32)
        table = self.cache.tables[self.table_idx]
        return self._forward(
            self.model_params,
            table.values,
            table.scales,
            jnp.asarray(slots),
            jnp.asarray(dense),
        )
