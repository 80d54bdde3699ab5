"""Lookup session: the per-(model, device) query object.

TPU-native implementation of the reference's ``LookupSessionBase`` contract
(reference docs/architecture.md:308-323; created at model_instance_state.cpp:171,
hot call at :194):

    LookupSession.create(params, embedding_cache)
    session.lookup(keys_per_table, num_keys_per_table) -> per-table vectors

Sessions are thread-safe and many sessions share one :class:`EmbeddingCache`
(reference docs/architecture.md:20). The device program is jit-compiled once
per (padded) batch shape — the TPU analogue of the reference's
``use_cuda_graph`` (reference backend.cpp InferenceParams).

The request wire format is preserved (reference docs/architecture.md:220-231):
``KEYS`` is the flat int64 concatenation over tables of each sample's keys;
``NUMKEYS`` is the per-table total key count. ``lookup_from_request`` consumes
that format directly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax

from hugectr_backend_tpu.cache.embedding_cache import EmbeddingCache
from hugectr_backend_tpu.config.params import InferenceParams


class LookupSession:
    def __init__(self, params: InferenceParams, cache: EmbeddingCache):
        self.params = params
        self.cache = cache

    @classmethod
    def create(cls, params: InferenceParams, embedding_cache: EmbeddingCache):
        """Reference ``LookupSessionBase::create`` (model_instance_state.cpp:171)."""
        return cls(params, embedding_cache)

    # ------------------------------------------------------------------ lookup

    def lookup(
        self,
        keys_per_table: Sequence[np.ndarray],
        num_keys_per_table: Optional[Sequence[int]] = None,
    ) -> list[jax.Array]:
        """Per-table gather+dequant with miss-merge and default-on-miss.

        ``keys_per_table[t]`` may be over-allocated; ``num_keys_per_table[t]``
        bounds the live prefix (mirrors the reference's pointer+count calling
        convention, docs/architecture.md:308-323). Returns per-table float32
        device arrays of shape [num_keys_t, vecsize_t].
        """
        if len(keys_per_table) != self.cache.num_tables:
            raise ValueError(
                f"got {len(keys_per_table)} key arrays for "
                f"{self.cache.num_tables} tables"
            )
        if num_keys_per_table is not None:
            keys_per_table = [
                np.asarray(k).reshape(-1)[: int(n)]
                for k, n in zip(keys_per_table, num_keys_per_table)
            ]
        return self.cache.lookup(keys_per_table)

    def lookup_numpy(self, keys_per_table, num_keys_per_table=None) -> list[np.ndarray]:
        return [np.asarray(o) for o in self.lookup(keys_per_table, num_keys_per_table)]

    def lookup_flat(self, keys_per_table, num_keys_per_table=None,
                    pad_counts=None) -> jax.Array:
        """Single flat f32 OUTPUT0 vector (table-major) in one compiled
        program + one transfer — the serving frontend's hot path.

        ``pad_counts[t]`` (optional) pads table t's run to that many rows at
        the SLOT level (default-row slots, discarded by the caller) so
        compiled signatures stay on a fixed bucket grid."""
        if len(keys_per_table) != self.cache.num_tables:
            raise ValueError(
                f"got {len(keys_per_table)} key arrays for "
                f"{self.cache.num_tables} tables"
            )
        if num_keys_per_table is not None:
            keys_per_table = [
                np.asarray(k).reshape(-1)[: int(n)]
                for k, n in zip(keys_per_table, num_keys_per_table)
            ]
        return self.cache.lookup_flat(keys_per_table, pad_counts=pad_counts)

    # ---------------------------------------------------------- wire format

    def split_request(self, flat_keys: np.ndarray, num_keys: np.ndarray):
        """Split the flat KEYS buffer into per-table key arrays using NUMKEYS
        (reference hps.cc:586-625 builds per-table pointers the same way)."""
        flat_keys = np.asarray(flat_keys, dtype=np.int64).reshape(-1)
        num_keys = np.asarray(num_keys, dtype=np.int64).reshape(-1)
        if num_keys.shape[0] != self.cache.num_tables:
            raise ValueError(
                f"NUMKEYS has {num_keys.shape[0]} entries, expected "
                f"{self.cache.num_tables}"
            )
        if (num_keys < 0).any():
            # A negative count passes the sum check while silently
            # misrouting keys between tables (negative slice offsets).
            raise ValueError(f"NUMKEYS entries must be >= 0, got "
                             f"{num_keys.tolist()}")
        total = int(num_keys.sum())
        if total != flat_keys.shape[0]:
            raise ValueError(
                f"KEYS holds {flat_keys.shape[0]} keys but NUMKEYS sums to {total}"
            )
        offsets = np.concatenate([[0], np.cumsum(num_keys)]).astype(np.int64)
        return [
            flat_keys[offsets[t] : offsets[t + 1]] for t in range(len(num_keys))
        ]

    def lookup_from_request(self, flat_keys: np.ndarray, num_keys: np.ndarray) -> np.ndarray:
        """Full request path: KEYS+NUMKEYS in, flat float32 out.

        Output is the concatenation over tables of the per-table result rows
        (sum_t numkeys_t * vecsize_t floats — the reference's output sizing,
        hps.cc:620-625 via inner_product)."""
        per_table_keys = self.split_request(flat_keys, num_keys)
        outs = self.lookup(per_table_keys)
        return np.concatenate([np.asarray(o).reshape(-1) for o in outs])

    def num_samples_of(self, flat_keys: np.ndarray) -> int:
        """num_of_samples = len(KEYS) / cat_num (reference hps.cc:573-582)."""
        cat = self.params.cat_num
        n = np.asarray(flat_keys).reshape(-1).shape[0]
        if cat == 0 or n % cat:
            raise ValueError(
                f"KEYS length {n} is not a multiple of cat_num {cat}"
            )
        return n // cat
