"""Retrieval serving: user-tower + full-corpus MXU scoring + top-k, fused.

One jitted program per batch bucket: user-embedding gather -> user tower
MLP -> [B, N] corpus scores as a single MXU matmul against the QUANTIZED
item table (the per-row dequant scales fold into a columnwise multiply of
the score matrix, so the dequantized corpus never materializes) ->
``lax.top_k`` on device. Only the [B, k] winners travel to the host.

Reference parity: HugeCTR's zoo serves retrieval models through HPS the
same lookup-plus-dense way as its ranking demos (reference
samples/hps-triton-ensemble/README.md:1-24); candidate scoring there runs
in a separate dense engine with the corpus shipped per request — here the
corpus IS the resident embedding table (see models/two_tower.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla


class RetrievalServer:
    """Serve two-tower retrieval against an :class:`EmbeddingCache`.

    ``user_table`` feeds the query tower; ``item_table`` is the corpus
    (every resident row is a candidate). ``model`` is a
    :class:`~hugectr_backend_tpu.models.two_tower.TwoTowerUser`-shaped
    module: ``apply(params, dense, user_emb [B, K_u, D_u]) -> [B, D]``
    with D equal to the item embedding dim.

    Scoring precision: int8/bf16 corpora score through bf16 MXU passes
    (int8 values are exact in bf16; the f32 query rounds to bf16 — the
    same precision XLA's default matmul uses); fp32 corpora score in f32.
    int4 nibble-packed item tables are not supported (route the item
    table to int8 via per-table quant policy).
    """

    def __init__(self, params, cache, model, model_params,
                 user_table: int = 0, item_table: int = 1, k: int = 100):
        if cache.num_tables <= max(user_table, item_table):
            raise ValueError("cache does not hold the requested tables")
        cache_type = getattr(params.embedding_cache_type, "value",
                             params.embedding_cache_type)
        if str(cache_type) != "static":
            # Dynamic/UVM slotmaps REASSIGN slots on eviction: scoring row
            # j and reporting sorted_keys[j] would label another key's
            # vector with an evicted key's id.
            raise ValueError(
                "retrieval requires embedding_cache_type 'static' (the "
                "corpus row -> key mapping must be stable), got "
                f"{cache_type}"
            )
        it = cache.tables[item_table]
        if getattr(it.values, "dtype", None) == jnp.uint8:
            raise ValueError(
                "retrieval corpus cannot be int4 nibble-packed; serve the "
                "item table at quant_bits 8/16/32"
            )
        self.params = params
        self.cache = cache
        self.model = model
        self.model_params = model_params
        self.user_table = user_table
        self.item_table = item_table
        self.k = int(k)
        if not (1 <= self.k <= it.capacity):
            raise ValueError(
                f"k={self.k} must be in [1, corpus size {it.capacity}]"
            )
        self.keys_per_sample = params.maxnum_catfeature_query_per_table_per_sample[
            user_table
        ]

        @functools.partial(jax.jit, static_argnames=("batch", "n_items", "k"))
        def fwd(mp, uvals, uscales, uslots, uscin, ivals, iscales, dense,
                batch: int, n_items: int, k: int):
            urows = gather_dequant_xla(uvals, uscales, uslots)
            if uscin is not None:
                urows = urows * uscin[:, None]
            q = model.apply(
                mp, dense, urows.reshape(batch, -1, urows.shape[-1])
            )  # [B, D]
            iv = ivals
            if iv.ndim == 3:  # blocked [K, SUB, D] corpus
                iv = iv.reshape(-1, iv.shape[-1])
            iv = iv[:n_items]
            if iv.dtype == jnp.float32:
                scores = jax.lax.dot_general(
                    q, iv, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                scores = jax.lax.dot_general(
                    q.astype(jnp.bfloat16), iv.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if iscales is not None:
                sc = iscales
                if sc.ndim == 2:
                    sc = sc.reshape(-1)
                scores = scores * sc[:n_items][None, :]
            return jax.lax.top_k(scores, k)

        self._fwd = fwd

    def retrieve(self, user_keys: np.ndarray, dense: np.ndarray, k=None):
        """-> (item_keys [B, k] int64, scores [B, k] f32).

        ``user_keys`` [B, K_u] or flat; ``dense`` [B, Nd] user-side dense
        features (zero-width allowed)."""
        k = self.k if k is None else int(k)
        dense = np.asarray(dense, dtype=np.float32)
        b = dense.shape[0]
        user_keys = np.asarray(user_keys, np.int64).reshape(
            b * self.keys_per_sample
        )
        cache = self.cache
        # User side: translate + arena-aware operand snapshot (one lock
        # hold inside translate_resolve). Item side: the table VIEW — its
        # .values/.scales properties slice the member rows out of the
        # arena, so the corpus operand is already [cap+1, D].
        uvals, uscales, uslots, uscin = cache.translate_resolve(
            self.user_table, user_keys
        )
        with cache._lock:
            it = cache.tables[self.item_table]
            # The functional object writers REPLACE is the raw values
            # array (arena.values for views, the .values field for solo
            # tables) — key the corpus-operand memo on its identity, so
            # the ArenaView property slice (a device dispatch) runs only
            # after a refresh/update actually swapped the array.
            arena = getattr(it, "arena", None)
            raw = arena.values if arena is not None else it.values
            snap = getattr(self, "_item_snap", None)
            if snap is None or snap[0] is not raw:
                snap = (raw, it.values, it.scales, int(it.capacity),
                        it.index.sorted_keys)
                self._item_snap = snap
            _, ivals, iscales, n_items, item_sorted_keys = snap
        if not (1 <= k <= n_items):
            raise ValueError(
                f"k={k} must be in [1, corpus size {n_items}] "
                "(lax.top_k cannot exceed the candidate count)"
            )
        scores, idx = self._fwd(
            self.model_params, uvals, uscales, jnp.asarray(uslots),
            None if uscin is None else jnp.asarray(uscin),
            ivals, iscales, jnp.asarray(dense),
            batch=b, n_items=n_items, k=k,
        )
        idx = np.asarray(idx)
        return item_sorted_keys[idx], np.asarray(scores)
