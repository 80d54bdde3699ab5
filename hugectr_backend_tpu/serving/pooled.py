"""Variable-length multi-hot lookups with fused pooling (DIN-style).

BASELINE config 4: "Sequence recsys (DIN-style) with variable-length
multi-hot lookups and fused pooling". The reference expresses variable
length through the request format — per-table NUMKEYS totals with a
``maxnum_catfeature_query_per_table_per_sample`` padding bound (reference
docs/architecture.md:98,220-231) — and returns unpooled vectors, leaving
pooling to the dense backend. Here pooling fuses into the lookup program:
the [B, S, D] gathered block never round-trips through HBM; the masked
sum/mean feeds the dense net directly (one XLA program).

Shapes are static: keys are padded host-side to ``S = maxnum_cat_t`` per
sample; ``seq_len`` masks the live prefix. Padding slots point at the default
row, so even an unmasked sum would only add default-value rows — the mask
exists for ``mean`` pooling correctness and for nonzero default values.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.cache.embedding_cache import EmbeddingCache
from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla


@functools.partial(jax.jit, static_argnames=("batch", "max_len", "mode"))
def _pooled_gather(values, scales, slots, seq_len, batch: int, max_len: int,
                   mode: str = "sum", scin=None):
    """slots [B*S] -> pooled [B, D] with masked sum/mean pooling fused in.

    ``scin`` is the host-gathered per-key dequant scale vector [B*S] — the
    production "solo" path for big tables (a device scales gather on a large
    scales array costs ~+14 ns/access on v5e, see ROOFLINE.md; host fetch
    during key translation is free). Pass ``scales`` for small arenas where
    the device gather fuses cheaply, never both.
    """
    flat = gather_dequant_xla(values, scales, slots)  # [B*S, D]
    if scin is not None:
        flat = flat * scin[:, None]
    emb = flat.reshape(batch, max_len, flat.shape[-1])
    mask = (
        jnp.arange(max_len)[None, :] < seq_len[:, None]
    ).astype(emb.dtype)[..., None]
    summed = (emb * mask).sum(axis=1)
    if mode == "mean":
        denom = jnp.maximum(seq_len.astype(summed.dtype), 1.0)[:, None]
        return summed / denom
    return summed


def pooled_lookup(
    cache: EmbeddingCache,
    table_idx: int,
    keys: np.ndarray,
    seq_len: Optional[np.ndarray] = None,
    mode: str = "sum",
) -> jax.Array:
    """Multi-hot pooled lookup: keys [B, S] (padded), seq_len [B] -> [B, D].

    ``seq_len=None`` means all S keys are live. Padding key positions may
    hold any value; they are masked out (and unknown keys hit the default
    row anyway, preserving reference miss semantics).
    """
    if mode not in ("sum", "mean"):
        # An unknown mode must not silently pool as "sum" — numerically
        # plausible wrong embeddings would flow into the dense net.
        raise ValueError(f"unknown pooling mode {mode!r} (want sum|mean)")
    keys = np.asarray(keys, dtype=np.int64)
    if keys.ndim != 2:
        raise ValueError(f"keys must be [batch, max_len], got {keys.shape}")
    b, s = keys.shape
    if seq_len is None:
        seq_len = np.full(b, s, np.int32)
    # Translate + snapshot under one cache-lock hold (the pairing invariant;
    # a dynamic cache's insert may remap slots between the two otherwise).
    vals, dev_scales, slots, scin = cache.translate_resolve(
        table_idx, keys.reshape(-1))
    return _pooled_gather(
        vals,
        dev_scales,
        jnp.asarray(slots),
        jnp.asarray(np.asarray(seq_len, np.int32)),
        batch=b,
        max_len=s,
        mode=mode,
        scin=None if scin is None else jnp.asarray(scin),
    )


class FusedDinServer:
    """DIN serving: target lookup + sequence pooled-attention + dense MLP in
    one program per batch shape.

    The behavior-sequence embeddings stay on device end-to-end: gather ->
    attention pooling -> MLP is one XLA executable.
    """

    def __init__(self, params, cache, model, model_params,
                 target_table: int = 0, seq_table: int = 1):
        self.params = params
        self.cache = cache
        self.model = model
        self.model_params = model_params
        self.target_table = target_table
        self.seq_table = seq_table
        self.max_seq = params.maxnum_catfeature_query_per_table_per_sample[seq_table]

        @functools.partial(jax.jit, static_argnames=("batch", "max_len"))
        def fwd(mp, tv, ts, sv, ss, tslots, sslots, tscin, sscin, seq_len,
                dense, batch: int, max_len: int):
            target = gather_dequant_xla(tv, ts, tslots)  # [B, D]
            if tscin is not None:
                target = target * tscin[:, None]
            seq = gather_dequant_xla(sv, ss, sslots)
            if sscin is not None:
                seq = seq * sscin[:, None]
            seq = seq.reshape(batch, max_len, -1)
            return self.model.apply(mp, dense, target, seq, seq_len)

        self._fwd = fwd

    def predict(self, target_keys, seq_keys, seq_len, dense) -> jax.Array:
        """target_keys [B]; seq_keys [B, S] padded; seq_len [B]; dense [B, Nd]."""
        dense = np.asarray(dense, dtype=np.float32)
        b = dense.shape[0]
        seq_keys = np.asarray(seq_keys, dtype=np.int64).reshape(b, -1)
        s = seq_keys.shape[1]
        # Each translate+snapshot pairs under one cache-lock hold (see
        # EmbeddingCache.translate_resolve); the two tables need not share a
        # hold — each (slots, values) pair is internally consistent.
        tv, ts, tslots, tscin = self.cache.translate_resolve(
            self.target_table, np.asarray(target_keys, np.int64).reshape(-1))
        sv, ss, sslots, sscin = self.cache.translate_resolve(
            self.seq_table, seq_keys.reshape(-1))
        return self._fwd(
            self.model_params,
            tv, ts, sv, ss,
            jnp.asarray(tslots), jnp.asarray(sslots),
            None if tscin is None else jnp.asarray(tscin),
            None if sscin is None else jnp.asarray(sscin),
            jnp.asarray(np.asarray(seq_len, np.int32)),
            jnp.asarray(dense),
            batch=b, max_len=s,
        )
