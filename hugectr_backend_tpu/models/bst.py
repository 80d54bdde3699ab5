"""BST — Behavior Sequence Transformer (Alibaba, arXiv:1905.06874 shape).

The reference's HPS serves sequence-recsys models by returning the raw
per-position embeddings and leaving the sequence model to the dense
backend (reference docs/architecture.md:220-231 NUMKEYS format; the DIN
demo family in the HugeCTR zoo). Here the whole thing — target + behavior
sequence lookups, the transformer encoder, the MLP head — fuses into ONE
XLA program behind :class:`~hugectr_backend_tpu.serving.pooled.
FusedDinServer` (the call signature ``(dense, target, seq, seq_len)`` is
shared with DIN, so the same fused server drives both).

TPU-first formulation: static [B, S+1, D] token block (behavior sequence
plus the target item as the final token), learned positional embeddings,
``num_layers`` standard post-LN encoder blocks whose attention is two
einsums on the MXU with a padding mask from ``seq_len``, masked mean over
live tokens, then the MLP head. No dynamic shapes, no python control flow
in the traced graph.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP

_NEG = -1e9  # mask value (finite: -inf would NaN a fully-masked row)


class _EncoderBlock(nn.Module):
    num_heads: int
    ff_mult: int = 4
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, live):
        # x [B, T, D]; live [B, T] bool — dead tokens never serve as keys.
        b, t, d = x.shape
        h = self.num_heads
        dk = d // h
        q = nn.DenseGeneral((h, dk), dtype=self.compute_dtype, name="q")(x)
        k = nn.DenseGeneral((h, dk), dtype=self.compute_dtype, name="k")(x)
        v = nn.DenseGeneral((h, dk), dtype=self.compute_dtype, name="v")(x)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(dk, self.compute_dtype)
        )
        logits = jnp.where(live[:, None, None, :], logits, _NEG)
        attn = nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        x = nn.LayerNorm(dtype=self.compute_dtype)(
            x + nn.Dense(d, dtype=self.compute_dtype, name="o")(ctx)
        )
        ff = nn.Dense(self.ff_mult * d, dtype=self.compute_dtype)(x)
        ff = nn.Dense(d, dtype=self.compute_dtype)(nn.relu(ff))
        return nn.LayerNorm(dtype=self.compute_dtype)(x + ff)


class BST(nn.Module):
    """``__call__(dense, target_emb, seq_emb, seq_len) -> [B] logits``.

    target_emb [B, D]; seq_emb [B, S, D] (padded); seq_len [B] live
    prefix. The target item rides as token S (always live); positional
    embeddings are learned over the S+1 slots.
    """

    num_heads: int = 4
    num_layers: int = 1
    head_widths: Sequence[int] = (256, 64, 1)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, target_emb, seq_emb, seq_len):
        b, s, d = seq_emb.shape
        if d % self.num_heads:
            raise ValueError(
                f"embedding dim {d} must divide num_heads {self.num_heads}"
            )
        tokens = jnp.concatenate(
            [seq_emb, target_emb[:, None, :]], axis=1
        ).astype(self.compute_dtype)  # [B, S+1, D]
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (s + 1, d), jnp.float32
        )
        tokens = tokens + pos[None].astype(self.compute_dtype)
        live = jnp.concatenate(
            [
                jnp.arange(s)[None, :] < seq_len[:, None],
                jnp.ones((b, 1), bool),  # the target token is always live
            ],
            axis=1,
        )
        for _ in range(self.num_layers):
            tokens = _EncoderBlock(
                self.num_heads, compute_dtype=self.compute_dtype
            )(tokens, live)
        # Masked mean over live tokens (>= 1: the target). Dead-query rows
        # hold finite garbage (they attended over live keys) — the mask
        # zeroes their contribution here.
        m = live.astype(tokens.dtype)[..., None]
        pooled = (tokens * m).sum(axis=1) / m.sum(axis=1)
        x = jnp.concatenate(
            [pooled, jnp.asarray(dense, self.compute_dtype)], axis=1
        )
        logits = MLP(self.head_widths, self.compute_dtype,
                     final_activation=False)(x)
        return logits.astype(jnp.float32).squeeze(-1)
