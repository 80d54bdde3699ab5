"""DIN-style sequence recsys: attention-pooled variable-length behavior lookups.

BASELINE config 4: variable-length multi-hot lookups with fused pooling. The
variable length arrives as a static padded sequence plus a length vector (the
reference expresses variable length as NUMKEYS-per-table with a
``maxnum_catfeature_query_per_table_per_sample`` bound, reference
docs/architecture.md:98,220-231); masking keeps shapes static for XLA.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP


class DinAttentionPool(nn.Module):
    """Target-aware attention over the behavior sequence (fused softmax pool)."""

    hidden: int = 64
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, target, seq, seq_len):
        # target [B, D]; seq [B, S, D]; seq_len [B] int32
        b, s, d = seq.shape
        t = jnp.broadcast_to(target[:, None, :], (b, s, d))
        feats = jnp.concatenate([t, seq, t - seq, t * seq], axis=-1)
        score = MLP((self.hidden, 1), self.compute_dtype, final_activation=False)(feats)
        score = score.astype(jnp.float32).squeeze(-1)  # [B, S]
        mask = jnp.arange(s)[None, :] < seq_len[:, None]
        score = jnp.where(mask, score, -1e9)
        # Re-mask AFTER the softmax: for seq_len == 0 every score is -1e9
        # and softmax over the constant row returns UNIFORM weights — the
        # pooled vector would average arbitrary padding-position embeddings
        # (pooled_lookup's contract: padding positions may hold any value).
        # Masking makes an empty history pool to zeros instead.
        w = nn.softmax(score, axis=-1) * mask.astype(jnp.float32)
        return jnp.einsum("bs,bsd->bd", w, seq.astype(jnp.float32))


class DIN(nn.Module):
    mlp_widths: Sequence[int] = (200, 80, 1)
    att_hidden: int = 64
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, target_emb, seq_emb, seq_len):
        # dense [B, Nd]; target_emb [B, D]; seq_emb [B, S, D]; seq_len [B]
        pooled = DinAttentionPool(self.att_hidden, self.compute_dtype)(
            target_emb, seq_emb, seq_len
        )
        x = jnp.concatenate([dense, target_emb, pooled], axis=1)
        logits = MLP(self.mlp_widths, self.compute_dtype, final_activation=False)(x)
        return logits.astype(jnp.float32).squeeze(-1)
