"""DCN-v2: deep & cross network with low-rank cross layers.

BASELINE config 3 serves DCN-v2 with multi-table embeddings sharded across
hosts. The cross layers are rank-limited (two skinny matmuls) so they stay
MXU-friendly at serving batch sizes.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP


class CrossLayerV2(nn.Module):
    rank: int = 64
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x):
        d = x.shape[-1]
        u = nn.Dense(self.rank, dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
        v = nn.Dense(d, dtype=self.compute_dtype, param_dtype=jnp.float32)(u)
        return x0 * v + x


class DCNv2(nn.Module):
    num_cross_layers: int = 3
    cross_rank: int = 64
    deep_widths: Sequence[int] = (1024, 512, 256)
    head_widths: Sequence[int] = (128, 1)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, emb):
        # dense [B, Nd]; emb [B, T, D]
        x0 = jnp.concatenate(
            [dense, emb.reshape(emb.shape[0], -1)], axis=1
        ).astype(self.compute_dtype)
        x = x0
        for _ in range(self.num_cross_layers):
            x = CrossLayerV2(self.cross_rank, self.compute_dtype)(x0, x)
        deep = MLP(self.deep_widths, self.compute_dtype)(x0)
        head_in = jnp.concatenate([x, deep], axis=1)
        logits = MLP(self.head_widths, self.compute_dtype, final_activation=False)(head_in)
        return logits.astype(jnp.float32).squeeze(-1)
