"""NCF / NeuMF dense network (GMF + MLP heads over user/item embeddings).

The reference's HPS serves NCF-style retrieval/ranking models through the
same lookup-plus-dense ensemble as its other demos (reference
samples/hps-triton-ensemble/README.md:1-24; NCF ships in the HugeCTR model
zoo). Two embedding tables — users and items — one key each per sample.

TPU-native formulation (NeuMF structure, shared embeddings per tower):

    gmf  = u * v                                  (VPU elementwise)
    mlp  = MLP([u; v])                            (MXU)
    y    = Dense(1)([gmf; mlp])                   (MXU)

The whole head is one fused XLA program behind the lookup engine
(``serving.program.make_ncf_server``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP


class NCF(nn.Module):
    """``__call__(dense, user_emb, item_emb)``: dense [B, Nd] (may be
    zero-width), user_emb/item_emb [B, 1, D]."""

    mlp_widths: Sequence[int] = (256, 128, 64)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, user_emb, item_emb):
        b = user_emb.shape[0]
        u = user_emb.reshape(b, -1)
        v = item_emb.reshape(b, -1)
        gmf = u * v  # [B, D]
        mlp_in = jnp.concatenate([dense, u, v], axis=1)
        mlp = MLP(self.mlp_widths, self.compute_dtype)(mlp_in)
        head_in = jnp.concatenate([gmf, mlp.astype(jnp.float32)], axis=1)
        y = nn.Dense(1, dtype=self.compute_dtype, param_dtype=jnp.float32)(
            head_in
        )
        return y.astype(jnp.float32).squeeze(-1)
