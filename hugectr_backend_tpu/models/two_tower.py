"""Two-tower retrieval (user tower MLP vs item-embedding corpus) + top-k.

The reference serves retrieval-style models through the same HPS
lookup-plus-dense composition as its ranking demos (reference
samples/hps-triton-ensemble/README.md:1-24; NCF/retrieval ships in the
HugeCTR zoo) and leaves candidate scoring to the downstream engine. On TPU
the ENTIRE retrieval — user lookup, user tower, corpus scoring, top-k —
is one XLA program:

    q      = MLP([user_emb; user_dense])          (MXU)
    scores = q @ items^T                          (one big MXU matmul —
                                                   the corpus never leaves
                                                   HBM, and scoring B x N
                                                   candidates is exactly
                                                   the batched-matmul
                                                   shape the MXU wants)
    top-k  = lax.top_k(scores)                    (XLA's on-device sort)

No per-candidate gather, no host round-trip between scoring and
selection. The item corpus is the embedding table itself (int8 rows +
per-row scales), dequantized on the fly inside the same program.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP


class TwoTowerUser(nn.Module):
    """User/query tower: ``__call__(dense, user_emb) -> [B, dim]`` where
    ``widths[-1]`` must equal the item embedding dim. ``normalize`` makes
    the dot-product scores cosine similarities (both towers unit-norm —
    the usual retrieval training objective)."""

    widths: Sequence[int] = (256, 128)
    compute_dtype: jnp.dtype = jnp.float32
    normalize: bool = True

    @nn.compact
    def __call__(self, dense, user_emb):
        b = user_emb.shape[0]
        x = jnp.concatenate(
            [user_emb.reshape(b, -1), jnp.asarray(dense, self.compute_dtype)],
            axis=1,
        )
        q = MLP(self.widths, self.compute_dtype, final_activation=False)(x)
        if self.normalize:
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-9)
        return q
