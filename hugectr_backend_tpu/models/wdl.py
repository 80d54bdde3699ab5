"""Wide & Deep dense network.

The reference's WDL demo deploys 2 embedding tables (vecsize [1, 16]) plus a
dense part served by TF (reference samples/Hierarchical_Parameter_Server_
Deployment.ipynb, WDL config in SURVEY §6). Here: the wide table contributes a
scalar logit term, deep embeddings + dense features feed an MLP.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP


class WideAndDeep(nn.Module):
    deep_widths: Sequence[int] = (1024, 512, 256, 1)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, wide_emb, deep_emb):
        # dense [B, Nd]; wide_emb [B, Kw, 1] scalar weights; deep_emb [B, Kd, D]
        wide_logit = wide_emb.reshape(wide_emb.shape[0], -1).sum(axis=1)
        deep_in = jnp.concatenate(
            [dense, deep_emb.reshape(deep_emb.shape[0], -1)], axis=1
        )
        deep_logit = MLP(self.deep_widths, self.compute_dtype, final_activation=False)(
            deep_in
        ).astype(jnp.float32).squeeze(-1)
        return wide_logit + deep_logit
