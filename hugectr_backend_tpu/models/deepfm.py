"""DeepFM dense network (FM second-order term + deep MLP over embeddings).

The reference's HPS serves DeepFM-style models the same way as its other
demos — HPS lookup feeding a TF/TRT dense graph via ensemble (reference
samples/hps-triton-ensemble/README.md:1-24; the HugeCTR model zoo ships
DeepFM alongside WDL/DCN/DLRM). TPU-native formulation:

    y = w0-term (first-order scalar weights)
      + FM second-order: 0.5 * sum_d[(sum_f v_fd)^2 - sum_f v_fd^2]
      + MLP([dense; flat embeddings])

The FM term is two reductions over the stacked embeddings — elementwise VPU
work XLA fuses into the surrounding graph; the MXU carries the MLP. Serve
via ``serving.program.make_deepfm_server`` (lookup + dense in ONE XLA
program, like the WDL/DCN servers).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP


class DeepFM(nn.Module):
    """``__call__(dense, first_emb, emb)``:

    dense [B, Nd]; first_emb [B, T, 1] per-feature first-order weights
    (vecsize-1 table, like WDL's wide table); emb [B, T, D] second-order
    embedding vectors (shared with the deep half, the defining DeepFM
    weight-sharing).
    """

    deep_widths: Sequence[int] = (400, 400, 1)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, first_emb, emb):
        b = dense.shape[0]
        first = first_emb.reshape(b, -1).sum(axis=1)  # [B]
        s = emb.sum(axis=1)  # [B, D] — sum over features
        fm = 0.5 * (s * s - (emb * emb).sum(axis=1)).sum(axis=1)  # [B]
        deep_in = jnp.concatenate([dense, emb.reshape(b, -1)], axis=1)
        deep = (
            MLP(self.deep_widths, self.compute_dtype, final_activation=False)(
                deep_in
            )
            .astype(jnp.float32)
            .squeeze(-1)
        )
        return first.astype(jnp.float32) + fm.astype(jnp.float32) + deep
