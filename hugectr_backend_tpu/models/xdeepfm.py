"""xDeepFM dense network: Compressed Interaction Network (CIN) + deep MLP.

The reference's HPS serves xDeepFM-style models the same way as its other
demos — HPS lookup feeding a dense graph via ensemble (reference
samples/hps-triton-ensemble/README.md:1-24; xDeepFM ships in the HugeCTR
model zoo alongside WDL/DCN/DLRM/DeepFM). TPU-native formulation of the
CIN layer, MXU-first:

    x^0 = emb                               [B, T, D]
    z^k = x^{k-1} (outer) x^0 over features [B, H, T, D]
    x^k = einsum('bhtd,ght->bgd', z^k, W^k) [B, G, D]

The contraction over (H·T) is one batched matmul per layer — reshaped to
[B·D, H·T] x [H·T, G] it tiles straight onto the MXU; the outer product is
VPU elementwise work XLA fuses into the matmul's operand read. Each
layer's feature maps are sum-pooled over D and the concatenated pools feed
a linear head, added to a deep MLP over [dense; flat embeddings].
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP


class CINLayer(nn.Module):
    """One compressed-interaction layer: H_in x T pairwise products
    compressed to ``feature_maps`` maps."""

    feature_maps: int = 64
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x0):
        b, h, d = x.shape
        t = x0.shape[1]
        # The einsum contracts over h*t (the LAST axis), so fan-in must be
        # h*t — lecun_normal's default in_axis=-2 would scale the init
        # variance by (h*t)/feature_maps (~3x std at Criteo shapes,
        # compounding per CIN layer).
        w = self.param(
            "w",
            nn.initializers.lecun_normal(in_axis=-1, out_axis=-2),
            (self.feature_maps, h * t),
            jnp.float32,
        )
        # [B, H, T, D] outer product, then contract (H*T) on the MXU.
        z = (x[:, :, None, :] * x0[:, None, :, :]).astype(self.compute_dtype)
        z = z.reshape(b, h * t, d)
        out = jnp.einsum(
            "bkd,gk->bgd", z, w.astype(self.compute_dtype)
        )
        return out.astype(jnp.float32)


class XDeepFM(nn.Module):
    """``__call__(dense, emb)``: dense [B, Nd]; emb [B, T, D].

    Output logit = CIN head + deep MLP head (both over the shared
    embeddings — the defining xDeepFM structure).
    """

    cin_feature_maps: Sequence[int] = (64, 64)
    deep_widths: Sequence[int] = (400, 400, 1)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, emb):
        b = emb.shape[0]
        x0 = emb
        x = emb
        pools = []
        for g in self.cin_feature_maps:
            x = CINLayer(g, self.compute_dtype)(x, x0)
            pools.append(x.sum(axis=2))  # [B, G] sum-pool over D
        cin = nn.Dense(1, dtype=self.compute_dtype, param_dtype=jnp.float32)(
            jnp.concatenate(pools, axis=1)
        )
        deep_in = jnp.concatenate([dense, emb.reshape(b, -1)], axis=1)
        deep = MLP(self.deep_widths, self.compute_dtype, final_activation=False)(
            deep_in
        )
        return (cin + deep).astype(jnp.float32).squeeze(-1)
