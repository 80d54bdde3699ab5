"""MMoE — Multi-gate Mixture-of-Experts for multi-task CTR/CVR (KDD'18).

The reference's HPS is task-count-agnostic (it serves embeddings; the
dense backend owns the heads), and multi-task ranking towers are the
standard production shape downstream. Here the whole thing fuses with the
lookup engine like every other zoo family (``serving.program.
make_mmoe_server``): experts and gates are batched MXU matmuls, the
expert mixture is one einsum, and the per-task towers emit a [B, n_tasks]
logit matrix from a single XLA program.

TPU-first notes: all experts compute as ONE batched tensor ([B, E, H] via
a DenseGeneral) rather than a Python list of expert MLPs — the MXU sees
one large contraction per layer instead of E small ones.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import MLP


class MMoE(nn.Module):
    """``__call__(dense, emb) -> [B, num_tasks]`` logits.

    dense [B, Nd]; emb [B, T, D] (the lookup engine's stacked per-table
    block — same contract as DCN/xDeepFM).
    """

    num_experts: int = 4
    num_tasks: int = 2
    expert_widths: Sequence[int] = (128, 64)
    tower_widths: Sequence[int] = (32, 1)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, emb):
        b = emb.shape[0]
        x = jnp.concatenate(
            [emb.reshape(b, -1), jnp.asarray(dense, self.compute_dtype)],
            axis=1,
        ).astype(self.compute_dtype)
        # Experts as one batched stack: the entry layer maps [B, F] ->
        # [B, E, H1] with an (E, H1)-shaped DenseGeneral; deeper layers
        # use per-expert kernels contracted in ONE einsum — the MXU sees a
        # single large contraction per layer instead of E small ones.
        h = nn.relu(
            nn.DenseGeneral(
                (self.num_experts, self.expert_widths[0]),
                dtype=self.compute_dtype, name="experts_in",
            )(x)
        )  # [B, E, H1]
        for i, w in enumerate(self.expert_widths[1:]):
            # Per-expert kernels: contract the feature axis only, keep E.
            k = self.param(
                f"expert_kernel_{i}", nn.initializers.lecun_normal(),
                (self.num_experts, h.shape[-1], w), jnp.float32,
            )
            bias = self.param(
                f"expert_bias_{i}", nn.initializers.zeros,
                (self.num_experts, w), jnp.float32,
            )
            h = nn.relu(
                jnp.einsum(
                    "beh,ehw->bew", h, k.astype(self.compute_dtype)
                ) + bias.astype(self.compute_dtype)[None]
            )
        # Per-task softmax gates over experts + mixture in one einsum.
        gates = nn.DenseGeneral(
            (self.num_tasks, self.num_experts), dtype=self.compute_dtype,
            name="gates",
        )(x)  # [B, K, E]
        gates = nn.softmax(gates, axis=-1)
        mixed = jnp.einsum("bke,bew->bkw", gates, h)  # [B, K, W]
        logits = []
        for t in range(self.num_tasks):
            y = MLP(self.tower_widths, self.compute_dtype,
                    final_activation=False, )(mixed[:, t])
            logits.append(y)
        return jnp.concatenate(logits, axis=1).astype(jnp.float32)
