"""DLRM dense network (bottom MLP + pairwise interaction + top MLP).

The reference serves DLRM's dense part through separate Triton backends
composed by ensemble (reference samples/hps-triton-ensemble/README.md:1-24);
here the dense part is a Flax module so lookup + dense fuse into ONE XLA
program (BASELINE north star: dequant+gather overlapped with dense forward).

Shapes follow the reference CI config: 26 categorical features, 13 dense
features, batch from the serving frontend (reference .gitlab-ci.yml:70
``--shape KEYS:26``).

Precision: compute_dtype defaults to f32 TENSORS. On TPU, XLA's default
matmul precision already executes f32-input matmuls as bf16 MXU passes with
f32 accumulation, so a manually-cast bf16 graph does the same MXU work but
pays extra convert/fusion-break kernels — measured 221 (f32) vs 312 (bf16
casts) us/batch-4096 on v5e with the XLA interaction, 155.6 with the Pallas
fused interaction (bench_artifacts/dense_roofline*.json, ROOFLINE.md §6). Pass
``compute_dtype=jnp.bfloat16`` to halve activation HBM traffic where that
(not conversion) is the bottleneck, or ``quant_fmt="int8"|"fp8"`` for
weight-only quantized kernels.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """Serving MLP; ``quant_fmt`` selects weight-only int8/fp8 kernels or
    the w8a8 int8-MXU path (models/quant_dense.py — the reference's
    ``fp8_quant`` dense analogue, reference backend.cpp:500-504). Convert
    trained fp32 params with
    :func:`hugectr_backend_tpu.models.quant_dense.quantize_model_params`."""

    widths: Sequence[int]
    compute_dtype: jnp.dtype = jnp.float32
    final_activation: bool = True
    quant_fmt: Optional[str] = None  # None | "int8" | "fp8" | "w8a8"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for i, w in enumerate(self.widths):
            act = (
                "relu"
                if i + 1 < len(self.widths) or self.final_activation
                else None
            )
            if self.quant_fmt:
                from hugectr_backend_tpu.models.quant_dense import QuantDense

                # The activation fuses into the quant layer (for w8a8 it
                # runs in the Pallas kernel epilogue, saving an [M, N]
                # HBM pass per layer).
                x = QuantDense(w, self.quant_fmt, self.compute_dtype,
                               activation=act)(x)
            else:
                x = nn.Dense(
                    w, dtype=self.compute_dtype, param_dtype=jnp.float32
                )(x)
                if act:
                    x = nn.relu(x)
        return x


class DotInteraction(nn.Module):
    """DLRM pairwise-dot feature interaction.

    Concatenates the bottom-MLP output with the upper triangle of
    ``Z @ Z^T`` where Z stacks [bottom_out; emb_1..emb_T].

    On TPU the default is the Pallas fused kernel
    (ops/fused_interaction.py): einsum + triu extraction in one VMEM pass,
    measured 40.2 us vs 107.8 us for the XLA lowering at batch 4096 / F=27 /
    D=128 on v5e (bench_artifacts/pallas_interaction.json) — the XLA graph
    pays an HBM round-trip of the full [B, F, F] tensor plus a gather.
    ``use_pallas``: None = auto (TPU, k=1 interactions, batch divisible
    by 8; env kill-switch HPS_PALLAS_INTERACTION=0), True/False = force.
    Both paths use bf16 MXU passes with f32 accumulation — on-device
    outputs are bit-identical (parity_rel_err 0.0 in the bench artifact).

    ``emb`` may also be an :class:`~hugectr_backend_tpu.ops.
    fused_interaction.EmbParts` — the lookup engine's chunked outputs.
    The Pallas kernel then assembles z in VMEM and the [B, T, D] stack
    never materializes in HBM (stacking it first erases the kernel's win:
    +91 us vs the fused-into-einsum XLA stack at the headline shape).
    """

    self_interaction: bool = False
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, bottom_out, emb):
        # bottom_out [B, D], emb [B, T, D] or EmbParts
        from hugectr_backend_tpu.ops.fused_interaction import EmbParts

        use = self.use_pallas
        if use and self.self_interaction:
            # Refuse rather than silently downgrade: a user forcing the
            # kernel while benchmarking would measure the XLA lowering.
            raise ValueError(
                "the Pallas fused interaction does not support "
                "self_interaction=True (use_pallas must be None/False)"
            )
        # Test hook: HPS_PALLAS_INTERPRET=1 runs the Pallas kernels in
        # interpret mode so CPU tests exercise the REAL kernel bodies
        # through the full serving path (Mosaic is never touched).
        interp = os.environ.get("HPS_PALLAS_INTERPRET") == "1"
        if use is None:
            import jax

            use = (
                not self.self_interaction
                and (jax.default_backend() == "tpu" or interp)
                and os.environ.get("HPS_PALLAS_INTERACTION", "1") != "0"
            )
        if use and not self.self_interaction:
            from hugectr_backend_tpu.ops.fused_interaction import (
                fused_dot_interaction,
                fused_dot_interaction_oh,
                fused_dot_interaction_parts,
            )

            if isinstance(emb, EmbParts):
                ep = emb.astype(bottom_out.dtype)
                if ep.oh is not None:
                    return fused_dot_interaction_oh(
                        bottom_out, ep.oh, ep.parts, ep.feature_map,
                        interpret=interp,
                    )
                return fused_dot_interaction_parts(
                    bottom_out, ep.parts, ep.feature_map, interp
                )
            return fused_dot_interaction(
                bottom_out, emb.astype(bottom_out.dtype), interp
            )
        if isinstance(emb, EmbParts):
            emb = emb.stack().astype(bottom_out.dtype)
        z = jnp.concatenate([bottom_out[:, None, :], emb], axis=1)  # [B, F, D]
        zzt = jnp.einsum(
            "bfd,bgd->bfg", z, z, preferred_element_type=jnp.float32
        )  # [B, F, F]
        f = z.shape[1]
        rows, cols = jnp.triu_indices(f, k=0 if self.self_interaction else 1)
        inter = zzt[:, rows, cols]  # [B, F*(F-1)/2]
        return jnp.concatenate([bottom_out, inter.astype(bottom_out.dtype)], axis=1)


class DLRM(nn.Module):
    """Facebook-style DLRM dense graph consuming HPS lookup output.

    ``__call__(dense, emb)``: dense [B, num_dense], emb [B, T, D] (one pooled
    vector per table per sample, as produced by the lookup engine).
    """

    bottom_widths: Sequence[int] = (512, 256, 64)
    top_widths: Sequence[int] = (1024, 1024, 512, 256, 1)
    compute_dtype: jnp.dtype = jnp.float32
    quant_fmt: Optional[str] = None  # weight-only dense quant: "int8"|"fp8"

    @nn.compact
    def __call__(self, dense, emb):
        if self.bottom_widths[-1] != emb.shape[-1]:
            raise ValueError(
                f"DLRM bottom MLP must end at the embedding dim for the dot "
                f"interaction: bottom_widths[-1]={self.bottom_widths[-1]} vs "
                f"embedding dim {emb.shape[-1]}"
            )
        bottom = MLP(self.bottom_widths, self.compute_dtype,
                     final_activation=True, quant_fmt=self.quant_fmt)(dense)
        x = DotInteraction()(bottom, emb.astype(bottom.dtype))
        logits = MLP(self.top_widths, self.compute_dtype,
                     final_activation=False, quant_fmt=self.quant_fmt)(x)
        return logits.astype(jnp.float32).squeeze(-1)
