"""Quantized dense layers (INT8 / FP8-e4m3 weight-only, and W8A8) for serving.

BASELINE config 5 calls for FP8 dense layers; the reference exposes
``fp8_quant`` and ``use_mixed_precision`` (reference backend.cpp:500-504,
docs/hierarchical_parameter_server.md InferenceParams). Design: weights are
stored quantized per-output-column (symmetric absmax); the dequant multiply
fuses into the weight operand and the matmul runs on the MXU (bf16 passes
under XLA's default precision). Weight-only quantization is the
serving-friendly scheme: no activation calibration needed, accuracy close
to the unquantized net. Measured latency-NEUTRAL at the headline shape
(weights are a tiny fraction of the traffic, ROOFLINE.md §6) — the win is
4x weight capacity; it becomes a latency lever for weight-traffic-bound
shapes (small batch / very wide nets).

``fmt="w8a8"`` additionally quantizes ACTIVATIONS at runtime (dynamic
symmetric per-row absmax — no calibration pass) and issues a true
s8 x s8 -> s32 ``dot_general``: the v5e MXU executes int8 passes at 2x the
bf16 rate (394.7 vs 197.4 TOPS), so compute-bound dense stacks halve their
matmul time where weight-only cannot. This is the latency analogue of the
reference's fp8_quant on H100 (TPU v5e has no fp8 MXU mode; int8 is the
native 2x format). Accuracy: dynamic per-row + per-column scales is the
standard serving recipe; parity-tested against the f32 net in
tests/test_parity_and_resume.py.

``quantize_dense_params`` converts a trained Flax ``Dense`` param tree in
place, so existing checkpoints deploy quantized without retraining.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

INT8_QMAX = 127.0
FP8_E4M3_MAX = 448.0


def quantize_weight(w: np.ndarray, fmt: str = "int8"):
    """[in, out] -> (q, scale[out]) column-wise symmetric."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=0)
    absmax = np.where(absmax == 0, 1.0, absmax)
    if fmt in ("int8", "w8a8"):
        scale = (absmax / INT8_QMAX).astype(np.float32)
        q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    elif fmt == "fp8":
        import ml_dtypes

        scale = (absmax / FP8_E4M3_MAX).astype(np.float32)
        q = (w / scale).astype(ml_dtypes.float8_e4m3fn)
    else:
        raise ValueError(fmt)
    return q, scale


def quantize_activations(x: jnp.ndarray):
    """Dynamic symmetric per-row int8: [.., K] -> (q int8, scale [.., 1])."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / INT8_QMAX
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


class QuantDense(nn.Module):
    """Dense layer with weight-only quantized kernel.

    Parameters are ``kernel_q`` (int8/fp8), ``kernel_scale`` (f32 per column)
    and ``bias`` (f32). Initialization quantizes a fresh normal kernel; for
    deployment, overwrite params with :func:`quantize_dense_params` output.
    """

    features: int
    fmt: str = "int8"  # "int8" | "fp8" | "w8a8"
    compute_dtype: jnp.dtype = jnp.float32
    use_bias: bool = True
    #: optional activation fused into the layer ("relu" | "sigmoid" |
    #: "tanh" | "gelu"); for w8a8 it runs in the Pallas kernel's epilogue
    #: instead of a separate [M, N] HBM pass.
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        qdtype = jnp.int8
        if self.fmt == "fp8":
            import ml_dtypes

            qdtype = ml_dtypes.float8_e4m3fn

        qmax = FP8_E4M3_MAX if self.fmt == "fp8" else INT8_QMAX
        # DETERMINISTIC init scale (±3σ of the lecun fan-in std mapped to
        # the quant range): Flax hands sibling params DIFFERENT RNG keys,
        # so deriving the scale from a per-param random draw would pair
        # kernel_q with another draw's absmax — a random per-column gain
        # on the dequantized init weights. A fixed scale keeps
        # q * scale ≈ w exactly (up to the quant step; the >3σ tail
        # clips, which lecun init makes negligible).
        init_scale_val = 3.0 * float(in_features) ** -0.5 / qmax

        def init_q(key, shape, dtype=None):
            w = jax.nn.initializers.lecun_normal()(key, shape, jnp.float32)
            q = w / init_scale_val
            if self.fmt != "fp8":
                return jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
            return q.astype(qdtype)

        def init_s(key, shape, dtype=None):
            return jnp.full(shape, init_scale_val, jnp.float32)

        kernel_q = self.param("kernel_q", init_q, (in_features, self.features))
        kernel_scale = self.param("kernel_scale", init_s, (self.features,))
        if self.fmt == "w8a8":
            # Quantize activations on the fly (per-row absmax) and run a
            # true s8 x s8 -> s32 contraction: the v5e MXU executes int8
            # passes at 2x the bf16 rate. On TPU this is one Pallas pass
            # (ops/quant_matmul.py: x read once, quant + dot + rescale +
            # bias + activation fused); elsewhere the XLA formulation.
            from hugectr_backend_tpu.ops.quant_matmul import w8a8_dense

            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None
            )
            y = w8a8_dense(
                x.astype(jnp.float32).reshape(-1, in_features), kernel_q,
                kernel_scale, bias, self.activation,
            ).reshape(*x.shape[:-1], self.features)
            return y.astype(self.compute_dtype)
        else:
            # Dequant fuses into the matmul operand; bf16 MXU passes.
            w = kernel_q.astype(self.compute_dtype) * kernel_scale.astype(
                self.compute_dtype
            )[None, :]
            y = jnp.dot(
                x.astype(self.compute_dtype), w,
                preferred_element_type=jnp.float32,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        if self.activation:
            from hugectr_backend_tpu.ops.quant_matmul import _ACTS

            y = _ACTS[self.activation](y)
        return y.astype(self.compute_dtype)


# (A quantized MLP is models.dlrm.MLP(widths, quant_fmt=...) — it emits the
# same QuantDense_i layer stack; a parallel QuantMLP class here drifted.)


def quantize_dense_params(dense_params: Any, fmt: str = "int8",
                          rename: bool = False):
    """Convert a Flax param tree of ``Dense`` layers ({kernel, bias}) into
    the QuantDense layout ({kernel_q, kernel_scale, bias}). With
    ``rename``, module keys ``Dense_i`` also rename to ``QuantDense_i``."""

    def convert(node):
        if isinstance(node, dict) and "kernel" in node:
            q, s = quantize_weight(np.asarray(node["kernel"]), fmt)
            out = {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(s)}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        if isinstance(node, dict):
            return {
                k.replace("Dense_", "QuantDense_")
                if rename and k.startswith("Dense_") else k: convert(v)
                for k, v in node.items()
            }
        return node

    return convert(dense_params)


def quantize_model_params(params: Any, fmt: str = "int8"):
    """Convert a whole Flax param tree trained with ``nn.Dense`` layers into
    the layout the same model expects with ``quant_fmt=fmt`` set: module
    keys ``Dense_i`` rename to ``QuantDense_i`` and each kernel becomes
    (kernel_q, kernel_scale). Existing fp32 checkpoints deploy quantized
    without retraining (the serving-side analogue of the reference's
    fp8_quant flag, reference backend.cpp:500-504)."""
    return quantize_dense_params(params, fmt, rename=True)
