"""Pallas w8a8 dense layer: in-kernel activation quant + s8 x s8 MXU matmul.

The XLA w8a8 path (models/quant_dense.py) quantizes activations as a
separate op chain: absmax-reduce reads x, quantize reads x again and writes
xq, the matmul reads xq back — three HBM passes over the activations before
any MXU work, which is why measured w8a8 reaches only ~34% of the 394-TOPS
int8 peak (bench_artifacts/dense_roofline_w8a8.json). This kernel does the
whole layer in one VMEM pass per block: read x once, absmax + round on the
VPU, int8 dot on the MXU (2x the bf16 rate on v5e), rank-1 rescale + bias +
activation fused on the way out.

Blocking: grid over M only — the full [K, N] weight block stays resident in
VMEM across the batch sweep (our MLP layers are <=1024x1024 int8 = 1 MB),
so x is read exactly once and per-row absmax needs no cross-block pass.
Eligibility: M divisible by 8, N >= 128; anything else takes the XLA
formulation (bit-equivalent semantics, same scales).

Reference contract: the dense-side latency analogue of the reference's
``fp8_quant`` flag (reference hps_backend/src/backend.cpp:500-504); v5e has
no fp8 MXU mode, int8 is the native 2x format.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    None: lambda x: x,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
}


def _pick_bm(m: int) -> int:
    for bm in (256, 128, 64, 32, 16, 8):
        if m % bm == 0:
            return bm
    return 0


def _kernel(x_ref, wq_ref, ws_ref, b_ref, out_ref, *, act):
    x = x_ref[...]  # [bm, K] f32
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    # DIVIDE (not multiply by the inexact fl(1/127)): the XLA fallback
    # divides, and the documented contract is bit-equivalent scales on
    # both paths — an ulp difference here can flip round(x/xs) on
    # boundary values and make path choice observable in outputs.
    xs = jnp.maximum(absmax, 1e-12) / 127.0  # [bm, 1]
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bm, N] s32
    y = acc.astype(jnp.float32) * xs * ws_ref[...]  # ws [1, N] broadcasts
    if b_ref is not None:
        y = y + b_ref[...]
    out_ref[...] = _ACTS[act](y)


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "block")
)
def _w8a8_pallas(x, wq, wscale, bias, *, act, interpret=False, block=0):
    m, k = x.shape
    n = wq.shape[1]
    bm = block or _pick_bm(m)
    in_specs = [
        pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, wq, wscale.reshape(1, n)]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias.reshape(1, n))
        kern = functools.partial(_kernel, act=act)
    else:
        kern = functools.partial(_no_bias_kernel, act=act)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=(m // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x.size * 4 + wq.size + n * 8 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _no_bias_kernel(x_ref, wq_ref, ws_ref, out_ref, *, act):
    _kernel(x_ref, wq_ref, ws_ref, None, out_ref, act=act)


def xla_w8a8(x, wq, wscale, bias=None, act=None):
    """The XLA formulation (same math: dynamic per-row int8 activations)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * wscale[None, :]
    if bias is not None:
        y = y + bias
    return _ACTS[act](y)


def w8a8_dense(x, wq, wscale, bias=None, act=None, interpret=False):
    """One w8a8 dense layer: x [M, K] f32, wq [K, N] int8, wscale [N] f32.

    Uses the Pallas single-pass kernel on TPU when the shape is eligible
    (M % 8 == 0, N >= 128, weight block fits VMEM); the XLA formulation
    otherwise. ``act``: None | "relu" | "sigmoid" | "tanh" | "gelu" fused
    into the kernel epilogue. Kill-switch: HPS_PALLAS_W8A8=0.
    """
    m, k = x.shape
    n = wq.shape[1]
    eligible = _pick_bm(m) > 0 and act in _ACTS
    if not interpret:
        eligible = (
            eligible
            # Lane-aligned N and K: Mosaic compiles non-128-aligned
            # slice/store shapes pathologically slowly on some toolchains
            # (observed with the interaction kernel's sub-128 dims —
            # fused_interaction.py _eligible); unaligned layers take the
            # XLA formulation. Interpret mode never touches Mosaic, so the
            # gates do not apply there.
            and n % 128 == 0
            and k % 128 == 0
            and k * n + 4 * (n + _pick_bm(m) * (k + n)) < 12 * 2**20
            and jax.default_backend() == "tpu"
            and os.environ.get("HPS_PALLAS_W8A8", "1") != "0"
        )
    if not eligible:
        return xla_w8a8(x, wq, wscale, bias, act)
    return _w8a8_pallas(
        x, wq, wscale, bias, act=act, interpret=interpret
    )
