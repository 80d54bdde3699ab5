"""Dense-half roofline: slope-time the fused DLRM's dense stages on the real
chip and compare against the v5e MXU peak (ROOFLINE.md §6).

Stages measured (batch 4096, the headline bench shape — bottom MLP
13->512->256->128, dot interaction over 27 features, top MLP
479->1024->1024->512->256->1):

    A  full dense forward, f32 tensors (production default: XLA default
       precision runs the matmuls as bf16 MXU passes)
    B  full dense forward, explicit bf16 casts
    C  full dense forward, int8 weight-only kernels (f32 activations)
    D  full dense forward, fp8 weight-only kernels (f32 activations)
    H  full dense forward, w8a8 (dynamic int8 activations, s8xs8 MXU)
    E  bottom MLP alone (default precision)
    F  interaction einsum + triu gather alone (bf16, as the model runs it)
    G  top MLP alone (default precision)

FLOP accounting (MACs*2, per sample):
    bottom 13*512 + 512*256 + 256*128 = 170,496 MACs
    interaction einsum F^2*D = 27^2*128 = 93,312 MACs
    top    479*1024 + 1024^2 + 1024*512 + 512*256 + 256*1 = 2,194,688 MACs
    total ~ 2.458M MACs = 4.92 MFLOP/sample -> 20.2 GFLOP at batch 4096.

v5e peaks: ~197 TFLOP/s bf16, ~394 TOP/s int8 -> bf16 floor ~102 us/batch.

Timing follows the tunnel slope protocol (two scan lengths, data-dependent
iterations, fetch a scalar; see ROOFLINE.md preamble / memory notes).

    python scripts/microbench_dense.py          # on the real TPU
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

if os.environ.get("HPS_BENCH_SMOKE"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import DLRM, MLP, DotInteraction
from hugectr_backend_tpu.models.quant_dense import quantize_model_params

BATCH, T, DIM, ND = 4096, 26, 128, 13
IT_LO, IT_HI = 64, 320
if os.environ.get("HPS_BENCH_SMOKE"):
    BATCH, IT_LO, IT_HI = 64, 2, 6

BOTTOM = (512, 256, DIM)
TOP = (1024, 1024, 512, 256, 1)

MACS = {
    "bottom": ND * 512 + 512 * 256 + 256 * DIM,
    "interaction": (T + 1) * (T + 1) * DIM,
}
_f = T + 1
_inter_out = DIM + _f * (_f - 1) // 2
MACS["top"] = (_inter_out * 1024 + 1024 * 1024 + 1024 * 512 + 512 * 256
               + 256 * 1)
MACS["total"] = sum(MACS.values())

BF16_PEAK = 197e12  # v5e TensorCore bf16 FLOP/s
INT8_PEAK = 394e12


def slope_us(step_fn, params):
    """Two-scan-length slope with data-dependent iterations. Inputs are
    generated ON DEVICE from a seed argument (no multi-MB uploads through
    the tunnel per timed call)."""
    totals = {}
    for iters in (IT_LO, IT_HI):
        @jax.jit
        def run(seed, params):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            emb0 = jax.random.normal(k1, (BATCH, T, DIM), jnp.float32) * 0.1
            dense = jax.random.normal(k2, (BATCH, ND), jnp.float32)

            def body(carry, i):
                emb, acc = carry
                out = step_fn(params, dense, emb)
                s = out.sum()
                # data dependency: perturb ONE element of the carry
                # (in-place dus on the donated scan buffer, O(1) — a
                # whole-tensor add would cost ~50-90 us/iter of HBM traffic)
                emb = emb.at[0, 0, 0].add((s * 1e-20).astype(emb.dtype))
                return (emb, acc + s), None
            (_, acc), _ = jax.lax.scan(
                body, (emb0, jnp.float32(0)), jnp.arange(iters))
            return acc
        best = float("inf")
        first = True
        for sd in (0, 1, 2, 3):
            t0 = time.perf_counter()
            float(run(jnp.int32(sd), params))
            dt = time.perf_counter() - t0
            if first:
                first = False  # compile run
                continue
            best = min(best, dt)
        totals[iters] = best
    return (totals[IT_HI] - totals[IT_LO]) / (IT_HI - IT_LO) * 1e6


def main():
    print("device:", jax.devices()[0], file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(1)
    model = DLRM(bottom_widths=BOTTOM, top_widths=TOP)
    dense0 = jnp.zeros((BATCH, ND), jnp.float32)
    emb0 = jnp.zeros((BATCH, T, DIM), jnp.float32)
    params = model.init(rng, dense0, emb0)

    results = {}

    def full(m, p):
        return slope_us(lambda pp, d, e: m.apply(pp, d, e), p)

    results["A_full_f32_default_us"] = full(model, params)
    results["B_full_bf16cast_us"] = full(
        DLRM(bottom_widths=BOTTOM, top_widths=TOP,
             compute_dtype=jnp.bfloat16), params)
    for tag, fmt in (("C_full_int8_us", "int8"), ("D_full_fp8_us", "fp8"),
                     ("H_full_w8a8_us", "w8a8")):
        qm = DLRM(bottom_widths=BOTTOM, top_widths=TOP, quant_fmt=fmt)
        qp = quantize_model_params(params, fmt)
        results[tag] = full(qm, qp)

    # Stage isolation (bf16): bottom / interaction / top.
    bot = MLP(BOTTOM)
    bot_p = bot.init(rng, dense0)
    results["E_bottom_us"] = slope_us(
        lambda pp, d, e: bot.apply(pp, d) * e[:, 0, :1], bot_p)

    inter = DotInteraction()
    ip = inter.init(rng, jnp.zeros((BATCH, DIM), jnp.bfloat16),
                    jnp.zeros((BATCH, T, DIM), jnp.bfloat16))
    results["F_interaction_us"] = slope_us(
        lambda pp, d, e: inter.apply(
            pp, e[:, 0, :].astype(jnp.bfloat16), e.astype(jnp.bfloat16)
        ).astype(jnp.float32), ip)

    top = MLP(TOP, final_activation=False)
    xin = jnp.zeros((BATCH, _inter_out), jnp.float32)
    top_p = top.init(rng, xin)
    results["G_top_us"] = slope_us(
        lambda pp, d, e: top.apply(
            pp, jnp.broadcast_to(
                e.reshape(BATCH, -1)[:, :_inter_out], (BATCH, _inter_out))
        ), top_p)

    gflop = 2 * MACS["total"] * BATCH / 1e9
    floor_bf16_us = gflop / (BF16_PEAK / 1e9) * 1e6
    floor_int8_us = gflop / (INT8_PEAK / 1e9) * 1e6
    out = {
        "metric": "dense_roofline_v5e",
        **{k: round(v, 1) for k, v in results.items()},
        "flop_per_batch_g": round(gflop, 2),
        "macs_per_sample": MACS,
        "bf16_mxu_floor_us": round(floor_bf16_us, 1),
        "int8_mxu_floor_us": round(floor_int8_us, 1),
        "default_pct_of_peak": round(
            100 * floor_bf16_us / results["A_full_f32_default_us"], 1),
        "int8_pct_of_peak": round(
            100 * floor_int8_us / results["C_full_int8_us"], 1),
        "w8a8_pct_of_int8_peak": round(
            100 * floor_int8_us / results["H_full_w8a8_us"], 1),
        "batch": BATCH,
        "device": str(jax.devices()[0]),
        "timing": f"slope over {IT_LO}->{IT_HI} scan iters",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
