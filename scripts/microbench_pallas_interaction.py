"""Measure the Pallas fused interaction kernel vs the XLA production path.

Apples-to-apples: both variants take (bottom [B, D] f32, emb [B, T, D] f32)
— the real inputs of models/dlrm.py DotInteraction — so the XLA number
includes the z-concat materialization the fused kernel eliminates. Timing
follows the tunnel-safe house style (lax.scan serialization, O(1) carry
perturbation, slope over two iteration counts, min over seeds).

    python scripts/microbench_pallas_interaction.py
    HPS_BENCH_SMOKE=1 python scripts/microbench_pallas_interaction.py
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("HPS_BENCH_SMOKE"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hugectr_backend_tpu.ops.fused_interaction import (
    _fused_pallas,
    _xla_reference,
)

BATCH, T, DIM = 4096, 26, 128
IT_LO, IT_HI = 64, 320
SMOKE = bool(os.environ.get("HPS_BENCH_SMOKE"))
if SMOKE:
    BATCH, IT_LO, IT_HI = 64, 2, 6


def slope_us(step_fn):
    totals = {}
    for iters in (IT_LO, IT_HI):

        @jax.jit
        def run(seed):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            bot0 = jax.random.normal(k1, (BATCH, DIM), jnp.float32)
            emb0 = jax.random.normal(k2, (BATCH, T, DIM), jnp.float32)

            def body(carry, i):
                bot, emb, acc = carry
                out = step_fn(bot, emb)
                s = out.sum().astype(jnp.float32)
                bot = bot.at[0, 0].add((s * 1e-20).astype(bot.dtype))
                return (bot, emb, acc + s), None

            (_, _, acc), _ = jax.lax.scan(
                body, (bot0, emb0, jnp.float32(0)), jnp.arange(iters)
            )
            return acc

        best, first = float("inf"), True
        for sd in (0, 1, 2, 3):
            t0 = time.perf_counter()
            float(run(jnp.int32(sd)))
            dt = time.perf_counter() - t0
            if first:
                first = False
                continue
            best = min(best, dt)
        totals[iters] = best
    return (totals[IT_HI] - totals[IT_LO]) / (IT_HI - IT_LO) * 1e6


def main():
    print("device:", jax.devices()[0], file=sys.stderr, flush=True)
    results = {}
    only = set(filter(None, os.environ.get("HPS_VARIANTS", "").split(",")))

    def want(tag):
        return not only or tag in only

    if want("xla"):
        results["xla_fancy_index_us"] = slope_us(_xla_reference)

    blocks = (64, 128, 256) if not SMOKE else (64,)
    for bb in blocks:
        if BATCH % bb:
            continue
        tag = f"pallas_fused_b{bb}_us"
        if not want(f"b{bb}"):
            continue
        try:
            results[tag] = slope_us(
                lambda bot, emb, _bb=bb: _fused_pallas(
                    bot, emb, interpret=SMOKE, block=_bb
                )
            )
        except Exception as e:  # lowering/VMEM failures are data too
            results[tag] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"

    # Parity on-device between the winning kernel and the XLA path.
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    bot = jax.random.normal(k1, (BATCH, DIM), jnp.float32)
    emb = jax.random.normal(k2, (BATCH, T, DIM), jnp.float32)
    try:
        a = _fused_pallas(bot, emb, interpret=SMOKE, block=64)
        b = _xla_reference(bot, emb)
        results["parity_rel_err"] = float(
            jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9)
        )
    except Exception as e:
        results["parity_rel_err"] = f"FAILED: {str(e)[:200]}"

    out = {
        "metric": "pallas_fused_interaction_v5e",
        **{
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in results.items()
        },
        "batch": BATCH,
        "features": T + 1,
        "dim": DIM,
        "device": str(jax.devices()[0]),
        "timing": f"slope over {IT_LO}->{IT_HI} scan iters",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
