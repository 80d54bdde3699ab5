"""Pallas vs XLA w8a8 single-layer A/B on the real chip (ROOFLINE §6.3).

Slope-times one w8a8 dense layer (act quant + s8xs8 dot + rescale + bias +
relu) in both formulations at the fused DLRM's dominant shapes, plus the
full eligible-layer ladder. Answers whether the single-pass Pallas kernel
(ops/quant_matmul.py) actually beats XLA's three-HBM-pass lowering per
layer, independent of the full-model composition.

    python scripts/microbench_w8a8_kernel.py   # on the real TPU

Writes bench_artifacts/w8a8_kernel_ab.json.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from hugectr_backend_tpu.ops.quant_matmul import _w8a8_pallas, xla_w8a8

BATCH = 4096
IT_LO, IT_HI = 64, 512
SHAPES = [(512, 256), (256, 128), (1024, 1024), (1024, 512)]


def slope(run_factory, args_fn, label):
    times = {}
    for iters in (IT_LO, IT_HI):
        run = run_factory(iters)
        float(run(*args_fn(0)))
        best = float("inf")
        for sd in (1, 2, 3):
            a = args_fn(sd)
            t0 = time.perf_counter()
            float(run(*a))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    us = (times[IT_HI] - times[IT_LO]) / (IT_HI - IT_LO) * 1e6
    print(f"{label:36s}: {us:8.1f} us/layer", flush=True)
    return us


def make_runner(kind, k, n, iters):
    def layer(x, wq, ws, b):
        if kind == "pallas":
            return _w8a8_pallas(x, wq, ws, b, act="relu")
        return xla_w8a8(x, wq, ws, b, act="relu")

    @jax.jit
    def run(sd, wq, ws, b):
        # Generate the activations ON DEVICE from the seed scalar — a fresh
        # [B, k] upload per timed call would swamp the slope with tunnel
        # transfer noise (microbench_dense.py protocol).
        col = jax.lax.broadcasted_iota(jnp.float32, (BATCH, k), 1)
        row = jax.lax.broadcasted_iota(jnp.float32, (BATCH, k), 0)
        x0 = jnp.sin(col * 0.37 + row * 0.011 + sd.astype(jnp.float32))

        def body(carry, i):
            x, acc = carry
            y = layer(x, wq, ws, b)  # [B, n]
            # O(B) data-dependent perturbation: the next iteration's input
            # depends on this output (no hoisting/dedup), but the carry
            # cost is negligible next to the layer itself.
            xn = x * (1.0 + 1e-7 * jnp.tanh(y[:, :1])) + 1e-9 * i
            return (xn, acc + y.sum()), None

        (_, acc), _ = jax.lax.scan(
            body, (x0, jnp.float32(0)), jnp.arange(iters)
        )
        return acc

    return run


def main():
    print("device:", jax.devices()[0], flush=True)
    out = {"metric": "w8a8_kernel_ab_v5e", "batch": BATCH,
           "device": str(jax.devices()[0]),
           "timing": f"slope over {IT_LO}->{IT_HI} scan iters",
           "layers": {}}
    rng = np.random.default_rng(0)
    for k, n in SHAPES:
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.asarray(rng.random(n, np.float32) * 0.02 + 0.001)
        b = jnp.asarray(rng.random(n, np.float32) * 0.1)

        def args_fn(sd):
            return (jnp.int32(sd), wq, ws, b)

        res = {}
        for kind in ("xla", "pallas"):
            res[kind + "_us"] = round(
                slope(lambda it, kk=kind: make_runner(kk, k, n, it),
                      args_fn, f"{k}x{n} {kind}"), 1)
        out["layers"][f"{k}x{n}"] = res
    path = pathlib.Path(__file__).resolve().parents[1] / "bench_artifacts"
    (path / "w8a8_kernel_ab.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
