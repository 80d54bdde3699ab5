"""Parts-kernel z-assembly A/B: interleaved fmap vs part-major (_fm kernel).

VERDICT r3 weak #1: the composed fused DLRM sits ~25% above its composed
floor and the named residual is the chunk assembly the parts kernel pays.
The general parts kernel builds z from 26 per-feature [bb,1,D] VMEM
relayouts because the production feature map interleaves the one-hot and
arena chunks; with a PART-MAJOR feature order the new _kernel_parts_fm
assembles z feature-major ([F,bb,D], one axis-0 concat, batch-minor
contraction) — and serving can adopt that order for any checkpoint by
permuting the first top-MLP kernel (ops/fused_interaction.py
interaction_permutation; exact-logits test in tests/test_fused_interaction
.py).

Legs (full dense forward in scan, interleaved round-robin measurement):
  xla           — stacked tensor, XLA interaction
  parts_inter   — general parts kernel, production interleaved fmap
  parts_fm      — _fm kernel, part-major fmap (what production becomes)

Writes bench_artifacts/parts_fm_ab.json.
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

from hugectr_backend_tpu.models.dlrm import DLRM
from hugectr_backend_tpu.ops.fused_interaction import (
    EmbParts,
    is_part_major,
    part_major_order,
)

B, T, D, ND = 4096, 26, 128, 13
IT_LO, IT_HI = 64, 320
ROUNDS = 3
if os.environ.get("HPS_BENCH_SMOKE"):
    B, IT_LO, IT_HI, ROUNDS = 64, 2, 6, 2
BOTTOM, TOP = (512, 256, D), (1024, 1024, 512, 256, 1)
n_oh, n_ar = 14, 12

model0 = DLRM(bottom_widths=BOTTOM, top_widths=TOP)
params = model0.init(jax.random.PRNGKey(1),
                     jnp.zeros((B, ND), jnp.float32),
                     jnp.zeros((B, T, D), jnp.float32))

oh_idx = list(range(0, T, 2)) + [T - 1]  # 13 even + tail = 14
ar_idx = [t for t in range(T) if t not in oh_idx]
fmap_inter = [None] * T
for j, t in enumerate(oh_idx):
    fmap_inter[t] = (0, j)
for j, t in enumerate(ar_idx):
    fmap_inter[t] = (1, j)
fmap_inter = tuple(fmap_inter)
order, fmap_fm = part_major_order(fmap_inter)
assert not is_part_major(fmap_inter) and is_part_major(fmap_fm)


def make_run(mode, iters):
    os.environ["HPS_PALLAS_INTERACTION"] = "0" if mode == "xla" else "1"
    model = DLRM(bottom_widths=BOTTOM, top_widths=TOP)

    def run(seed, params):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        oh0 = jax.random.normal(k1, (n_oh * B, D), jnp.float32) * 0.1
        ar0 = jax.random.normal(k2, (n_ar * B, D), jnp.float32) * 0.1
        dense = jax.random.normal(k3, (B, ND), jnp.float32)

        def body(carry, i):
            oh, ar, acc = carry
            parts = [oh.reshape(n_oh, B, D), ar.reshape(n_ar, B, D)]
            if mode == "parts_inter":
                emb = EmbParts(parts, fmap_inter)
            elif mode == "parts_fm":
                emb = EmbParts(parts, fmap_fm)
            else:  # xla stacked
                embs = [None] * T
                for j, t in enumerate(oh_idx):
                    embs[t] = oh[j * B:(j + 1) * B]
                for j, t in enumerate(ar_idx):
                    embs[t] = ar[j * B:(j + 1) * B]
                emb = jnp.stack(embs, axis=1)
            s = model.apply(params, dense, emb).sum()
            oh = oh.at[0, 0].add((s * 1e-20).astype(oh.dtype))
            ar = ar.at[0, 0].add((s * 1e-20).astype(ar.dtype))
            return (oh, ar, acc + s), None

        (_, _, acc), _ = jax.lax.scan(
            body, (oh0, ar0, jnp.float32(0)), jnp.arange(iters))
        return acc

    return jax.jit(run)


MODES = ("xla", "parts_inter", "parts_fm")
runs = {}
for mode in MODES:
    for iters in (IT_LO, IT_HI):
        r = make_run(mode, iters)
        float(r(jnp.int32(0), params))  # compile + warm
        runs[(mode, iters)] = r

samples = {m: [] for m in MODES}
for rd in range(ROUNDS):
    for mode in MODES:
        tt = {}
        for iters in (IT_LO, IT_HI):
            t0 = time.perf_counter()
            float(runs[(mode, iters)](jnp.int32(10 + 7 * rd + iters),
                                      params))
            tt[iters] = time.perf_counter() - t0
        samples[mode].append(
            (tt[IT_HI] - tt[IT_LO]) / (IT_HI - IT_LO) * 1e6)

med = {m: float(np.median(s)) for m, s in samples.items()}

# Parity: fm kernel with part-major fmap == stacked XLA on permuted emb.
os.environ["HPS_PALLAS_INTERACTION"] = "1"
k = jax.random.PRNGKey(0)
oh = jax.random.normal(k, (n_oh * B, D), jnp.float32) * 0.1
ar = jax.random.normal(jax.random.PRNGKey(9), (n_ar * B, D), jnp.float32) * 0.1
dense = jax.random.normal(jax.random.PRNGKey(5), (B, ND), jnp.float32)
parts = [oh.reshape(n_oh, B, D), ar.reshape(n_ar, B, D)]
y_fm = model0.apply(params, dense, EmbParts(parts, fmap_fm))
embs = [None] * T
for j, t in enumerate(oh_idx):
    embs[t] = oh[j * B:(j + 1) * B]
for j, t in enumerate(ar_idx):
    embs[t] = ar[j * B:(j + 1) * B]
emb_perm = jnp.stack(embs, axis=1)[:, np.asarray(order)]
os.environ["HPS_PALLAS_INTERACTION"] = "0"
y_ref = DLRM(bottom_widths=BOTTOM, top_widths=TOP).apply(
    params, dense, emb_perm)
rel = float(jnp.abs(y_fm - y_ref).max() / (jnp.abs(y_ref).max() + 1e-9))

out = {
    "metric": "parts_fm_ab_v5e",
    "median_us": {m: round(v, 1) for m, v in med.items()},
    "samples_us": {m: [round(x, 1) for x in s] for m, s in samples.items()},
    "fm_parity_rel_err": rel,
    "batch": B, "features": T + 1, "dim": D,
    "protocol": f"interleaved round-robin x{ROUNDS}, slope "
                f"{IT_LO}->{IT_HI} scan iters, full dense forward",
    "device": str(jax.devices()[0]),
}
print(json.dumps(out))
if not os.environ.get("HPS_BENCH_SMOKE"):
    p = pathlib.Path(__file__).resolve().parents[1] / "bench_artifacts" / (
        "parts_fm_ab.json")
    p.write_text(json.dumps(out, indent=1))
