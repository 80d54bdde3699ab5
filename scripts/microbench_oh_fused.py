"""A/B: one-hot stage as XLA matmuls + parts kernel vs one-hot IN-kernel.

VERDICT r3 option (b) for the composed-fused gap: the production program
computes the 14 one-hot features as XLA matmuls whose [14B, D] output
round-trips HBM (~2x29 MB at the headline shape) before the interaction
kernel reads it — XLA cannot fuse across the pallas_call boundary.
`fused_dot_interaction_oh_parts` assembles those features inside the
kernel from the VMEM-resident arena instead.

Geometry mirrors bench.py's Criteo layout (14 one-hot members, one [4,B,D]
arena part, 8 solo parts), with one-hot member offsets padded to
128-aligned rows (the in-kernel variant's requirement; pad rows replicate
nothing — slots never land there).

Writes bench_artifacts/oh_fused_ab.json.
"""
import functools
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

from hugectr_backend_tpu.cache.lookup_program import onehot_member_rows
from hugectr_backend_tpu.ops.fused_interaction import (
    fused_dot_interaction_oh_parts,
    fused_dot_interaction_parts,
)

B, D = 4096, 128
IT_LO, IT_HI = 64, 320
ROUNDS = int(os.environ.get("HPS_AB_ROUNDS", "3"))
INTERPRET = False
if os.environ.get("HPS_BENCH_SMOKE"):
    B, IT_LO, IT_HI, ROUNDS, INTERPRET = 64, 2, 6, 2, True

OH_CARDS = [1460, 583, 305, 24, 633, 3, 3194, 27, 10, 2173, 4, 18, 15, 105]
N_AR, N_SOLO = 4, 8


def pad128(n):
    return -(-n // 128) * 128


sizes = [pad128(c + 1) for c in OH_CARDS]
offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
members = tuple((int(offs[j]), int(sizes[j])) for j in range(len(OH_CARDS)))
R = int(offs[-1])
n_oh = len(OH_CARDS)
feats = 1 + n_oh + N_AR + N_SOLO

rng = np.random.default_rng(0)
arena = jnp.asarray(rng.integers(-127, 128, (R, D)), jnp.int8)
parts_np = [rng.standard_normal((N_AR, B, D)).astype(np.float32) * 0.1] + [
    rng.standard_normal((1, B, D)).astype(np.float32) * 0.1
    for _ in range(N_SOLO)
]
parts = tuple(jnp.asarray(p) for p in parts_np)
fmap = []
for pi, p in enumerate(parts_np):
    fmap += [(pi, j) for j in range(p.shape[0])]
fmap = tuple(fmap)


def slots_for(seed):
    r = np.random.default_rng(seed)
    return np.stack([
        r.integers(off, off + OH_CARDS[j] + 1, B)
        for j, (off, _sz) in enumerate(members)
    ]).astype(np.int32)


def scales_for(seed):
    r = np.random.default_rng(seed + 999)
    return ((r.random((n_oh, B)) + 0.5) / 127.0).astype(np.float32)


def make_two_stage(iters):
    @jax.jit
    def run(bot0, arena_, parts_, slots0, scales_):
        def body(carry, i):
            bot, slots, acc = carry
            rows = []
            for j, (off, sz) in enumerate(members):
                rows.append(
                    onehot_member_rows(arena_, off, sz, slots[j])
                    * scales_[j][:, None]
                )
            oh_part = jnp.stack(rows)  # [n_oh, B, D] -> HBM chunk
            out = fused_dot_interaction_parts(
                bot, [oh_part, *parts_], fmap2, INTERPRET)
            s = out.sum()
            bump = s.astype(jnp.int32)
            nslots = jnp.stack([
                offs_d[j] + (slots[j] - offs_d[j] + bump + i + 1) % mods_d[j]
                for j in range(n_oh)
            ])
            bot = bot.at[0, 0].add((s * 1e-20).astype(bot.dtype))
            return (bot, nslots, acc + s), None

        (_, _, acc), _ = jax.lax.scan(
            body, (bot0, slots0, jnp.float32(0)), jnp.arange(iters))
        return acc
    return run


def make_fused(iters):
    @jax.jit
    def run(bot0, arena_, parts_, slots0, scales_):
        def body(carry, i):
            bot, slots, acc = carry
            out = fused_dot_interaction_oh_parts(
                bot, arena_, slots, scales_, parts_,
                members=members, interpret=INTERPRET)
            s = out.sum()
            bump = s.astype(jnp.int32)
            nslots = jnp.stack([
                offs_d[j] + (slots[j] - offs_d[j] + bump + i + 1) % mods_d[j]
                for j in range(n_oh)
            ])
            bot = bot.at[0, 0].add((s * 1e-20).astype(bot.dtype))
            return (bot, nslots, acc + s), None

        (_, _, acc), _ = jax.lax.scan(
            body, (bot0, slots0, jnp.float32(0)), jnp.arange(iters))
        return acc
    return run


# fmap for two_stage: part 0 = oh (n_oh subs), then the other parts.
fmap2 = tuple([(0, j) for j in range(n_oh)]
              + [(pi + 1, j) for (pi, j) in fmap])
offs_d = jnp.asarray([m[0] for m in members], jnp.int32)
mods_d = jnp.asarray([c + 1 for c in OH_CARDS], jnp.int32)

# Parity first (one execution each, same inputs).
bot = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
sl = jnp.asarray(slots_for(0))
sc = jnp.asarray(scales_for(0))
rows_ref = [
    onehot_member_rows(arena, off, sz, sl[j]) * sc[j][:, None]
    for j, (off, sz) in enumerate(members)
]
a = fused_dot_interaction_parts(
    bot, [jnp.stack(rows_ref), *parts], fmap2, INTERPRET)
b = fused_dot_interaction_oh_parts(
    bot, arena, sl, sc, parts, members=members, interpret=INTERPRET)
rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
print("parity rel err:", rel)
assert rel < 1e-2, rel

MODES = {"two_stage": make_two_stage, "oh_in_kernel": make_fused}
runs = {}
for name, mk in MODES.items():
    for iters in (IT_LO, IT_HI):
        r = mk(iters)
        float(r(bot, arena, parts, sl, sc))
        runs[(name, iters)] = r

samples = {m: [] for m in MODES}
for rd in range(ROUNDS):
    for name in MODES:
        tt = {}
        for iters in (IT_LO, IT_HI):
            s0 = jnp.asarray(slots_for(50 + rd * 7 + iters))
            sc0 = jnp.asarray(scales_for(rd))
            t0 = time.perf_counter()
            float(runs[(name, iters)](bot, arena, parts, s0, sc0))
            tt[iters] = time.perf_counter() - t0
        samples[name].append(
            (tt[IT_HI] - tt[IT_LO]) / (IT_HI - IT_LO) * 1e6)

med = {m: float(np.median(s)) for m, s in samples.items()}
out = {
    "metric": "oh_in_kernel_ab_v5e",
    "median_us": {m: round(v, 1) for m, v in med.items()},
    "samples_us": {m: [round(x, 1) for x in s] for m, s in samples.items()},
    "parity_rel_err": rel,
    "batch": B, "dim": D, "oh_members": len(OH_CARDS),
    "arena_rows_padded": R, "feats": feats,
    "protocol": f"interleaved x{ROUNDS}, slope {IT_LO}->{IT_HI} scan iters; "
                "stage = one-hot lookup + interaction (dense MLP excluded "
                "— identical in both variants)",
    "device": str(jax.devices()[0]),
}
print(json.dumps(out))
if not os.environ.get("HPS_BENCH_SMOKE"):
    (pathlib.Path(__file__).resolve().parents[1] / "bench_artifacts" /
     "oh_fused_ab.json").write_text(json.dumps(out, indent=1))
