"""FULL-program A/B: one-hot fold vs two-stage fused DLRM, high-round.

bench.py's 3-round interleaved A/B (bench_preview_r5) measured the folded
and two-stage constructions statistically EQUAL (874.8 vs 872.8 µs,
spreads 6–20%) even though the isolated stage A/B shows a 19.2 µs win for
the fold (bench_artifacts/oh_fused_ab.json). This script interleaves the
two variants over MORE rounds (default 9) to push the full-program noise
floor below the stage-level delta and answer whether the fold's win
survives composition (e.g. XLA may already overlap the one-hot stage's
HBM round-trip with the solo gathers).

Writes bench_artifacts/fold_full_ab.json.
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
from hugectr_backend_tpu.models.dlrm import DLRM
from hugectr_backend_tpu.ops.fused_interaction import EmbParts
from hugectr_backend_tpu.ps.parameter_server import (
    arena_member_max_rows,
    onehot_member_max_rows,
)
from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla

CRITEO_CARDS = [
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683,
    8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18, 15,
    286181, 105, 142572,
]
DIM = 128
BATCH = 4096
IT_LO, IT_HI = 64, 320
ROUNDS = int(os.environ.get("HPS_AB_ROUNDS", "9"))
if os.environ.get("HPS_BENCH_SMOKE"):
    CRITEO_CARDS = [min(c, 60_000) for c in CRITEO_CARDS]
    BATCH, IT_LO, IT_HI, ROUNDS = 128, 4, 12, 2


def main():
    print("device:", jax.devices()[0], flush=True)
    oh_idx = [t for t, c in enumerate(CRITEO_CARDS)
              if c + 1 <= onehot_member_max_rows()]
    ar_idx = [t for t, c in enumerate(CRITEO_CARDS)
              if c + 1 > onehot_member_max_rows()
              and c <= arena_member_max_rows()]
    big_idx = [t for t, c in enumerate(CRITEO_CARDS)
               if c > arena_member_max_rows()]

    def layout(idx, align=1):
        cards = [CRITEO_CARDS[t] for t in idx]
        blocks = [-(-(c + 1) // align) * align for c in cards]
        off = np.concatenate([[0], np.cumsum(blocks)]).astype(np.int64)
        return cards, off, int(off[-1])

    oh_cards, oh_off, oh_total = layout(oh_idx, align=128)
    ar_cards, ar_off, ar_total = layout(ar_idx)
    big_cards = [CRITEO_CARDS[t] for t in big_idx]
    oh_members = tuple(
        (int(oh_off[j]), int(oh_off[j + 1] - oh_off[j]))
        for j in range(len(oh_cards))
    )

    def gen(rows):
        @jax.jit
        def g():
            v = jax.lax.broadcasted_iota(jnp.int32, (rows, DIM), 0) * 131
            return (v % 255 - 127).astype(jnp.int8)
        out = g()
        jax.block_until_ready(out)
        return out

    oh_vals = gen(oh_total)
    ar_vals = gen(ar_total)
    ar_scales = jnp.ones((ar_total,), jnp.float32) * 0.01
    big_vals = [gen(c) for c in big_cards]

    n_oh, n_ar = len(oh_idx), len(ar_idx)
    model = DLRM(bottom_widths=(512, 256, DIM))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((BATCH, 13), jnp.float32),
        jnp.zeros((BATCH, 26, DIM), jnp.float32),
    )
    rng = np.random.default_rng(0)
    dense0 = jnp.asarray(rng.standard_normal((BATCH, 13)), jnp.float32)

    def bases_mods(cards, off):
        bases = np.concatenate(
            [np.full(BATCH, off[i], np.int64) for i in range(len(cards))])
        mods = np.concatenate([np.full(BATCH, c, np.int64) for c in cards])
        return (jnp.asarray(bases.astype(np.int32)),
                jnp.asarray(mods.astype(np.int32)))

    oh_b, oh_m = bases_mods(oh_cards, oh_off)
    ar_b, ar_m = bases_mods(ar_cards, ar_off)

    def make_run(iters, fold: bool):
        # TABLES RIDE AS ARGUMENTS (tunnel rule: closures embed them as
        # compile-request constants — 4.3 GB uploaded per compile).
        @jax.jit
        def run(oh_vals_, ar_vals_, ar_scales_, big_vals_, mp, dense,
                oh_sl0, ar_sl0, big_sl0, oh_sc, big_sc):
            def body(carry, i):
                (oh_sl, ar_sl, big_sl), acc = carry
                ar_rows = gather_dequant_xla(ar_vals_, ar_scales_, ar_sl)
                big_rows = [
                    gather_dequant_xla(v, None, sl) * sc[:, None]
                    for v, sl, sc in zip(big_vals_, big_sl, big_sc)
                ]
                parts, fmap = [], []
                oh = None
                if fold:
                    oh = (oh_vals_, oh_sl.reshape(n_oh, BATCH),
                          oh_sc.reshape(n_oh, BATCH), oh_members)
                else:
                    rows = []
                    p = 0
                    for o, sz in oh_members:
                        rows.append(onehot_member_rows(
                            oh_vals_, o, sz, oh_sl[p:p + BATCH]))
                        p += BATCH
                    oh_rows = jnp.concatenate(rows) * oh_sc[:, None]
                    fmap += [(0, j) for j in range(n_oh)]
                    parts.append(oh_rows.reshape(n_oh, BATCH, DIM))
                pi = len(parts)
                parts.append(ar_rows.reshape(n_ar, BATCH, DIM))
                fmap += [(pi, j) for j in range(n_ar)]
                for j in range(len(big_idx)):
                    fmap.append((len(parts), 0))
                    parts.append(big_rows[j][None])
                emb = EmbParts(parts, fmap, BATCH, oh=oh)
                logits = model.apply(mp, dense, emb)
                tot = logits.sum()
                bump = tot.astype(jnp.int32)
                n_ohs = (oh_sl - oh_b + bump + i + 1) % oh_m + oh_b
                n_ars = (ar_sl - ar_b + bump + i + 1) % ar_m + ar_b
                n_big = [(sl + bump + i + 1) % c
                         for sl, c in zip(big_sl, big_cards)]
                return ((n_ohs, n_ars, n_big), acc + tot), None

            (_, acc), _ = jax.lax.scan(
                body, ((oh_sl0, ar_sl0, big_sl0), jnp.float32(0)),
                jnp.arange(iters))
            return acc
        return run

    def make_slots(seed, cards, off):
        r = np.random.default_rng(seed)
        return np.concatenate(
            [off[i] + (r.zipf(1.05, BATCH) % c)
             for i, c in enumerate(cards)]).astype(np.int64)

    def args_for(seed):
        oh_np = make_slots(seed, oh_cards, oh_off)
        ar_np = make_slots(seed + 7000, ar_cards, ar_off)
        r = np.random.default_rng(seed + 9000)
        big_np = [r.zipf(1.05, BATCH) % c for c in big_cards]
        oh_sc = (0.01 + (oh_np % 50) * 0.001).astype(np.float32)
        big_sc = [jnp.asarray(
            (0.01 + (s % 50) * 0.001).astype(np.float32)) for s in big_np]
        return (jnp.asarray(oh_np.astype(np.int32)),
                jnp.asarray(ar_np.astype(np.int32)),
                [jnp.asarray(s.astype(np.int32)) for s in big_np],
                jnp.asarray(oh_sc), big_sc)

    tables_args = (oh_vals, ar_vals, ar_scales, big_vals)
    runs = {}
    for fold in (True, False):
        for iters in (IT_LO, IT_HI):
            r = make_run(iters, fold)
            float(r(*tables_args, params, dense0, *args_for(0)))
            runs[(fold, iters)] = r
    samples = {"fold": [], "twostage": []}
    for rd in range(ROUNDS):
        for fold, name in ((True, "fold"), (False, "twostage")):
            tt = {}
            for iters in (IT_LO, IT_HI):
                a = args_for(100 + 13 * rd + iters)
                t0 = time.perf_counter()
                float(runs[(fold, iters)](*tables_args, params, dense0, *a))
                tt[iters] = time.perf_counter() - t0
            samples[name].append(
                (tt[IT_HI] - tt[IT_LO]) / (IT_HI - IT_LO) * 1e6)
    med = {n: float(np.median(s)) for n, s in samples.items()}
    out = {
        "metric": "fold_vs_twostage_full_program_v5e",
        "median_us": {n: round(v, 1) for n, v in med.items()},
        "delta_us": round(med["fold"] - med["twostage"], 1),
        "samples_us": {n: [round(x, 1) for x in s]
                       for n, s in samples.items()},
        "spread": {
            n: round((max(s) - min(s)) / max(med[n], 1e-9), 3)
            for n, s in samples.items()
        },
        "rounds": ROUNDS,
        "batch": BATCH, "dim": DIM,
        "protocol": f"interleaved x{ROUNDS}, slope {IT_LO}->{IT_HI} scan "
                    "iters; full fused DLRM f32 (lookup incl. arena+solo "
                    "gathers + dense forward), fold vs two-stage one-hot",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    if not os.environ.get("HPS_BENCH_SMOKE"):
        (pathlib.Path(__file__).resolve().parents[1] / "bench_artifacts" /
         "fold_full_ab.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
