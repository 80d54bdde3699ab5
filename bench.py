"""Headline benchmark: Criteo-Kaggle DLRM INT8 embedding lookup + fused dense
forward on one TPU chip, through the production table layout.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: the reference's CI model — DLRM over Criteo (26 categorical
features, reference .gitlab-ci.yml:70 ``perf_analyzer -m dlrm --shape
KEYS:26``) — with the REAL Criteo-Kaggle per-feature cardinalities (26
tables, 3 rows .. 10.1M rows), dim 128, INT8 row-quantized with per-row
scales, one key per table per sample.

Table layout matches the production cache (ps/parameter_server.py
_build_cache): the 18 small tables (<= 64k rows) share one ~6 MB arena that
stays in the fast gather size class (~9-15 ns/row vs ~22 ns/row for a 190 MB
arena), and the 8 larger tables stay solo — their gathers are independent
ops in the same program and overlap (measured v5e: 5 solo gathers cost 1.8x
one, not 5x). This layout measured 1.32x faster than the previous 21-table
mono-arena.

Measurement rules for this environment (hard-won; see ops/dequant_gather.py):
tables passed to jit AS ARGUMENTS; work serialized inside one lax.scan with a
data dependency; completion forced by fetching the result value; distinct
inputs per timed call. Headline batch is 4096 (the continuous batcher's merge
ceiling); batch 1024 (the reference demo config) reported as an extra.

Baseline: the reference publishes no absolute numbers (BASELINE.md). The
north-star target is ">=2x lookup vectors/s/chip vs A100 HPS" (BASELINE.json);
an A100 sustains roughly 1e9 random 512 B row reads/s through the HPS GPU
cache, so vs_baseline uses 1.0e9 vectors/s. v5e has no SparseCore — random
gather is the structural gap; the honest number is reported rather than
flattered, and the levers (INT8 capacity, arena layout, fused dense,
multi-chip sharding, streaming mega-batch selects) are documented.
"""

import json
import os
import sys
import time

import numpy as np

# The 26 Criteo-Kaggle categorical cardinalities (C1..C26).
CRITEO_CARDS = [
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683,
    8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18, 15,
    286181, 105, 142572,
]

DIM = 128
BATCH = 4096
SMALL_BATCH = 1024
SCAN_ITERS = 64
ARENA_MAX = 1 << 16  # matches ps.parameter_server.arena_member_max_rows

if os.environ.get("HPS_BENCH_SMOKE"):
    CRITEO_CARDS = [min(c, 60_000) for c in CRITEO_CARDS]
    BATCH, SMALL_BATCH, SCAN_ITERS, ARENA_MAX = 128, 64, 8, 30_000


def main():
    import jax
    import jax.numpy as jnp

    from hugectr_backend_tpu.models.dlrm import DLRM
    from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla

    n_tables = len(CRITEO_CARDS)
    rng = np.random.default_rng(0)

    small_idx = [t for t, c in enumerate(CRITEO_CARDS) if c <= ARENA_MAX]
    big_idx = [t for t, c in enumerate(CRITEO_CARDS) if c > ARENA_MAX]
    small_cards = [CRITEO_CARDS[t] for t in small_idx]
    big_cards = [CRITEO_CARDS[t] for t in big_idx]
    s_off = np.concatenate([[0], np.cumsum(np.asarray(small_cards) + 1)]).astype(
        np.int64
    )
    s_total = int(s_off[-1])

    # ---- tables generated on device in ONE program (no giant H2D) --------
    @jax.jit
    def gen_tables():
        v = jax.lax.broadcasted_iota(jnp.int32, (s_total, DIM), 0) * 131
        sv = (v % 255 - 127).astype(jnp.int8)
        ssc = 0.01 + (
            jax.lax.broadcasted_iota(jnp.int32, (s_total,), 0) % 50
        ).astype(jnp.float32) * 0.001
        bigs = []
        for rows in big_cards:
            bv = jax.lax.broadcasted_iota(jnp.int32, (rows, DIM), 0) * 131
            bs = 0.01 + (
                jax.lax.broadcasted_iota(jnp.int32, (rows,), 0) % 50
            ).astype(jnp.float32) * 0.001
            bigs.append(((bv % 255 - 127).astype(jnp.int8), bs))
        return sv, ssc, bigs

    sv, ssc, bigs = gen_tables()
    jax.block_until_ready((sv, ssc))

    def make_slots(batch, seed):
        r = np.random.default_rng(seed)
        sparts = [
            s_off[i] + (r.zipf(1.05, batch) % c) for i, c in enumerate(small_cards)
        ]
        sslots = jnp.asarray(np.concatenate(sparts).astype(np.int32))
        bslots = [jnp.asarray(r.zipf(1.05, batch) % c, jnp.int32) for c in big_cards]
        return sslots, bslots

    # ---- serialized lookup rate (hybrid production layout) ---------------
    def lookup_body(sslots, bslots):
        o = gather_dequant_xla(sv, ssc, sslots)
        outs_big = [
            gather_dequant_xla(bv, bsc, sl) for (bv, bsc), sl in zip(bigs, bslots)
        ]
        return o, outs_big

    def make_run(batch):
        @jax.jit
        def run(sv_, ssc_, bigs_, sslots, bslots):
            def body(carry, i):
                (ss_, bs_), acc = carry
                o = gather_dequant_xla(sv_, ssc_, ss_)
                tot = o.sum()
                nxt_s = (ss_ + o.sum(axis=1).astype(jnp.int32) + i + 1) % s_total
                nxt_b = []
                for (bv, bsc), sl, rows in zip(bigs_, bs_, big_cards):
                    ob = gather_dequant_xla(bv, bsc, sl)
                    tot = tot + ob.sum()
                    nxt_b.append(
                        (sl + ob.sum(axis=1).astype(jnp.int32) + i + 1) % rows
                    )
                return ((nxt_s, nxt_b), acc + tot), None

            (_, acc), _ = jax.lax.scan(
                body, ((sslots, bslots), jnp.float32(0)), jnp.arange(SCAN_ITERS)
            )
            return acc

        return run

    def timed_us(run, batch, seeds):
        a, b = make_slots(batch, seeds[0])
        float(run(sv, ssc, bigs, a, b))  # compile + warm
        best = float("inf")
        for s in seeds[1:]:
            a, b = make_slots(batch, s)
            t0 = time.perf_counter()
            float(run(sv, ssc, bigs, a, b))
            best = min(best, time.perf_counter() - t0)
        return best / SCAN_ITERS * 1e6

    us_head = timed_us(make_run(BATCH), BATCH, [1, 2, 3, 4])
    vectors_per_s = BATCH * n_tables / us_head * 1e6
    us_small = timed_us(make_run(SMALL_BATCH), SMALL_BATCH, [5, 6, 7])
    small_vectors_per_s = SMALL_BATCH * n_tables / us_small * 1e6

    # ---- fused end-to-end DLRM (hybrid lookup + dense, one program) ------
    model = DLRM(bottom_widths=(512, 256, DIM))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((BATCH, 13), jnp.float32),
        jnp.zeros((BATCH, n_tables, DIM), jnp.float32),
    )
    dense0 = jnp.asarray(rng.standard_normal((BATCH, 13)), jnp.float32)

    @jax.jit
    def run_e2e(sv_, ssc_, bigs_, mp, dense, sslots, bslots):
        def body(carry, i):
            (ss_, bs_), acc = carry
            o = gather_dequant_xla(sv_, ssc_, ss_)  # [21*B, D]
            small_embs = o.reshape(len(small_idx), BATCH, DIM)
            big_embs = [
                gather_dequant_xla(bv, bsc, sl)
                for (bv, bsc), sl in zip(bigs_, bs_)
            ]
            emb = jnp.concatenate(
                [small_embs, jnp.stack(big_embs, axis=0)], axis=0
            ).transpose(1, 0, 2)  # [B, 26, D]
            logits = model.apply(mp, dense, emb)
            bump = logits.sum().astype(jnp.int32)
            nxt_s = (ss_ + bump + i + 1) % s_total
            nxt_b = [(sl + bump + i + 1) % rows for sl, rows in zip(bs_, big_cards)]
            return ((nxt_s, nxt_b), acc + logits.sum()), None

        (_, acc), _ = jax.lax.scan(
            body, ((sslots, bslots), jnp.float32(0)), jnp.arange(SCAN_ITERS)
        )
        return acc

    a, b = make_slots(BATCH, 10)
    float(run_e2e(sv, ssc, bigs, params, dense0, a, b))
    best = float("inf")
    for s in (11, 12, 13):
        a, b = make_slots(BATCH, s)
        t0 = time.perf_counter()
        float(run_e2e(sv, ssc, bigs, params, dense0, a, b))
        best = min(best, time.perf_counter() - t0)
    us_e2e = best / SCAN_ITERS * 1e6
    e2e_qps = BATCH / us_e2e * 1e6

    baseline_vectors_per_s = 1.0e9  # A100 HPS reference point (see docstring)
    print(
        json.dumps(
            {
                "metric": "criteo_dlrm_int8_lookup_vectors_per_s_per_chip",
                "value": round(vectors_per_s, 1),
                "unit": "vectors/s",
                "vs_baseline": round(vectors_per_s / baseline_vectors_per_s, 4),
                "batch_latency_us": round(us_head, 1),
                "batch1024_latency_us": round(us_small, 1),
                "batch1024_vectors_per_s": round(small_vectors_per_s, 1),
                "fused_dlrm_e2e_samples_per_s": round(e2e_qps, 1),
                "fused_dlrm_batch_latency_us": round(us_e2e, 1),
                "batch": BATCH,
                "num_tables": n_tables,
                "layout": "criteo-kaggle 26 tables x 128d int8+scales, "
                          "small-table arena (<=64k rows) + solo overlapped "
                          "gathers",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
