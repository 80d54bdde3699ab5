"""Headline benchmark: Criteo-Kaggle DLRM INT8 embedding lookup + fused dense
forward on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: the reference's own CI model — DLRM over Criteo (26 categorical
features, reference .gitlab-ci.yml:70 ``perf_analyzer -m dlrm --shape
KEYS:26``) — with the REAL Criteo-Kaggle per-feature cardinalities (26 tables
from 3 rows to 10.1M rows), embedding dim 128, INT8 row-quantized with
per-row scales, one key per table per sample.

Timing methodology: the chip sits behind a network tunnel (~30 ms sync RTT,
async dispatch pipelining + caching make python-loop timing unreliable), so
every number is measured INSIDE one XLA program: K iterations under
``lax.scan``, each iteration's slots derived from the previous iteration's
full output (serializes iterations, defeats DCE), timed over a whole call.

Gather cost structure measured on v5e (see ops/dequant_gather.py): per-access
bound, ~12 ns/row for tables >= 4 MB, ~4.6 ns/row below ~2 MB. The 26-table
Criteo layout keeps 21 tables in the fast region; the 5 huge tables pay the
slow rate.

Baseline: the reference publishes no absolute numbers (BASELINE.md). The
north-star target is ">=2x lookup vectors/s/chip vs A100 HPS" (BASELINE.json);
an A100's HBM2e sustains roughly 1-2 G random 512 B row reads/s, so
vs_baseline uses 1.0e9 vectors/s as the A100-HPS reference point (target:
vs_baseline >= 2). v5e has no SparseCore, so closing this gap is the central
engineering problem of this framework — current levers: INT8 capacity,
small-table fast path, fused dense forward; next: native-dedup + streaming
select for mega-batches.
"""

import json
import sys
import time

import numpy as np

# The 26 Criteo-Kaggle categorical cardinalities (C1..C26).
CRITEO_CARDS = [
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683,
    8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18, 15,
    286181, 105, 142572,
]


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from hugectr_backend_tpu.models.dlrm import DLRM

    DIM, BATCH, SMALL_BATCH = 128, 4096, 1024
    KEYS = len(CRITEO_CARDS)  # one key per table per sample

    # INT8 tables + per-row scales, generated directly on device in ONE
    # compiled program (4.2 GB through the host tunnel would take ~15 min,
    # and 26 separate generator dispatches cost 26 remote compiles). Content
    # is an iota-based pseudo-pattern — gather cost is content-independent.
    @jax.jit
    def gen_tables():
        ts, ss = [], []
        for idx, rows in enumerate(CRITEO_CARDS):
            v = jax.lax.broadcasted_iota(jnp.int32, (rows, DIM), 0) * 131 + \
                jax.lax.broadcasted_iota(jnp.int32, (rows, DIM), 1) * 7 + idx
            ts.append((v % 255 - 127).astype(jnp.int8))
            r = jax.lax.broadcasted_iota(jnp.int32, (rows,), 0)
            ss.append(0.01 + (r % 50).astype(jnp.float32) * 0.001)
        return ts, ss

    tables, scales = gen_tables()
    jax.block_until_ready(tables)

    def lookup_all(slot_list):
        outs = []
        for t, s, sl in zip(tables, scales, slot_list):
            o = jnp.take(t, sl, axis=0).astype(jnp.float32)
            outs.append(o * jnp.take(s, sl)[:, None])
        return outs

    def make_slots(batch, seed):
        r = np.random.default_rng(seed)
        return [
            jnp.asarray(r.zipf(1.05, batch) % c, jnp.int32) for c in CRITEO_CARDS
        ]

    def timed_scan_us(run, k_small=16, k_big=128):
        run(k=k_small).block_until_ready()
        run(k=k_big).block_until_ready()
        t0 = time.perf_counter()
        run(k=k_big).block_until_ready()
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(k=k_small).block_until_ready()
        ts = time.perf_counter() - t0
        return max(tb - ts, 1e-9) / (k_big - k_small) * 1e6

    # --- lookup: all 26 tables, serialized batches inside one program -------
    def make_lookup_runner(batch):
        slots0 = make_slots(batch, 1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run(k: int):
            def body(carry, i):
                slot_list, acc = carry
                outs = lookup_all(slot_list)
                sums = [o.sum(axis=1) for o in outs]
                nxt = [
                    (sl + s.astype(jnp.int32) + i + 1) % c
                    for sl, s, c in zip(slot_list, sums, CRITEO_CARDS)
                ]
                return (nxt, acc + sum(s.sum() for s in sums)), None

            (_, acc), _ = jax.lax.scan(body, (slots0, jnp.float32(0)), jnp.arange(k))
            return acc

        return run

    us_head = timed_scan_us(make_lookup_runner(BATCH))
    vectors_per_s = BATCH * KEYS / us_head * 1e6
    us_small = timed_scan_us(make_lookup_runner(SMALL_BATCH))
    small_vectors_per_s = SMALL_BATCH * KEYS / us_small * 1e6

    # --- fused end-to-end DLRM (26 lookups + dense forward, one program) ----
    model = DLRM(bottom_widths=(512, 256, DIM))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((BATCH, 13), jnp.float32),
        jnp.zeros((BATCH, KEYS, DIM), jnp.float32),
    )
    dense0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 13), jnp.float32)
    slots_e2e = make_slots(BATCH, 3)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_e2e(k: int):
        def body(carry, i):
            slot_list, acc = carry
            outs = lookup_all(slot_list)
            emb = jnp.stack(outs, axis=1)  # [B, 26, D]
            logits = model.apply(params, dense0, emb)
            bump = logits.sum().astype(jnp.int32)
            nxt = [
                (sl + bump + i + 1) % c for sl, c in zip(slot_list, CRITEO_CARDS)
            ]
            return (nxt, acc + logits.sum()), None

        (_, acc), _ = jax.lax.scan(body, (slots_e2e, jnp.float32(0)), jnp.arange(k))
        return acc

    us_e2e = timed_scan_us(lambda k: run_e2e(k=k))
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
                "num_tables": KEYS,
                "layout": "criteo-kaggle 26 tables x 128d int8",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
