"""Microbench: gather-op overlap, chunked gathers, sorted slots (real TPU).

Round-1 measured that INDEPENDENT gather ops in one XLA program overlap
(5 ops ~= 1.8x one op's latency). This script quantifies the lever set for
the round-2 hot-path rebuild:

  1. chunk scaling: one big table's 4096 slots split into K independent
     chunk-gathers, K = 1/2/4/8/16 (sums consumed separately so XLA cannot
     re-fuse them).
  2. fusion check: same but chunk outputs concatenated before the sum (does
     XLA merge them back into one gather?).
  3. sorted slots: jnp.sort before the gather (duplicate adjacency + HBM page
     locality; zipf batches are duplicate-heavy); with and without the
     unpermute-back gather.
  4. small-arena chunking: the 18-small-table arena's 73728 slots in K chunks.
  5. combined: the production criteo-26 layout as-is vs all-chunked.

Timing rules (tunnel; see CLAUDE.md): tables as jit args, work serialized in
one lax.scan with data dependencies, completion forced via float(result),
distinct inputs per timed call.

    python scripts/microbench_overlap.py
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

DIM = 128
BATCH = 4096
ITERS = 32

BIG_CARDS = [10131227, 2202608, 8351593, 5461306, 7046547, 286181, 142572,
             93145]
SMALL_CARDS = [1460, 583, 305, 24, 12517, 633, 3, 5683, 3194, 27, 14992, 10,
               5652, 2173, 4, 18, 15, 105]


def gen_table(rows):
    @jax.jit
    def gen():
        v = jax.lax.broadcasted_iota(jnp.int32, (rows, DIM), 0) * 131
        sv = (v % 255 - 127).astype(jnp.int8)
        sc = 0.01 + (jax.lax.broadcasted_iota(jnp.int32, (rows,), 0) % 50
                     ).astype(jnp.float32) * 0.001
        return sv, sc
    out = gen()
    jax.block_until_ready(out)
    return out


def gd(v, s, slots):
    return jnp.take(v, slots, axis=0).astype(jnp.float32) * jnp.take(
        s, slots, axis=0)[:, None]


def make_slots(seed, cards, batch=BATCH):
    r = np.random.default_rng(seed)
    return [jnp.asarray(r.zipf(1.05, batch) % c, jnp.int32) for c in cards]


def timed(run, args_fn, seeds, iters=ITERS):
    float(run(*args_fn(seeds[0])))
    best = float("inf")
    for s in seeds[1:]:
        a = args_fn(s)
        t0 = time.perf_counter()
        float(run(*a))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6


def report(name, us, nrows):
    print(f"{name:34s}: {us:9.1f} us/batch  {nrows / us:8.1f} Mrow/s  "
          f"{us * 1e3 / nrows:6.2f} ns/row", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rows_big = BIG_CARDS[0]
    v, s = gen_table(rows_big)
    seeds = [1, 2, 3, 4]

    # ---- 1. chunk scaling on ONE big table ------------------------------
    for k in (1, 2, 4, 8, 16):
        @jax.jit
        def run(v_, s_, slots, k=k):
            chunks0 = jnp.split(slots, k)
            def body(carry, i):
                chunks, acc = carry
                nxt, tot = [], acc
                for c in chunks:
                    o = gd(v_, s_, c)
                    tot = tot + o.sum()
                    nxt.append((c + o.sum(axis=1).astype(jnp.int32) + i + 1)
                               % rows_big)
                return (nxt, tot), None
            (_, acc), _ = jax.lax.scan(
                body, (chunks0, jnp.float32(0)), jnp.arange(ITERS))
            return acc
        us = timed(run, lambda sd: (v, s, make_slots(sd, [rows_big])[0]),
                   seeds)
        report(f"1 big table, K={k} chunks (sep)", us, BATCH)

    # ---- 2. fusion check: chunks concatenated ---------------------------
    @jax.jit
    def run_cat(v_, s_, slots):
        def body(carry, i):
            sl, acc = carry
            o = jnp.concatenate([gd(v_, s_, c) for c in jnp.split(sl, 4)])
            return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1) % rows_big,
                    acc + o.sum()), None
        (_, acc), _ = jax.lax.scan(
            body, (slots, jnp.float32(0)), jnp.arange(ITERS))
        return acc
    us = timed(run_cat, lambda sd: (v, s, make_slots(sd, [rows_big])[0]),
               seeds)
    report("1 big table, K=4 chunks (concat)", us, BATCH)

    # ---- 3. sorted slots -------------------------------------------------
    @jax.jit
    def run_sorted(v_, s_, slots):
        def body(carry, i):
            sl, acc = carry
            o = gd(v_, s_, jnp.sort(sl))
            return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1) % rows_big,
                    acc + o.sum()), None
        (_, acc), _ = jax.lax.scan(
            body, (slots, jnp.float32(0)), jnp.arange(ITERS))
        return acc
    us = timed(run_sorted, lambda sd: (v, s, make_slots(sd, [rows_big])[0]),
               seeds)
    report("1 big table, sorted (no unperm)", us, BATCH)

    @jax.jit
    def run_sorted_unperm(v_, s_, slots):
        def body(carry, i):
            sl, acc = carry
            order = jnp.argsort(sl)
            o_sorted = gd(v_, s_, sl[order])
            o = jnp.zeros_like(o_sorted).at[order].set(o_sorted)
            return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1) % rows_big,
                    acc + o.sum()), None
        (_, acc), _ = jax.lax.scan(
            body, (slots, jnp.float32(0)), jnp.arange(ITERS))
        return acc
    us = timed(run_sorted_unperm,
               lambda sd: (v, s, make_slots(sd, [rows_big])[0]), seeds)
    report("1 big table, sorted + unperm", us, BATCH)

    # sorted chunked: sort whole batch then K chunk gathers (locality within
    # each chunk is even better: chunks cover disjoint sorted ranges)
    for k in (4, 8):
        @jax.jit
        def run_schunk(v_, s_, slots, k=k):
            def body(carry, i):
                sl, acc = carry
                tot = acc
                for c in jnp.split(jnp.sort(sl), k):
                    tot = tot + gd(v_, s_, c).sum()
                return ((sl + jnp.int32(tot) % 7 + i + 1) % rows_big, tot), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(ITERS))
            return acc
        us = timed(run_schunk, lambda sd: (v, s, make_slots(sd, [rows_big])[0]),
                   seeds)
        report(f"1 big table, sorted K={k} chunks", us, BATCH)

    # ---- 4. all 8 big tables --------------------------------------------
    vs_big = [gen_table(c) for c in BIG_CARDS]
    vlist = [a for a, _ in vs_big]
    slist = [b for _, b in vs_big]

    def make_big(k):
        @jax.jit
        def run(vl, sl, slots, k=k):
            chunks0 = [jnp.split(x, k) for x in slots]
            def body(carry, i):
                chs, acc = carry
                nxt, tot = [], acc
                for (v_, s_), cc, rows in zip(zip(vl, sl), chs, BIG_CARDS):
                    ncc = []
                    for c in cc:
                        o = gd(v_, s_, c)
                        tot = tot + o.sum()
                        ncc.append((c + o.sum(axis=1).astype(jnp.int32) + i
                                    + 1) % rows)
                    nxt.append(ncc)
                return (nxt, tot), None
            (_, acc), _ = jax.lax.scan(
                body, (chunks0, jnp.float32(0)), jnp.arange(ITERS))
            return acc
        return run
    for k in (1, 2, 4):
        us = timed(make_big(k), lambda sd: (vlist, slist,
                                            make_slots(sd, BIG_CARDS)), seeds)
        report(f"8 big tables, K={k} chunks each", us, BATCH * len(BIG_CARDS))

    # ---- 5. small arena chunking ----------------------------------------
    off = np.concatenate([[0], np.cumsum(np.asarray(SMALL_CARDS) + 1)])
    total_small = int(off[-1])
    av, asc = gen_table(total_small)

    def make_arena_slots(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(np.concatenate(
            [off[i] + (r.zipf(1.05, BATCH) % c)
             for i, c in enumerate(SMALL_CARDS)]).astype(np.int32))

    for k in (1, 2, 4, 8):
        @jax.jit
        def run_ar(v_, s_, slots, k=k):
            chunks0 = jnp.split(slots, k)
            def body(carry, i):
                chs, acc = carry
                nxt, tot = [], acc
                for c in chs:
                    o = gd(v_, s_, c)
                    tot = tot + o.sum()
                    nxt.append((c + o.sum(axis=1).astype(jnp.int32) + i + 1)
                               % total_small)
                return (nxt, tot), None
            (_, acc), _ = jax.lax.scan(
                body, (chunks0, jnp.float32(0)), jnp.arange(ITERS))
            return acc
        us = timed(run_ar, lambda sd: (av, asc, make_arena_slots(sd)), seeds)
        report(f"small arena, K={k} chunks", us, BATCH * len(SMALL_CARDS))

    # ---- 6. combined criteo-26: current vs chunked ----------------------
    def make_comb(k_arena, k_big):
        @jax.jit
        def run(av_, asc_, vl, sl, aslots, bslots):
            a0 = jnp.split(aslots, k_arena) if k_arena > 1 else [aslots]
            b0 = [jnp.split(x, k_big) if k_big > 1 else [x] for x in bslots]
            def body(carry, i):
                (achs, bchs), acc = carry
                tot = acc
                nxt_a = []
                for c in achs:
                    o = gd(av_, asc_, c)
                    tot = tot + o.sum()
                    nxt_a.append((c + o.sum(axis=1).astype(jnp.int32) + i + 1)
                                 % total_small)
                nxt_b = []
                for (v_, s_), cc, rows in zip(zip(vl, sl), bchs, BIG_CARDS):
                    ncc = []
                    for c in cc:
                        o = gd(v_, s_, c)
                        tot = tot + o.sum()
                        ncc.append((c + o.sum(axis=1).astype(jnp.int32) + i
                                    + 1) % rows)
                    nxt_b.append(ncc)
                return ((nxt_a, nxt_b), tot), None
            (_, acc), _ = jax.lax.scan(
                body, ((a0, b0), jnp.float32(0)), jnp.arange(ITERS))
            return acc
        return run

    n_comb = BATCH * (len(SMALL_CARDS) + len(BIG_CARDS))
    for (ka, kb) in ((1, 1), (4, 2), (8, 4)):
        us = timed(make_comb(ka, kb),
                   lambda sd: (av, asc, vlist, slist, make_arena_slots(sd),
                               make_slots(sd, BIG_CARDS)), seeds)
        report(f"criteo-26, arena K={ka} big K={kb}", us, n_comb)

    print("done", flush=True)


if __name__ == "__main__":
    main()
