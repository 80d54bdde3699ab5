"""Slope-timed (tunnel-RTT-free) measurements of the hot-path candidates.

microbench_overhead.py found ~26 ms fixed per-execution overhead (tunnel
RTT), inflating every round-1 number taken at 64 scan iters by ~410 us/batch.
Protocol here: run each config at ITERS=64 and ITERS=320 and report
slope = (t320 - t64) / 256 — pure device time per batch.

Configs (criteo-kaggle 26-table workload, D=128, zipf 1.05):
  A  small arena (18 tables, 47k rows) int8 + DEVICE scales gather  [current]
  B  small arena int8 + scales passed as input (host-gathered)
  C  small arena int8, no scales at all (lower bound)
  D  1 big table (10.1M) + device scales, 4096 slots
  E  1 big table + input scales
  F  8 big tables + device scales [current]
  G  8 big tables + input scales
  H  criteo-26 full, device scales [current production emulation]
  I  criteo-26 full, input scales everywhere
  J  one-hot MXU kernel, 16-tiny-table subset (slope-timed)
  K  pallas grouped-DMA gather, 1 big table, 4096 keys, input scales

    python scripts/microbench_true.py
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
IT_LO, IT_HI = 64, 320

BIG_CARDS = [10131227, 2202608, 8351593, 5461306, 7046547, 286181, 142572,
             93145]
SMALL_CARDS = [1460, 583, 305, 24, 12517, 633, 3, 5683, 3194, 27, 14992, 10,
               5652, 2173, 4, 18, 15, 105]
TINY_CARDS = [1460, 583, 305, 24, 633, 3, 5683, 3194, 27, 10, 5652, 2173, 4,
              18, 15, 105]


def gen_flat(rows):
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


def slope_timed(make_run, args_fn, label, nrows):
    times = {}
    for iters in (IT_LO, IT_HI):
        run = make_run(iters)
        float(run(*args_fn(0)))
        best = float("inf")
        for sd in (1, 2, 3):
            a = args_fn(sd)
            t0 = time.perf_counter()
            float(run(*a))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    us = (times[IT_HI] - times[IT_LO]) / (IT_HI - IT_LO) * 1e6
    print(f"{label:44s}: {us:8.1f} us/batch  {nrows / us:8.1f} Mrow/s  "
          f"{us * 1e3 / nrows:6.2f} ns/row", flush=True)
    return us


def main():
    print("device:", jax.devices()[0], flush=True)

    # ---------------- small arena -------------------------------------
    off = np.concatenate([[0], np.cumsum(np.asarray(SMALL_CARDS) + 1)])
    total_small = int(off[-1])
    av, asc = gen_flat(total_small)
    n_small = BATCH * len(SMALL_CARDS)

    def arena_slots(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(np.concatenate(
            [off[i] + (r.zipf(1.05, BATCH) % c)
             for i, c in enumerate(SMALL_CARDS)]).astype(np.int32))

    def make_arena(iters, mode):
        @jax.jit
        def run(v_, s_, slots, inscales):
            def body(carry, i):
                sl, acc = carry
                rows = jnp.take(v_, sl, axis=0).astype(jnp.float32)
                if mode == "dev":
                    o = rows * jnp.take(s_, sl, axis=0)[:, None]
                elif mode == "in":
                    o = rows * inscales[:, None]
                else:
                    o = rows
                return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1)
                        % total_small, acc + o.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    inscales = jnp.ones((n_small,), jnp.float32) * 0.013
    for mode, label in (("dev", "A arena dev-scales"),
                        ("in", "B arena input-scales"),
                        ("none", "C arena no-scales")):
        slope_timed(lambda it, m=mode: make_arena(it, m),
                    lambda sd: (av, asc, arena_slots(sd), inscales),
                    label, n_small)

    # ---------------- big tables --------------------------------------
    rows_big = BIG_CARDS[0]
    bv, bs = gen_flat(rows_big)

    def big_slots(seed, cards):
        r = np.random.default_rng(seed)
        return [jnp.asarray(r.zipf(1.05, BATCH) % c, jnp.int32) for c in cards]

    def make_one_big(iters, mode):
        @jax.jit
        def run(v_, s_, slots, inscales):
            def body(carry, i):
                sl, acc = carry
                rows = jnp.take(v_, sl, axis=0).astype(jnp.float32)
                if mode == "dev":
                    o = rows * jnp.take(s_, sl, axis=0)[:, None]
                else:
                    o = rows * inscales[:, None]
                return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1)
                        % rows_big, acc + o.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    bscales1 = jnp.ones((BATCH,), jnp.float32) * 0.013
    for mode, label in (("dev", "D 1 big dev-scales"),
                        ("in", "E 1 big input-scales")):
        slope_timed(lambda it, m=mode: make_one_big(it, m),
                    lambda sd: (bv, bs, big_slots(sd, [rows_big])[0], bscales1),
                    label, BATCH)

    vs_all = [(bv, bs)] + [gen_flat(c) for c in BIG_CARDS[1:]]
    vlist = [a for a, _ in vs_all]
    slist = [b for _, b in vs_all]
    n_big = BATCH * len(BIG_CARDS)

    def make_bigs(iters, mode):
        @jax.jit
        def run(vl, sl_, slots, inscales):
            def body(carry, i):
                sls, acc = carry
                nxt, tot = [], acc
                for (v_, s_), c, rows in zip(zip(vl, sl_), sls, BIG_CARDS):
                    r_ = jnp.take(v_, c, axis=0).astype(jnp.float32)
                    if mode == "dev":
                        o = r_ * jnp.take(s_, c, axis=0)[:, None]
                    else:
                        o = r_ * inscales[:, None]
                    tot = tot + o.sum()
                    nxt.append((c + o.sum(axis=1).astype(jnp.int32) + i + 1)
                               % rows)
                return (nxt, tot), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    for mode, label in (("dev", "F 8 bigs dev-scales"),
                        ("in", "G 8 bigs input-scales")):
        slope_timed(lambda it, m=mode: make_bigs(it, m),
                    lambda sd: (vlist, slist, big_slots(sd, BIG_CARDS),
                                bscales1),
                    label, n_big)

    # ---------------- full criteo-26 ----------------------------------
    n_all = n_small + n_big

    def make_full(iters, mode):
        @jax.jit
        def run(av_, asc_, vl, sl_, aslots, bslots, ainsc, binsc):
            def body(carry, i):
                (asl, bsls), acc = carry
                rows = jnp.take(av_, asl, axis=0).astype(jnp.float32)
                if mode == "dev":
                    o = rows * jnp.take(asc_, asl, axis=0)[:, None]
                else:
                    o = rows * ainsc[:, None]
                tot = acc + o.sum()
                nasl = (asl + o.sum(axis=1).astype(jnp.int32) + i + 1) \
                    % total_small
                nxt = []
                for (v_, s_), c, rows_n in zip(zip(vl, sl_), bsls, BIG_CARDS):
                    r_ = jnp.take(v_, c, axis=0).astype(jnp.float32)
                    if mode == "dev":
                        o2 = r_ * jnp.take(s_, c, axis=0)[:, None]
                    else:
                        o2 = r_ * binsc[:, None]
                    tot = tot + o2.sum()
                    nxt.append((c + o2.sum(axis=1).astype(jnp.int32) + i + 1)
                               % rows_n)
                return ((nasl, nxt), tot), None
            (_, acc), _ = jax.lax.scan(
                body, ((aslots, bslots), jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    for mode, label in (("dev", "H criteo-26 dev-scales [round-1 bench]"),
                        ("in", "I criteo-26 input-scales")):
        slope_timed(lambda it, m=mode: make_full(it, m),
                    lambda sd: (av, asc, vlist, slist, arena_slots(sd),
                                big_slots(sd, BIG_CARDS), inscales, bscales1),
                    label, n_all)

    # ---------------- J one-hot kernel (tiny subset) -------------------
    from hugectr_backend_tpu.ops.onehot_gather import (
        plan_onehot_worklist, _onehot_gather_raw)
    r_tile, m_tile = 512, 4096
    tiles, t0_ = [], 0
    for c in TINY_CARDS:
        nt = -(-(c + 1) // r_tile)
        tiles.append((t0_, nt))
        t0_ += nt
    r_total = t0_ * r_tile
    plan = plan_onehot_worklist(tiles, [BATCH] * len(TINY_CARDS),
                                m_tile=m_tile, r_tile=r_tile)
    ov, osc = gen_flat(r_total)
    osc8 = jnp.broadcast_to(osc.reshape(1, -1), (8, r_total))
    kt, rt, fs = (jnp.asarray(plan.kt), jnp.asarray(plan.rt),
                  jnp.asarray(plan.first))
    bases = jnp.asarray(np.concatenate(
        [np.full(BATCH, t0 * r_tile, np.int32) for (t0, _) in tiles]))
    mods = jnp.asarray(np.concatenate(
        [np.full(BATCH, c, np.int32) for c in TINY_CARDS]))
    n_tiny = BATCH * len(TINY_CARDS)

    def tiny_slots(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(np.concatenate(
            [t0 * r_tile + (r.zipf(1.05, BATCH) % c)
             for (t0, _), c in zip(tiles, TINY_CARDS)]).astype(np.int32))

    def make_onehot(iters):
        @jax.jit
        def run(v_, s8_, slots):
            def body(carry, i):
                sl, acc = carry
                out = _onehot_gather_raw(
                    v_, s8_, sl.reshape(-1, 1), kt, rt, fs,
                    num_key_tiles=plan.num_key_tiles, m_tile=m_tile,
                    r_tile=r_tile)
                b = out.sum(axis=1).astype(jnp.int32)
                nxt = bases + (sl - bases + b + i + 1) % mods
                return (nxt, acc + out.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    slope_timed(make_onehot, lambda sd: (ov, osc8, tiny_slots(sd)),
                "J one-hot kernel 16 tiny tables", n_tiny)

    def make_tiny_xla(iters):
        @jax.jit
        def run(v_, s_, slots):
            def body(carry, i):
                sl, acc = carry
                o = jnp.take(v_, sl, axis=0).astype(jnp.float32) * jnp.take(
                    s_, sl, axis=0)[:, None]
                b = o.sum(axis=1).astype(jnp.int32)
                nxt = bases + (sl - bases + b + i + 1) % mods
                return (nxt, acc + o.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    slope_timed(make_tiny_xla, lambda sd: (ov, osc, tiny_slots(sd)),
                "J' xla gather 16 tiny tables", n_tiny)

    # ---------------- K pallas grouped DMA, 1 big table ----------------
    from hugectr_backend_tpu.ops.dequant_gather import pallas_grouped_gather
    rows_g = (rows_big // 8) * 8
    bv3 = bv[:rows_g].reshape(-1, 8, DIM)
    jax.block_until_ready(bv3)

    def make_pallas(iters):
        @jax.jit
        def run(v3_, slots, rsc):
            def body(carry, i):
                sl, acc = carry
                o = pallas_grouped_gather(v3_, sl, rsc)
                return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1)
                        % rows_g, acc + o.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    slope_timed(make_pallas,
                lambda sd: (bv3, big_slots(sd, [rows_g])[0], bscales1),
                "K pallas grouped-DMA 1 big", BATCH)

    print("done", flush=True)


if __name__ == "__main__":
    main()
