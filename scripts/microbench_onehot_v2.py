"""Slope-timed: v2 rows-only one-hot kernel vs v1 vs XLA gather vs a pure-XLA
one-hot matmul, on the tiny-table subsets; picks the production threshold.

    python scripts/microbench_onehot_v2.py
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from hugectr_backend_tpu.ops.onehot_gather import (
    plan_onehot_worklist, _onehot_gather_raw, _onehot_rows_raw)

DIM = 128
BATCH = 4096
IT_LO, IT_HI = 64, 320

TINY_CARDS = [1460, 583, 305, 24, 633, 3, 5683, 3194, 27, 10, 5652, 2173, 4,
              18, 15, 105]
# ..."mid" adds nothing tiny: sweep includes the two 12-15k tables to find
# where one-hot stops paying.
MID_CARDS = TINY_CARDS + [12517, 14992]


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
    print(f"{label:46s}: {us:8.1f} us/batch  {us * 1e3 / nrows:6.2f} ns/vec",
          flush=True)
    return us


def setup(cards, r_tile, m_tile):
    tiles, t0_ = [], 0
    for c in cards:
        nt = -(-(c + 1) // r_tile)
        tiles.append((t0_, nt))
        t0_ += nt
    r_total = t0_ * r_tile
    plan = plan_onehot_worklist(tiles, [BATCH] * len(cards),
                                m_tile=m_tile, r_tile=r_tile)
    v, sc = gen_flat(r_total)
    bases = jnp.asarray(np.concatenate(
        [np.full(BATCH, t0 * r_tile, np.int32) for (t0, _) in tiles]))
    mods = jnp.asarray(np.concatenate(
        [np.full(BATCH, c, np.int32) for c in cards]))

    def slots_fn(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(np.concatenate(
            [t0 * r_tile + (r.zipf(1.05, BATCH) % c)
             for (t0, _), c in zip(tiles, cards)]).astype(np.int32))
    return tiles, r_total, plan, v, sc, bases, mods, slots_fn


def main():
    print("device:", jax.devices()[0], flush=True)

    for cards, tag in ((TINY_CARDS, "tiny16"), (MID_CARDS, "mid18")):
        for m_tile, r_tile in ((512, 512), (1024, 512), (2048, 512),
                               (4096, 512)):
            tiles, r_total, plan, v, sc, bases, mods, slots_fn = setup(
                cards, r_tile, m_tile)
            kt, rt, fs = (jnp.asarray(plan.kt), jnp.asarray(plan.rt),
                          jnp.asarray(plan.first))
            n_vec = BATCH * len(cards)
            inscales = jnp.ones((n_vec,), jnp.float32) * 0.013

            def make_v2(iters):
                @jax.jit
                def run(v_, slots, insc):
                    def body(carry, i):
                        sl, acc = carry
                        rows = _onehot_rows_raw(
                            v_, sl.reshape(-1, 1), kt, rt, fs,
                            num_key_tiles=plan.num_key_tiles,
                            m_tile=plan.m_tile, r_tile=plan.r_tile)
                        o = rows * insc[:, None]
                        b = o.sum(axis=1).astype(jnp.int32)
                        nxt = bases + (sl - bases + b + i + 1) % mods
                        return (nxt, acc + o.sum()), None
                    (_, acc), _ = jax.lax.scan(
                        body, (slots, jnp.float32(0)), jnp.arange(iters))
                    return acc
                return run

            slope_timed(make_v2, lambda sd: (v, slots_fn(sd), inscales),
                        f"v2 rows-only {tag} m={m_tile} r={r_tile}", n_vec)

    # reference points on tiny16
    tiles, r_total, plan, v, sc, bases, mods, slots_fn = setup(
        TINY_CARDS, 512, 4096)
    kt, rt, fs = (jnp.asarray(plan.kt), jnp.asarray(plan.rt),
                  jnp.asarray(plan.first))
    n_vec = BATCH * len(TINY_CARDS)
    sc8 = jnp.broadcast_to(sc.reshape(1, -1), (8, r_total))

    def make_v1(iters):
        @jax.jit
        def run(v_, s8_, slots):
            def body(carry, i):
                sl, acc = carry
                out = _onehot_gather_raw(
                    v_, s8_, sl.reshape(-1, 1), kt, rt, fs,
                    num_key_tiles=plan.num_key_tiles,
                    m_tile=plan.m_tile, r_tile=plan.r_tile)
                b = out.sum(axis=1).astype(jnp.int32)
                nxt = bases + (sl - bases + b + i + 1) % mods
                return (nxt, acc + out.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    slope_timed(make_v1, lambda sd: (v, sc8, slots_fn(sd)),
                "v1 svec kernel tiny16 m=4096 r=512", n_vec)

    # pure-XLA one-hot matmul, per table
    offs = [t0 * 512 for (t0, _) in tiles]
    sizes = [nt * 512 for (_, nt) in tiles]

    def make_xla_onehot(iters):
        @jax.jit
        def run(v_, slots, insc):
            def body(carry, i):
                sl, acc = carry
                outs = []
                for ti, (o0, sz) in enumerate(zip(offs, sizes)):
                    seg = sl[ti * BATCH:(ti + 1) * BATCH] - o0
                    mask = (seg[:, None] == jax.lax.broadcasted_iota(
                        jnp.int32, (BATCH, sz), 1)).astype(jnp.bfloat16)
                    rows = jnp.dot(
                        mask, v_[o0:o0 + sz].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                    outs.append(rows)
                o = jnp.concatenate(outs) * insc[:, None]
                b = o.sum(axis=1).astype(jnp.int32)
                nxt = bases + (sl - bases + b + i + 1) % mods
                return (nxt, acc + o.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    inscales = jnp.ones((n_vec,), jnp.float32) * 0.013
    slope_timed(make_xla_onehot, lambda sd: (v, slots_fn(sd), inscales),
                "pure-XLA one-hot matmul tiny16", n_vec)
    print("done", flush=True)


if __name__ == "__main__":
    main()
