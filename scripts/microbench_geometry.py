"""Microbench: gather cost vs (table geometry x slot count) on the real TPU.

microbench_overlap.py showed a big-table gather op costs ~750-1000 us nearly
INDEPENDENT of slot count (4096 slots ~ 988 us; 26k slots ~ 755 us round 1),
i.e. a per-op wall tied to the operand's size class, not per-row cost. This
script maps that wall:

  - flat [R, 128] int8 gathers at R = 16k / 131k / 1M / 10.1M
  - blocked [K, 1M, 128] two-coordinate gather (the production >1M layout)
  - row-grouped [R/G, G, 128] gathers with G = 16 / 64 / 128: each access
    fetches a G-row slice (2-16 KB) that should stream at HBM bandwidth,
    then an in-program one-hot select picks the row (MXU, cheap). Trades
    G x byte amplification for escaping the small-row latency wall.

  slot counts 1024 / 4096 / 26624 for each.

Timing rules per CLAUDE.md (tables as args, lax.scan serialization with data
dependency, float(result), distinct inputs).

    python scripts/microbench_geometry.py
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

DIM = 128
ITERS = 32
SLOT_COUNTS = (1024, 4096, 26624)
ROWS_BIG = 10_137_600  # 10.1M rows padded to a nice multiple (lcm-friendly)


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


def timed(run, args_fn, seeds, iters=ITERS):
    float(run(*args_fn(seeds[0])))
    best = float("inf")
    for s in seeds[1:]:
        a = args_fn(s)
        t0 = time.perf_counter()
        float(run(*a))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6


def slots_for(seed, rows, n):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.zipf(1.05, n) % rows, jnp.int32)


def report(name, n, us):
    print(f"{name:36s} n={n:6d}: {us:9.1f} us  {us * 1e3 / n:7.2f} ns/row",
          flush=True)


def make_flat_run(rows, n):
    @jax.jit
    def run(v_, s_, slots):
        def body(carry, i):
            sl, acc = carry
            o = jnp.take(v_, sl, axis=0).astype(jnp.float32) * jnp.take(
                s_, sl, axis=0)[:, None]
            return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1) % rows,
                    acc + o.sum()), None
        (_, acc), _ = jax.lax.scan(
            body, (slots, jnp.float32(0)), jnp.arange(ITERS))
        return acc
    return run


def make_blocked_run(rows, sub, n):
    k = rows // sub

    @jax.jit
    def run(v3_, s2_, slots):
        def body(carry, i):
            sl, acc = carry
            idx = jnp.stack([sl // sub, sl % sub], axis=-1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0, 1),
                start_index_map=(0, 1))
            rows_o = jax.lax.gather(
                v3_, idx, dn, slice_sizes=(1, 1, DIM),
                mode=jax.lax.GatherScatterMode.CLIP)
            dn2 = jax.lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(0, 1),
                start_index_map=(0, 1))
            sc_o = jax.lax.gather(
                s2_, idx, dn2, slice_sizes=(1, 1),
                mode=jax.lax.GatherScatterMode.CLIP)
            o = rows_o.astype(jnp.float32) * sc_o[:, None]
            return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1) % rows,
                    acc + o.sum()), None
        (_, acc), _ = jax.lax.scan(
            body, (slots, jnp.float32(0)), jnp.arange(ITERS))
        return acc
    return run


def make_grouped_run(rows, g, n):
    """[R/G, G, D] layout; gather a (1, G, D) slice per key, one-hot select."""
    nblk = rows // g

    @jax.jit
    def run(v3_, s2_, slots):
        def body(carry, i):
            sl, acc = carry
            blk = (sl // g).reshape(-1, 1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(0,),
                start_index_map=(0,))
            grp = jax.lax.gather(
                v3_, blk, dn, slice_sizes=(1, g, DIM),
                mode=jax.lax.GatherScatterMode.CLIP)  # [n, G, D] int8
            scg = jax.lax.gather(
                s2_, blk,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                slice_sizes=(1, g),
                mode=jax.lax.GatherScatterMode.CLIP)  # [n, G]
            sel = (jax.lax.broadcasted_iota(jnp.int32, (n, g), 1)
                   == (sl % g)[:, None]).astype(jnp.float32) * scg
            o = jax.lax.dot_general(
                sel[:, None, :], grp.astype(jnp.float32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]
            return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1) % rows,
                    acc + o.sum()), None
        (_, acc), _ = jax.lax.scan(
            body, (slots, jnp.float32(0)), jnp.arange(ITERS))
        return acc
    return run


def main():
    print("device:", jax.devices()[0], flush=True)
    seeds = [1, 2, 3, 4]

    # ---- flat size classes ----------------------------------------------
    for rows in (16_384, 131_072, 1_048_576):
        v, s = gen_flat(rows)
        for n in SLOT_COUNTS:
            us = timed(make_flat_run(rows, n),
                       lambda sd: (v, s, slots_for(sd, rows, n)), seeds)
            report(f"flat {rows} rows", n, us)
        del v, s

    v, s = gen_flat(ROWS_BIG)
    for n in SLOT_COUNTS:
        us = timed(make_flat_run(ROWS_BIG, n),
                   lambda sd: (v, s, slots_for(sd, ROWS_BIG, n)), seeds)
        report(f"flat {ROWS_BIG} rows", n, us)

    # ---- blocked [K, 1M, D] (production >1M layout) ---------------------
    sub = 1 << 20
    kblk = ROWS_BIG // sub  # 9.67 -> need exact multiple; pad rows
    rows_b = (ROWS_BIG // sub) * sub
    v3 = v[:rows_b].reshape(-1, sub, DIM)
    s2 = s[:rows_b].reshape(-1, sub)
    jax.block_until_ready((v3, s2))
    for n in SLOT_COUNTS:
        us = timed(make_blocked_run(rows_b, sub, n),
                   lambda sd: (v3, s2, slots_for(sd, rows_b, n)), seeds)
        report(f"blocked [K,1M] {rows_b} rows", n, us)
    del v3, s2

    # ---- grouped [R/G, G, D] --------------------------------------------
    for g in (16, 64, 128):
        rows_g = (ROWS_BIG // g) * g
        v3 = v[:rows_g].reshape(-1, g, DIM)
        s2 = s[:rows_g].reshape(-1, g)
        jax.block_until_ready((v3, s2))
        for n in SLOT_COUNTS:
            us = timed(make_grouped_run(rows_g, g, n),
                       lambda sd: (v3, s2, slots_for(sd, rows_g, n)), seeds)
            report(f"grouped G={g} {rows_g} rows", n, us)
        del v3, s2

    # ---- 8 big tables with the best grouped layout, overlap check -------
    # (done in a follow-up once the winner is known)
    print("done", flush=True)


if __name__ == "__main__":
    main()
