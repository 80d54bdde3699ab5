"""Microbench: MXU one-hot gather vs XLA random-access gather, tiny tables.

Runs on the real TPU. Measures the 16 tiny Criteo-Kaggle tables (< 6k rows)
at batch 4096/table under the repo's timing rules (tables as jit args, work
serialized in one lax.scan with a data dependency, completion forced by
fetching the scalar result, distinct inputs per timed call).

    python scripts/microbench_onehot.py
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from hugectr_backend_tpu.ops.onehot_gather import (
    plan_onehot_worklist, _onehot_gather_raw,
)
from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla

CARDS = [1460, 583, 305, 24, 633, 3, 5683, 3194, 27, 10, 5652, 2173, 4, 18,
         15, 105]
DIM = 128
BATCH = 4096
ITERS = 64


def build(m_tile, r_tile):
    # Tile-padded arena (member rows include the +1 default row).
    tiles, tile0 = [], 0
    for c in CARDS:
        nt = -(-(c + 1) // r_tile)
        tiles.append((tile0, nt))
        tile0 += nt
    r_total = tile0 * r_tile
    plan = plan_onehot_worklist(tiles, [BATCH] * len(CARDS), m_tile=m_tile)
    return tiles, r_total, plan


def main():
    print("device:", jax.devices()[0].device_kind)
    import itertools, os
    configs = [(4096, 1024), (2048, 1024), (4096, 2048), (2048, 512),
               (4096, 512)]
    m_tile, r_tile = configs[0]
    tiles, r_total, plan = build(m_tile, r_tile)

    @jax.jit
    def gen():
        v = jax.lax.broadcasted_iota(jnp.int32, (r_total, DIM), 0) * 131
        sv = (v % 255 - 127).astype(jnp.int8)
        sc = 0.01 + (jax.lax.broadcasted_iota(jnp.int32, (r_total,), 0) % 50
                     ).astype(jnp.float32) * 0.001
        return sv, sc

    sv, sc = gen()
    jax.block_until_ready((sv, sc))
    sc2d = sc.reshape(1, -1)

    # Per-position member base/range so the scan's slot perturbation stays
    # inside each member's own rows.
    bases = np.concatenate(
        [np.full(BATCH, t0 * r_tile, np.int32) for (t0, _) in tiles])
    mods = np.concatenate(
        [np.full(BATCH, c, np.int32) for c, _ in zip(CARDS, tiles)])
    bases_d, mods_d = jnp.asarray(bases), jnp.asarray(mods)

    def make_slots(seed, tiles, r_tile):
        r = np.random.default_rng(seed)
        parts = [t0 * r_tile + (r.zipf(1.05, BATCH) % c)
                 for (t0, _), c in zip(tiles, CARDS)]
        return jnp.asarray(np.concatenate(parts).astype(np.int32))

    def bump_slots(slots, out, i):
        b = out.sum(axis=1).astype(jnp.int32)
        return bases_d + (slots - bases_d + b + i + 1) % mods_d

    def make_run_onehot(plan, bases_d, mods_d):
        kt, rt, first = (jnp.asarray(plan.kt), jnp.asarray(plan.rt),
                         jnp.asarray(plan.first))

        @jax.jit
        def run_onehot(sv_, sc2d_, slots):
            def body(carry, i):
                s, acc = carry
                out = _onehot_gather_raw(
                    sv_, sc2d_, s.reshape(-1, 1), kt, rt, first,
                    num_key_tiles=plan.num_key_tiles,
                    m_tile=plan.m_tile, r_tile=plan.r_tile)
                b = out.sum(axis=1).astype(jnp.int32)
                nxt = bases_d + (s - bases_d + b + i + 1) % mods_d
                return (nxt, acc + out.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots, jnp.float32(0)), jnp.arange(ITERS))
            return acc
        return run_onehot

    @jax.jit
    def run_xla(sv_, sc_, slots):
        def body(carry, i):
            s, acc = carry
            out = gather_dequant_xla(sv_, sc_, s)
            return (bump_slots(s, out, i), acc + out.sum()), None
        (_, acc), _ = jax.lax.scan(
            body, (slots, jnp.float32(0)), jnp.arange(ITERS))
        return acc

    n_vec = BATCH * len(CARDS)

    def timed(run, args_fn, seeds):
        float(run(*args_fn(seeds[0])))  # compile + warm
        best = float("inf")
        for s in seeds[1:]:
            a = args_fn(s)
            t0 = time.perf_counter()
            float(run(*a))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e6

    us_x = timed(run_xla, lambda s: (sv, sc, make_slots(s, tiles, r_tile)),
                 [1, 2, 3, 4])
    print(f"xla gather        : {us_x:9.1f} us/batch  "
          f"{n_vec / us_x:8.1f} Mvec/s  {us_x * 1e3 / n_vec:6.2f} ns/row")

    for (mt, rt_) in configs:
        tiles_c, r_total_c, plan_c = build(mt, rt_)
        @jax.jit
        def gen_c(r_total_c=r_total_c):
            v = jax.lax.broadcasted_iota(jnp.int32, (r_total_c, DIM), 0) * 131
            sv = (v % 255 - 127).astype(jnp.int8)
            sc = 0.01 + (jax.lax.broadcasted_iota(
                jnp.int32, (r_total_c,), 0) % 50).astype(jnp.float32) * 0.001
            return sv, sc
        sv_c, sc_c = gen_c()
        jax.block_until_ready((sv_c, sc_c))
        bases_c = jnp.asarray(np.concatenate(
            [np.full(BATCH, t0 * rt_, np.int32) for (t0, _) in tiles_c]))
        run_o = make_run_onehot(plan_c, bases_c, mods_d)
        us_o = timed(run_o,
                     lambda s: (sv_c, sc_c.reshape(1, -1),
                                make_slots(s, tiles_c, rt_)),
                     [1, 2, 3, 4])
        print(f"onehot M={mt:5d} R={rt_:5d} steps={plan_c.steps:4d}: "
              f"{us_o:9.1f} us/batch  {n_vec / us_o:8.1f} Mvec/s  "
              f"speedup {us_x / us_o:.2f}x")
        # device correctness per config
        s0 = make_slots(99, tiles_c, rt_)
        a = _onehot_gather_raw(
            sv_c, sc_c.reshape(1, -1), s0.reshape(-1, 1),
            jnp.asarray(plan_c.kt), jnp.asarray(plan_c.rt),
            jnp.asarray(plan_c.first), num_key_tiles=plan_c.num_key_tiles,
            m_tile=plan_c.m_tile, r_tile=plan_c.r_tile)
        b = gather_dequant_xla(sv_c, sc_c, s0)
        sv_h, sc_h = np.asarray(sv_c), np.asarray(sc_c)
        s_h = np.asarray(s0)
        want = sv_h[s_h].astype(np.float32) * sc_h[s_h][:, None]
        ea = np.abs(np.asarray(a) - want).max()
        eb = np.abs(np.asarray(b) - want).max()
        print(f"    vs host truth: onehot_err={ea} xla_err={eb}")
        if ea != 0.0:
            bad = np.argwhere(np.abs(np.asarray(a) - want).max(axis=1) > 1e-6)
            tabs, counts = np.unique(bad[:, 0] // BATCH, return_counts=True)
            print("    bad tables:", dict(zip(tabs.tolist(), counts.tolist())))
            a2 = _onehot_gather_raw(
                sv_c, sc_c.reshape(1, -1), s0.reshape(-1, 1),
                jnp.asarray(plan_c.kt), jnp.asarray(plan_c.rt),
                jnp.asarray(plan_c.first),
                num_key_tiles=plan_c.num_key_tiles,
                m_tile=plan_c.m_tile, r_tile=plan_c.r_tile)
            print("    rerun same call err:",
                  np.abs(np.asarray(a2) - want).max())
            a3 = _onehot_gather_raw(
                jnp.asarray(sv_h), jnp.asarray(sc_h).reshape(1, -1),
                jnp.asarray(s_h).reshape(-1, 1),
                jnp.asarray(plan_c.kt), jnp.asarray(plan_c.rt),
                jnp.asarray(plan_c.first),
                num_key_tiles=plan_c.num_key_tiles,
                m_tile=plan_c.m_tile, r_tile=plan_c.r_tile)
            print("    fresh-buffer call err:",
                  np.abs(np.asarray(a3) - want).max())
            k = bad[0][0]
            print("    first bad key:", k, "slot:", s_h[k],
                  "got:", np.asarray(a)[k][:4], "want:", want[k][:4])
    print("done")


if __name__ == "__main__":
    main()
