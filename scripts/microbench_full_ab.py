"""A/B the FULL 26-table production lookup with bf16 vs int8 one-hot members
(slope-timed, 3 reps each, interleaved to expose run-to-run variance).

    python scripts/microbench_full_ab.py
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla

CRITEO_CARDS = [
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683,
    8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18, 15,
    286181, 105, 142572,
]
DIM = 128
BATCH = 4096
IT_LO, IT_HI = 64, 320
ONEHOT_MAX = 4096
ARENA_MAX = 1 << 16


def main():
    print("device:", jax.devices()[0], flush=True)
    oh_idx = [t for t, c in enumerate(CRITEO_CARDS) if c + 1 <= ONEHOT_MAX]
    ar_idx = [t for t, c in enumerate(CRITEO_CARDS)
              if c + 1 > ONEHOT_MAX and c <= ARENA_MAX]
    big_idx = [t for t, c in enumerate(CRITEO_CARDS) if c > ARENA_MAX]

    def layout(idx):
        cards = [CRITEO_CARDS[t] for t in idx]
        off = np.concatenate([[0], np.cumsum(np.asarray(cards) + 1)])
        return cards, off.astype(np.int64), int(off[-1])

    oh_cards, oh_off, oh_total = layout(oh_idx)
    ar_cards, ar_off, ar_total = layout(ar_idx)
    big_cards = [CRITEO_CARDS[t] for t in big_idx]

    def gen(rows):
        @jax.jit
        def g():
            v = jax.lax.broadcasted_iota(jnp.int32, (rows, DIM), 0) * 131
            sv = (v % 255 - 127).astype(jnp.int8)
            sc = 0.01 + (jax.lax.broadcasted_iota(jnp.int32, (rows,), 0) % 50
                         ).astype(jnp.float32) * 0.001
            return sv, sc
        out = g()
        jax.block_until_ready(out)
        return out

    oh_vals, _ = gen(oh_total)
    ar_vals, ar_scales = gen(ar_total)
    bigs = [gen(c) for c in big_cards]
    big_vals = [v for v, _ in bigs]

    def bases_mods(cards, off):
        b = np.concatenate([np.full(BATCH, off[i], np.int64)
                            for i in range(len(cards))])
        m = np.concatenate([np.full(BATCH, c, np.int64) for c in cards])
        return jnp.asarray(b.astype(np.int32)), jnp.asarray(m.astype(np.int32))

    oh_b, oh_m = bases_mods(oh_cards, oh_off)
    ar_b, ar_m = bases_mods(ar_cards, ar_off)
    oh_sizes = [c + 1 for c in oh_cards]
    oh_offs = [int(o) for o in oh_off[:-1]]

    def member(values, offset, size, sl, mode):
        seg = values[offset:offset + size]
        local = sl - offset
        iota = jax.lax.broadcasted_iota(jnp.int32, (sl.shape[0], size), 1)
        hit = local[:, None] == iota
        if mode == "bf16":
            return jax.lax.dot_general(
                hit.astype(jnp.bfloat16), seg.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            hit.astype(jnp.int8), seg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)

    def make_run(iters, mode):
        @jax.jit
        def run(ohv, arv, arsc, bv, oh0, ar0, big0, ohsc, bigsc):
            def body(carry, i):
                (ohs, ars, bigs_), acc = carry
                parts = []
                for j, (o, sz) in enumerate(zip(oh_offs, oh_sizes)):
                    parts.append(member(
                        ohv, o, sz, ohs[j * BATCH:(j + 1) * BATCH], mode))
                oh_rows = jnp.concatenate(parts) * ohsc[:, None]
                ar_rows = gather_dequant_xla(arv, arsc, ars)
                big_rows = [gather_dequant_xla(v, None, sl) * sc[:, None]
                            for v, sl, sc in zip(bv, bigs_, bigsc)]
                tot = oh_rows.sum() + ar_rows.sum() + sum(
                    r.sum() for r in big_rows)
                bump = tot.astype(jnp.int32)
                n_oh = (ohs - oh_b + oh_rows.sum(axis=1).astype(jnp.int32)
                        + bump + i + 1) % oh_m + oh_b
                n_ar = (ars - ar_b + ar_rows.sum(axis=1).astype(jnp.int32)
                        + bump + i + 1) % ar_m + ar_b
                n_big = [(sl + r.sum(axis=1).astype(jnp.int32) + bump + i + 1)
                         % c for sl, r, c in zip(bigs_, big_rows, big_cards)]
                return ((n_oh, n_ar, n_big), acc + tot), None
            (_, acc), _ = jax.lax.scan(
                body, ((oh0, ar0, big0), jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    def host_scale(i):
        return (np.float32(0.01)
                + (np.asarray(i) % 50).astype(np.float32) * np.float32(0.001))

    def args_for(seed):
        r = np.random.default_rng(seed)
        oh_np = np.concatenate(
            [o + (r.zipf(1.05, BATCH) % c)
             for o, c in zip(oh_offs, oh_cards)]).astype(np.int64)
        ar_np = np.concatenate(
            [ar_off[i] + (r.zipf(1.05, BATCH) % c)
             for i, c in enumerate(ar_cards)]).astype(np.int64)
        big_np = [r.zipf(1.05, BATCH) % c for c in big_cards]
        return (jnp.asarray(oh_np.astype(np.int32)),
                jnp.asarray(ar_np.astype(np.int32)),
                [jnp.asarray(s.astype(np.int32)) for s in big_np],
                jnp.asarray(host_scale(oh_np)),
                [jnp.asarray(host_scale(s)) for s in big_np])

    n_vec = BATCH * 26

    def slope(mode, rep):
        times = {}
        for iters in (IT_LO, IT_HI):
            run = make_run(iters, mode)
            float(run(oh_vals, ar_vals, ar_scales, big_vals, *args_for(0)))
            best = float("inf")
            for sd in (1, 2, 3):
                a = args_for(100 * rep + sd)
                t0 = time.perf_counter()
                float(run(oh_vals, ar_vals, ar_scales, big_vals, *a))
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
        us = (times[IT_HI] - times[IT_LO]) / (IT_HI - IT_LO) * 1e6
        print(f"{mode} rep{rep}: {us:8.1f} us/batch  "
              f"{n_vec / us:8.1f} Mvec/s", flush=True)
        return us

    for rep in range(3):
        slope("bf16", rep)
        slope("int8", rep)
    print("done", flush=True)


if __name__ == "__main__":
    main()
