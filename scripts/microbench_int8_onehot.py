"""Slope-timed comparison: bf16 vs int8 MXU one-hot lookup on v5e.

The production "onehot" access path (cache/lookup_program.py
onehot_member_rows) runs mask[bf16] @ seg[bf16] -> f32. The v5e MXU does
int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197 TOPS), and for int8
arenas the one-hot product is exact in int32, so the same result is
mask[int8] @ seg[int8] -> int32 -> f32. If XLA lowers the s8 dot natively
this should halve the one-hot portion of the batch.

Also measures (c) the dot with the mask built in int8 directly from the
comparison (no bf16 intermediate), and (d) the 14-member production split
vs one fat member, to separate matmul cost from per-member overhead.

Protocol: tunnel rules (slope over 64->320 scan iters, tables as jit args,
data-dependent slots, float(result) to force completion).

    python scripts/microbench_int8_onehot.py
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

# The 14 Criteo-Kaggle tables on the production one-hot path (<= 4k rows).
OH_CARDS = [1460, 583, 305, 24, 633, 3, 3194, 27, 10, 2173, 4, 18, 15, 105]


def main():
    print("device:", jax.devices()[0], flush=True)
    off = np.concatenate([[0], np.cumsum(np.asarray(OH_CARDS) + 1)])
    total = int(off[-1])
    sizes = [c + 1 for c in OH_CARDS]
    offs = [int(o) for o in off[:-1]]
    n_keys = BATCH * len(OH_CARDS)

    @jax.jit
    def gen():
        v = jax.lax.broadcasted_iota(jnp.int32, (total, DIM), 0) * 131
        return (v % 255 - 127).astype(jnp.int8)

    vals = gen()
    jax.block_until_ready(vals)

    bases = jnp.asarray(np.concatenate(
        [np.full(BATCH, o, np.int64) for o in offs]).astype(np.int32))
    mods = jnp.asarray(np.concatenate(
        [np.full(BATCH, c, np.int64) for c in OH_CARDS]).astype(np.int32))

    def slots_np(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(np.concatenate(
            [o + (r.zipf(1.05, BATCH) % c)
             for o, c in zip(offs, OH_CARDS)]).astype(np.int32))

    def member_rows(values, offset, size, sl, mode):
        seg = values[offset:offset + size]
        local = sl - offset
        iota = jax.lax.broadcasted_iota(jnp.int32, (sl.shape[0], size), 1)
        hit = local[:, None] == iota
        if mode == "bf16":
            return jax.lax.dot_general(
                hit.astype(jnp.bfloat16), seg.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # int8 MXU path: exact in int32 for one-hot masks over int8 values.
        return jax.lax.dot_general(
            hit.astype(jnp.int8), seg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)

    def make_run(iters, mode, fat=False):
        @jax.jit
        def run(v_, slots0):
            def body(carry, i):
                sl, acc = carry
                if fat:
                    out = member_rows(v_, 0, total, sl, mode)
                else:
                    parts = []
                    for j, (o, sz) in enumerate(zip(offs, sizes)):
                        parts.append(member_rows(
                            v_, o, sz, sl[j * BATCH:(j + 1) * BATCH], mode))
                    out = jnp.concatenate(parts)
                b = out.sum(axis=1).astype(jnp.int32)
                nxt = bases + (sl - bases + b + i + 1) % mods
                return (nxt, acc + out.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots0, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    def slope(label, mode, fat=False):
        times = {}
        for iters in (IT_LO, IT_HI):
            run = make_run(iters, mode, fat)
            float(run(vals, slots_np(0)))
            best = float("inf")
            for sd in (1, 2, 3):
                s = slots_np(sd)
                t0 = time.perf_counter()
                float(run(vals, s))
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
        us = (times[IT_HI] - times[IT_LO]) / (IT_HI - IT_LO) * 1e6
        print(f"{label:40s}: {us:8.1f} us/batch  "
              f"{n_keys / us:8.1f} Mrow/s  {us * 1e3 / n_keys:6.2f} ns/row",
              flush=True)
        return us

    slope("bf16 one-hot, 14 members [current]", "bf16")
    slope("int8 one-hot, 14 members", "int8")
    slope("bf16 one-hot, 1 fat member", "bf16", fat=True)
    slope("int8 one-hot, 1 fat member", "int8", fat=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
