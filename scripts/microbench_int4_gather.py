"""INT4 vs INT8 solo-path gather head-to-head (ROOFLINE.md §3 item 6).

The solo (big-table) production path gathers rows with HOST-gathered scales
passed as an input array, so the device program is just `take + unpack +
scale-multiply`. int4 nibble-packing halves the gathered bytes per row
(64 B vs 128 B at D=128) — this probe answers whether that halving speeds
the latency-bound gather, or whether the VPU nibble unpack eats the saving.

Protocol: tunnel slope timing (two scan lengths, data-dependent slot
evolution so executions are not deduped, fetch a scalar) — see
ROOFLINE.md preamble and scripts/microbench_true.py.

    python scripts/microbench_int4_gather.py   # on the real TPU chip

Writes bench_artifacts/int4_solo_gather.json.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla

DIM = 128
BATCH = 4096
ROWS = 2_000_000
IT_LO, IT_HI = 64, 320


def gen_tables():
    @jax.jit
    def gen():
        v = jax.lax.broadcasted_iota(jnp.int32, (ROWS, DIM), 0) * 131
        q8 = (v % 255 - 127).astype(jnp.int8)
        # nibble-pack the int4 variant on device: values in [-7, 7]
        q4 = (v % 15 - 7).astype(jnp.int32)
        lo = q4[:, 0::2] & 0xF
        hi = q4[:, 1::2] & 0xF
        packed = (lo | (hi << 4)).astype(jnp.uint8)  # [ROWS, DIM//2]
        return q8, packed

    out = gen()
    jax.block_until_ready(out)
    return out


def slots_for(seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.zipf(1.05, BATCH) % ROWS, jnp.int32)


def make_run(iters):
    @jax.jit
    def run(table, slots, inscales):
        def body(carry, i):
            sl, acc = carry
            o = gather_dequant_xla(table, None, sl) * inscales[:, None]
            return (
                (sl + o.sum(axis=1).astype(jnp.int32) + i + 1) % ROWS,
                acc + o.sum(),
            ), None

        (_, acc), _ = jax.lax.scan(
            body, (slots, jnp.float32(0)), jnp.arange(iters)
        )
        return acc

    return run


def slope(table, label):
    inscales = jnp.ones((BATCH,), jnp.float32) * 0.013
    times = {}
    for iters in (IT_LO, IT_HI):
        run = make_run(iters)
        float(run(table, slots_for(0), inscales))  # warm compile
        best = float("inf")
        for sd in (1, 2, 3):
            sl = slots_for(sd)
            t0 = time.perf_counter()
            float(run(table, sl, inscales))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    us = (times[IT_HI] - times[IT_LO]) / (IT_HI - IT_LO) * 1e6
    ns = us * 1e3 / BATCH
    print(f"{label:28s}: {us:8.1f} us/batch  {ns:6.2f} ns/access", flush=True)
    return us, ns


def main():
    print("device:", jax.devices()[0], flush=True)
    q8, q4 = gen_tables()
    us8, ns8 = slope(q8, "int8 solo (input scales)")
    us4, ns4 = slope(q4, "int4 solo (input scales)")
    out = {
        "metric": "int4_vs_int8_solo_gather_v5e",
        "rows": ROWS,
        "batch": BATCH,
        "dim": DIM,
        "int8_us_per_batch": round(us8, 2),
        "int8_ns_per_access": round(ns8, 2),
        "int4_us_per_batch": round(us4, 2),
        "int4_ns_per_access": round(ns4, 2),
        "device": str(jax.devices()[0]),
        "timing": f"slope over {IT_LO}->{IT_HI} scan iters",
    }
    path = pathlib.Path(__file__).resolve().parents[1] / "bench_artifacts"
    path.mkdir(exist_ok=True)
    (path / "int4_solo_gather.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
