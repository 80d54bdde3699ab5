"""Isolate fixed per-execution overhead (tunnel RTT/dispatch) from true
per-iteration device time: same workload at ITERS = 16/64/256.

measured_us_per_batch = device_us_per_batch + fixed_overhead / ITERS

    python scripts/microbench_overhead.py
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

DIM = 128


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


def main():
    print("device:", jax.devices()[0], flush=True)

    # Pure overhead probe: trivial program, scalar in/out.
    @jax.jit
    def trivial(x):
        return (x * 2 + 1).sum()
    float(trivial(jnp.float32(1.0)))
    for trial in range(3):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(2.0 + trial)))
        print(f"trivial exec {trial}: {(time.perf_counter()-t0)*1e3:.2f} ms",
              flush=True)

    for rows, n in ((16_384, 4096), (16_384, 1024), (1_048_576, 4096)):
        v, s = gen_flat(rows)
        for iters in (16, 64, 256):
            @jax.jit
            def run(v_, s_, slots, iters=iters):
                def body(carry, i):
                    sl, acc = carry
                    o = jnp.take(v_, sl, axis=0).astype(jnp.float32) * \
                        jnp.take(s_, sl, axis=0)[:, None]
                    return ((sl + o.sum(axis=1).astype(jnp.int32) + i + 1)
                            % rows, acc + o.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (slots, jnp.float32(0)), jnp.arange(iters))
                return acc

            def args(sd):
                r = np.random.default_rng(sd)
                return (v, s, jnp.asarray(r.zipf(1.05, n) % rows, jnp.int32))
            float(run(*args(0)))
            best = float("inf")
            for sd in (1, 2, 3):
                a = args(sd)
                t0 = time.perf_counter()
                float(run(*a))
                best = min(best, time.perf_counter() - t0)
            print(f"rows={rows:8d} n={n:5d} iters={iters:3d}: "
                  f"total {best*1e3:8.2f} ms  per-batch {best/iters*1e6:8.1f} us",
                  flush=True)
        del v, s
    print("done", flush=True)


if __name__ == "__main__":
    main()
