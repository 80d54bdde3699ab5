"""Probe DLRM DotInteraction implementations on the real chip.

microbench_dense.py showed the interaction stage costs ~197 us of the
~362 us dense forward at batch 4096 — 50x its ~4 us matmul floor — so the
triu extraction, not the einsum, is the dense half's bottleneck. Variants:

    A  einsum only (no extraction)                     — the floor
    B  production: zzt[:, rows, cols] fancy index
    C  flat take: zzt.reshape(B, F*F) take(flat_idx)
    D  mask-matmul fold: feed the FULL symmetric zzt (flattened) to the next
       layer through an expanded weight (extraction disappears into the
       top-MLP matmul; mathematically identical output)
    E  strided-tril via dynamic slices per row-block (XLA copy-fusion test)

    python scripts/microbench_interaction.py
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

if os.environ.get("HPS_BENCH_SMOKE"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

BATCH, T, DIM = 4096, 26, 128
IT_LO, IT_HI = 64, 320
CDT = jnp.bfloat16  # CPU smoke can't lower bf16 dots; TPU runs use bf16
if os.environ.get("HPS_BENCH_SMOKE"):
    BATCH, IT_LO, IT_HI = 64, 2, 6
    CDT = jnp.float32
F = T + 1
ROWS_NP, COLS_NP = np.triu_indices(F, k=1)
N_INTER = ROWS_NP.size  # 351
TOP_W = 1024


def slope_us(step_fn, *consts):
    totals = {}
    for iters in (IT_LO, IT_HI):
        @jax.jit
        def run(seed, *consts):
            z0 = jax.random.normal(
                jax.random.PRNGKey(seed), (BATCH, F, DIM), CDT)

            def body(carry, i):
                z, acc = carry
                out = step_fn(z, *consts)
                s = out.sum().astype(jnp.float32)
                # Real data dependency: a runtime scalar (not provably
                # zero at compile time) feeds back into ONE element of the
                # carry — an in-place dynamic-update-slice on the donated
                # scan buffer, O(1), so the dependency does not add a
                # whole-tensor rewrite to every iteration (a full-tensor
                # `z + eps` add measured +50-90 us/iter of HBM traffic).
                z = z.at[0, 0, 0].add((s * 1e-20).astype(z.dtype))
                return (z, acc + s), None
            (_, acc), _ = jax.lax.scan(
                body, (z0, jnp.float32(0)), jnp.arange(iters))
            return acc
        best, first = float("inf"), True
        for sd in (0, 1, 2, 3):
            t0 = time.perf_counter()
            float(run(jnp.int32(sd), *consts))
            dt = time.perf_counter() - t0
            if first:
                first = False
                continue
            best = min(best, dt)
        totals[iters] = best
    return (totals[IT_HI] - totals[IT_LO]) / (IT_HI - IT_LO) * 1e6


def main():
    print("device:", jax.devices()[0], file=sys.stderr, flush=True)
    results = {}
    only = set(filter(None, os.environ.get("HPS_VARIANTS", "").split(",")))

    def want(tag):
        return not only or tag.split("_")[0] in only

    def ein(z):
        return jnp.einsum("bfd,bgd->bfg", z, z,
                          preferred_element_type=jnp.float32)

    if want("A"):
        results["A_einsum_only_us"] = slope_us(lambda z: ein(z))

    rows = jnp.asarray(ROWS_NP)
    cols = jnp.asarray(COLS_NP)
    if want("B"):
        results["B_fancy_index_us"] = slope_us(
            lambda z, r, c: ein(z)[:, r, c], rows, cols)

    flat_idx = jnp.asarray(ROWS_NP * F + COLS_NP)
    if want("C"):
        results["C_flat_take_us"] = slope_us(
            lambda z, fi: jnp.take(ein(z).reshape(BATCH, F * F), fi, axis=1),
            flat_idx)

    # D: extraction folded into the next matmul. W [N_INTER, TOP_W] expands
    # to W' [F*F, TOP_W] with W/2 at (f,g) and (g,f): zzt_flat @ W' ==
    # triu(zzt) @ W exactly (zzt symmetric, diagonal rows zero).
    rng = np.random.default_rng(0)
    w = rng.standard_normal((N_INTER, TOP_W)).astype(np.float32) * 0.05
    w_exp = np.zeros((F * F, TOP_W), np.float32)
    w_exp[ROWS_NP * F + COLS_NP] = w / 2
    w_exp[COLS_NP * F + ROWS_NP] = w / 2
    wj = jnp.asarray(w)
    wej = jnp.asarray(w_exp)
    if want("D"):
        results["D_fold_matmul_us"] = slope_us(
            lambda z, we: jnp.dot(
                ein(z).reshape(BATCH, F * F).astype(CDT), we,
            preferred_element_type=jnp.float32), wej.astype(CDT))
        # Reference cost of the unexpanded matmul (what D replaces):
        results["D_ref_gather_plus_matmul_us"] = slope_us(
            lambda z, r, c, ww: jnp.dot(
                ein(z)[:, r, c].astype(CDT), ww,
                preferred_element_type=jnp.float32),
            rows, cols, wj.astype(CDT))

    # E: strided-slice extraction — the triu rows are 26 contiguous slices
    # zzt[:, f, f+1:]; copies, not gathers.
    def strided(z):
        zzt = ein(z)
        return jnp.concatenate(
            [zzt[:, f, f + 1:] for f in range(F - 1)], axis=1)

    if want("E"):
        results["E_strided_slices_us"] = slope_us(strided)

    # F: bf16 zzt before extraction (the model casts the interaction output
    # to bf16 anyway) — halves the extraction's HBM traffic.
    if want("F"):
        results["F_bf16_zzt_fancy_us"] = slope_us(
            lambda z, r, c: ein(z).astype(CDT)[:, r, c], rows, cols)
    if want("G"):
        results["G_bf16_zzt_strided_us"] = slope_us(
            lambda z: jnp.concatenate(
                [ein(z).astype(CDT)[:, f, f + 1:] for f in range(F - 1)],
                axis=1))

    # Parity check of the fold (f32 math).
    z = jnp.asarray(rng.standard_normal((8, F, DIM)), jnp.float32)
    zzt = jnp.einsum("bfd,bgd->bfg", z, z)
    a = zzt[:, rows, cols] @ jnp.asarray(w)
    b = zzt.reshape(8, F * F) @ jnp.asarray(w_exp)
    err = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
    results["fold_parity_rel_err"] = err

    out = {"metric": "dlrm_interaction_variants_v5e",
           **{k: round(v, 3) if "err" in k else round(v, 1)
              for k, v in results.items()},
           "batch": BATCH, "features": F, "dim": DIM,
           "device": str(jax.devices()[0]),
           "timing": f"slope over {IT_LO}->{IT_HI} scan iters"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
