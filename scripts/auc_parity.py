"""Generate the committed AUC-parity evidence artifact.

Trains a DLRM on synthetic click data (CPU — training never touches the
tunneled TPU), serves the SAME checkpoint through the production engine
under every lookup + dense quantization flavor, and writes
bench_artifacts/auc_parity.json with per-variant AUC and delta-vs-fp32.

Run: python scripts/auc_parity.py            (full, ~2-4 min CPU)
     HPS_AUC_SMOKE=1 python scripts/auc_parity.py   (quick sanity)

Multi-seed: the artifact reports per-seed deltas plus the max |delta| so
the int8 < 0.001 claim is not a single-lucky-seed result.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from hugectr_backend_tpu.eval.auc_parity import (  # noqa: E402
    run_parity,
    run_path_parity,
)


def main():
    smoke = bool(os.environ.get("HPS_AUC_SMOKE"))
    seeds = [0] if smoke else [0, 1, 2]
    cfg = dict(
        n_train=20_000 if smoke else 120_000,
        n_eval=8_000 if smoke else 40_000,
        vocab=1_000 if smoke else 5_000,
        dim=16 if smoke else 32,
        num_feats=26,
        steps=150 if smoke else 600,
    )
    runs = []
    t0 = time.time()
    for seed in seeds:
        r = run_parity(seed=seed, **cfg)
        runs.append(r)
        print(f"seed {seed}: " + ", ".join(
            f"{k}={v:.5f}({r['delta_vs_fp32'][k]:+.6f})"
            for k, v in r["auc"].items()))
    variants = list(runs[0]["auc"].keys())
    out = {
        "config": cfg,
        "seeds": seeds,
        "elapsed_s": round(time.time() - t0, 1),
        "auc_per_seed": {v: [r["auc"][v] for r in runs] for v in variants},
        "delta_per_seed": {
            v: [r["delta_vs_fp32"][v] for r in runs] for v in variants
        },
        "max_abs_delta": {
            v: max(abs(r["delta_vs_fp32"][v]) for r in runs)
            for v in variants
        },
        "gates": {
            "int8_north_star_lt_0.001": max(
                abs(r["delta_vs_fp32"]["int8"]) for r in runs) < 1e-3,
            "int4_documented_lt_0.01": max(
                abs(r["delta_vs_fp32"]["int4"]) for r in runs) < 1e-2,
        },
        "note": "same trained checkpoint served through "
                "HierParameterServer->EmbeddingCache->FusedDlrmServer per "
                "variant; synthetic click data with embedding-borne signal "
                "(eval/auc_parity.py)",
    }

    # Production-PATH sweep (VERDICT r4 weak #3): 26 tables x 128d through
    # make_dlrm_multi_server — the mixed one-hot/arena/solo policy with the
    # part-major + one-hot-fold graph, the blocked [K, SUB, D] layout,
    # int4, and the REAL Pallas kernel bodies under interpret mode.
    path_cfg = dict(
        n_train=8_000 if smoke else 60_000,
        n_eval=4_000 if smoke else 20_000,
        dim=32 if smoke else 128,
        steps=120 if smoke else 400,
        vocabs=([60, 300, 1500, 3000] if smoke else
                # 26 tables spanning the scaled one-hot (<=512) / arena
                # (<=2048) / solo thresholds — the Criteo mix shape.
                [60, 90, 120, 200, 260, 300, 350, 420, 480, 510,
                 700, 900, 1100, 1300, 1500, 1700, 1900, 2000,
                 2600, 3000, 3400, 3800, 4200, 4600, 5000, 5400]),
        kernel_eval_cap=1024 if smoke else 4096,
    )
    path_runs = []
    for seed in seeds[: 1 if smoke else 2]:
        pr = run_path_parity(seed=seed, **path_cfg)
        path_runs.append(pr)
        print(f"path seed {seed}: " + ", ".join(
            f"{k}={v:+.6f}" for k, v in pr["delta_vs_fp32"].items()))
    paths = list(path_runs[0]["delta_vs_fp32"].keys())
    out["path_parity"] = {
        "config": {k: v for k, v in path_cfg.items()},
        "seeds": seeds[: 1 if smoke else 2],
        "auc_per_seed": {
            p: [r["auc"][p] for r in path_runs] for p in ["fp32"] + paths
        },
        "delta_per_seed": {
            p: [r["delta_vs_fp32"][p] for r in path_runs] for p in paths
        },
        "max_abs_delta": {
            p: max(abs(r["delta_vs_fp32"][p]) for r in path_runs)
            for p in paths
        },
        # Per-seed proof that the interpreted Pallas one-hot-in-kernel
        # body actually executed (False would mean the leg measured the
        # exact fallback — vacuous as a kernel gate).
        "oh_kernel_engaged": [
            bool(r.get("oh_kernel_engaged")) for r in path_runs
        ],
        "note": "served through make_dlrm_multi_server (chunked fused "
                "program: mixed lookup kinds, part-major reorder, one-hot "
                "fold); thresholds scaled via env so all kinds appear; "
                "oh_kernel_interpret runs the real Pallas bodies on a "
                "capped eval subset, delta vs fp32 on the SAME subset",
    }
    out["gates"]["int8_mixed_policy_lt_0.001"] = max(
        abs(r["delta_vs_fp32"]["int8_mixed_policy"]) for r in path_runs
    ) < 1e-3
    out["elapsed_s"] = round(time.time() - t0, 1)
    path = Path(__file__).resolve().parent.parent / "bench_artifacts" / (
        "auc_parity.json")
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out["max_abs_delta"], indent=1))
    print("gates:", out["gates"], "->", path)


if __name__ == "__main__":
    main()
