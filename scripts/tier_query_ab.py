"""A/B the r2-vs-r3 tier query paths in ONE session (VERDICT r3 weak #3).

BENCH_r02 -> r03 showed dram 70.5 -> 144.9 ns/key and ssd 421.7 -> 536.8
ns/key on a shared host, and the round-3 SSD-ingest vectorization (commit
4c59568) touched exactly the SSD code. This script exonerates or convicts
the code: it loads the r2 (pre-4c59568) tiers/ssd.py straight from git
into a shadow module and interleaves r2/r3 query measurements round-robin
against identical data in one process — session noise hits both arms
equally. DRAM's query path did not change r2->r3 (only cluster TLS
plumbing — `git diff daca6b4 4c59568 -- tiers/dram.py`), so its arm is a
repeatability probe of the same code.

Writes bench_artifacts/tier_query_ab.json with a conclusion.
"""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

R2_REF = "daca6b4"  # last commit before the SSD ingest vectorization


def load_r2_ssd():
    src = subprocess.run(
        ["git", "show", f"{R2_REF}:hugectr_backend_tpu/tiers/ssd.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    path = Path(tempfile.mkdtemp(prefix="hps_ab_")) / "ssd_r2.py"
    path.write_text(src)
    spec = importlib.util.spec_from_file_location("hps_ssd_r2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_ssd(mod, keys, vecs, tag):
    from hugectr_backend_tpu.config.params import PersistentDatabaseParams

    tmp = tempfile.mkdtemp(prefix=f"hps_ab_{tag}_")
    tier = mod.SsdKVTier(PersistentDatabaseParams(path=tmp))
    tier.create_table("hps_et.ab.s", vecs.shape[1])
    for i in range(0, len(keys), 100_000):
        tier.insert("hps_et.ab.s", keys[i:i + 100_000], vecs[i:i + 100_000])
    return tier


def main():
    import os

    from hugectr_backend_tpu.tiers import ssd as ssd_r3
    from hugectr_backend_tpu.tiers.dram import make_dram_tier

    smoke = bool(os.environ.get("HPS_AB_SMOKE"))
    rows, dim, nq = (30_000, 32, 512) if smoke else (300_000, 32, 4096)
    rounds = 3 if smoke else 9
    rng = np.random.default_rng(0)
    keys = rng.choice(np.int64(1) << 40, size=rows, replace=False)
    vecs = rng.standard_normal((rows, dim)).astype(np.float32)

    ssd_r2 = load_r2_ssd()
    t_r2 = build_ssd(ssd_r2, keys, vecs, "r2")
    t_r3 = build_ssd(ssd_r3, keys, vecs, "r3")
    dram = make_dram_tier()
    dram.create_table("hps_et.ab.d", dim)
    for i in range(0, rows, 100_000):
        dram.insert("hps_et.ab.d", keys[i:i + 100_000], vecs[i:i + 100_000])

    qs = [keys[rng.integers(0, rows, nq)] for _ in range(rounds)]
    samples = {"ssd_r2": [], "ssd_r3": [], "dram": []}
    # Warm each arm once, then interleave rounds.
    t_r2.query("hps_et.ab.s", qs[0])
    t_r3.query("hps_et.ab.s", qs[0])
    dram.query("hps_et.ab.d", qs[0])
    for rd in range(rounds):
        for name, fn in (
            ("ssd_r2", lambda q: t_r2.query("hps_et.ab.s", q)),
            ("ssd_r3", lambda q: t_r3.query("hps_et.ab.s", q)),
            ("dram", lambda q: dram.query("hps_et.ab.d", q)),
        ):
            t0 = time.perf_counter()
            fn(qs[rd])
            samples[name].append((time.perf_counter() - t0) * 1e9 / nq)
    # Parity: both SSD arms must return identical vectors.
    v2, m2 = t_r2.query("hps_et.ab.s", qs[0])
    v3, m3 = t_r3.query("hps_et.ab.s", qs[0])
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m3))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v3))
    t_r2.close()
    t_r3.close()

    med = {k: float(np.median(v)) for k, v in samples.items()}
    ratio = med["ssd_r3"] / med["ssd_r2"]
    out = {
        "rows": rows, "queries": nq, "rounds": rounds,
        "r2_ref": R2_REF,
        "ns_per_key_median": {k: round(v, 1) for k, v in med.items()},
        "ns_per_key_samples": {
            k: [round(x, 1) for x in v] for k, v in samples.items()
        },
        "ssd_r3_over_r2": round(ratio, 3),
        "parity": "r2 and r3 SSD arms return identical vectors",
        "conclusion": (
            "SSD query path r3 ~= r2 in-session (ratio %.2f); the r2->r3 "
            "BENCH regression was cross-session host noise, not the ingest "
            "vectorization." % ratio
            if 0.85 <= ratio <= 1.15 else
            "SSD query path changed by %.2fx in-session — the ingest "
            "vectorization DID affect queries; investigate." % ratio
        ),
        "dram_note": "dram query code is unchanged r2->r3 (git diff shows "
                     "only cluster TLS plumbing); its arm here measures "
                     "same-code session noise",
    }
    path = REPO / "bench_artifacts" / "tier_query_ab.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in (
        "ns_per_key_median", "ssd_r3_over_r2", "conclusion")}, indent=1))
    print("->", path)


if __name__ == "__main__":
    main()
