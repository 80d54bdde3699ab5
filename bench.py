"""Headline benchmark: Criteo-Kaggle DLRM INT8 embedding lookup + fused dense
forward on one TPU chip, through the production access-path mix.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: the reference's CI model — DLRM over Criteo (26 categorical
features, reference .gitlab-ci.yml:70 ``perf_analyzer -m dlrm --shape
KEYS:26``) — with the REAL Criteo-Kaggle per-feature cardinalities (26
tables, 3 rows .. 10.1M rows), dim 128, INT8 row-quantized with per-row f32
scales, one key per table per sample, zipf(1.05) keys.

Access paths match production exactly (ps/parameter_server.py _build_cache
policy + cache/lookup_program.py, slope-timed on v5e):
- 14 tiny tables (<= 4k rows): MXU one-hot matmul — no per-access gather
  (~2 ps per key x row vs the ~10 ns/access v5e gather floor).
- 4 small tables (<= 64k rows): one shared arena, XLA gather + fused device
  scales gather.
- 8 big tables: solo XLA gathers with HOST-gathered per-key scales passed as
  inputs (a device scales gather on a >100 MB array costs ~14 ns/access —
  60% of big-table lookup time). In production the host fetches scales
  during key->slot translation; here the scan holds them fixed per batch
  (identical device compute; slots still evolve with a data dependency).

TIMING (corrected in round 2): this environment reaches the TPU through a
tunnel with ~26 ms fixed RTT per program execution (a trivial jitted scalar
program takes 26 ms wall). Round-1 numbers divided one execution's wall time
by 64 scan iters, silently adding ~410 us to every per-batch figure. The
protocol now runs each workload at TWO scan lengths (64 and 320 iters) and
reports the SLOPE — pure device time, what a production (non-tunneled) chip
delivers. Other tunnel rules still apply: tables as jit ARGUMENTS, work
serialized in one lax.scan with data dependencies, completion forced by
fetching the scalar result, distinct inputs per timed call.

Baseline: the reference publishes no absolute numbers (BASELINE.md). The
north-star target is ">=2x lookup vectors/s/chip vs A100 HPS" (BASELINE.json);
an A100 sustains roughly 1e9 random 512 B row reads/s through the HPS GPU
cache, so vs_baseline uses 1.0e9 vectors/s.
"""

import json
import os
import sys
import time

import numpy as np

# The 26 Criteo-Kaggle categorical cardinalities (C1..C26).
CRITEO_CARDS = [
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683,
    8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18, 15,
    286181, 105, 142572,
]

DIM = 128
BATCH = 4096
SMALL_BATCH = 1024
IT_LO, IT_HI = 64, 320

if os.environ.get("HPS_BENCH_SMOKE"):
    CRITEO_CARDS = [min(c, 60_000) for c in CRITEO_CARDS]
    BATCH, SMALL_BATCH, IT_LO, IT_HI = 128, 64, 4, 12
    # Smoke runs validate the bench logic on CPU (the env var alone is
    # overridden by the axon TPU plugin on this image).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def e2e_serving_stage():
    """Serve a Criteo-shaped lookup model over the HTTP frontend on this
    chip and drive it with the perf client (the reference's CI gate is
    ``perf_analyzer -m dlrm --shape KEYS:26`` end-to-end,
    .gitlab-ci.yml:70). Cardinalities are capped at 20k rows/table so the
    host->device upload stays small; the measurement quantifies FRONTEND
    overhead (HTTP parse + continuous batcher + translation + dispatch),
    which is table-size independent. NOTE: on this tunneled dev setup every
    device execution pays ~26 ms RTT, which bounds e2e qps; production
    chips are host-attached and do not.
    """
    import tempfile
    import threading
    import urllib.request

    import numpy as np

    from hugectr_backend_tpu.io.sparse_model import write_sparse_model
    from hugectr_backend_tpu.io.synthetic import make_synthetic_table
    from hugectr_backend_tpu.serving.server import serve

    smoke = bool(os.environ.get("HPS_BENCH_SMOKE"))
    cards = [min(c, 2_000 if smoke else 20_000) for c in CRITEO_CARDS]
    if smoke:
        cards = cards[:4]
    duration, conc = (2.0, 2) if smoke else (10.0, 8)
    tmp = tempfile.mkdtemp(prefix="hps_bench_e2e_")
    sparse_files, table_keys = [], []
    for i, c in enumerate(cards):
        tbl = make_synthetic_table(c, DIM, seed=i, deterministic_fn=False)
        p = f"{tmp}/t{i}"
        write_sparse_model(p, tbl.keys, tbl.vectors)
        sparse_files.append(p)
        table_keys.append(tbl.keys)
    cfg = {
        "supportlonglong": True,
        "models": [{
            "model": "dlrm", "sparse_files": sparse_files,
            "dense_file": "", "network_file": "",
            "max_batch_size": 256,
            "embedding_vecsize_per_table": [DIM] * len(cards),
            "maxnum_catfeature_query_per_table_per_sample": [1] * len(cards),
            "default_value_for_each_table": [0.0] * len(cards),
            "deployed_device_list": [0], "gpucache": True,
            "gpucacheper": 1.0,
        }],
    }
    server = serve(ps_source=cfg, port=0, block=False, grpc_port=0)
    try:
        url = f"http://127.0.0.1:{server.port}/v2/models/dlrm/infer"
        batch = 8 if smoke else 64
        n_t = len(cards)
        # Zipf over REAL table keys (hot path; misses are a separate axis).
        def req_keys(seed):
            r = np.random.default_rng(seed)
            return np.concatenate([
                k[r.zipf(1.05, batch) % k.shape[0]] for k in table_keys
            ])
        keys_np = [req_keys(s) for s in range(32)]
        lat = []
        lat_lock = threading.Lock()
        stop = threading.Event()

        def post(keys, per_table, timeout=300):
            # Binary-tensor protocol in AND out (what perf_analyzer uses):
            # JSON-encoding the 200k-float output dominates latency.
            import json as _json

            kraw = np.ascontiguousarray(keys, "<i8").tobytes()
            nraw = np.asarray([per_table] * n_t, "<i4").tobytes()
            header = _json.dumps({
                "inputs": [
                    {"name": "KEYS", "datatype": "INT64",
                     "shape": [keys.shape[0]],
                     "parameters": {"binary_data_size": len(kraw)}},
                    {"name": "NUMKEYS", "datatype": "INT32", "shape": [n_t],
                     "parameters": {"binary_data_size": len(nraw)}},
                ],
                "outputs": [
                    {"name": "OUTPUT0", "parameters": {"binary_data": True}}
                ],
            }).encode()
            r = urllib.request.urlopen(urllib.request.Request(
                url, data=header + kraw + nraw,
                headers={
                    "Content-Type": "application/octet-stream",
                    "Inference-Header-Content-Length": str(len(header)),
                }), timeout=timeout)
            r.read()

        # Warm the compiled-signature grid: the batcher pow2-pads merged
        # per-table counts, so merges of any concurrency mix land on one of
        # these warmed executables instead of compiling mid-measurement.
        r = np.random.default_rng(99)
        wb = batch
        while wb <= 256:
            wkeys = np.concatenate([
                k[r.integers(0, k.shape[0], wb)] for k in table_keys])
            post(wkeys, wb)
            wb *= 2

        def client(cid):
            i = cid
            while not stop.is_set():
                keys = keys_np[i % len(keys_np)]
                i += 1
                t0 = time.perf_counter()
                post(keys, batch, timeout=60)
                with lat_lock:
                    lat.append(time.perf_counter() - t0)

        threads = [threading.Thread(target=client, args=(c,), daemon=True)
                   for c in range(conc)]
        t_start = time.perf_counter()
        for th in threads:
            th.start()
        time.sleep(duration)
        stop.set()
        for th in threads:
            th.join(timeout=30)
        wall = time.perf_counter() - t_start
        with lat_lock:
            n = len(lat)
            ls = np.sort(np.asarray(lat))
        if n == 0:
            return {"e2e_error": "no completed requests"}

        # ---- gRPC leg (perf_analyzer -i grpc parity) --------------------
        grpc_extra = {}
        try:
            import grpc as grpc_mod

            from hugectr_backend_tpu.serving import kserve_pb

            pb2 = kserve_pb.load()
            glat, glock = [], threading.Lock()
            gstop = threading.Event()

            def gclient(cid):
                channel = grpc_mod.insecure_channel(
                    f"127.0.0.1:{server.grpc.port}")
                infer = channel.unary_unary(
                    f"/{kserve_pb.SERVICE_NAME}/ModelInfer",
                    request_serializer=lambda m: m.SerializeToString(),
                    response_deserializer=pb2.ModelInferResponse.FromString,
                )
                i = cid
                while not gstop.is_set():
                    keys = keys_np[i % len(keys_np)]
                    i += 1
                    req = pb2.ModelInferRequest(model_name="dlrm")
                    ki = req.inputs.add()
                    ki.name, ki.datatype = "KEYS", "INT64"
                    ki.shape.append(keys.shape[0])
                    ni = req.inputs.add()
                    ni.name, ni.datatype = "NUMKEYS", "INT32"
                    ni.shape.append(n_t)
                    req.raw_input_contents.append(
                        np.ascontiguousarray(keys, "<i8").tobytes())
                    req.raw_input_contents.append(
                        np.asarray([batch] * n_t, "<i4").tobytes())
                    t0 = time.perf_counter()
                    try:
                        infer(req, timeout=60)
                        with glock:
                            glat.append(time.perf_counter() - t0)
                    except Exception:
                        pass
                channel.close()

            gthreads = [threading.Thread(target=gclient, args=(c,),
                                         daemon=True) for c in range(conc)]
            gt0 = time.perf_counter()
            for th in gthreads:
                th.start()
            time.sleep(duration)
            gstop.set()
            for th in gthreads:
                th.join(timeout=30)
            gwall = time.perf_counter() - gt0
            with glock:
                gn = len(glat)
                gls = np.sort(np.asarray(glat))
            if gn:
                grpc_extra = {
                    "e2e_grpc_qps": round(gn / gwall, 1),
                    "e2e_grpc_samples_per_s": round(gn * batch / gwall, 1),
                    "e2e_grpc_p50_ms": round(float(gls[gn // 2]) * 1e3, 2),
                    "e2e_grpc_p99_ms": round(
                        float(gls[min(int(gn * 0.99), gn - 1)]) * 1e3, 2),
                }
        except Exception as e:
            grpc_extra = {"e2e_grpc_error": repr(e)}

        # Decomposition (VERDICT r2 missing #5): split each executed batch
        # into frontend SOFTWARE time (validate+merge+pad+response split)
        # vs DISPATCH (translate + device program + transfer, which on this
        # dev setup includes the ~26 ms tunnel RTT). A reader subtracts the
        # known device slope (batch_latency_us scaled to the merged batch)
        # from dispatch to isolate the tunnel.
        from hugectr_backend_tpu.serving import metrics as smetrics

        return {
            **grpc_extra,
            "e2e_http_qps": round(n / wall, 1),
            "e2e_http_samples_per_s": round(n * batch / wall, 1),
            "e2e_batch": batch,
            "e2e_concurrency": conc,
            "e2e_p50_ms": round(float(ls[n // 2]) * 1e3, 2),
            "e2e_p99_ms": round(float(ls[min(int(n * 0.99), n - 1)]) * 1e3, 2),
            "e2e_sw_overhead_us": round(
                smetrics.BATCH_SW_SECONDS.mean(model="dlrm") * 1e6, 1),
            "e2e_dispatch_us": round(
                smetrics.BATCH_DISPATCH_SECONDS.mean(model="dlrm") * 1e6, 1),
            "e2e_batches_executed":
                smetrics.BATCH_SW_SECONDS.count(model="dlrm"),
            "e2e_note": f"{n_t}-table lookup via HTTP binary tensors; tunnel adds ~26ms "
                        "RTT per device execution on this dev setup",
            "e2e_qps_disclaimer": "qps fields are tunnel-RTT-bound and vary "
                                  "~2x between sessions (r2: 60.1, r3: 26.4 "
                                  "on identical code), and under RTT-bound "
                                  "concurrency on the 2-core host the "
                                  "sw_overhead timestamps absorb GIL time "
                                  "from client threads (measured up to "
                                  "~2.6 ms here vs ~0.1-0.2 ms isolated); "
                                  "the frontend saturation stage "
                                  "(bench_artifacts/frontend_saturation."
                                  "json, device stubbed) is the defensible "
                                  "frontend-software number",
        }
    finally:
        server.stop()


def e2e_bigtable_stage():
    """Big-table serving leg (VERDICT r2 weak #7): one >=1M-row table so the
    SOLO gather path + host scales fetch runs under real serving concurrency
    (HTTP -> batcher -> translate -> device), reporting MEASURED pipelined
    throughput (not the max(host, device) model) and the same sw/dispatch
    decomposition."""
    import tempfile
    import threading
    import urllib.request

    from hugectr_backend_tpu.io.sparse_model import write_sparse_model
    from hugectr_backend_tpu.io.synthetic import make_synthetic_table
    from hugectr_backend_tpu.serving import metrics as smetrics
    from hugectr_backend_tpu.serving.server import serve

    smoke = bool(os.environ.get("HPS_BENCH_SMOKE"))
    rows, dim = (30_000, 16) if smoke else (1_250_000, 32)
    duration, conc, batch = (2.0, 2, 16) if smoke else (10.0, 4, 256)
    tmp = tempfile.mkdtemp(prefix="hps_bench_big_")
    tbl = make_synthetic_table(rows, dim, seed=5, deterministic_fn=False)
    write_sparse_model(f"{tmp}/t0", tbl.keys, tbl.vectors)
    cfg = {
        "supportlonglong": True,
        "models": [{
            "model": "big", "sparse_files": [f"{tmp}/t0"],
            "max_batch_size": 1024,
            "embedding_vecsize_per_table": [dim],
            "maxnum_catfeature_query_per_table_per_sample": [1],
            "deployed_device_list": [0], "gpucache": True,
            "gpucacheper": 1.0,
        }],
    }
    server = serve(ps_source=cfg, port=0, block=False, grpc_port=None)
    try:
        url = f"http://127.0.0.1:{server.port}/v2/models/big/infer"
        import json as _json

        def post(keys):
            kraw = np.ascontiguousarray(keys, "<i8").tobytes()
            nraw = np.asarray([keys.shape[0]], "<i4").tobytes()
            header = _json.dumps({
                "inputs": [
                    {"name": "KEYS", "datatype": "INT64",
                     "shape": [keys.shape[0]],
                     "parameters": {"binary_data_size": len(kraw)}},
                    {"name": "NUMKEYS", "datatype": "INT32", "shape": [1],
                     "parameters": {"binary_data_size": len(nraw)}},
                ],
                "outputs": [
                    {"name": "OUTPUT0", "parameters": {"binary_data": True}}
                ],
            }).encode()
            r = urllib.request.urlopen(urllib.request.Request(
                url, data=header + kraw + nraw,
                headers={
                    "Content-Type": "application/octet-stream",
                    "Inference-Header-Content-Length": str(len(header)),
                }), timeout=300)
            r.read()

        rng_l = np.random.default_rng(11)
        reqs = [tbl.keys[rng_l.zipf(1.05, batch) % rows] for _ in range(32)]
        # Warm the pow2 merge buckets this concurrency mix can produce.
        wb = batch
        while wb <= batch * conc:
            post(tbl.keys[rng_l.integers(0, rows, wb)])
            wb *= 2
        lat, lock = [], threading.Lock()
        stop = threading.Event()

        def client(cid):
            i = cid
            while not stop.is_set():
                t0 = time.perf_counter()
                post(reqs[i % len(reqs)])
                i += 1
                with lock:
                    lat.append(time.perf_counter() - t0)

        threads = [threading.Thread(target=client, args=(c,), daemon=True)
                   for c in range(conc)]
        t_start = time.perf_counter()
        for th in threads:
            th.start()
        time.sleep(duration)
        stop.set()
        for th in threads:
            th.join(timeout=30)
        wall = time.perf_counter() - t_start
        with lock:
            n = len(lat)
            ls = np.sort(np.asarray(lat))
        if n == 0:
            return {"e2e_bigtable_error": "no completed requests"}
        return {
            "e2e_bigtable_rows": rows,
            "e2e_bigtable_qps": round(n / wall, 1),
            "e2e_bigtable_vectors_per_s_measured": round(n * batch / wall, 1),
            "e2e_bigtable_p50_ms": round(float(ls[n // 2]) * 1e3, 2),
            "e2e_bigtable_p99_ms": round(
                float(ls[min(int(n * 0.99), n - 1)]) * 1e3, 2),
            "e2e_bigtable_sw_overhead_us": round(
                smetrics.BATCH_SW_SECONDS.mean(model="big") * 1e6, 1),
            "e2e_bigtable_dispatch_us": round(
                smetrics.BATCH_DISPATCH_SECONDS.mean(model="big") * 1e6, 1),
            "e2e_bigtable_note": "solo-gather path under serving "
                                 "concurrency; measured pipelined run",
        }
    finally:
        server.stop()


def tier_latency_stage():
    """BASELINE config 5 (host half): bulk-read latency of the DRAM and SSD
    tiers for a 4096-key batch — the reference's latency table rows "CPU
    memory database: us ~ ms" / "persistent database: ms ~ s"
    (reference README.md:193). Host-only; no device involved."""
    import tempfile

    from hugectr_backend_tpu.tiers.dram import make_dram_tier
    from hugectr_backend_tpu.tiers.ssd import SsdKVTier
    from hugectr_backend_tpu.config.params import PersistentDatabaseParams

    smoke = bool(os.environ.get("HPS_BENCH_SMOKE"))
    rows, dim, nq = (50_000, 32, 512) if smoke else (2_000_000, 32, 4096)
    ssd_rows = 20_000 if smoke else 300_000
    rng = np.random.default_rng(0)

    dram = make_dram_tier()
    dram.create_table("hps_et.bench.t", dim)
    keys = rng.choice(np.int64(1) << 40, size=rows, replace=False)
    vecs = rng.standard_normal((rows, dim)).astype(np.float32)
    for i in range(0, rows, 250_000):
        dram.insert("hps_et.bench.t", keys[i:i + 250_000], vecs[i:i + 250_000])
    tmp = tempfile.mkdtemp(prefix="hps_bench_ssd_")
    ssd = SsdKVTier(PersistentDatabaseParams(path=tmp))
    ssd.create_table("hps_et.bench.s", dim)
    for i in range(0, ssd_rows, 100_000):
        ssd.insert("hps_et.bench.s", keys[i:i + 100_000], vecs[i:i + 100_000])

    # Multi-round interleaved medians (the scripts/tier_query_ab.py protocol
    # that settled the r2/r3 "regression" as host noise, VERDICT r4 weak #5):
    # single-session point-samples on a shared host moved 70.5 -> 144.9
    # ns/key between rounds on IDENTICAL code. Rounds interleave dram/ssd
    # with per-round key sets; report median + (max-min)/median spread.
    rounds = 3 if smoke else 9
    samples = {"dram": [], "ssd": []}
    for rd in range(rounds):
        qk = keys[rng.integers(0, rows, nq)]
        qs = keys[rng.integers(0, ssd_rows, nq)]
        for name, tier, tag, q in (
            ("dram", dram, "hps_et.bench.t", qk),
            ("ssd", ssd, "hps_et.bench.s", qs),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                tier.query(tag, q)
                best = min(best, time.perf_counter() - t0)
            samples[name].append(best * 1e6)
    ssd.close()
    dram_us = float(np.median(samples["dram"]))
    ssd_us = float(np.median(samples["ssd"]))
    spread = {
        n: round((max(s) - min(s)) / max(float(np.median(s)), 1e-9), 3)
        for n, s in samples.items()
    }
    out = {
        "dram_tier_query_us": round(dram_us, 1),
        "dram_tier_ns_per_key": round(dram_us * 1e3 / nq, 1),
        "ssd_tier_query_us": round(ssd_us, 1),
        "ssd_tier_ns_per_key": round(ssd_us * 1e3 / nq, 1),
        "tier_query_keys": nq,
        "tier_protocol": f"interleaved x{rounds} rounds, min-of-2 per "
                         "round, median; spread=(max-min)/median",
        "tier_spread": spread,
    }
    if not smoke:
        try:
            hist = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_artifacts", "tier_history.jsonl")
            with open(hist, "a") as f:
                f.write(json.dumps({
                    "samples_us": {n: [round(x, 1) for x in s]
                                   for n, s in samples.items()},
                    "median_us": {"dram": round(dram_us, 1),
                                  "ssd": round(ssd_us, 1)},
                }) + "\n")
        except OSError:
            pass
    return out


def host_translate_stage(batch):
    """Host half of the serving hot path: key -> slot translation for a full
    26-table request (sparse int64 keys, the reference's general case —
    reference docs/architecture.md:185-218 allows arbitrary key values).
    One native batch call translates every table in parallel on the
    persistent pool (tiers/hbm.py translate_indexes_batch). In production the
    continuous batcher overlaps batch k+1's translation with batch k's device
    gather, so sustained throughput is bounded by max(host, device) — both
    are reported."""
    import multiprocessing

    from hugectr_backend_tpu.tiers.hbm import (
        KeyIndex,
        translate_indexes_batch,
    )

    rng = np.random.default_rng(9)
    idxs, batches = [], []
    for c in CRITEO_CARDS:
        keys = np.sort(
            rng.choice(c * 4 + 8, size=c, replace=False).astype(np.int64))
        idx, _ = KeyIndex.build(keys)
        idxs.append(idx)
        batches.append(keys[rng.zipf(1.05, batch) % c])
    translate_indexes_batch(idxs, batches)
    # Median of per-round minima (see tier_latency_stage protocol note).
    rounds = []
    for _ in range(9):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            translate_indexes_batch(idxs, batches)
            best = min(best, time.perf_counter() - t0)
        rounds.append(best)
    best = float(np.median(rounds))
    return {
        "host_translate_us": round(best * 1e6, 1),
        "host_translate_spread": round(
            (max(rounds) - min(rounds)) / max(best, 1e-12), 3),
        "host_translate_ns_per_key": round(
            best * 1e9 / (batch * len(CRITEO_CARDS)), 1),
        "host_translate_cpus": multiprocessing.cpu_count(),
        "host_translate_note": "native static-hash batch translate, all "
        "tables parallel on the pool; scales with host cores (this box: "
        f"{multiprocessing.cpu_count()})",
    }


def host_scale(i):
    """The synthetic per-row scale formula (host-computable mirror of the
    on-device table generator below)."""
    return np.float32(0.01) + (np.asarray(i) % 50).astype(np.float32) * np.float32(0.001)


def main():
    import jax
    import jax.numpy as jnp

    from hugectr_backend_tpu.cache.lookup_program import onehot_member_rows
    from hugectr_backend_tpu.models.dlrm import DLRM
    from hugectr_backend_tpu.ps.parameter_server import (
        arena_member_max_rows,
        onehot_member_max_rows,
    )
    from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla

    n_tables = len(CRITEO_CARDS)
    rng = np.random.default_rng(0)

    # ---- the production grouping policy, verbatim ------------------------
    oh_idx = [t for t, c in enumerate(CRITEO_CARDS)
              if c + 1 <= onehot_member_max_rows()]
    ar_idx = [t for t, c in enumerate(CRITEO_CARDS)
              if c + 1 > onehot_member_max_rows()
              and c <= arena_member_max_rows()]
    big_idx = [t for t, c in enumerate(CRITEO_CARDS)
               if c > arena_member_max_rows()]

    def arena_layout(idx, align=1):
        """Member blocks of ``cards[t]+1`` rows, padded to ``align``-row
        multiples (the production one-hot layout: build_arena_views pads
        one-hot members to 128 rows so offsets/sizes stay lane-aligned for
        the in-kernel interaction variant)."""
        cards = [CRITEO_CARDS[t] for t in idx]
        blocks = [-(-(c + 1) // align) * align for c in cards]
        off = np.concatenate([[0], np.cumsum(blocks)]).astype(np.int64)
        return cards, off, int(off[-1])

    oh_cards, oh_off, oh_total = arena_layout(oh_idx, align=128)
    ar_cards, ar_off, ar_total = arena_layout(ar_idx)
    big_cards = [CRITEO_CARDS[t] for t in big_idx]

    # ---- tables generated on device (no giant H2D through the tunnel) ---
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

    oh_vals, _ = gen(oh_total)          # one-hot arena: scales ride host-side
    ar_vals, ar_scales = gen(ar_total)  # small arena: device scales
    bigs = [gen(c) for c in big_cards]  # solo: scales host-side
    big_vals = [v for v, _ in bigs]

    # per-position member base/modulus so the scan's slot bump stays inside
    # each member's own rows
    def bases_mods(cards, off, batch):
        bases = np.concatenate(
            [np.full(batch, off[i], np.int64) for i in range(len(cards))])
        mods = np.concatenate(
            [np.full(batch, c, np.int64) for c in cards])
        return (jnp.asarray(bases.astype(np.int32)),
                jnp.asarray(mods.astype(np.int32)))

    def make_slots(seed, cards, off, batch):
        r = np.random.default_rng(seed)
        return np.concatenate(
            [off[i] + (r.zipf(1.05, batch) % c)
             for i, c in enumerate(cards)]).astype(np.int64)

    # Padded member sizes — what production's prepare_lookup passes since
    # one-hot arenas became 128-row aligned (ArenaView.block_rows).
    oh_sizes = tuple(int(oh_off[i + 1] - oh_off[i])
                     for i in range(len(oh_cards)))
    oh_offs = tuple(int(o) for o in oh_off[:-1])
    oh_members = tuple(zip(oh_offs, oh_sizes))

    def lookup_rows(oh_vals_, ar_vals_, ar_scales_, big_vals_, oh_sl, ar_sl,
                    big_sl, oh_sc, big_sc, batch, skip_oh=False):
        """The full 26-table lookup: one-hot + arena gather + solo gathers.
        Returns (oh_rows, ar_rows, big_rows_list). ``skip_oh`` mirrors the
        production fold: the one-hot group is consumed by the interaction
        kernel instead (lookup_program.gather_rows_for_groups "skip")."""
        if skip_oh:
            oh_rows = None
        else:
            parts, p = [], 0
            for o, sz in zip(oh_offs, oh_sizes):
                parts.append(
                    onehot_member_rows(oh_vals_, o, sz, oh_sl[p:p + batch]))
                p += batch
            oh_rows = jnp.concatenate(parts) * oh_sc[:, None]
        ar_rows = gather_dequant_xla(ar_vals_, ar_scales_, ar_sl)
        big_rows = [
            gather_dequant_xla(v, None, sl) * sc[:, None]
            for v, sl, sc in zip(big_vals_, big_sl, big_sc)
        ]
        return oh_rows, ar_rows, big_rows

    def make_run(batch, iters, e2e_model=None, e2e_params=None, dense0=None,
                 oh_fold=True):
        oh_b, oh_m = bases_mods(oh_cards, oh_off, batch)
        ar_b, ar_m = bases_mods(ar_cards, ar_off, batch)

        @jax.jit
        def run(oh_vals_, ar_vals_, ar_scales_, big_vals_, mp, dense,
                oh_sl0, ar_sl0, big_sl0, oh_sc, big_sc):
            def body(carry, i):
                (oh_sl, ar_sl, big_sl), acc = carry
                fold = e2e_model is not None and oh_fold and len(oh_idx)
                if fold:
                    # Production fold (serving/program.py _fold_oh_plan):
                    # the one-hot group is NOT looked up here — its slots +
                    # scales ride into the interaction kernel, which
                    # assembles those features from the VMEM-resident
                    # arena (bench_artifacts/oh_fused_ab.json: 208.0 ->
                    # 188.8 us on the one-hot+interaction stage).
                    oh_rows = None
                    _, ar_rows, big_rows = lookup_rows(
                        oh_vals_, ar_vals_, ar_scales_, big_vals_, None,
                        ar_sl, big_sl, None, big_sc, batch, skip_oh=True)
                else:
                    oh_rows, ar_rows, big_rows = lookup_rows(
                        oh_vals_, ar_vals_, ar_scales_, big_vals_, oh_sl,
                        ar_sl, big_sl, oh_sc, big_sc, batch)
                if e2e_model is None:
                    tot = oh_rows.sum() + ar_rows.sum() + sum(
                        r.sum() for r in big_rows)
                    bump = tot.astype(jnp.int32)
                else:
                    # Hand the dense model the lookup outputs CHUNKED
                    # (EmbParts): the Pallas interaction assembles z in
                    # VMEM, so the [B, 26, D] stack never hits HBM (the
                    # stack materialization erased the kernel's win —
                    # bench_artifacts/pallas_interaction_parts.json). On
                    # the XLA path EmbParts.stack() reproduces jnp.stack.
                    # Features enumerate PART-MAJOR — the production order
                    # since round 4 (serving reorders interleaved chunk
                    # maps and permutes the top-MLP kernel; the _fm kernel
                    # assembles z with one transpose per part, measured
                    # 213 -> 184 us on the full dense forward —
                    # bench_artifacts/parts_fm_ab.json).
                    from hugectr_backend_tpu.ops.fused_interaction import (
                        EmbParts,
                    )

                    fmap = []
                    parts = []
                    oh = None
                    if fold:
                        oh = (oh_vals_,
                              oh_sl.reshape(len(oh_idx), batch),
                              oh_sc.reshape(len(oh_idx), batch),
                              oh_members)
                    elif len(oh_idx):
                        pi = len(parts)
                        parts.append(
                            oh_rows.reshape(len(oh_idx), batch, -1))
                        fmap += [(pi, j) for j in range(len(oh_idx))]
                    if len(ar_idx):
                        pi = len(parts)
                        parts.append(
                            ar_rows.reshape(len(ar_idx), batch, -1))
                        fmap += [(pi, j) for j in range(len(ar_idx))]
                    for j, t in enumerate(big_idx):
                        fmap.append((len(parts), 0))
                        parts.append(big_rows[j][None])
                    emb = EmbParts(parts, fmap, batch, oh=oh)
                    logits = e2e_model.apply(mp, dense, emb)
                    tot = logits.sum()
                    bump = tot.astype(jnp.int32)
                oh_dep = (0 if oh_rows is None
                          else oh_rows.sum(axis=1).astype(jnp.int32))
                n_oh = (oh_sl - oh_b + oh_dep + bump + i + 1) % oh_m + oh_b
                n_ar = (ar_sl - ar_b + ar_rows.sum(axis=1).astype(jnp.int32)
                        + bump + i + 1) % ar_m + ar_b
                n_big = [
                    (sl + r.sum(axis=1).astype(jnp.int32) + bump + i + 1) % c
                    for sl, r, c in zip(big_sl, big_rows, big_cards)
                ]
                return ((n_oh, n_ar, n_big), acc + tot), None

            (_, acc), _ = jax.lax.scan(
                body, ((oh_sl0, ar_sl0, big_sl0), jnp.float32(0)),
                jnp.arange(iters))
            return acc
        return run

    def args_for(seed, batch):
        oh_np = make_slots(seed, oh_cards, oh_off, batch)
        ar_np = make_slots(seed + 7000, ar_cards, ar_off, batch)
        r = np.random.default_rng(seed + 9000)
        big_np = [r.zipf(1.05, batch) % c for c in big_cards]
        # Host-side scale fetch (production: done during key translation).
        oh_sc = jnp.asarray(host_scale(oh_np))
        big_sc = [jnp.asarray(host_scale(s)) for s in big_np]
        return (jnp.asarray(oh_np.astype(np.int32)),
                jnp.asarray(ar_np.astype(np.int32)),
                [jnp.asarray(s.astype(np.int32)) for s in big_np],
                oh_sc, big_sc)

    def slope_us(batch, e2e=None):
        """Device us/batch via the two-scan-length slope (RTT-free)."""
        model, mp, dense = (None, None, None)
        if e2e is not None:
            model, mp, dense = e2e
        totals = {}
        for iters in (IT_LO, IT_HI):
            run = make_run(batch, iters, model, mp, dense)
            a = args_for(0, batch)
            float(run(oh_vals, ar_vals, ar_scales, big_vals, mp, dense, *a))
            best = float("inf")
            for sd in (1, 2, 3):
                a = args_for(sd, batch)
                t0 = time.perf_counter()
                float(run(oh_vals, ar_vals, ar_scales, big_vals, mp, dense,
                          *a))
                best = min(best, time.perf_counter() - t0)
            totals[iters] = best
        return (totals[IT_HI] - totals[IT_LO]) / (IT_HI - IT_LO) * 1e6

    us_head = slope_us(BATCH)
    vectors_per_s = BATCH * n_tables / us_head * 1e6
    us_small = slope_us(SMALL_BATCH)
    small_vectors_per_s = SMALL_BATCH * n_tables / us_small * 1e6

    # ---- fused end-to-end DLRM (lookup + dense in one program) ----------
    # Dense-precision ladder (ROOFLINE.md §6): the headline runs the
    # production default — f32 TENSORS (XLA's default precision routes the
    # matmuls through bf16 MXU passes; manual bf16 casting measured ~30%
    # SLOWER at this shape, bench_artifacts/dense_roofline.json). Variants:
    # bf16_cast (explicit casts), int8/fp8 weight-only kernels
    # (models/quant_dense.py, the reference fp8_quant dense analogue).
    # NOTE round-2's "fp32 vs bf16" A/B compared bf16 against itself (the
    # then-default was bf16 and use_mixed_precision changed nothing) — its
    # ±2% delta was run noise, not a precision effect.
    from hugectr_backend_tpu.models.quant_dense import quantize_model_params

    arch = dict(bottom_widths=(512, 256, DIM))
    model = DLRM(**arch)
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((BATCH, 13), jnp.float32),
        jnp.zeros((BATCH, n_tables, DIM), jnp.float32),
    )
    dense0 = jnp.asarray(rng.standard_normal((BATCH, 13)), jnp.float32)
    # Interleaved A/B protocol (VERDICT r3 weak #2): compile every variant
    # first, then measure them ROUND-ROBIN within one session — the
    # cross-variant ordering is then comparable (sequential one-per-session
    # measurement flipped the w8a8-vs-f32 ordering between sessions at the
    # chip's ±4% session noise). Per variant: median slope over rounds +
    # spread; history appended to bench_artifacts/fused_ab_history.jsonl.
    # Production default since round 5: the one-hot group folds INTO the
    # interaction kernel (oh_fold=True, serving/program.py _fold_oh_plan);
    # "f32_twostage" keeps the round-4 construction (one-hot stage as XLA
    # matmuls materializing [n_oh*B, D] to HBM) as the in-session A/B.
    fused_variants = {"f32": (model, params, True)}
    fused_variants["f32_twostage"] = (model, params, False)
    fused_variants["bf16cast"] = (
        DLRM(**arch, compute_dtype=jnp.bfloat16), params, True)
    for fmt in ("int8", "fp8", "w8a8"):
        fused_variants[fmt] = (
            DLRM(**arch, quant_fmt=fmt), quantize_model_params(params, fmt),
            True)

    runners = {}
    for name, (m, mp, fold) in fused_variants.items():
        for iters in (IT_LO, IT_HI):
            run = make_run(BATCH, iters, m, mp, dense0, oh_fold=fold)
            a = args_for(0, BATCH)
            float(run(oh_vals, ar_vals, ar_scales, big_vals, mp, dense0, *a))
            runners[(name, iters)] = (run, mp)
    # 5 interleaved rounds by default: the 3-round protocol could not
    # resolve the fold's ~20 us full-program win (ROOFLINE §6.8 — a
    # 9-round dedicated A/B did, bench_artifacts/fold_full_ab.json);
    # 5 keeps the headline run bounded while halving the noise floor.
    AB_ROUNDS = (2 if os.environ.get("HPS_BENCH_SMOKE")
                 else int(os.environ.get("HPS_FUSED_AB_ROUNDS", "5")))
    fused_samples = {name: [] for name in fused_variants}
    for rd in range(AB_ROUNDS):
        for name in fused_variants:
            tt = {}
            for iters in (IT_LO, IT_HI):
                run, mp = runners[(name, iters)]
                a = args_for(100 + 13 * rd + iters, BATCH)
                t0 = time.perf_counter()
                float(run(oh_vals, ar_vals, ar_scales, big_vals, mp, dense0,
                          *a))
                tt[iters] = time.perf_counter() - t0
            fused_samples[name].append(
                (tt[IT_HI] - tt[IT_LO]) / (IT_HI - IT_LO) * 1e6)
    fused_med = {n: float(np.median(s)) for n, s in fused_samples.items()}
    fused_spread = {
        n: round((max(s) - min(s)) / max(fused_med[n], 1e-9), 3)
        for n, s in fused_samples.items()
    }
    us_e2e = fused_med["f32"]  # production default
    e2e_qps = BATCH / us_e2e * 1e6
    dense_variants = {}
    for name in ("f32_twostage", "bf16cast", "int8", "fp8", "w8a8"):
        dense_variants[f"fused_dlrm_{name}_dense_samples_per_s"] = round(
            BATCH / fused_med[name] * 1e6, 1)
        dense_variants[f"fused_dlrm_{name}_dense_batch_latency_us"] = round(
            fused_med[name], 1)
    dense_variants["fused_ab_protocol"] = (
        f"interleaved round-robin x{AB_ROUNDS}, median slope; "
        "in-session spread (max-min)/median per variant below")
    dense_variants["fused_ab_spread"] = fused_spread
    try:
        if os.environ.get("HPS_BENCH_SMOKE"):
            raise OSError  # CPU smoke slopes are noise; keep history TPU-only
        hist = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_artifacts", "fused_ab_history.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps({
                "samples_us": {n: [round(x, 1) for x in s]
                               for n, s in fused_samples.items()},
                "median_us": {n: round(v, 1) for n, v in fused_med.items()},
            }) + "\n")
    except OSError:
        pass

    # ---- DIN-style pooled multi-hot lookup (BASELINE config 4) ----------
    # keys [B, S] zipf, masked mean pooling fused into the gather program
    # (serving/pooled.py _pooled_gather — the production pooled path).
    from hugectr_backend_tpu.serving.pooled import _pooled_gather

    smoke = bool(os.environ.get("HPS_BENCH_SMOKE"))
    din_rows = 20_000 if smoke else 1_000_000
    din_b, din_s = (64, 8) if smoke else (1024, 64)
    din_vals, din_scales = gen(din_rows)

    del din_scales  # production solo policy: scales ride host-side

    def make_din(iters):
        @jax.jit
        def run(v_, slots0, seq_len, scin):
            def body(carry, i):
                sl, acc = carry
                out = _pooled_gather(v_, None, sl, seq_len, din_b, din_s,
                                     "mean", scin=scin)
                bump = out.sum().astype(jnp.int32)
                nxt = (sl + bump + i + 1) % din_rows
                return (nxt, acc + out.sum()), None
            (_, acc), _ = jax.lax.scan(
                body, (slots0, jnp.float32(0)), jnp.arange(iters))
            return acc
        return run

    def din_args(seed):
        r = np.random.default_rng(seed)
        slots = (r.zipf(1.05, din_b * din_s) % din_rows).astype(np.int64)
        seq = r.integers(1, din_s + 1, din_b).astype(np.int32)
        # Host-side scale fetch (production: during key translation).
        return (jnp.asarray(slots.astype(np.int32)), jnp.asarray(seq),
                jnp.asarray(host_scale(slots)))

    din_totals = {}
    for iters in (IT_LO, IT_HI):
        run = make_din(iters)
        float(run(din_vals, *din_args(0)))
        best = float("inf")
        for sd in (1, 2, 3):
            a = din_args(sd)
            t0 = time.perf_counter()
            float(run(din_vals, *a))
            best = min(best, time.perf_counter() - t0)
        din_totals[iters] = best
    us_din = (din_totals[IT_HI] - din_totals[IT_LO]) / (IT_HI - IT_LO) * 1e6
    if us_din <= 0:
        # Slope noise at smoke scale: fall back to the per-iter average
        # (upper bound: includes fixed per-execution overhead).
        us_din = din_totals[IT_HI] / IT_HI * 1e6
    din_vectors_per_s = din_b * din_s / us_din * 1e6
    din_samples_per_s = din_b / us_din * 1e6

    try:
        tier_extra = tier_latency_stage()
    except Exception as e:
        tier_extra = {"tier_error": repr(e)}

    try:
        host_extra = host_translate_stage(BATCH)
        host_us = host_extra["host_translate_us"]
        # Batcher pipelines host translation under the device program;
        # sustained = the slower of the two stages.
        host_extra["sustained_vectors_per_s"] = round(
            BATCH * n_tables / max(host_us, us_head) * 1e6, 1)
    except Exception as e:
        host_extra = {"host_translate_error": repr(e)}

    try:
        e2e_extra = e2e_serving_stage()
    except Exception as e:  # never fail the bench on the serving stage
        e2e_extra = {"e2e_error": repr(e)}

    try:
        e2e_extra.update(e2e_bigtable_stage())
    except Exception as e:
        e2e_extra["e2e_bigtable_error"] = repr(e)

    baseline_vectors_per_s = 1.0e9  # A100 HPS reference point (see docstring)
    print(
        json.dumps(
            {
                "metric": "criteo_dlrm_int8_lookup_vectors_per_s_per_chip",
                "value": round(vectors_per_s, 1),
                "unit": "vectors/s",
                "vs_baseline": round(vectors_per_s / baseline_vectors_per_s, 4),
                "batch_latency_us": round(us_head, 1),
                "batch1024_latency_us": round(us_small, 1),
                "batch1024_vectors_per_s": round(small_vectors_per_s, 1),
                "fused_dlrm_e2e_samples_per_s": round(e2e_qps, 1),
                "fused_dlrm_batch_latency_us": round(us_e2e, 1),
                "fused_dlrm_dense_delta_us": round(us_e2e - us_head, 1),
                **dense_variants,
                "din_pooled_vectors_per_s": round(din_vectors_per_s, 1),
                "din_pooled_samples_per_s": round(din_samples_per_s, 1),
                "din_pooled_batch_latency_us": round(us_din, 1),
                "din_pooled_shape": f"[{din_b}, {din_s}] keys, "
                                    f"{din_rows}-row int8 table, masked mean,"
                                    " host-side scales (solo policy)",
                **tier_extra,
                **host_extra,
                "batch": BATCH,
                "num_tables": n_tables,
                "layout": f"criteo-kaggle 26 tables x {DIM}d int8+f32 scales: "
                          f"{len(oh_idx)} one-hot MXU + {len(ar_idx)} arena "
                          f"gather + {len(big_idx)} solo gather w/ host "
                          "scales (production policy)",
                "timing": "slope over 64->320 scan iters (tunnel-RTT-free; "
                          "round-1 numbers included ~410us/batch of RTT)",
                "device": str(jax.devices()[0]),
                **e2e_extra,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
