"""Update-pipeline benchmark: sustained updates/s through the full online
path (Kafka wire transport -> PS consumer -> DRAM + SSD tiers -> cache
refresh) while lookups keep serving, with lookup p50/p99 before vs during
the storm (the reference's trainer->Kafka->VDB/PDB->GPU-cache cycle,
reference README.md:213-218).

Host-dominated measurement; runs on CPU devices. NOTE: this dev box has
2 vCPUs — production hosts with dozens of cores sustain proportionally more
(the consumer, SSD ingest, and serving threads all contend here).

    python scripts/microbench_update_storm.py [--seconds 10]

Prints one JSON object (committed under bench_artifacts/).
"""

import argparse
import json
import pathlib
import sys
import tempfile
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from hugectr_backend_tpu import HierParameterServer, LookupSession
from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import make_synthetic_table
from hugectr_backend_tpu.tiers.base import table_tag
from hugectr_backend_tpu.update.kafka_lite import KafkaQueueSource
from hugectr_backend_tpu.update.mini_broker import MiniKafkaBroker

ROWS, DIM = 200_000, 32
UPDATE_BATCH = 512
LOOKUP_BATCH = 1024


def pcts(lat):
    ls = np.sort(np.asarray(lat))
    n = ls.size
    return (round(float(ls[n // 2]) * 1e3, 3),
            round(float(ls[min(int(n * 0.99), n - 1)]) * 1e3, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="hps_storm_")
    tbl = make_synthetic_table(ROWS, DIM, seed=7, deterministic_fn=False)
    write_sparse_model(f"{tmp}/t0", tbl.keys, tbl.vectors)
    broker = MiniKafkaBroker(num_partitions=3).start()
    ps = HierParameterServer.create({
        "volatile_db": {"type": "parallel_hash_map"},
        "persistent_db": {"type": "rocks_db", "path": f"{tmp}/ssd"},
        "update_source": {
            "type": "kafka_message_queue",
            "brokers": f"127.0.0.1:{broker.port}",
            "poll_timeout_ms": 5,
            "max_batch_size": 8192,
            "max_commit_interval": 50,
        },
        "models": [{
            "model": "m", "sparse_files": [f"{tmp}/t0"],
            "embedding_vecsize_per_table": [DIM],
            "maxnum_catfeature_query_per_table_per_sample": [1],
            "gpucacheper": 0.25, "embedding_cache_type": "dynamic",
            "hit_rate_threshold": 0.9,
        }],
    })
    tag = table_tag("m", "sparse_embedding0")
    cache = ps.get_embedding_cache("m", 0)
    sess = LookupSession.create(ps.get_model_params("m"), cache)
    rng = np.random.default_rng(0)

    def lookup_once(i):
        q = tbl.keys[rng.zipf(1.05, LOOKUP_BATCH) % ROWS]
        t0 = time.perf_counter()
        sess.lookup_numpy([q])
        return time.perf_counter() - t0

    # Warm compile + hit meter + the hot resident set (zipf head), so the
    # baseline percentiles measure steady serving, not cold fill.
    for i in range(100):
        lookup_once(i)
    base_lat = [lookup_once(i) for i in range(200)]
    p50_before, p99_before = pcts(base_lat)

    # Storm: one producer thread posts update batches over the Kafka wire;
    # the PS consumer applies them to DRAM+SSD; a refresher thread cycles
    # the cache refresh; serving thread keeps looking up.
    stop = threading.Event()
    posted = {"batches": 0}
    producer = KafkaQueueSource(f"127.0.0.1:{broker.port}")

    def storm():
        r = np.random.default_rng(1)
        while not stop.is_set():
            # Flow control: cap the producer's lead so the in-memory broker
            # stays bounded and the measured rate is the PIPELINE's, not the
            # producer loop's.
            lead = posted["batches"] - (
                ps.update_consumer.applied_batches - applied0)
            if lead > 40:
                time.sleep(0.002)
                continue
            idx = r.integers(0, ROWS, UPDATE_BATCH)
            vecs = r.standard_normal((UPDATE_BATCH, DIM)).astype(np.float32)
            producer.post(tag, tbl.keys[idx], vecs)
            posted["batches"] += 1

    def refresher():
        while not stop.is_set():
            ps.refresh_embedding_cache("m", 0)
            time.sleep(0.2)

    applied0 = ps.update_consumer.applied_batches if ps.update_consumer else 0
    threads = [threading.Thread(target=storm, daemon=True),
               threading.Thread(target=refresher, daemon=True)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    storm_lat = []
    while time.perf_counter() - t0 < args.seconds:
        storm_lat.append(lookup_once(len(storm_lat)))
    stop.set()
    for t in threads:
        t.join(timeout=10)
    wall = time.perf_counter() - t0
    # Let the consumer drain what was posted, bounded.
    drain_deadline = time.time() + 15
    applied = ps.update_consumer.applied_batches - applied0 if ps.update_consumer else 0
    while time.time() < drain_deadline:
        a = ps.update_consumer.applied_batches - applied0
        if a >= posted["batches"]:
            applied = a
            break
        applied = a
        time.sleep(0.1)
    drain_wall = time.perf_counter() - t0

    p50_during, p99_during = pcts(storm_lat)
    import multiprocessing

    out = {
        "metric": "update_storm_pipeline",
        "updates_per_s_posted": round(posted["batches"] * UPDATE_BATCH / wall, 1),
        "updates_per_s_applied": round(applied * UPDATE_BATCH / drain_wall, 1),
        "update_batch": UPDATE_BATCH,
        "batches_posted": posted["batches"],
        "batches_applied": applied,
        "lookup_batch": LOOKUP_BATCH,
        "lookup_p50_ms_before": p50_before,
        "lookup_p99_ms_before": p99_before,
        "lookup_p50_ms_during": p50_during,
        "lookup_p99_ms_during": p99_during,
        "seconds": round(wall, 2),
        "host_cpus": multiprocessing.cpu_count(),
        "note": "kafka wire -> consumer -> DRAM+SSD (vectorized overlay) -> "
                "cache refresh, while a serving thread looks up; "
                "applied rate includes post-storm drain",
    }
    print(json.dumps(out))
    producer.close()
    ps.shutdown()
    broker.stop()


if __name__ == "__main__":
    main()
