"""Kafka update stream with compression + consumer-group coordination.

The reference consumes trainer updates through librdkafka (reference
docs/hierarchical_parameter_server.md:575-646); this example runs the same
shape fully in-process: an embedded mini broker (3 partitions/topic), a
trainer-side producer with ``compression.type=lz4``, and TWO "inference
node" consumers in one consumer group that split the partitions between
them (JoinGroup/SyncGroup, range assignor) and commit offsets to the
broker — so neither re-reads the other's share.

Runs on CPU:  python examples/08_kafka_groups_compression.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hugectr_backend_tpu.update.kafka_lite import KafkaQueueSource
from hugectr_backend_tpu.update.mini_broker import MiniKafkaBroker

broker = MiniKafkaBroker(num_partitions=3).start()
broker.rebalance_window_s = 0.3
print(f"mini broker on 127.0.0.1:{broker.port} (3 partitions/topic)")

try:
    # Trainer side: lz4-compressed update batches, spread across
    # partitions by the stock murmur2 key partitioner.
    trainer = KafkaQueueSource(f"127.0.0.1:{broker.port}", compression="lz4")
    rng = np.random.default_rng(0)
    for i in range(9):
        tag = f"hps_et.demo.t{i % 3}"
        keys = np.arange(8, dtype=np.int64) + 1000 * i
        vecs = rng.standard_normal((8, 16)).astype(np.float32)
        trainer.post(tag, keys, vecs)
    print("trainer posted 9 lz4-compressed update batches over 3 topics")

    # Inference side: two nodes, one group.
    node_a = KafkaQueueSource(f"127.0.0.1:{broker.port}",
                              group_id="hps-serving")
    node_b = KafkaQueueSource(f"127.0.0.1:{broker.port}",
                              group_id="hps-serving")
    import threading

    got = {"a": [], "b": []}
    ta = threading.Thread(target=lambda: got["a"].extend(node_a.poll(10)))
    tb = threading.Thread(target=lambda: got["b"].extend(node_b.poll(10)))
    ta.start(); tb.start(); ta.join(); tb.join()

    for name, node in (("a", node_a), ("b", node_b)):
        parts = {t: pids for t, pids in (node._assignment or {}).items()}
        n = sum(len(k) for _, k, _ in got[name])
        print(f"node {name}: assigned {parts}, consumed {n} updated rows")
    total = sum(len(k) for rows in got.values() for _, k, _ in rows)
    assert total == 9 * 8, total
    print(f"exactly-once split: {total} rows total, no double-apply")
    node_a.commit(); node_b.commit()
    print("offsets committed to the broker (OffsetCommit v1, "
          "generation-fenced)")
    node_a.close(); node_b.close(); trainer.close()
finally:
    broker.stop()
print("done")
