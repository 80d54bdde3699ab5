"""Multi-process shared-memory DRAM store tests (native/shm_kvstore.cpp).

The reference's `multi_process_hash_map` volatile database shares one
embedding table across serving processes through /dev/shm (reference
docs/hierarchical_parameter_server.md:404,417-421). These tests exercise the
native TPU-build equivalent: same-process semantics parity with the other
DRAM stores, true cross-process sharing, overflow eviction, and the
ps.json routing.
"""

import json
import subprocess
import sys
import uuid

import numpy as np
import pytest

from hugectr_backend_tpu.config.params import (
    DatabaseOverflowPolicy,
    DatabaseType,
    VolatileDatabaseParams,
)
from hugectr_backend_tpu.tiers.dram import make_dram_tier

pytestmark = pytest.mark.skipif(
    not __import__("pathlib").Path("/dev/shm").is_dir(),
    reason="/dev/shm not available",
)

DIM = 8


def _params(name, **over):
    p = VolatileDatabaseParams()
    p.type = DatabaseType.MULTI_PROCESS_HASH_MAP
    p.shared_memory_name = name
    p.shared_memory_auto_remove = True
    for k, v in over.items():
        setattr(p, k, v)
    return p


@pytest.fixture
def shm_name():
    return f"hps_test_{uuid.uuid4().hex[:12]}"


def test_insert_query_evict_roundtrip(shm_name, rng):
    tier = make_dram_tier(_params(shm_name))
    assert type(tier).__name__ == "SharedMemoryDramKVTier"
    try:
        keys = rng.choice(10**9, size=500, replace=False).astype(np.int64)
        vecs = rng.normal(size=(500, DIM)).astype(np.float32)
        tier.create_table("t", DIM)
        tier.insert("t", keys, vecs)
        assert tier.size("t") == 500
        out, found = tier.query("t", keys[:100])
        assert found.all()
        np.testing.assert_allclose(out, vecs[:100], rtol=1e-6)
        # misses zero-filled + not-found
        out2, found2 = tier.query("t", np.asarray([-1, -2], np.int64))
        assert not found2.any() and (out2 == 0).all()
        # upsert overwrites
        tier.insert("t", keys[:10], vecs[:10] * 2)
        out3, _ = tier.query("t", keys[:10])
        np.testing.assert_allclose(out3, vecs[:10] * 2, rtol=1e-6)
        assert tier.size("t") == 500
        # explicit evict
        assert tier.evict("t", keys[:50]) == 50
        assert tier.size("t") == 450
        _, f = tier.query("t", keys[:50])
        assert not f.any()
        got = np.sort(tier.keys("t"))
        np.testing.assert_array_equal(got, np.sort(keys[50:]))
    finally:
        tier.close()


# Child runs in a FRESH interpreter (no fork of the jax-threaded test
# process): attach to the existing segment, verify reads, write rows the
# parent then verifies. The import chain here pulls no jax.
_CHILD_SRC = """
import json, sys
import numpy as np
sys.path.insert(0, {repo!r})
from hugectr_backend_tpu.config.params import DatabaseType, VolatileDatabaseParams
from hugectr_backend_tpu.tiers.dram import make_dram_tier

name, dim = sys.argv[1], int(sys.argv[2])
keys = np.asarray(json.loads(sys.argv[3]), np.int64)
vecs = np.asarray(json.loads(sys.argv[4]), np.float32)
p = VolatileDatabaseParams()
p.type = DatabaseType.MULTI_PROCESS_HASH_MAP
p.shared_memory_name = name
p.shared_memory_auto_remove = False  # parent owns the segment
tier = make_dram_tier(p)
tier.create_table("t", dim)  # attaches to the existing segment
out, found = tier.query("t", keys)
assert found.all(), "child: keys not visible"
assert np.allclose(out, vecs, rtol=1e-6), "child: vector mismatch"
tier.insert("t", keys + 10**12, vecs * 3)
tier.close()
print("child-ok")
"""


def test_cross_process_sharing(shm_name, rng):
    tier = make_dram_tier(_params(shm_name))
    try:
        keys = np.arange(1000, 1200, dtype=np.int64)
        vecs = rng.normal(size=(200, DIM)).astype(np.float32)
        tier.create_table("t", DIM)
        tier.insert("t", keys, vecs)

        import pathlib

        repo = str(pathlib.Path(__file__).resolve().parent.parent)
        proc = subprocess.run(
            [
                sys.executable, "-c", _CHILD_SRC.format(repo=repo),
                shm_name, str(DIM),
                json.dumps(keys.tolist()), json.dumps(vecs.tolist()),
            ],
            capture_output=True, text=True, timeout=60,
        )
        assert proc.returncode == 0, proc.stderr
        assert "child-ok" in proc.stdout
        # Parent sees the child's writes through the shared mapping.
        out, found = tier.query("t", keys + 10**12)
        assert found.all()
        np.testing.assert_allclose(out, vecs * 3, rtol=1e-6)
        assert tier.size("t") == 400
    finally:
        tier.close()


def test_overflow_eviction_within_budget(shm_name, rng):
    # Budget sized for ~256 rows; inserting 2000 must stay within capacity
    # and keep recent rows (evict_oldest policy).
    row_bytes = DIM * 4 + 44 + 24
    p = _params(
        shm_name,
        shared_memory_size=256 * row_bytes,
        overflow_policy=DatabaseOverflowPolicy.EVICT_OLDEST,
        overflow_resolution_target=0.8,
    )
    tier = make_dram_tier(p)
    try:
        tier.create_table("t", DIM)
        cap = tier.capacity("t")
        assert cap <= 280
        keys = np.arange(2000, dtype=np.int64)
        vecs = rng.normal(size=(2000, DIM)).astype(np.float32)
        for i in range(0, 2000, 100):
            tier.insert("t", keys[i : i + 100], vecs[i : i + 100])
        assert tier.size("t") <= cap
        # The most recent chunk survives in every partition.
        out, found = tier.query("t", keys[-64:])
        assert found.mean() > 0.9
        np.testing.assert_allclose(out[found], vecs[-64:][found], rtol=1e-6)
    finally:
        tier.close()


def test_geometry_mismatch_rejected(shm_name):
    tier = make_dram_tier(_params(shm_name))
    try:
        tier.create_table("t", DIM)
        p2 = _params(shm_name)
        p2.shared_memory_auto_remove = False
        tier2 = make_dram_tier(p2)
        with pytest.raises(OSError, match="geometry|failed"):
            tier2.create_table("t", DIM * 2)  # same segment, different dim
    finally:
        tier.close()


def test_ps_json_type_routing(tmp_path, shm_name):
    """`"type": "multi_process_hash_map"` in ps.json selects the shm store."""
    cfg = VolatileDatabaseParams.from_json(
        {
            "type": "multi_process_hash_map",
            "shared_memory_name": shm_name,
            "shared_memory_size": 10**7,
            "shared_memory_auto_remove": True,
        }
    )
    tier = make_dram_tier(cfg)
    try:
        assert type(tier).__name__ == "SharedMemoryDramKVTier"
        tier.create_table("x", 4)
        tier.insert("x", np.asarray([5], np.int64), np.ones((1, 4), np.float32))
        out, found = tier.query("x", np.asarray([5], np.int64))
        assert found.all() and (out == 1).all()
    finally:
        tier.close()
