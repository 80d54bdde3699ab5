"""Cross-host volatile DRAM pool (the redis_cluster equivalent,
reference docs/hierarchical_parameter_server.md:423-458)."""

import subprocess
import sys
import time

import numpy as np
import pytest

from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.tiers.cluster import ClusterKVTier, ClusterNodeServer


def test_cluster_tier_roundtrip_two_nodes():
    n1 = ClusterNodeServer().start()
    n2 = ClusterNodeServer().start()
    try:
        tier = ClusterKVTier([f"127.0.0.1:{n1.port}", f"127.0.0.1:{n2.port}"],
                             max_batch_size=64)
        assert tier.ping()
        rng = np.random.default_rng(0)
        keys = rng.choice(10**8, size=500, replace=False).astype(np.int64)
        vecs = rng.standard_normal((500, 16)).astype(np.float32)
        tier.create_table("t", 16)
        tier.insert("t", keys, vecs)
        # Keys actually partitioned across both nodes by low bits.
        assert n1.store.size("t") > 0 and n2.store.size("t") > 0
        assert n1.store.size("t") + n2.store.size("t") == 500
        assert tier.size("t") == 500

        probe = np.concatenate([keys[::7], np.array([10**12 + 1], np.int64)])
        out, found = tier.query("t", probe)
        assert found[:-1].all() and not found[-1]
        order = np.argsort(keys)
        want = vecs[order][np.searchsorted(keys[order], probe[:-1])]
        np.testing.assert_allclose(out[:-1], want, rtol=1e-6)

        # Upsert + keys() union + drop.
        tier.insert("t", keys[:10], np.full((10, 16), 5.0, np.float32))
        out2, _ = tier.query("t", keys[:10])
        np.testing.assert_allclose(out2, 5.0)
        np.testing.assert_array_equal(tier.keys("t"), np.sort(keys))
        tier.drop_table("t")
        assert tier.size("t") == 0
        tier.close()
    finally:
        n1.stop()
        n2.stop()


def test_cluster_tier_cross_process_and_ps_integration(tmp_path):
    """One pool node in a REAL separate OS process + one in-process; the
    full PS serves lookups through the pooled tier configured as
    volatile_db type=redis_cluster."""
    from hugectr_backend_tpu import HierParameterServer, LookupSession

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from hugectr_backend_tpu.tiers.cluster import ClusterNodeServer\n"
        "import threading\n"
        "srv = ClusterNodeServer(port=0).start()\n"
        "print(srv.port, flush=True)\n"
        "threading.Event().wait()\n"
    ) % (str(tmp_path.parents[len(tmp_path.parents) - 1]) if False else "/root/repo",)
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    try:
        port_remote = int(proc.stdout.readline().strip())
        local = ClusterNodeServer().start()
        try:
            tbl = make_synthetic_table(400, 8, seed=91)
            write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
            ps = HierParameterServer.create(
                {
                    "volatile_db": {
                        "type": "redis_cluster",
                        "address": f"127.0.0.1:{port_remote},"
                                   f"127.0.0.1:{local.port}",
                        "initial_cache_rate": 1.0,
                    },
                    "models": [
                        {
                            "model": "m",
                            "sparse_files": [str(tmp_path / "t0")],
                            "embedding_vecsize_per_table": [8],
                            "maxnum_catfeature_query_per_table_per_sample": [4],
                            "gpucacheper": 0.25,
                            "embedding_cache_type": "dynamic",
                            "quant_bits": 32,
                        }
                    ],
                }
            )
            try:
                assert isinstance(ps.dram, ClusterKVTier)
                # Rows live across BOTH processes' DRAM.
                assert local.store.size("hps_et.m.sparse_embedding0") > 0
                sess = LookupSession.create(
                    ps.get_model_params("m"), ps.get_embedding_cache("m", 0)
                )
                q = tbl.keys[1::3][:50]
                out = sess.lookup_numpy([q])[0]
                np.testing.assert_allclose(
                    out, expected_vector(q, 8), atol=1e-5
                )
            finally:
                ps.shutdown()
        finally:
            local.stop()
    finally:
        proc.kill()
        proc.wait(timeout=10)


def test_cluster_fallback_to_local_when_unreachable(tmp_path, caplog):
    """Config resilience: unreachable pool -> local DRAM store + warning
    (the reference survives a Redis outage via its persistent full copy)."""
    from hugectr_backend_tpu.config.params import VolatileDatabaseParams
    from hugectr_backend_tpu.tiers.dram import make_dram_tier

    params = VolatileDatabaseParams.from_json(
        {"type": "redis_cluster", "address": "127.0.0.1:1"}
    )
    tier = make_dram_tier(params)
    assert not isinstance(tier, ClusterKVTier)
    tier.create_table("x", 4)
    tier.insert("x", np.array([1], np.int64), np.ones((1, 4), np.float32))
    _, found = tier.query("x", np.array([1], np.int64))
    assert found.all()
