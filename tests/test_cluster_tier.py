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


def test_cluster_auth_secret():
    """Shared-secret handshake (reference redis password parity,
    doc:450-458): good secret round-trips; a bad secret and a secretless
    client are rejected before any op — including DROP — executes."""
    node = ClusterNodeServer(secret="s3kr1t").start()
    try:
        good = ClusterKVTier([f"127.0.0.1:{node.port}"], secret="s3kr1t")
        good.create_table("t", 4)
        good.insert("t", np.array([1, 2], np.int64),
                    np.ones((2, 4), np.float32))
        out, found = good.query("t", np.array([1], np.int64))
        assert found.all() and np.allclose(out, 1.0)

        bad = ClusterKVTier([f"127.0.0.1:{node.port}"], secret="wrong")
        with pytest.raises(IOError):
            bad.ping()
        bad.close()

        # A client with no secret must not be able to DROP the table: the
        # node's first frame is the auth challenge, not an op response.
        naked = ClusterKVTier([f"127.0.0.1:{node.port}"])
        with pytest.raises(IOError):
            naked.drop_table("t")
        naked.close()
        assert node.store.size("t") == 2  # table untouched
        good.close()
    finally:
        node.stop()


@pytest.fixture(scope="module")
def self_signed_cert(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tls")
    cert, key = tmp / "cert.pem", tmp / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "2",
         "-subj", "/CN=localhost",
         "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1"],
        check=True, capture_output=True,
    )
    return str(cert), str(key)


def test_cluster_tls_and_secret(self_signed_cert):
    """TLS-wrapped node protocol (reference enable_tls, doc:450-458) with
    the secret handshake riding inside the encrypted channel."""
    import ssl

    cert, key = self_signed_cert
    sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    sctx.load_cert_chain(cert, key)
    node = ClusterNodeServer(secret="tls-pass", tls=sctx).start()
    try:
        cctx = ssl.create_default_context(cafile=cert)
        cctx.check_hostname = False  # self-signed test cert
        tier = ClusterKVTier(
            [f"127.0.0.1:{node.port}"], secret="tls-pass", tls=cctx
        )
        tier.create_table("t", 4)
        tier.insert("t", np.array([7], np.int64),
                    np.full((1, 4), 2.0, np.float32))
        out, found = tier.query("t", np.array([7], np.int64))
        assert found.all() and np.allclose(out, 2.0)
        tier.close()

        # Plaintext client against the TLS node: the node's TLS handshake
        # rejects the raw bytes and the connection drops.
        plain = ClusterKVTier([f"127.0.0.1:{node.port}"], timeout_s=3)
        with pytest.raises(IOError):
            plain.ping()
        plain.close()
    finally:
        node.stop()


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
