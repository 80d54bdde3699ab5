"""Serving frontend tests: continuous batcher, model manager, HTTP API.

Replicates the reference's acceptance-test surface (health check, repository
index, end-to-end lookup over HTTP — reference sample notebooks + CI clients)
in-process on CPU devices.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.serving.model_manager import ModelManager
from hugectr_backend_tpu.serving.scheduler import RequestError
from hugectr_backend_tpu.serving.server import HpsHttpServer


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_repo")
    tbl = make_synthetic_table(3000, 16, seed=21)
    write_sparse_model(root / "t0", tbl.keys, tbl.vectors)
    ps_json = {
        "models": [
            {
                "model": "dlrm",
                "sparse_files": [str(root / "t0")],
                "embedding_vecsize_per_table": [16],
                "maxnum_catfeature_query_per_table_per_sample": [26],
                "max_batch_size": 64,
                "gpucacheper": 1.0,
                "embedding_cache_type": "static",
                "quant_bits": 32,
                "num_of_worker_buffer_in_pool": 2,
                "max_queue_delay_us": 200,
            }
        ]
    }
    manager = ModelManager.create(json.dumps(ps_json))
    server = HpsHttpServer(manager, port=0).start()
    yield server, tbl, root
    server.stop()


def _get(server, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}") as r:
            return r.status, json.loads(r.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _post(server, path, obj=None):
    data = json.dumps(obj).encode() if obj is not None else b""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}", data=data, method="POST"
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_health_and_metadata(served):
    server, _, _root = served
    assert _get(server, "/v2/health/live")[0] == 200
    assert _get(server, "/v2/health/ready")[0] == 200
    assert _get(server, "/v2/models/dlrm/ready")[0] == 200
    status, meta = _get(server, "/v2/models/dlrm")
    assert status == 200
    assert meta["inputs"][0]["name"] == "KEYS"
    assert meta["embedding_vecsize_per_table"] == [16]
    status, idx = _post(server, "/v2/repository/index")
    assert status == 200 and idx[0]["name"] == "dlrm" and idx[0]["state"] == "READY"


def test_http_infer_known_vectors(served):
    server, tbl, _root = served
    batch = 2
    q = tbl.keys[: 26 * batch]
    req = {
        "inputs": [
            {"name": "KEYS", "datatype": "INT64", "shape": [len(q)],
             "data": [int(k) for k in q]},
            {"name": "NUMKEYS", "datatype": "INT32", "shape": [1],
             "data": [len(q)]},
        ]
    }
    status, resp = _post(server, "/v2/models/dlrm/infer", req)
    assert status == 200, resp
    assert resp["parameters"]["NumSample"] == batch
    out = np.asarray(resp["outputs"][0]["data"], dtype=np.float32).reshape(-1, 16)
    np.testing.assert_allclose(out, expected_vector(q, 16), rtol=1e-5)


def test_http_infer_errors(served):
    server, tbl, _root = served
    # missing NUMKEYS
    status, resp = _post(
        server,
        "/v2/models/dlrm/infer",
        {"inputs": [{"name": "KEYS", "datatype": "INT64", "shape": [1], "data": [1]}]},
    )
    assert status == 400 and "NUMKEYS" in resp["error"]
    # batch too large: 65 samples x 26 keys > max_batch_size 64
    q = [0] * (65 * 26)
    status, resp = _post(
        server,
        "/v2/models/dlrm/infer",
        {"inputs": [
            {"name": "KEYS", "datatype": "INT64", "shape": [len(q)], "data": q},
            {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [len(q)]},
        ]},
    )
    assert status == 400 and "max batch size" in resp["error"]
    # unknown model
    status, resp = _post(
        server,
        "/v2/models/nope/infer",
        {"inputs": [
            {"name": "KEYS", "datatype": "INT64", "shape": [0], "data": []},
            {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [0]},
        ]},
    )
    assert status == 400 and "not loaded" in resp["error"]


def test_concurrent_clients_batched(served):
    """Many concurrent single-sample requests share device batches and all
    return correct results (continuous batching correctness)."""
    server, tbl, _root = served
    errs = []
    rng = np.random.default_rng(3)

    def client(i):
        try:
            idx = rng.integers(0, 3000, 26)
            q = tbl.keys[idx]
            resp = server.manager.infer("dlrm", q, [26])
            out = resp.output.reshape(26, 16)
            np.testing.assert_allclose(out, expected_vector(q, 16), rtol=1e-5)
        except Exception as e:
            errs.append((i, e))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs[:3]


def test_load_unload_cycle(served):
    server, tbl, _root = served
    mgr = server.manager
    status, _ = _post(server, "/v2/repository/models/dlrm/unload")
    assert status == 200
    assert not mgr.is_loaded("dlrm")
    assert _get(server, "/v2/models/dlrm/ready")[0] == 400
    status, _ = _post(server, "/v2/repository/models/dlrm/load")
    assert status == 200
    assert mgr.is_loaded("dlrm")
    # still serves correctly after reload
    resp = mgr.infer("dlrm", tbl.keys[:26], [26])
    np.testing.assert_allclose(
        resp.output.reshape(26, 16), expected_vector(tbl.keys[:26], 16), rtol=1e-5
    )


def test_metrics_endpoint(served):
    server, tbl, _root = served
    server.manager.infer("dlrm", tbl.keys[:26], [26])
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/metrics") as r:
        text = r.read().decode()
    assert "hps_inference_request_success" in text
    assert 'model="dlrm"' in text
    assert "hps_inference_request_duration_seconds_bucket" in text


def test_version_bump_schedules_refresh(served):
    server, tbl, root = served
    mgr = server.manager
    # True online-redeploy path (reference hps.cc:207-219 + model_state.cpp:
    # 413-418): the trainer writes NEW sparse files, the model is loaded with
    # a bumped version; load re-reads the files into the tiers and schedules a
    # one-shot async cache refresh (refresh_delay=0) that propagates the new
    # vectors into the resident HBM cache.
    new_vecs = np.full((tbl.num_rows, 16), 3.25, np.float32)
    write_sparse_model(root / "t0", tbl.keys, new_vecs)
    mgr.load("dlrm", version=2)
    import time

    out = None
    for _ in range(50):
        out = mgr.infer("dlrm", tbl.keys[:1], [1]).output.reshape(1, 16)
        if np.allclose(out, 3.25):
            break
        time.sleep(0.1)
    np.testing.assert_allclose(out, np.full((1, 16), 3.25))
    # restore original table for any later tests
    write_sparse_model(root / "t0", tbl.keys, tbl.vectors)


def test_binary_tensor_extension(served):
    """KServe binary-tensor wire format (the tritonclient/perf_analyzer
    fast path): raw int64/int32 payloads in, raw fp32 out, bit-identical to
    the JSON path."""
    server, tbl, _root = served
    q = tbl.keys[:52]
    # JSON reference
    jreq = {"inputs": [
        {"name": "KEYS", "datatype": "INT64", "shape": [52],
         "data": [int(k) for k in q]},
        {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [52]}]}
    _, jresp = _post(server, "/v2/models/dlrm/infer", jreq)
    out_json = np.asarray(jresp["outputs"][0]["data"], np.float32)
    # Binary request
    kraw = np.ascontiguousarray(q, "<i8").tobytes()
    nraw = np.asarray([52], "<i4").tobytes()
    hdr = json.dumps({"inputs": [
        {"name": "KEYS", "datatype": "INT64", "shape": [52],
         "parameters": {"binary_data_size": len(kraw)}},
        {"name": "NUMKEYS", "datatype": "INT32", "shape": [1],
         "parameters": {"binary_data_size": len(nraw)}}],
        "outputs": [{"name": "OUTPUT0", "parameters": {"binary_data": True}}],
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v2/models/dlrm/infer",
        hdr + kraw + nraw,
        headers={"Inference-Header-Content-Length": str(len(hdr))},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        hlen = int(r.headers["Inference-Header-Content-Length"])
        body = r.read()
        header = json.loads(body[:hlen])
        out_bin = np.frombuffer(body[hlen:], "<f4")
    assert header["outputs"][0]["parameters"]["binary_data_size"] == out_bin.nbytes
    np.testing.assert_array_equal(out_json, out_bin)
    # Truncated binary payload -> clean 400
    bad = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v2/models/dlrm/infer",
        hdr + kraw[:-3] ,
        headers={"Inference-Header-Content-Length": str(len(hdr))},
        method="POST",
    )
    try:
        urllib.request.urlopen(bad)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_malformed_payload_fuzz(served):
    """Garbage requests must yield 4xx error responses — never kill the
    server or wedge the batcher (reference GUARDED_RESPOND posture,
    triton_common.hpp:62-76). A known-good request must still succeed after
    the storm."""
    import urllib.error

    server, tbl, _root = served
    url = f"http://127.0.0.1:{server.port}/v2/models/dlrm/infer"
    payloads = [
        b"",                                   # empty body
        b"\x00\xff\x13garbage",                # not JSON
        b"{",                                  # truncated JSON
        b"[]",                                 # wrong top-level type
        json.dumps({"inputs": "nope"}).encode(),
        json.dumps({"inputs": [{}]}).encode(),
        json.dumps({"inputs": [
            {"name": "KEYS", "datatype": "FP64", "shape": [1], "data": [1]},
            {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [1]},
        ]}).encode(),                           # wrong dtype
        json.dumps({"inputs": [
            {"name": "KEYS", "datatype": "INT64", "shape": [2], "data": [1]},
            {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [1]},
        ]}).encode(),                           # shape/data mismatch
        json.dumps({"inputs": [
            {"name": "KEYS", "datatype": "INT64", "shape": [-3], "data": []},
            {"name": "NUMKEYS", "datatype": "INT32", "shape": [1], "data": [0]},
        ]}).encode(),                           # negative shape
    ]
    rng = np.random.default_rng(13)
    for _ in range(4):  # plus some random byte soup
        payloads.append(rng.bytes(int(rng.integers(1, 300))))
    for body in payloads:
        req = urllib.request.Request(
            url, data=body, method="POST",
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                raise AssertionError(
                    f"malformed payload accepted (status {r.status}): {body[:40]!r}"
                )
        except urllib.error.HTTPError as e:
            assert 400 <= e.code < 600, body[:40]
    # the server still answers a valid request correctly
    q = tbl.keys[[5, 6, 7]]
    status, resp = _post(server, "/v2/models/dlrm/infer", {
        "inputs": [
            {"name": "KEYS", "datatype": "INT64",
             "shape": [1, 3], "data": [int(k) for k in q]},
            {"name": "NUMKEYS", "datatype": "INT32", "shape": [1, 1],
             "data": [3]},
        ],
        "outputs": [{"name": "OUTPUT0"}],
    })
    assert status == 200
    out = np.asarray(resp["outputs"][0]["data"], np.float32).reshape(3, 16)
    np.testing.assert_allclose(out, expected_vector(q, 16), rtol=1e-5)


def test_tls_frontends(tmp_path):
    """HTTPS + TLS gRPC frontends (Triton serves TLS on its endpoints; the
    plaintext-only round-2 frontends were a parity gap)."""
    import ssl
    import subprocess

    from hugectr_backend_tpu.serving.server import serve

    cert, key = tmp_path / "cert.pem", tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "2",
         "-subj", "/CN=localhost",
         "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1"],
        check=True, capture_output=True,
    )
    tbl = make_synthetic_table(500, 8, seed=33)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    cfg = {"models": [{
        "model": "m", "sparse_files": [str(tmp_path / "t0")],
        "embedding_vecsize_per_table": [8],
        "maxnum_catfeature_query_per_table_per_sample": [4],
        "max_batch_size": 32, "gpucacheper": 1.0, "quant_bits": 32,
    }]}
    srv = serve(ps_source=cfg, port=0, grpc_port=0, block=False,
                tls_certfile=str(cert), tls_keyfile=str(key))
    try:
        ctx = ssl.create_default_context(cafile=str(cert))
        with urllib.request.urlopen(
            f"https://localhost:{srv.port}/v2/health/ready", context=ctx
        ) as r:
            assert r.status == 200
        # Plain HTTP against the TLS port fails.
        with pytest.raises(Exception):
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/v2/health/ready", timeout=5)

        import grpc

        from hugectr_backend_tpu.serving import kserve_pb

        pb2 = kserve_pb.load()
        creds = grpc.ssl_channel_credentials(cert.read_bytes())
        channel = grpc.secure_channel(f"localhost:{srv.grpc.port}", creds)
        ready = channel.unary_unary(
            f"/{kserve_pb.SERVICE_NAME}/ServerReady",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=pb2.ServerReadyResponse.FromString,
        )
        assert ready(pb2.ServerReadyRequest(), timeout=10).ready
        channel.close()
    finally:
        srv.stop()


def test_batch_failure_isolation(tmp_path):
    """A device-side fault while executing a MERGED batch fails only the
    poisoned request: the batcher retries each co-batched request
    individually (reference per-request GUARDED_RESPOND_IF_ERROR isolation,
    triton_common.hpp:62-76)."""
    from hugectr_backend_tpu import HierParameterServer, LookupSession
    from hugectr_backend_tpu.serving.scheduler import ContinuousBatcher

    tbl = make_synthetic_table(400, 8, seed=44)
    write_sparse_model(tmp_path / "t0", tbl.keys, tbl.vectors)
    ps = HierParameterServer.create(json.dumps({"models": [{
        "model": "m", "sparse_files": [str(tmp_path / "t0")],
        "embedding_vecsize_per_table": [8],
        "maxnum_catfeature_query_per_table_per_sample": [4],
        "max_batch_size": 64, "gpucacheper": 1.0, "quant_bits": 32,
        "max_queue_delay_us": 200_000,
    }]}))
    params = ps.get_model_params("m")
    sess = LookupSession.create(params, ps.get_embedding_cache("m", 0))
    POISON = np.int64(-987654321)
    real_lookup = sess.lookup_flat

    def flaky_lookup(merged, **kw):
        if any(POISON in np.asarray(m) for m in merged):
            raise RuntimeError("simulated device fault")
        return real_lookup(merged, **kw)

    sess.lookup_flat = flaky_lookup
    batcher = ContinuousBatcher(params, sess, device_id=0, num_workers=1)
    try:
        good_keys = tbl.keys[[1, 2, 3, 4]]
        f_good = batcher.submit(good_keys, [4])
        f_bad = batcher.submit(np.array([POISON, tbl.keys[0], 5, 6]), [4])
        # The good request succeeds with exact vectors despite sharing a
        # merged batch with the poisoned one...
        out = f_good.result(timeout=30)
        np.testing.assert_allclose(
            out.output.reshape(4, 8), expected_vector(good_keys, 8),
            rtol=1e-6)
        # ...and only the poisoned request carries the fault.
        with pytest.raises(RuntimeError, match="simulated device fault"):
            f_bad.result(timeout=30)
        # The batcher is not wedged: a follow-up request still completes.
        out2 = batcher.infer(good_keys, [4], timeout=30)
        np.testing.assert_allclose(
            out2.output.reshape(4, 8), expected_vector(good_keys, 8),
            rtol=1e-6)
    finally:
        batcher.shutdown()
