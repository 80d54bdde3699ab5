"""gRPC frontend tests: KServe v2 `inference.GRPCInferenceService`.

The reference is served through Triton's gRPC endpoint (port 8001,
`tritonclient.grpc` / `perf_analyzer -i grpc`); these tests exercise the
native TPU implementation with a stock grpc channel — same tensor contract
(KEYS/NUMKEYS -> OUTPUT0), response parameters (NumSample/DeviceID,
reference hps.cc:712-719), and repository control as the HTTP frontend.
"""

import json

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")

from hugectr_backend_tpu.io.sparse_model import write_sparse_model
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.serving import kserve_pb
from hugectr_backend_tpu.serving.grpc_server import HpsGrpcServer
from hugectr_backend_tpu.serving.model_manager import ModelManager

pb2 = kserve_pb.load()


class _Client:
    """Minimal tritonclient.grpc stand-in over a raw channel (the generated
    module has messages only; stubs are exercised via unary_unary paths,
    which is exactly what a generic stock client does on the wire)."""

    def __init__(self, port):
        self.channel = grpc.insecure_channel(f"127.0.0.1:{port}")

    def call(self, method, request, resp_cls):
        fn = self.channel.unary_unary(
            f"/{kserve_pb.SERVICE_NAME}/{method}",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=resp_cls.FromString,
        )
        return fn(request, timeout=30)

    def close(self):
        self.channel.close()


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("grpc_repo")
    tbl = make_synthetic_table(3000, 16, seed=33)
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
    server = HpsGrpcServer(manager, port=0).start()
    client = _Client(server.port)
    yield client, tbl
    client.close()
    server.stop()
    manager.shutdown()


def test_health_and_metadata(served):
    client, _ = served
    assert client.call("ServerLive", pb2.ServerLiveRequest(),
                       pb2.ServerLiveResponse).live
    assert client.call("ServerReady", pb2.ServerReadyRequest(),
                       pb2.ServerReadyResponse).ready
    assert client.call("ModelReady", pb2.ModelReadyRequest(name="dlrm"),
                       pb2.ModelReadyResponse).ready
    assert not client.call("ModelReady", pb2.ModelReadyRequest(name="nope"),
                           pb2.ModelReadyResponse).ready
    meta = client.call("ModelMetadata", pb2.ModelMetadataRequest(name="dlrm"),
                       pb2.ModelMetadataResponse)
    assert meta.platform == "hps_tpu"
    assert [t.name for t in meta.inputs] == ["KEYS", "NUMKEYS"]
    assert meta.outputs[0].datatype == "FP32"
    srv = client.call("ServerMetadata", pb2.ServerMetadataRequest(),
                      pb2.ServerMetadataResponse)
    assert srv.name == "hps_tpu"


def test_repository_index(served):
    client, _ = served
    idx = client.call("RepositoryIndex", pb2.RepositoryIndexRequest(),
                      pb2.RepositoryIndexResponse)
    names = {m.name: m.state for m in idx.models}
    assert names.get("dlrm") == "READY"


def _infer_request(keys, numkeys, raw=True):
    req = pb2.ModelInferRequest(model_name="dlrm")
    ki = req.inputs.add()
    ki.name, ki.datatype = "KEYS", "INT64"
    ki.shape.append(len(keys))
    ni = req.inputs.add()
    ni.name, ni.datatype = "NUMKEYS", "INT32"
    ni.shape.append(len(numkeys))
    if raw:
        req.raw_input_contents.append(
            np.asarray(keys, "<i8").tobytes())
        req.raw_input_contents.append(
            np.asarray(numkeys, "<i4").tobytes())
    else:
        ki.contents.int64_contents.extend(int(k) for k in keys)
        ni.contents.int_contents.extend(int(n) for n in numkeys)
    return req


@pytest.mark.parametrize("raw", [True, False])
def test_infer_known_vectors(served, raw):
    client, tbl = served
    batch = 4
    q = tbl.keys[100 : 100 + batch * 26]
    # NUMKEYS carries per-TABLE key counts (reference hps.cc:616-618).
    resp = client.call(
        "ModelInfer",
        _infer_request(q, [len(q)], raw=raw),
        pb2.ModelInferResponse,
    )
    assert resp.outputs[0].name == "OUTPUT0"
    assert resp.outputs[0].datatype == "FP32"
    assert resp.parameters["NumSample"].int64_param == batch
    out = np.frombuffer(resp.raw_output_contents[0], "<f4").reshape(-1, 16)
    np.testing.assert_allclose(out, expected_vector(q, 16), rtol=1e-5)


def test_infer_miss_gets_default(served):
    client, tbl = served
    missing = np.array([10_000_001], np.int64)  # not in the table
    resp = client.call(
        "ModelInfer", _infer_request(missing, [1]), pb2.ModelInferResponse
    )
    out = np.frombuffer(resp.raw_output_contents[0], "<f4")
    np.testing.assert_array_equal(out, np.zeros(16, np.float32))


def test_infer_validation_errors(served):
    client, _ = served
    # Missing NUMKEYS -> INVALID_ARGUMENT (reference model_state.cpp:180-261).
    req = pb2.ModelInferRequest(model_name="dlrm")
    t = req.inputs.add()
    t.name, t.datatype = "KEYS", "INT64"
    t.shape.append(1)
    t.contents.int64_contents.append(5)
    with pytest.raises(grpc.RpcError) as e:
        client.call("ModelInfer", req, pb2.ModelInferResponse)
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    # Unknown model -> NOT_FOUND.
    bad = _infer_request([1], [1])
    bad.model_name = "absent"
    with pytest.raises(grpc.RpcError) as e:
        client.call("ModelInfer", bad, pb2.ModelInferResponse)
    assert e.value.code() == grpc.StatusCode.NOT_FOUND
    # Over max batch -> INVALID_ARGUMENT (reference hps.cc:573-582).
    over = _infer_request(list(range(26 * 100)), [26 * 100])
    with pytest.raises(grpc.RpcError) as e:
        client.call("ModelInfer", over, pb2.ModelInferResponse)
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_load_unload_cycle(served):
    client, _ = served
    client.call("RepositoryModelUnload",
                pb2.RepositoryModelUnloadRequest(model_name="dlrm"),
                pb2.RepositoryModelUnloadResponse)
    assert not client.call("ModelReady", pb2.ModelReadyRequest(name="dlrm"),
                           pb2.ModelReadyResponse).ready
    client.call("RepositoryModelLoad",
                pb2.RepositoryModelLoadRequest(model_name="dlrm"),
                pb2.RepositoryModelLoadResponse)
    assert client.call("ModelReady", pb2.ModelReadyRequest(name="dlrm"),
                       pb2.ModelReadyResponse).ready
    # Still serves correctly after the cycle.
    keys = list(range(1, 53))  # 2 samples x 26 keys/sample
    resp = client.call("ModelInfer", _infer_request(keys, [52]),
                       pb2.ModelInferResponse)
    assert resp.parameters["NumSample"].int64_param == 2


def test_malformed_request_fuzz(served):
    """Malformed gRPC requests must map to INVALID_ARGUMENT (never crash or
    wedge the service), mirroring the HTTP fuzz test. A valid request still
    succeeds afterward."""
    client, tbl = served

    def expect_invalid(req):
        with pytest.raises(grpc.RpcError) as e:
            client.call("ModelInfer", req, pb2.ModelInferResponse)
        assert e.value.code() in (
            grpc.StatusCode.INVALID_ARGUMENT,
            grpc.StatusCode.NOT_FOUND,
        ), e.value.details()

    # wrong KEYS datatype (FP64 keys would silently truncate if coerced)
    req = pb2.ModelInferRequest(model_name="dlrm")
    ki = req.inputs.add()
    ki.name, ki.datatype = "KEYS", "FP64"
    ki.shape.append(1)
    ki.contents.fp64_contents.append(1.5)
    ni = req.inputs.add()
    ni.name, ni.datatype = "NUMKEYS", "INT32"
    ni.shape.append(1)
    ni.contents.int_contents.append(1)
    expect_invalid(req)

    # wrong NUMKEYS datatype
    req = _infer_request([1, 2], [2], raw=False)
    req.inputs[1].datatype = "INT64"
    del req.inputs[1].contents.int_contents[:]
    req.inputs[1].contents.int64_contents.append(2)
    expect_invalid(req)

    # raw bytes not a multiple of the itemsize
    req = _infer_request([1, 2], [2])
    req.raw_input_contents[0] = req.raw_input_contents[0][:-3]
    expect_invalid(req)

    # shape/data mismatch
    req = _infer_request([1, 2, 3], [3], raw=False)
    req.inputs[0].shape[0] = 7
    expect_invalid(req)

    # unsupported datatype string
    req = _infer_request([1], [1], raw=False)
    req.inputs[0].datatype = "COMPLEX128"
    expect_invalid(req)

    # NUMKEYS sum disagreeing with KEYS length
    req = _infer_request([1, 2, 3, 4], [99], raw=False)
    expect_invalid(req)

    # the service still answers a valid request
    q = tbl.keys[[1, 2, 3]]
    resp = client.call(
        "ModelInfer", _infer_request([int(k) for k in q], [3]),
        pb2.ModelInferResponse,
    )
    out = np.frombuffer(resp.raw_output_contents[0], "<f4").reshape(3, 16)
    np.testing.assert_allclose(out, expected_vector(q, 16), rtol=1e-5)


def test_pb_wire_matches_generated_serializer():
    """The hand-rolled hot-path response framing (serving/pb_wire.py) must
    parse back to exactly the message the protoc-generated path builds."""
    import numpy as np

    from hugectr_backend_tpu.serving import kserve_pb
    from hugectr_backend_tpu.serving.pb_wire import infer_response_bytes

    pb2 = kserve_pb.load()
    out = np.arange(37, dtype="<f4")
    wire = infer_response_bytes(
        "dlrm", "3", "req-9", {"NumSample": 5, "DeviceID": 0},
        "OUTPUT0", "FP32", [37], out,
    )
    msg = pb2.ModelInferResponse.FromString(wire)
    assert msg.model_name == "dlrm" and msg.model_version == "3"
    assert msg.id == "req-9"
    assert msg.parameters["NumSample"].int64_param == 5
    assert msg.parameters["DeviceID"].int64_param == 0
    assert len(msg.outputs) == 1
    t = msg.outputs[0]
    assert (t.name, t.datatype, list(t.shape)) == ("OUTPUT0", "FP32", [37])
    got = np.frombuffer(msg.raw_output_contents[0], "<f4")
    np.testing.assert_array_equal(got, out)

    # Reference equivalence: build the same message with the generated API
    # and compare the parsed forms field by field.
    ref = pb2.ModelInferResponse(
        model_name="dlrm", model_version="3", id="req-9",
        parameters={"NumSample": pb2.InferParameter(int64_param=5),
                    "DeviceID": pb2.InferParameter(int64_param=0)},
        outputs=[pb2.ModelInferResponse.InferOutputTensor(
            name="OUTPUT0", datatype="FP32", shape=[37])],
        raw_output_contents=[out.tobytes()],
    )
    assert msg == ref
