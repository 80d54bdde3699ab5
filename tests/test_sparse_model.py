"""Sparse-model file format round-trips (reference docs/architecture.md:185-218)."""

import struct

import numpy as np
import pytest

from hugectr_backend_tpu.io.sparse_model import (
    read_quantized_sidecar,
    read_sparse_model,
    write_quantized_sidecar,
    write_sparse_model,
)
from hugectr_backend_tpu.io.synthetic import expected_vector, make_synthetic_table
from hugectr_backend_tpu.ops.quantize import (
    dequantize_rows,
    quantize_rows_fp8,
    quantize_rows_int8,
)


def test_round_trip(tmp_path):
    t = make_synthetic_table(1000, 16, seed=3)
    write_sparse_model(tmp_path / "tbl", t.keys, t.vectors)
    back = read_sparse_model(tmp_path / "tbl")
    np.testing.assert_array_equal(back.keys, t.keys)
    np.testing.assert_array_equal(back.vectors, t.vectors)
    assert back.dim == 16


def test_reads_reference_writer_layout(tmp_path):
    # Byte layout produced by the reference notebook's convert_to_sparse_model
    # (struct.pack 'q' per key + 'Nf' per vector) must read back identically.
    d = tmp_path / "ref"
    d.mkdir()
    keys = [7, 42, 99]
    vecs = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    with open(d / "key", "wb") as kf, open(d / "emb_vector", "wb") as vf:
        for k, v in zip(keys, vecs):
            kf.write(struct.pack("q", k))
            vf.write(struct.pack(f"{len(v)}f", *v))
    back = read_sparse_model(d)
    np.testing.assert_array_equal(back.keys, np.array(keys, dtype=np.int64))
    np.testing.assert_allclose(back.vectors, np.array(vecs, dtype=np.float32))


def test_dim_inference_mismatch(tmp_path):
    t = make_synthetic_table(10, 8)
    write_sparse_model(tmp_path / "t", t.keys, t.vectors)
    with pytest.raises(ValueError):
        read_sparse_model(tmp_path / "t", embedding_dim=7)


def test_remote_path_without_fetcher_raises():
    # No hdfs fetcher registered and no fsspec in the image -> actionable
    # error naming the plug point.
    with pytest.raises(NotImplementedError, match="register_remote_fetcher"):
        read_sparse_model("hdfs://nn/path/table")


def test_remote_path_pluggable_fetcher(tmp_path):
    """Remote URIs delegate to a registered scheme fetcher (the reference's
    FileSystem layer, doc:189)."""
    from hugectr_backend_tpu.io.sparse_model import (
        REMOTE_FETCHERS,
        register_remote_fetcher,
        write_sparse_model,
    )

    tbl = make_synthetic_table(40, 4, seed=3)
    write_sparse_model(tmp_path / "staged", tbl.keys, tbl.vectors)
    seen = []

    def fetch(uri):
        seen.append(uri)
        return str(tmp_path / "staged")

    register_remote_fetcher("s3", fetch)
    try:
        got = read_sparse_model("s3://bucket/models/table", embedding_dim=4)
        assert seen == ["s3://bucket/models/table"]
        np.testing.assert_array_equal(np.sort(got.keys), np.sort(tbl.keys))
    finally:
        REMOTE_FETCHERS.pop("s3", None)


def test_synthetic_table_deterministic():
    t = make_synthetic_table(100, 4, seed=1)
    np.testing.assert_allclose(t.vectors, expected_vector(t.keys, 4))
    assert len(set(t.keys.tolist())) == 100  # distinct keys


def test_int8_quant_roundtrip_error_bound():
    t = make_synthetic_table(500, 32, seed=2)
    q, s = quantize_rows_int8(t.vectors)
    deq = dequantize_rows(q, s)
    # Symmetric absmax int8: per-element error <= scale/2 = absmax/(2*127).
    absmax = np.abs(t.vectors).max(axis=1, keepdims=True)
    bound = absmax / (2 * 127.0) + 1e-7
    assert np.all(np.abs(deq - t.vectors) <= bound)


def test_fp8_quant_roundtrip_reasonable():
    t = make_synthetic_table(200, 16, seed=4)
    q, s = quantize_rows_fp8(t.vectors)
    deq = dequantize_rows(q, s)
    # e4m3 has ~2 decimal digits; relative row error should be small.
    rel = np.abs(deq - t.vectors).max() / (np.abs(t.vectors).max() + 1e-9)
    assert rel < 0.07


def test_quantized_sidecar_roundtrip(tmp_path):
    t = make_synthetic_table(64, 8)
    q, s = quantize_rows_int8(t.vectors)
    write_quantized_sidecar(tmp_path / "t", q, s)
    q2, s2, meta = read_quantized_sidecar(tmp_path / "t")
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(s, s2)
    assert meta["format"] == "int8-rowwise"
