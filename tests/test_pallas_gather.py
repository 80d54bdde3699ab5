"""Pallas grouped-gather kernel parity vs the XLA path (interpret on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hugectr_backend_tpu.ops.dequant_gather import (
    BLOCK_N,
    dequant_gather,
    pallas_grouped_gather,
    to_grouped_layout,
)
from hugectr_backend_tpu.ops.quantize import quantize_rows_int8


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((4100, 128)).astype(np.float32)  # non-multiple of 8
    q, s = quantize_rows_int8(vecs)
    return jnp.asarray(q), jnp.asarray(s), vecs


def test_grouped_layout_pads():
    v = jnp.ones((4100, 128), jnp.int8)
    t3, rpad = to_grouped_layout(v)
    assert t3.shape == (rpad // 8, 8, 128)
    assert rpad == 4104


def test_pallas_grouped_gather_matches_take(table):
    q, s, _ = table
    t3, _ = to_grouped_layout(q)
    rng = np.random.default_rng(1)
    slots = jnp.asarray(rng.integers(0, 4100, 2 * BLOCK_N), jnp.int32)
    scales = jnp.take(s, slots)
    got = pallas_grouped_gather(t3, slots, scales, interpret=True)
    want = jnp.take(q, slots, axis=0).astype(jnp.float32) * scales[:, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_dequant_gather_pallas_vs_xla(table):
    q, s, _ = table
    rng = np.random.default_rng(2)
    # Deliberately non-multiple-of-BLOCK_N count to exercise pad+trim.
    slots = jnp.asarray(rng.integers(0, 4100, 1000), jnp.int32)
    a = dequant_gather(q, s, slots, use_pallas=True, interpret=True)
    b = dequant_gather(q, s, slots, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert a.shape == (1000, 128)


def test_dequant_gather_bf16_no_scales(table):
    _, _, vecs = table
    bf = jnp.asarray(vecs).astype(jnp.bfloat16)
    slots = jnp.asarray(np.random.default_rng(3).integers(0, 4100, 600), jnp.int32)
    a = dequant_gather(bf, None, slots, use_pallas=True, interpret=True)
    b = dequant_gather(bf, None, slots, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dequant_gather_accuracy(table):
    q, s, vecs = table
    slots = jnp.arange(256, dtype=jnp.int32)
    out = np.asarray(dequant_gather(q, s, slots, use_pallas=False))
    ref = vecs[:256]
    absmax = np.abs(ref).max(axis=1, keepdims=True)
    assert np.all(np.abs(out - ref) <= absmax / (2 * 127.0) + 1e-7)


def test_non_128_dim_falls_back(table):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((100, 48)).astype(np.float32)
    q, s = quantize_rows_int8(vecs)
    slots = jnp.asarray(rng.integers(0, 100, 64), jnp.int32)
    out = dequant_gather(jnp.asarray(q), jnp.asarray(s), slots, use_pallas=True)
    want = dequant_gather(jnp.asarray(q), jnp.asarray(s), slots, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
