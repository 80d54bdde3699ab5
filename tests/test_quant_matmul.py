"""Pallas w8a8 dense layer (ops/quant_matmul.py): interpret-mode parity vs
the XLA formulation, fused activations, no-bias, and ineligible-shape
fallback. On-device timing evidence: bench_artifacts/dense_roofline_w8a8
.json (XLA path) and the w8a8 fused-bench extras."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.ops.quant_matmul import w8a8_dense, xla_w8a8


@pytest.fixture(scope="module")
def layer():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 320)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (320, 256)), jnp.int8)
    ws = jnp.asarray(rng.random(256).astype(np.float32) * 0.01)
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32) * 0.01)
    return x, wq, ws, b


@pytest.mark.parametrize("act", [None, "relu", "sigmoid", "tanh", "gelu"])
def test_kernel_matches_xla(layer, act):
    x, wq, ws, b = layer
    got = w8a8_dense(x, wq, ws, b, act, interpret=True)
    want = xla_w8a8(x, wq, ws, b, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_no_bias(layer):
    x, wq, ws, _ = layer
    got = w8a8_dense(x, wq, ws, None, "relu", interpret=True)
    want = xla_w8a8(x, wq, ws, None, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ineligible_shapes_fall_back(layer):
    x, wq, ws, b = layer
    # Odd batch and narrow N both take the XLA path (still correct).
    got = w8a8_dense(x[:7], wq, ws, b, "relu", interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(xla_w8a8(x[:7], wq, ws, b, "relu")),
                               rtol=1e-5, atol=1e-5)
    wq_n = wq[:, :64]
    got = w8a8_dense(x, wq_n, ws[:64], b[:64], None, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(xla_w8a8(x, wq_n, ws[:64], b[:64])),
                               rtol=1e-5, atol=1e-5)


def test_quantization_error_bounded(layer):
    """End-to-end accuracy: w8a8 layer output stays within a few percent of
    the f32 layer it quantizes (dynamic per-row + per-column scales)."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((320, 256)).astype(np.float32) * 0.05
    from hugectr_backend_tpu.models.quant_dense import quantize_weight

    wq, ws = quantize_weight(w, "w8a8")
    x, _, _, b = layer
    got = np.asarray(w8a8_dense(x, jnp.asarray(wq), jnp.asarray(ws), b,
                                "relu", interpret=True))
    want = np.maximum(np.asarray(x) @ w + np.asarray(b), 0)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.03, rel
