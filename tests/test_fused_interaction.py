"""Pallas fused DLRM interaction kernel: parity (fwd + grad) vs the XLA
formulation, interpret mode on CPU. On-device timing + bit-parity evidence
lives in bench_artifacts/pallas_interaction.json (v5e: 40.2 us fused vs
107.8 us XLA at batch 4096, parity_rel_err 0.0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.models.dlrm import DLRM, DotInteraction
from hugectr_backend_tpu.ops.fused_interaction import (
    _xla_reference,
    fused_dot_interaction,
)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    bot = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((64, 26, 128)), jnp.float32)
    return bot, emb


def test_forward_parity(inputs):
    bot, emb = inputs
    got = fused_dot_interaction(bot, emb, True)
    want = _xla_reference(bot, emb)
    assert got.shape == (64, 128 + 27 * 26 // 2)
    # Kernel contracts in bf16 (the MXU pass XLA also uses on TPU); CPU's
    # XLA reference contracts in f32, so parity is bf16-tolerance here.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0.12)


def test_gradient_parity(inputs):
    bot, emb = inputs

    def loss(fn):
        return lambda b, e: (fn(b, e) ** 2).sum()

    gp = jax.grad(loss(lambda b, e: fused_dot_interaction(b, e, True)),
                  argnums=(0, 1))(bot, emb)
    gx = jax.grad(loss(_xla_reference), argnums=(0, 1))(bot, emb)
    for a, b in zip(gp, gx):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 5e-3, rel


def test_odd_batch_falls_back(inputs):
    bot, emb = inputs
    got = fused_dot_interaction(bot[:9], emb[:9], True)
    want = _xla_reference(bot[:9], emb[:9])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_module_auto_is_xla_on_cpu(inputs):
    """On the CPU test mesh the module must auto-select the XLA path."""
    bot, emb = inputs
    key = jax.random.PRNGKey(0)
    m_auto = DotInteraction()
    m_xla = DotInteraction(use_pallas=False)
    out_auto = m_auto.apply(m_auto.init(key, bot, emb), bot, emb)
    out_xla = m_xla.apply(m_xla.init(key, bot, emb), bot, emb)
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_xla))


def test_dlrm_end_to_end_unchanged(inputs):
    """Full DLRM forward is unaffected by the kernel plumbing on CPU."""
    rng = np.random.default_rng(3)
    dense = jnp.asarray(rng.standard_normal((16, 13)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((16, 26, 64)), jnp.float32)
    model = DLRM(bottom_widths=(64, 64), top_widths=(64, 1))
    params = model.init(jax.random.PRNGKey(0), dense, emb)
    out = model.apply(params, dense, emb)
    assert out.shape == (16,)
    assert np.isfinite(np.asarray(out)).all()
