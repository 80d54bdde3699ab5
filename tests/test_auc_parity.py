"""AUC parity of quantized serving vs fp32 — the north-star accuracy gate.

BASELINE.md's accuracy claim is "int8 embedding AUC delta < 0.001" and the
reference CI gates on prediction-correctness clients (reference
.gitlab-ci.yml:71-72). Until round 4 every quantization flavor here was
gated only by elementwise tolerance; this test trains a real (small) DLRM,
serves the SAME checkpoint through the production engine under each
quantization flavor, and gates on the metric that matters. The committed
evidence artifact from the bigger run is bench_artifacts/auc_parity.json
(scripts/auc_parity.py).
"""

import numpy as np
import pytest

from hugectr_backend_tpu.eval.auc_parity import (
    auc,
    make_click_dataset,
    run_parity,
)


def test_auc_estimator():
    """Rank-based AUC: exact on tiny hand cases, tie-correct."""
    assert auc(np.array([0, 1]), np.array([0.1, 0.9])) == 1.0
    assert auc(np.array([1, 0]), np.array([0.1, 0.9])) == 0.0
    assert auc(np.array([0, 1]), np.array([0.5, 0.5])) == 0.5
    labels = np.array([0, 0, 1, 1, 1])
    scores = np.array([0.1, 0.4, 0.35, 0.8, 0.8])
    # Pairs: (0.1 vs each pos: 3 wins) + (0.4 vs 0.35 lose, vs 0.8 win x2)
    assert auc(labels, scores) == pytest.approx(5 / 6)


def test_dataset_has_learnable_signal():
    data = make_click_dataset(20_000, vocab=500, num_feats=8, seed=1)
    # The generative logit itself separates labels far above chance — a
    # perfect model could reach high AUC; a trained one lands in between.
    assert 0.2 < data.base_rate < 0.8
    assert len(np.unique(data.key_ids)) == 500


@pytest.fixture(scope="module")
def parity():
    return run_parity(
        n_train=30_000, n_eval=10_000, vocab=1500, dim=16, num_feats=26,
        steps=250, seed=0,
    )


def test_int8_auc_parity_north_star(parity):
    """int8 lookup serving: AUC delta < 0.001 vs fp32 serving (BASELINE.md
    north star — previously asserted in prose, never measured)."""
    assert parity["auc"]["fp32"] > 0.60, parity["auc"]  # model really learned
    assert abs(parity["delta_vs_fp32"]["int8"]) < 1e-3, parity


def test_int4_auc_within_documented_gate(parity):
    """int4 (docs/configuration.md: 'AUC gate 0.01') — now measured."""
    assert abs(parity["delta_vs_fp32"]["int4"]) < 1e-2, parity


def test_fp8_and_dense_flavors_measured(parity):
    """fp8 lookup and the dense int8/fp8/w8a8 flavors: deltas recorded and
    bounded (accuracy opt-ins — the claim is 'small, measured', not the
    int8 north star)."""
    for name in ("fp8", "int8+dense_int8", "int8+dense_fp8",
                 "int8+dense_w8a8"):
        assert abs(parity["delta_vs_fp32"][name]) < 5e-3, (name, parity)
