"""Native single-pass row quantizer (kvstore.cpp hps_quantize_rows).

Pins the bit-exactness contract vs the numpy op chain (same f32 arithmetic,
nearbyintf == np.rint round-half-to-even) and the ``order`` fusion that
replaces the full-table reorder copy on the model-load path.
"""

import numpy as np

from hugectr_backend_tpu.ops.quantize import (
    quantize_rows_int4,
    quantize_rows_int8,
)


def _with_env(monkeypatch, value, fn):
    monkeypatch.setenv("HPS_TPU_NATIVE_QUANTIZE", value)
    return fn()


def test_int8_native_bit_identical_to_numpy(monkeypatch):
    rng = np.random.default_rng(0)
    v = np.concatenate([
        rng.standard_normal((5_000, 64)).astype(np.float32) * 37.5,
        np.zeros((3, 64), np.float32),                    # zero rows: scale 1
        rng.standard_normal((100, 64)).astype(np.float32) * 1e-6,
    ])
    qn, sn = _with_env(monkeypatch, "0", lambda: quantize_rows_int8(v))
    qc, sc = _with_env(monkeypatch, "1", lambda: quantize_rows_int8(v))
    np.testing.assert_array_equal(qn, qc)
    np.testing.assert_array_equal(sn, sc)


def test_int4_native_bit_identical_to_numpy(monkeypatch):
    rng = np.random.default_rng(1)
    v = rng.standard_normal((4_000, 32)).astype(np.float32) * 5
    qn, sn = _with_env(monkeypatch, "0", lambda: quantize_rows_int4(v))
    qc, sc = _with_env(monkeypatch, "1", lambda: quantize_rows_int4(v))
    np.testing.assert_array_equal(qn, qc)
    np.testing.assert_array_equal(sn, sc)


def test_order_fusion_matches_reorder_then_quantize():
    rng = np.random.default_rng(2)
    v = rng.standard_normal((2_000, 16)).astype(np.float32)
    order = rng.permutation(2_000).astype(np.int64)
    q1, s1 = quantize_rows_int8(v[order])
    q2, s2 = quantize_rows_int8(v, order=order)
    np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(s1, s2)
    q3, s3 = quantize_rows_int4(v, order=order)
    q4, s4 = quantize_rows_int4(v[order])
    np.testing.assert_array_equal(q3, q4)
    np.testing.assert_array_equal(s3, s4)


def test_empty_table():
    q, s = quantize_rows_int8(np.zeros((0, 8), np.float32))
    assert q.shape == (0, 8) and s.shape == (0,)


def test_concurrent_pool_runs_no_corruption():
    """Concurrent native quantize/translate calls must not corrupt each
    other: Pool::run serializes whole generations (a cv_done wait releases
    the pool mutex, so without run_mu a second caller could swap fn/bounds
    under the first generation's workers)."""
    from concurrent.futures import ThreadPoolExecutor

    from hugectr_backend_tpu.tiers.hbm import KeyIndex

    rng = np.random.default_rng(3)
    vs = [rng.standard_normal((20_000, 32)).astype(np.float32) for _ in range(4)]
    expected = [quantize_rows_int8(v) for v in vs]
    keys = np.sort(rng.choice(120_000, 40_000, replace=False).astype(np.int64))
    idx, _ = KeyIndex.build(keys)
    q = keys[rng.integers(0, 40_000, 20_000)]
    exp_slots = idx.lookup(q)

    def work(i):
        for _ in range(3):
            qv, sv = quantize_rows_int8(vs[i % 4])
            np.testing.assert_array_equal(qv, expected[i % 4][0])
            np.testing.assert_array_equal(sv, expected[i % 4][1])
            np.testing.assert_array_equal(idx.lookup(q), exp_slots)
        return True

    with ThreadPoolExecutor(max_workers=8) as ex:
        assert all(ex.map(work, range(12)))
