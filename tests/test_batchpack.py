"""Batch merge/regroup (serving/batchpack.py): native vs numpy parity.

These two memcpy ops carry every serving response; the native path
(kvstore.cpp hps_merge_requests / hps_regroup_responses) must be
bit-identical to the numpy fallback, including padded table runs, empty
per-(request, table) counts, and single-request batches.
"""

import numpy as np
import pytest

from hugectr_backend_tpu.serving import batchpack


def _merge_ref(keys_list, counts):
    n_reqs, n_tables = counts.shape
    offs = np.zeros((n_reqs, n_tables + 1), np.int64)
    np.cumsum(counts, axis=1, out=offs[:, 1:])
    return [
        np.concatenate([
            keys_list[r][offs[r, t] : offs[r, t + 1]] for r in range(n_reqs)
        ])
        for t in range(n_tables)
    ]


def _regroup_ref(flat, tstarts, dims, counts):
    n_reqs, n_tables = counts.shape
    in_off = np.zeros(n_tables, np.int64)
    parts = []
    for r in range(n_reqs):
        for t in range(n_tables):
            lo = int(tstarts[t]) + int(in_off[t]) * int(dims[t])
            parts.append(flat[lo : lo + int(counts[r, t]) * int(dims[t])])
            in_off[t] += counts[r, t]
    return np.concatenate(parts) if parts else np.empty(0, np.float32)


@pytest.mark.parametrize("n_reqs,n_tables,seed", [
    (1, 3, 0), (4, 26, 1), (7, 5, 2), (3, 1, 3),
])
def test_merge_and_regroup_parity(n_reqs, n_tables, seed):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 40, (n_reqs, n_tables)).astype(np.int64)
    counts[0, 0] = 0  # empty (request, table) cell
    keys_list = [
        rng.integers(0, 1 << 40, int(c.sum())).astype(np.int64)
        for c in counts
    ]
    merged = batchpack.merge_requests(keys_list, counts)
    want = _merge_ref(keys_list, counts)
    for got, w in zip(merged, want):
        np.testing.assert_array_equal(got, w)

    # Regroup a padded table-major flat output.
    dims = rng.integers(1, 9, n_tables).astype(np.int64)
    totals = counts.sum(axis=0)
    pads = totals + rng.integers(0, 5, n_tables)  # padded runs
    tstarts = np.zeros(n_tables, np.int64)
    np.cumsum(pads[:-1] * dims[:-1], out=tstarts[1:])
    flat = rng.standard_normal(int((pads * dims).sum())).astype(np.float32)
    out, offsets = batchpack.regroup_responses(flat, tstarts, dims, counts)
    np.testing.assert_array_equal(out, _regroup_ref(flat, tstarts, dims,
                                                    counts))
    sizes = counts @ dims
    np.testing.assert_array_equal(np.diff(offsets), sizes)


def test_numpy_fallback_matches_native(monkeypatch):
    """Force the fallback and compare against the (normally-native) path."""
    rng = np.random.default_rng(9)
    counts = rng.integers(0, 30, (5, 8)).astype(np.int64)
    keys_list = [
        rng.integers(0, 1 << 40, int(c.sum())).astype(np.int64)
        for c in counts
    ]
    dims = rng.integers(1, 6, 8).astype(np.int64)
    totals = counts.sum(axis=0)
    tstarts = np.zeros(8, np.int64)
    np.cumsum(totals[:-1] * dims[:-1], out=tstarts[1:])
    flat = rng.standard_normal(int((totals * dims).sum())).astype(np.float32)

    m_native = batchpack.merge_requests(keys_list, counts)
    r_native, o_native = batchpack.regroup_responses(
        flat, tstarts, dims, counts)
    monkeypatch.setattr(batchpack, "_lib", None)
    monkeypatch.setattr(batchpack, "_checked", True)
    m_py = batchpack.merge_requests(keys_list, counts)
    r_py, o_py = batchpack.regroup_responses(flat, tstarts, dims, counts)
    for a, b in zip(m_native, m_py):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(r_native, r_py)
    np.testing.assert_array_equal(o_native, o_py)
