"""Native C++ DRAM KV store: parity with the numpy tier + randomized churn."""

import numpy as np
import pytest

from hugectr_backend_tpu.config.params import (
    DatabaseOverflowPolicy,
    VolatileDatabaseParams,
)
from hugectr_backend_tpu.tiers.dram import DramKVTier


def _tiers():
    yield "numpy", DramKVTier
    try:
        from hugectr_backend_tpu.native.kvstore import NativeDramKVTier

        NativeDramKVTier()  # probes the build
        yield "native", NativeDramKVTier
    except Exception as e:  # pragma: no cover - build env issue
        pytest.fail(f"native kvstore unavailable: {e}")


@pytest.mark.parametrize("name,cls", list(_tiers()))
def test_insert_query_evict(name, cls):
    tier = cls(VolatileDatabaseParams(num_partitions=4))
    keys = np.array([1, 2, 3, 1 << 40, -7], dtype=np.int64)
    vecs = np.arange(20, dtype=np.float32).reshape(5, 4)
    tier.insert("t", keys, vecs)
    assert tier.size("t") == 5
    out, found = tier.query("t", np.array([3, 99, -7], dtype=np.int64))
    assert found.tolist() == [True, False, True]
    np.testing.assert_array_equal(out[0], vecs[2])
    np.testing.assert_array_equal(out[1], np.zeros(4))
    np.testing.assert_array_equal(out[2], vecs[4])
    # upsert overwrites
    tier.insert("t", keys[:1], vecs[:1] + 100)
    out2, _ = tier.query("t", keys[:1])
    np.testing.assert_array_equal(out2[0], vecs[0] + 100)
    assert tier.size("t") == 5
    # evict
    n = tier.evict("t", np.array([1, 2, 12345], dtype=np.int64))
    assert n == 2
    assert tier.size("t") == 3
    assert set(tier.keys("t").tolist()) == {3, 1 << 40, -7}


@pytest.mark.parametrize("name,cls", list(_tiers()))
def test_randomized_churn_against_dict(name, cls):
    """Model-based test: random insert/evict/query vs a python dict."""
    rng = np.random.default_rng(7)
    tier = cls(VolatileDatabaseParams(num_partitions=3))
    model: dict[int, np.ndarray] = {}
    dim = 8
    for step in range(30):
        op = rng.integers(0, 3)
        ks = rng.integers(-50, 50, size=rng.integers(1, 40)).astype(np.int64)
        ks = np.unique(ks)
        if op == 0:  # insert
            vs = rng.standard_normal((len(ks), dim)).astype(np.float32)
            tier.insert("t", ks, vs)
            for k, v in zip(ks.tolist(), vs):
                model[k] = v
        elif op == 1 and model:  # evict
            tier.evict("t", ks)
            for k in ks.tolist():
                model.pop(k, None)
        elif "t" in tier.tables():  # query
            out, found = tier.query("t", ks)
            for i, k in enumerate(ks.tolist()):
                if k in model:
                    assert found[i], f"step {step}: key {k} should be found"
                    np.testing.assert_array_equal(out[i], model[k])
                else:
                    assert not found[i], f"step {step}: key {k} should be absent"
    if "t" in tier.tables():
        assert tier.size("t") == len(model)
        assert set(tier.keys("t").tolist()) == set(model.keys())


@pytest.mark.parametrize("name,cls", list(_tiers()))
@pytest.mark.parametrize(
    "policy",
    [
        DatabaseOverflowPolicy.EVICT_RANDOM,
        DatabaseOverflowPolicy.EVICT_LEAST_USED,
        DatabaseOverflowPolicy.EVICT_OLDEST,
    ],
)
def test_overflow_eviction(name, cls, policy):
    p = VolatileDatabaseParams(
        num_partitions=2,
        overflow_margin=100,
        overflow_policy=policy,
        overflow_resolution_target=0.5,
    )
    tier = cls(p)
    keys = np.arange(400, dtype=np.int64)
    vecs = np.tile(keys.astype(np.float32)[:, None], (1, 4))
    # insert in chunks so eviction triggers repeatedly
    for i in range(0, 400, 50):
        tier.insert("t", keys[i : i + 50], vecs[i : i + 50])
    assert tier.size("t") <= 100
    live = tier.keys("t")
    out, found = tier.query("t", live)
    assert found.all()
    np.testing.assert_array_equal(out[:, 0], live.astype(np.float32))


def test_native_is_default_when_built():
    from hugectr_backend_tpu.native.kvstore import NativeDramKVTier
    from hugectr_backend_tpu.tiers.dram import make_dram_tier

    tier = make_dram_tier()
    assert isinstance(tier, NativeDramKVTier)


def test_native_bulk_throughput_smoke():
    """Native store must handle ~1M-row bulk ops in well under a second
    (the reference's DB tiers are micro/millisecond-class, README.md:193)."""
    import time

    from hugectr_backend_tpu.native.kvstore import NativeDramKVTier

    tier = NativeDramKVTier(VolatileDatabaseParams(num_partitions=8))
    n, dim = 500_000, 32
    keys = np.arange(n, dtype=np.int64)
    vecs = np.random.default_rng(0).standard_normal((n, dim)).astype(np.float32)
    t0 = time.perf_counter()
    tier.insert("t", keys, vecs)
    t_insert = time.perf_counter() - t0
    q = np.random.default_rng(1).integers(0, n, 100_000).astype(np.int64)
    t0 = time.perf_counter()
    out, found = tier.query("t", q)
    t_query = time.perf_counter() - t0
    assert found.all()
    np.testing.assert_array_equal(out[:, 0], vecs[q, 0])
    assert t_insert < 5.0, f"bulk insert too slow: {t_insert:.2f}s"
    assert t_query < 1.0, f"bulk query too slow: {t_query:.2f}s"


@pytest.mark.parametrize("name,cls", list(_tiers()))
def test_duplicate_keys_in_one_batch(name, cls):
    """A key repeated within ONE insert batch must behave like sequential
    upserts (LAST value wins, one row) — the numpy tier used to allocate an
    orphan arena row per duplicate, inflating size() and KeyError-ing a
    later eviction."""
    t = cls()
    t.create_table("hps_et.d.t", 4)
    keys = np.array([5, 5, 9, 5], np.int64)
    vecs = np.arange(16, dtype=np.float32).reshape(4, 4)
    t.insert("hps_et.d.t", keys, vecs)
    assert t.size("hps_et.d.t") == 2
    out, found = t.query("hps_et.d.t", np.array([5, 9], np.int64))
    assert found.all()
    np.testing.assert_array_equal(out[0], vecs[3])  # last occurrence of 5
    np.testing.assert_array_equal(out[1], vecs[2])
    # Eviction of the whole table must not crash on orphan rows.
    assert t.evict("hps_et.d.t", np.array([5, 9], np.int64)) == 2
    assert t.size("hps_et.d.t") == 0
