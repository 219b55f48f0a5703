"""Sketch accuracy + mergeability (driver-side, no Ray needed)."""

import numpy as np
import pyarrow as pa

from python_fastjsonschema_ray.state.sketches import (
    HyperLogLog, TDigest, hash64_array)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(42)
    a = rng.integers(0, 50_000, 100_000)
    b = rng.integers(25_000, 75_000, 100_000)
    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add_hashes(hash64_array(pa.array(a, type=pa.int64())))
    h2.add_hashes(hash64_array(pa.array(b, type=pa.int64())))
    true_1 = len(np.unique(a))
    est_1 = h1.estimate()
    assert abs(est_1 - true_1) / true_1 < 0.03
    merged = h1.merge(h2)
    true_u = len(np.unique(np.concatenate([a, b])))
    assert abs(merged.estimate() - true_u) / true_u < 0.03


def test_hll_strings():
    values = pa.array(['user-{}'.format(i % 1000) for i in range(10_000)])
    h = HyperLogLog()
    h.add_hashes(hash64_array(values))
    assert abs(h.estimate() - 1000) / 1000 < 0.05


def test_hll_serialize_roundtrip():
    h = HyperLogLog()
    h.add_hashes(hash64_array(pa.array(list(range(1000)), type=pa.int64())))
    h2 = HyperLogLog.deserialize(h.serialize())
    assert h2.estimate() == h.estimate()


def test_tdigest_quantiles():
    rng = np.random.default_rng(7)
    data = rng.normal(100, 15, 200_000)
    td = TDigest()
    for chunk in np.array_split(data, 20):
        td.add(chunk)
    for q in (0.1, 0.5, 0.9, 0.99):
        true = np.quantile(data, q)
        est = td.quantile(q)
        assert abs(est - true) < 1.0, (q, true, est)


def test_tdigest_merge():
    rng = np.random.default_rng(11)
    data = rng.exponential(10, 100_000)
    t1, t2 = TDigest(), TDigest()
    t1.add(data[:50_000])
    t2.add(data[50_000:])
    t1.merge(t2)
    for q in (0.5, 0.9):
        assert abs(t1.quantile(q) - np.quantile(data, q)) \
            < 0.05 * max(np.quantile(data, q), 1)


def test_tdigest_serialize_roundtrip():
    td = TDigest()
    td.add(np.arange(1000.0))
    td2 = TDigest.deserialize(td.serialize())
    assert td2.quantile(0.5) == td.quantile(0.5)


def test_hash64_stability():
    arr = pa.array(['a', 'b', None, 'a'])
    h = hash64_array(arr)
    assert h[0] == h[3]
    assert h[0] != h[1]
    # Stable across calls/processes (blake2b, not PYTHONHASHSEED).
    assert list(hash64_array(pa.array(['a']))) == [h[0]]
