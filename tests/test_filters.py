"""Bloom/cuckoo filter unit tests (SURVEY.md §2 B4/B5 prefilters)."""

import numpy as np
import pytest

from spider_spark.functions.filters import BloomFilter, CuckooFilter


def test_bloom_no_false_negatives():
    bf = BloomFilter(1000)
    keys = [f"http://h{i}.example/d/{i}" for i in range(1000)]
    bf.add_many(keys)
    assert all(k in bf for k in keys)


def test_bloom_fpr_bounded():
    bf = BloomFilter(2000, bits_per_key=10)
    bf.add_many(f"key-{i}" for i in range(2000))
    fp = sum(f"other-{i}" in bf for i in range(10000))
    assert fp / 10000 < 0.05  # ~1% expected at 10 bits/key


def test_bloom_series_probe():
    import pandas as pd

    bf = BloomFilter(100)
    bf.add("a")
    out = bf.contains_series(pd.Series(["a", "b", None]))
    assert out.tolist()[0] is True or out.tolist()[0] == True  # noqa: E712
    assert out.tolist()[2] == False  # noqa: E712


def test_bloom_deterministic_across_instances():
    a, b = BloomFilter(100), BloomFilter(100)
    for k in ("x", "y", "z"):
        a.add(k)
        b.add(k)
    assert np.array_equal(a.bits, b.bits)


def test_cuckoo_insert_delete_contains():
    cf = CuckooFilter(1000)
    keys = [f"url-{i}" for i in range(800)]
    for k in keys:
        assert cf.add(k)
    assert all(k in cf for k in keys)
    # deletion — the capability Bloom lacks (force-requeue B5)
    for k in keys[:100]:
        assert cf.delete(k)
    misses = sum(k in cf for k in keys[:100])
    # fingerprint collisions may leave a few phantom hits, never many
    assert misses < 10
    assert all(k in cf for k in keys[100:])


def test_cuckoo_full_table_reports_failure():
    cf = CuckooFilter(16)
    ok = sum(cf.add(f"k{i}") for i in range(200))
    assert ok < 200  # must signal saturation, not silently drop


def test_bloom_hash_array_api_no_false_negatives():
    """The engine hot path: vectorized add/probe over 64-bit hash pairs
    (JVM xxhash64 stand-ins) — no false negatives, bounded FPR."""
    rng = np.random.default_rng(7)
    h1 = rng.integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    h2 = rng.integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    bf = BloomFilter(5000, bits_per_key=10)
    bf.add_hash_arrays(h1, h2)
    assert bf.contains_hash_arrays(h1, h2).all()
    o1 = rng.integers(0, 2**63, size=20000, dtype=np.int64).view(np.uint64)
    o2 = rng.integers(0, 2**63, size=20000, dtype=np.int64).view(np.uint64)
    fpr = bf.contains_hash_arrays(o1, o2).mean()
    assert fpr < 0.05


def test_bloom_hash_array_negative_int64_wraps():
    """Signed xxhash64 values (negative int64) must round-trip through
    the uint64 view identically on build and probe."""
    h1 = np.array([-1, -(2**62), 5], dtype=np.int64).view(np.uint64)
    h2 = np.array([-3, 7, -(2**40)], dtype=np.int64).view(np.uint64)
    bf = BloomFilter(64)
    bf.add_hash_arrays(h1, h2)
    assert bf.contains_hash_arrays(h1, h2).all()
