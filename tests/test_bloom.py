"""numpy bloom kernel: no false negatives, low false positives, mergeable."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from scrape_spark.operators import bloom


def test_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**63), 2**63 - 1, size=10_000, dtype=np.int64)
    m = bloom.sizeof_bits(len(keys))
    b = bloom.build(keys, m)
    assert bloom.might_contain(b, keys).all()


def test_false_positive_rate_bounded():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    probes = rng.integers(-(2**63), 2**63 - 1, size=50_000, dtype=np.int64)
    probes = np.setdiff1d(probes, keys)
    m = bloom.sizeof_bits(len(keys))
    b = bloom.build(keys, m)
    fp = bloom.might_contain(b, probes).mean()
    assert fp < 1e-3, f"false positive rate too high: {fp}"


def test_empty_bloom_rejects_everything():
    b = bloom.build(np.array([], dtype=np.int64), 1024)
    assert not bloom.might_contain(b, np.array([1, 2, 3])).any()
    assert bloom.might_contain(b, np.array([], dtype=np.int64)).shape == (0,)


def test_merge_is_union():
    a_keys = np.arange(0, 1000, dtype=np.int64)
    b_keys = np.arange(1000, 2000, dtype=np.int64)
    m = bloom.sizeof_bits(2000)
    merged = bloom.merge([bloom.build(a_keys, m), bloom.build(b_keys, m)])
    assert bloom.might_contain(merged, a_keys).all()
    assert bloom.might_contain(merged, b_keys).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), max_size=200))
def test_membership_property(keys):
    keys = np.array(keys, dtype=np.int64)
    m = bloom.sizeof_bits(max(len(keys), 1))
    b = bloom.build(keys, m)
    if len(keys):
        assert bloom.might_contain(b, keys).all()
