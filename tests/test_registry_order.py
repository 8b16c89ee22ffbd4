"""The driver's correctness gate samples the FIRST 50 registered queries.

r5: the window is a fixed crawl CORE plus a 34-name slice that rotates by
round (phase = number of CORRECTNESS_r*.json files), so every registered
query runs in the driver's ENVIRONMENT once every 4 rounds — the r4 lesson
was that a curated static prefix left 102 queries never driver-checked and
an environment-sensitive kernel sat undetected in that tail. These tests
pin the partition: prefix = sample, rotation disjoint + exhaustive, core
always oracle-backed, reorder a pure permutation.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_driver_sample_is_the_registry_prefix():
    names = list(entry.queries())
    sample = entry._driver_sample()
    assert len(sample) == 50
    assert names[: len(sample)] == sample
    assert len(set(names)) == len(names)


def test_core_always_present_and_first():
    sample = entry._driver_sample()
    assert sample[: len(entry._DRIVER_CORE)] == entry._DRIVER_CORE
    for phase in range(8):
        s = entry._driver_sample(phase)
        assert s[: len(entry._DRIVER_CORE)] == entry._DRIVER_CORE


def test_rotation_covers_every_query_within_a_cycle():
    """Consecutive phase windows partition the non-core names: with
    136 = 4 x 34 the four windows are DISJOINT and their union is the
    whole registry — every query driver-checked once per 4 rounds."""
    all_names = set(entry.queries())
    non_core = all_names - set(entry._DRIVER_CORE)
    n, k = len(non_core), entry._DRIVER_ROTATION
    cycle = -(-n // k)  # ceil
    windows = [
        set(entry._driver_sample(p)) - set(entry._DRIVER_CORE)
        for p in range(cycle)
    ]
    assert set().union(*windows) == non_core
    if n % k == 0:  # exact division => disjoint phases
        assert sum(len(w) for w in windows) == n
    # phases repeat with the cycle
    assert entry._driver_sample(0) == entry._driver_sample(cycle)


def test_core_queries_all_have_oracles():
    """The always-checked crawl core must never degrade to rows-only
    checks; rotating names may be rows-only by design (non-SQL ops)."""
    oracles = entry.oracle_sql()
    no_oracle = [n for n in entry._DRIVER_CORE if n not in oracles]
    assert not no_oracle, no_oracle
