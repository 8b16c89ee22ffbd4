"""Redirect-chain resolution: parity with a python walk, caps, cycles."""

from __future__ import annotations

from scrape_spark.operators.redirects import resolve_redirects


def pyref_resolve(edges: dict[str, str], src: str, cap: int):
    """Hop-by-hop reference walk: (resolved, hops, terminal)."""
    cur, hops = src, 0
    while hops < cap and cur in edges:
        cur = edges[cur]
        hops += 1
    return cur, hops, cur not in edges


def _run(spark, pairs, max_hops=8):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {
        r.src: (r.resolved, r.hops, r.terminal)
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }


def test_chains_cycles_and_cap_match_pyref(spark):
    # chain a0<-a1<-...<-a9 (length 9 > cap 8), a 2-cycle, a self-loop,
    # a chain feeding INTO the cycle, and a 1-hop redirect
    pairs = [(f"a{i}", f"a{i-1}") for i in range(1, 10)]
    pairs += [("c1", "c2"), ("c2", "c1"), ("s", "s"), ("x", "c1"), ("one", "end")]
    edges = dict(pairs)
    got = _run(spark, pairs, max_hops=8)
    assert set(got) == set(edges)
    for src in edges:
        assert got[src] == pyref_resolve(edges, src, 8), src


def test_cap_rounds_up_to_power_of_two(spark):
    # max_hops=5 -> doubling cap 8: a 7-chain still fully resolves
    pairs = [(f"n{i}", f"n{i-1}") for i in range(1, 8)]
    got = _run(spark, pairs, max_hops=5)
    assert got["n7"] == ("n0", 7, True)


def test_duplicate_sources_deduped(spark):
    got = _run(spark, [("a", "b"), ("a", "b"), ("b", "t")])
    assert got["a"] == ("t", 2, True)
    assert len(got) == 2
