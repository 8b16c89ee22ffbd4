"""Integer PageRank: Spark kernel == pure-Python spec == DuckDB CTE chain,
exactly (int64 fixed-point — no float-summation-order wiggle room)."""

import random

import duckdb
import pytest

from scrape_spark.operators.webrank import (
    SCALE,
    pagerank_int,
    pagerank_py,
    pagerank_sql,
)


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["rank"] for r in pagerank_int(df, **kw).collect()
    }


def test_hub_graph_matches_python_spec(spark):
    # 0 is a hub everyone links to; its own out-mass splits three ways
    edges = [(1, 0), (2, 0), (3, 0), (1, 2), (2, 3), (3, 1),
             (0, 1), (0, 2), (0, 3)]
    got = _spark_ranks(spark, edges)
    want = pagerank_py(edges)
    assert got == want
    assert max(got, key=got.get) == 0  # the hub outranks everyone


def test_random_graphs_match_python_spec_exactly(spark):
    rng = random.Random(7)
    for n, m in [(12, 30), (40, 120)]:
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        got = _spark_ranks(spark, edges, iterations=4)
        assert got == pagerank_py(edges, iterations=4)


def test_duckdb_cte_chain_matches_python_spec():
    rng = random.Random(11)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = pagerank_sql(
        f"SELECT CAST(s AS BIGINT) AS src, CAST(d AS BIGINT) AS dst "
        f"FROM (VALUES {vals}) t(s, d)",
        iterations=3,
    )
    got = dict(duckdb.connect().execute(sql).fetchall())
    assert got == pagerank_py(edges, iterations=3)


def test_overflow_guard_raises(spark):
    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(ValueError, match="overflows int64"):
        pagerank_int(df, scale=2**62)


def test_dangling_mass_decays_not_crashes(spark):
    # node 2 has no out-edges: its rank contributes nothing (documented)
    edges = [(0, 1), (1, 2)]
    got = _spark_ranks(spark, edges)
    assert got == pagerank_py(edges)
    assert set(got) == {0, 1, 2}
    assert got[0] == SCALE * 15 // 100  # nothing links to 0 after step 1
