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


def test_anchor_text_agg_counts_and_tiebreak(spark):
    from scrape_spark.operators.webrank import anchor_text_agg

    rows = (
        [("u1", "click here")] * 3
        + [("u1", "spark docs")] * 3  # tie with 'click here' → lexi-largest
        + [("u1", "misc")]
        + [("u2", "solo")]
    )
    links = spark.createDataFrame(rows, "link_url string, anchor string")
    out = {r["url"]: r for r in anchor_text_agg(links).collect()}
    u1 = out["u1"]
    assert u1["n_inlinks"] == 7 and u1["n_anchors"] == 3
    assert u1["top_anchor"] == "spark docs" and u1["top_anchor_count"] == 3
    assert out["u2"]["top_anchor"] == "solo" and out["u2"]["n_inlinks"] == 1


def test_anchor_text_agg_no_python_and_single_window(spark):
    from scrape_spark.operators.webrank import anchor_text_agg

    links = spark.createDataFrame([("u", "a")], "link_url string, anchor string")
    plan = anchor_text_agg(links)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_hits_matches_py_spec(spark):
    from scrape_spark.operators.webrank import hits_int, hits_py

    edges = [(1, 2), (1, 3), (4, 2), (4, 3), (2, 5), (3, 5), (5, 1), (6, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits_int(df, iterations=3).collect()}
    assert got == hits_py(edges, iterations=3)


def test_hits_hub_authority_separation(spark):
    from scrape_spark.operators.webrank import hits_int

    # pure bipartite: 1,2 are hubs pointing at 3,4,5 (authorities)
    edges = [(h, a) for h in (1, 2) for a in (3, 4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits_int(df, iterations=2).collect()}
    for h in (1, 2):
        assert got[h][0] > 0 and got[h][1] == 0, got
    for a in (3, 4, 5):
        assert got[a][0] == 0 and got[a][1] > 0, got


def test_hits_guards(spark):
    import pytest

    from scrape_spark.operators.webrank import hits_int

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits_int(df, iterations=0)
    with pytest.raises(ValueError, match="overflows"):
        hits_int(df, scale=2**62)


def test_hits_duplicate_edges_collapse(spark):
    from scrape_spark.operators.webrank import hits_int, hits_py

    simple = [(1, 2), (2, 3)]
    multi = simple + [(1, 2)] * 5
    df = spark.createDataFrame(multi, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits_int(df, iterations=2).collect()}
    assert got == hits_py(simple, iterations=2)
    assert got == hits_py(multi, iterations=2)  # spec dedupes too


# ---------------------------------------------------------------------------
# TrustRank
# ---------------------------------------------------------------------------
def _spark_trust(spark, edges, seeds, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    from scrape_spark.operators.webrank import trustrank_int

    return {
        r["node"]: r["trust"]
        for r in trustrank_int(df, seeds, **kw).collect()
    }


def test_trustrank_matches_python_spec(spark):
    from scrape_spark.operators.webrank import trustrank_py

    rng = random.Random(3)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    seeds = [0, 7]
    got = _spark_trust(spark, edges, seeds, iterations=4)
    assert got == trustrank_py(edges, seeds, iterations=4)


def test_trustrank_unreachable_scores_zero(spark):
    # two components: seed in {0,1,2}; {10,11} never receives trust
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)]
    got = _spark_trust(spark, edges, [0])
    assert got[10] == 0 and got[11] == 0
    assert got[0] > 0 and got[1] > 0 and got[2] > 0
    # forward-only: node 1 (one hop from the seed) outranks node 2 (two hops)
    assert got[1] > got[2]


def test_trustrank_duckdb_chain_matches_python_spec():
    from scrape_spark.operators.webrank import trustrank_py, trustrank_sql

    rng = random.Random(5)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(55)]
    seeds = [1, 4, 9]
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    seed_sql = " UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS node" for s in seeds
    )
    sql = trustrank_sql(
        f"SELECT CAST(s AS BIGINT) AS src, CAST(d AS BIGINT) AS dst "
        f"FROM (VALUES {vals}) t(s, d)",
        seed_sql,
        iterations=3,
    )
    got = dict(duckdb.connect().execute(sql).fetchall())
    assert got == trustrank_py(edges, seeds, iterations=3)


def test_trustrank_guards(spark):
    from scrape_spark.operators.webrank import trustrank_int

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="non-empty seed"):
        trustrank_int(df, [])
    with pytest.raises(ValueError, match="overflows int64"):
        trustrank_int(df, [0, 1], scale=2**62)


def test_trustrank_seed_outside_graph_is_kept(spark):
    # a vetted seed with no edges still appears, holding its teleport mass
    got = _spark_trust(spark, [(0, 1)], [5], iterations=2)
    assert 5 in got and got[5] > 0
    assert got[1] == 0  # not reachable from the seed


# ---------------------------------------------------------------------------
# host_graph contraction
# ---------------------------------------------------------------------------
def test_host_graph_folds_subdomains_and_drops_intra(spark):
    from scrape_spark.operators.webrank import host_graph

    edges = [
        ("a.example.co.uk", "b.example.co.uk"),   # intra-domain: dropped
        ("a.example.co.uk", "www.other.test"),
        ("sub.example.co.uk", "www.other.test"),  # folds with the above
        ("www.other.test", "x.example.co.uk"),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {
        (r["src_domain"], r["dst_domain"]): r["weight"]
        for r in host_graph(df).collect()
    }
    assert got == {
        ("example.co.uk", "other.test"): 2,
        ("other.test", "example.co.uk"): 1,
    }


def test_link_reciprocity_semantics(spark):
    from scrape_spark.operators.webrank import link_reciprocity

    edges = [
        ("a.test", "b.test"), ("b.test", "a.test"),   # mutual pair
        ("a.test", "c.test"),                           # one-way
        ("c.test", "d.test"), ("c.test", "d.test"),    # dup edge collapses
    ]
    df = spark.createDataFrame(edges, "src_domain string, dst_domain string")
    got = {
        r["domain"]: (r["n_out"], r["n_reciprocal"], r["reciprocity_pct"])
        for r in link_reciprocity(df).collect()
    }
    assert got["a.test"] == (2, 1, 50)
    assert got["b.test"] == (1, 1, 100)
    assert got["c.test"] == (1, 0, 0)
    assert "d.test" not in got  # no out-edges, no row


# ---------------------------------------------------------------------------
# OPIC
# ---------------------------------------------------------------------------


def _spark_opic(spark, edges, **kw):
    from scrape_spark.operators.webrank import opic_int

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["cash"], r["hist"])
        for r in opic_int(df, **kw).collect()
    }


def test_opic_matches_python_spec_with_dangling(spark):
    from scrape_spark.operators.webrank import opic_py

    # 3 and 4 are dangling: their cash must route through the virtual root
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (1, 0)]
    got = _spark_opic(spark, edges, iterations=4)
    assert got == opic_py(edges, iterations=4)


def test_opic_random_graphs_match_python_spec(spark):
    from scrape_spark.operators.webrank import opic_py
    import random

    rng = random.Random(23)
    for n, m in [(10, 18), (30, 55)]:
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = _spark_opic(spark, edges, iterations=3)
        assert got == opic_py(edges, iterations=3)


def test_opic_duckdb_chain_matches_python_spec():
    from scrape_spark.operators.webrank import opic_py, opic_sql
    import random

    rng = random.Random(31)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(35)]
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = opic_sql(
        f"SELECT CAST(s AS BIGINT) AS src, CAST(d AS BIGINT) AS dst "
        f"FROM (VALUES {vals}) t(s, d)",
        iterations=3,
    )
    got = {
        n: (c, h) for n, c, h in duckdb.connect().execute(sql).fetchall()
    }
    assert got == opic_py(edges, iterations=3)


def test_opic_mass_conserved_within_truncation(spark):
    # floor division only LOSES mass: total cash never exceeds n*scale,
    # and with the root forwarding every round it stays close to it
    from scrape_spark.operators.webrank import opic_py

    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]  # 3 dangling
    res = opic_py(edges, iterations=5)
    total = sum(c for c, _ in res.values())
    n = 4
    assert total <= n * SCALE
    assert total >= n * SCALE - 5 * n * 10  # tiny truncation loss only


def test_opic_hist_is_priority_signal(spark):
    # everyone links to 0: its accumulated history dominates
    from scrape_spark.operators.webrank import opic_py

    edges = [(1, 0), (2, 0), (3, 0), (0, 1)]
    res = opic_py(edges, iterations=4)
    hist = {v: h for v, (_, h) in res.items()}
    assert max(hist, key=hist.get) == 0


def test_opic_guards(spark):
    from scrape_spark.operators.webrank import opic_int

    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(ValueError, match="overflows int64"):
        opic_int(df, scale=2**61)
    with pytest.raises(ValueError, match="iterations"):
        opic_int(df, iterations=0)
    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="non-empty"):
        opic_int(empty)


# ---------------------------------------------------------------------------
# Spam mass
# ---------------------------------------------------------------------------


def test_spam_mass_separates_farm_from_trusted(spark):
    from scrape_spark.operators.webrank import spam_mass_int

    # trusted core: 0 <-> 1; spam farm: 10..13 all link to 9 (the boosted
    # target), farm is unreachable from the seed
    edges = [(0, 1), (1, 0)] + [(i, 9) for i in (10, 11, 12, 13)] + [
        (9, 10), (9, 11),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = {
        r["node"]: r["spam_mass_pct"]
        for r in spam_mass_int(df, seeds=[0], iterations=3).collect()
    }
    assert res[9] == 100  # zero trust reaches the farm target
    assert res[0] < 50 and res[1] < 100  # the trusted pair keeps low mass


def test_spam_mass_duckdb_matches_spark(spark):
    from scrape_spark.operators.webrank import spam_mass_int, spam_mass_sql
    import random

    rng = random.Random(41)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(30)]
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    edges_sql = (
        f"SELECT CAST(s AS BIGINT) AS src, CAST(d AS BIGINT) AS dst "
        f"FROM (VALUES {vals}) t(s, d)"
    )
    seeds_sql = "SELECT CAST(0 AS BIGINT) AS node UNION ALL SELECT 3"
    want = {
        n: (r, ts, sm)
        for n, r, ts, sm in duckdb.connect()
        .execute(spam_mass_sql(edges_sql, seeds_sql, iterations=3))
        .fetchall()
    }
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["rank"], r["trust_scaled"], r["spam_mass_pct"])
        for r in spam_mass_int(df, seeds=[0, 3], iterations=3).collect()
    }
    assert got == want


def test_spam_mass_guard_empty_seeds(spark):
    from scrape_spark.operators.webrank import spam_mass_int

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="non-empty seed"):
        spam_mass_int(df, seeds=[])


def test_opic_warm_start_equals_straight_run(spark):
    # k iterations, then m more from the persisted state == k+m straight —
    # the exactness that lets the crawl advance OPIC incrementally per round
    from scrape_spark.operators.webrank import opic_int, opic_py

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (1, 0), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    straight = {
        r["node"]: (r["cash"], r["hist"])
        for r in opic_int(df, iterations=5).collect()
    }
    first = opic_int(df, iterations=2)
    resumed = {
        r["node"]: (r["cash"], r["hist"])
        for r in opic_int(df, iterations=3, init=first).collect()
    }
    assert resumed == straight
    # python spec agrees on the same split
    py2 = opic_py(edges, iterations=2)
    assert opic_py(edges, iterations=3, init=py2) == opic_py(
        edges, iterations=5
    )


def test_opic_warm_start_new_nodes_get_fresh_cash(spark):
    # adaptive case: the graph grew between runs; the new node enters with
    # cash=scale, hist=0 (the paper's new-page rule) and old state carries
    from scrape_spark.operators.webrank import opic_int, opic_py

    old_edges = [(0, 1), (1, 0)]
    new_edges = old_edges + [(1, 2), (2, 0)]
    df_old = spark.createDataFrame(old_edges, "src long, dst long")
    df_new = spark.createDataFrame(new_edges, "src long, dst long")
    st = opic_int(df_old, iterations=2)
    got = {
        r["node"]: (r["cash"], r["hist"])
        for r in opic_int(df_new, iterations=1, init=st).collect()
    }
    want = opic_py(new_edges, iterations=1, init=opic_py(old_edges, iterations=2))
    assert got == want


# -- graph shape report ---------------------------------------------------------


def test_graph_stats_hand_computed(spark):
    from scrape_spark.operators.webrank import graph_stats

    edges = spark.createDataFrame(
        [
            (1, 2), (1, 2),  # duplicate edge
            (1, 3),
            (2, 2),  # self loop
            (3, 4),  # 4 is dangling
        ],
        "src long, dst long",
    )
    r = graph_stats(edges).head()
    assert r["n_nodes"] == 4 and r["n_edges"] == 5
    assert r["n_distinct_edges"] == 4 and r["n_self_loops"] == 1
    assert r["n_dangling"] == 1  # only node 4
    assert r["max_out_degree"] == 2  # node 1
    assert r["avg_out_degree_q4"] == 10000 * 4 // 4


def test_graph_stats_empty(spark):
    from scrape_spark.operators.webrank import graph_stats

    edges = spark.createDataFrame([], "src long, dst long")
    r = graph_stats(edges).head()
    assert r["n_nodes"] == 0 and r["n_edges"] == 0
    assert r["max_out_degree"] == 0 and r["avg_out_degree_q4"] == 0


def test_graph_stats_null_endpoints_excluded(spark):
    from scrape_spark.operators.webrank import graph_stats

    edges = spark.createDataFrame(
        [(1, 2), (1, None), (None, 3)], "src long, dst long"
    )
    r = graph_stats(edges).head()
    assert r["n_edges"] == 1 and r["n_nodes"] == 2 and r["n_dangling"] == 1
