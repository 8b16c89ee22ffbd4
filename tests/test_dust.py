"""DUST rule mining + application: Spark == DuckDB, semantics pinned."""

import duckdb

from scrape_spark.operators.dust import (
    apply_dust_rules,
    apply_dust_rules_sql,
    dust_rules,
    dust_rules_sql,
)

PAGES = [
    # h.test: sid is a session id on a and b (same sha), content-relevant on c
    ("http://h.test/a?sid=1&x=2", "AAA"),
    ("http://h.test/a?x=2", "AAA"),
    ("http://h.test/b?sid=9", "BBB"),
    ("http://h.test/b", "BBB"),
    ("http://h.test/c?sid=3", "CCC"),
    ("http://h.test/c", "DDD"),
    # i.test: no evidence at all (candidate never observed)
    ("http://i.test/p?x=1", "EEE"),
]


def _pages_sql() -> str:
    vals = ", ".join(f"('{u}', '{h}')" for u, h in PAGES)
    return f"SELECT * FROM (VALUES {vals}) t(url, content_sha)"


def _spark_pages(spark):
    return spark.createDataFrame(PAGES, "url string, content_sha string")


def test_mining_semantics(spark):
    got = {
        (r["host"], r["param"]): (r["n_tried"], r["support"], r["confidence_pct"])
        for r in dust_rules(_spark_pages(spark), min_support=1).collect()
    }
    # sid tried on a, b, c; supported on a and b (c's hash differs)
    assert got == {("h.test", "sid"): (3, 2, 66)}


def test_min_support_gate(spark):
    # raising min_support above the evidence kills the rule
    assert dust_rules(_spark_pages(spark), min_support=3).count() == 0


def test_mining_matches_duckdb(spark):
    want = sorted(
        map(tuple, duckdb.sql(dust_rules_sql(_pages_sql(), 1)).fetchall())
    )
    got = sorted(
        tuple(r)
        for r in dust_rules(_spark_pages(spark), min_support=1)
        .select("host", "param", "n_tried", "support", "confidence_pct")
        .collect()
    )
    assert got == want


def test_application_matches_duckdb_and_passthrough(spark):
    pages = _spark_pages(spark)
    rules = dust_rules(pages, min_support=1)
    got = sorted(
        tuple(r)
        for r in apply_dust_rules(
            pages.select("url"), rules, min_confidence_pct=60
        ).collect()
    )
    sql = apply_dust_rules_sql(
        f"SELECT url FROM ({_pages_sql()})",
        dust_rules_sql(_pages_sql(), 1),
        min_confidence_pct=60,
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
    by_url = dict(got)
    # aliases collapse onto the canonical member of the family
    assert by_url["http://h.test/b?sid=9"] == "http://h.test/b"
    assert by_url["http://h.test/a?sid=1&x=2"] == "http://h.test/a?x=2"
    # '?' disappears when the query empties; ruleless hosts pass through
    assert by_url["http://i.test/p?x=1"] == "http://i.test/p?x=1"


def test_confidence_gate_blocks_weak_rules(spark):
    pages = _spark_pages(spark)
    rules = dust_rules(pages, min_support=1)  # confidence 66
    out = apply_dust_rules(pages.select("url"), rules, min_confidence_pct=100)
    assert all(
        r["canonical_url"] == r["url"] for r in out.collect()
    )  # 66 < 100: nothing rewritten


def test_application_is_shuffle_free_on_urls(spark):
    pages = _spark_pages(spark)
    rules = dust_rules(pages, min_support=1)
    plan = apply_dust_rules(
        pages.select("url"), rules
    )._jdf.queryExecution().executedPlan().toString()
    # the URL side must see a broadcast join, never an exchange of URLs
    assert "BroadcastHashJoin" in plan
