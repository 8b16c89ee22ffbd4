"""Sitemap parsing + global host-budget apportionment semantics."""

import pytest
from pyspark.sql import functions as F

from scrape_spark.operators.politeness import allocate_host_budget
from scrape_spark.sources.sitemap import sitemap_entries, sitemap_index_refs

_XML = (
    "<urlset>"
    "<url><loc>http://a.test/1</loc><lastmod>2025-02-03</lastmod></url>\n"
    "<url><loc>http://a.test/2</loc></url>"
    "<url><loc></loc></url>"  # empty loc → dropped
    "<url><lastmod>2025-01-01</lastmod></url>"  # no loc → dropped
    "</urlset>"
)


def _sm(spark, xml):
    return spark.createDataFrame(
        [("http://a.test/sitemap.xml", xml)], "sitemap_url string, xml string"
    )


def test_entries_order_lastmod_and_drops(spark):
    rows = sitemap_entries(_sm(spark, _XML)).collect()
    assert [(r["entry_pos"], r["loc"], r["lastmod"]) for r in rows] == [
        (1, "http://a.test/1", "2025-02-03"),
        (2, "http://a.test/2", None),
    ]


def test_entries_tolerate_truncated_tail(spark):
    cut = _XML[: _XML.index("http://a.test/2")]  # killed mid-second-entry
    rows = sitemap_entries(_sm(spark, cut)).collect()
    assert [r["loc"] for r in rows] == ["http://a.test/1"]


def test_sitemapindex_refs(spark):
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.test/s1.xml</loc></sitemap>"
        "<sitemap><loc>http://a.test/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    rows = sitemap_index_refs(_sm(spark, xml)).collect()
    assert [(r["ref_pos"], r["child_loc"]) for r in rows] == [
        (1, "http://a.test/s1.xml"),
        (2, "http://a.test/s2.xml"),
    ]


def test_sitemap_parse_is_pure_jvm(spark):
    plan = (
        sitemap_entries(_sm(spark, _XML))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-side: explode + project only


def _counts(spark, rows):
    return spark.createDataFrame(rows, "host string, pending long")


def test_budget_sums_exactly_when_demand_exceeds_budget(spark):
    counts = _counts(spark, [("a", 100), ("b", 50), ("c", 17), ("d", 3)])
    out = allocate_host_budget(counts, budget=60).collect()
    got = {r["host"]: r["alloc"] for r in out}
    assert sum(got.values()) == 60  # Hamilton: seats == budget exactly
    # proportionality: floor share <= alloc <= floor share + 1
    w = 170
    for host, p in [("a", 100), ("b", 50), ("c", 17), ("d", 3)]:
        assert 60 * p // w <= got[host] <= 60 * p // w + 1


def test_budget_caps_at_pending_when_budget_exceeds_demand(spark):
    counts = _counts(spark, [("a", 5), ("b", 2)])
    out = {r["host"]: r["alloc"] for r in allocate_host_budget(counts, 100).collect()}
    assert out == {"a": 5, "b": 2}


def test_budget_deterministic_tiebreak(spark):
    # equal pendings, budget leaves one leftover seat → host-ascending wins
    counts = _counts(spark, [("b", 10), ("a", 10), ("c", 10)])
    out = {r["host"]: r["alloc"] for r in allocate_host_budget(counts, 10).collect()}
    assert sum(out.values()) == 10
    assert out["a"] >= out["b"] >= out["c"]


def test_budget_overflow_guard_and_empty(spark):
    with pytest.raises(ValueError):
        allocate_host_budget(_counts(spark, [("a", 2**40)]), budget=2**40)
    assert allocate_host_budget(_counts(spark, []), budget=10).count() == 0
