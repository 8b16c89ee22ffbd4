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


def _job(spark, tmp_path, name):
    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.webgraph import generate_pages, robots_source_df

    return CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / name)),
        generate_pages(spark, 2, 8, 3, mega_host=None),
        robots_source_df(spark, 2, mega_host=None),
        round_seconds=60,
        n_buckets=4,
    )


def test_seed_frame_matches_seed_list(spark, tmp_path):
    """Distributed seeding is a pure physical-strategy switch: same urls in
    the same order produce an identical frontier to the list path."""
    from scrape_spark.sources.webgraph import seed_urls

    urls = sorted(seed_urls(2))
    a = _job(spark, tmp_path, "list")
    a.seed(urls)
    b = _job(spark, tmp_path, "frame")
    n = b.seed_frame(spark.createDataFrame([(u,) for u in urls], "url string"))
    assert n == len(urls)
    cols = ["url", "seq", "link_pos", "status", "method", "payload", "referrer"]
    assert sorted(map(tuple, a.frontier().select(cols).collect())) == sorted(
        map(tuple, b.frontier().select(cols).collect())
    )


def test_seed_frame_from_sitemap_drives_crawl(spark, tmp_path):
    """The bootstrap path end-to-end: sitemap XML → entries → seed_frame
    (document order, cross-file dup collapsed, referrer = sitemap) → a real
    crawl round."""
    xml0 = (
        "<urlset><url><loc>http://host0.test/p/0</loc></url>"
        "<url><loc>http://host1.test/p/0</loc></url></urlset>"
    )
    xml1 = "<urlset><url><loc>http://host1.test/p/0</loc></url></urlset>"  # dup
    sitemaps = spark.createDataFrame(
        [("http://host0.test/sitemap.xml", xml0),
         ("http://host1.test/sitemap.xml", xml1)],
        "sitemap_url string, xml string",
    )
    entries = sitemap_entries(sitemaps)
    job = _job(spark, tmp_path, "sm")
    n = job.seed_frame(
        entries.select(
            F.col("loc").alias("url"),
            F.col("sitemap_url").alias("referrer"),
            "entry_pos",
        ),
        order_cols=["referrer", "entry_pos"],
    )
    assert n == 2  # the cross-sitemap duplicate collapsed, first wins
    rows = {r["url"]: r for r in job.frontier().collect()}
    assert rows["http://host0.test/p/0"]["seq"] == 0
    assert rows["http://host1.test/p/0"]["seq"] == 1
    assert rows["http://host1.test/p/0"]["referrer"] == "http://host0.test/sitemap.xml"
    stats = job.run_round()
    assert stats is not None and stats["fetched"] == 2 and stats["new_urls"] > 0


def test_robots_sitemap_refs_matches_stdlib(spark):
    """The JVM regexp twin vs RobotFileParser.site_maps() line semantics."""
    from urllib.robotparser import RobotFileParser

    from scrape_spark.sources.sitemap import robots_sitemap_refs

    bodies = {
        "a.test": "User-agent: *\nDisallow: /x\n"
                  "Sitemap: http://a.test/s1.xml\r\n"
                  "sitemap: http://a.test/s2.xml\n",
        "b.test": "  SITEMAP:\thttp://b.test/all.xml\nUser-agent: *\n",
        "c.test": "User-agent: *\nDisallow: /\n",  # none
    }
    df = spark.createDataFrame(list(bodies.items()), "host string, body string")
    got: dict[str, list] = {h: [] for h in bodies}
    for r in robots_sitemap_refs(df).collect():
        got[r.host].append((r.ref_pos, r.sitemap_url))
    for host, body in bodies.items():
        rp = RobotFileParser()
        rp.parse(body.splitlines())
        expect = rp.site_maps() or []
        assert [u for _, u in sorted(got[host])] == list(expect), host
    assert got["c.test"] == []


def test_robots_discovery_to_seed_frame(spark, tmp_path):
    """Discovery end-to-end: robots bodies → Sitemap refs → (join the
    fetched XML) → entries → seed_frame, referrer = the sitemap URL."""
    from scrape_spark.sources.sitemap import robots_sitemap_refs

    robots = spark.createDataFrame(
        [("host0.test", "User-agent: *\nSitemap: http://host0.test/sm.xml\n")],
        "host string, body string",
    )
    fetched = spark.createDataFrame(
        [("http://host0.test/sm.xml",
          "<urlset><url><loc>http://host0.test/p/0</loc></url>"
          "<url><loc>http://host0.test/p/1</loc></url></urlset>")],
        "url string, xml string",
    )
    refs = robots_sitemap_refs(robots)
    xml = refs.join(fetched, refs["sitemap_url"] == fetched["url"]).select(
        "sitemap_url", "xml"
    )
    entries = sitemap_entries(xml)
    job = _job(spark, tmp_path, "disc")
    n = job.seed_frame(
        entries.select(
            F.col("loc").alias("url"),
            F.col("sitemap_url").alias("referrer"),
            "entry_pos",
        ),
        order_cols=["referrer", "entry_pos"],
    )
    assert n == 2
    rows = {r["url"]: r for r in job.frontier().collect()}
    assert rows["http://host0.test/p/1"]["referrer"] == "http://host0.test/sm.xml"


def test_robots_sitemap_refs_comment_semantics(spark):
    """'#' comments strip before value parsing — stdlib line semantics."""
    from urllib.robotparser import RobotFileParser

    from scrape_spark.sources.sitemap import robots_sitemap_refs

    bodies = {
        "a.test": "Sitemap: http://a.test/s.xml#frag\n",   # mid-value '#'
        "b.test": "Sitemap: # disabled\n",                  # fully commented
        "c.test": "# Sitemap: http://c.test/hidden.xml\n",  # commented line
    }
    df = spark.createDataFrame(list(bodies.items()), "host string, body string")
    got: dict[str, list] = {h: [] for h in bodies}
    for r in robots_sitemap_refs(df).collect():
        got[r.host].append(r.sitemap_url)
    for host, body in bodies.items():
        rp = RobotFileParser()
        rp.parse(body.splitlines())
        # stdlib surfaces a valueless directive as '' — the kernel drops
        # empties (an empty ref is unfetchable); otherwise identical
        expect = [u for u in (rp.site_maps() or []) if u]
        assert got[host] == expect, host


def test_sitemap_priority_changefreq(spark):
    from scrape_spark.sources.sitemap import sitemap_entries

    xml = (
        "<urlset>"
        "<url><loc>http://a/1</loc><priority>0.8</priority>"
        "<changefreq>Daily</changefreq></url>"
        "<url><loc>http://a/2</loc><priority>bogus</priority></url>"
        "<url><loc>http://a/3</loc><changefreq>never</changefreq></url>"
        "<url><loc>http://a/4</loc></url>"
        "</urlset>"
    )
    sm = spark.createDataFrame(
        [("http://a/sitemap.xml", xml)], "sitemap_url string, xml string"
    )
    got = {r["loc"]: r for r in sitemap_entries(sm).collect()}
    assert got["http://a/1"]["priority_q4"] == 8000
    assert got["http://a/1"]["changefreq"] == "daily"
    assert got["http://a/1"]["changefreq_s"] == 86_400
    # malformed priority degrades to the spec default, not a cast failure
    assert got["http://a/2"]["priority_q4"] == 5000
    assert got["http://a/3"]["changefreq"] == "never"
    assert got["http://a/3"]["changefreq_s"] is None
    assert got["http://a/4"]["priority_q4"] == 5000
    assert got["http://a/4"]["changefreq"] is None
