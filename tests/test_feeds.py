"""RSS/Atom feed parsing + HTML autodiscovery semantics."""

from pyspark.sql import functions as F

from scrape_spark.sources.feeds import (
    feed_autodiscovery_refs,
    feed_entries,
    feed_entries_sql,
)

_RSS = (
    "<rss version=\"2.0\"><channel>"
    "<title>Chan</title><link>http://a.test/</link>"
    "<item><title>First</title><link>http://a.test/p1</link>"
    "<pubDate>Mon, 03 Feb 2025 10:00:00 GMT</pubDate>"
    "<guid isPermaLink=\"false\">g-1</guid></item>\n"
    "<item><link>http://a.test/p2</link></item>"
    "<item><title>No link</title></item>"  # dropped: nothing to enqueue
    "</channel></rss>"
)

_ATOM = (
    "<feed xmlns=\"http://www.w3.org/2005/Atom\">"
    "<title>Feed</title><link href=\"http://b.test/\"/>"
    "<entry><title>E1</title>"
    "<link rel=\"alternate\" href=\"http://b.test/e1\"/>"
    "<updated>2025-02-03T10:00:00Z</updated><id>tag:b,e1</id></entry>"
    "<entry><link href=\"http://b.test/e2\"/></entry>"
    "</feed>"
)


def _feeds(spark, *rows):
    return spark.createDataFrame(
        [(f"http://f{i}.test/feed.xml", xml) for i, xml in enumerate(rows)],
        "feed_url string, xml string",
    )


def test_rss_entries(spark):
    rows = feed_entries(_feeds(spark, _RSS)).collect()
    assert [
        (r["kind"], r["entry_pos"], r["link"], r["title"], r["published_raw"], r["guid"])
        for r in rows
    ] == [
        ("rss", 1, "http://a.test/p1", "First",
         "Mon, 03 Feb 2025 10:00:00 GMT", "g-1"),
        ("rss", 2, "http://a.test/p2", None, None, None),
    ]


def test_atom_entries(spark):
    rows = feed_entries(_feeds(spark, _ATOM)).collect()
    assert [
        (r["kind"], r["entry_pos"], r["link"], r["published_raw"], r["guid"])
        for r in rows
    ] == [
        ("atom", 1, "http://b.test/e1", "2025-02-03T10:00:00Z", "tag:b,e1"),
        ("atom", 2, "http://b.test/e2", None, None),
    ]


def test_mixed_frame_and_truncation(spark):
    cut = _RSS[: _RSS.index("http://a.test/p2")]  # killed mid-second-item
    rows = feed_entries(_feeds(spark, cut, _ATOM)).collect()
    by_feed = {}
    for r in rows:
        by_feed.setdefault(r["feed_url"], []).append(r["link"])
    assert by_feed == {
        "http://f0.test/feed.xml": ["http://a.test/p1"],
        "http://f1.test/feed.xml": ["http://b.test/e1", "http://b.test/e2"],
    }


def test_duckdb_oracle_parity(spark):
    import duckdb

    df = feed_entries(_feeds(spark, _RSS, _ATOM))
    got = sorted(
        (r["feed_url"], r["kind"], r["entry_pos"], r["link"], r["title"],
         r["published_raw"], r["guid"])
        for r in df.collect()
    )
    con = duckdb.connect()
    feeds_sql = " UNION ALL ".join(
        "SELECT '{u}' AS feed_url, '{x}' AS xml".format(
            u=f"http://f{i}.test/feed.xml", x=xml.replace("'", "''")
        )
        for i, xml in enumerate([_RSS, _ATOM])
    )
    want = sorted(
        tuple(r) for r in con.sql(feed_entries_sql(feeds_sql)).fetchall()
    )
    assert got == want


def test_autodiscovery(spark):
    html = (
        "<html><head>"
        "<link rel=\"stylesheet\" href=\"/s.css\">"
        "<LINK rel=\"alternate\" TYPE=\"application/rss+xml\" "
        "href=\"http://a.test/feed.xml\" title=\"RSS\">"
        "<link href=\"/atom.xml\" type=\"application/atom+xml\" "
        "rel=\"alternate\">"
        "<link rel=\"alternate\" type=\"application/atom+xml\">"  # no href
        "</head><body></body></html>"
    )
    pages = spark.createDataFrame(
        [("http://a.test/", html), ("http://b.test/", "<html></html>")],
        "url string, html_str string",
    )
    rows = feed_autodiscovery_refs(pages).collect()
    assert [(r["ref_pos"], r["feed_url"], r["feed_kind"]) for r in rows] == [
        (1, "http://a.test/feed.xml", "rss"),
        (2, "/atom.xml", "atom"),
    ]


def test_feed_parse_is_pure_jvm(spark):
    plan = (
        feed_entries(_feeds(spark, _RSS))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_feed_schedule(spark):
    from scrape_spark.sources.feeds import feed_schedule

    rows = feed_entries(_feeds(spark, _RSS, _ATOM)).collect()
    # forge a cross-feed duplicate: also announce rss pos-2 link at atom pos 1
    entries = spark.createDataFrame(
        [(r["feed_url"], r["entry_pos"], r["link"]) for r in rows]
        + [("http://f9.test/feed.xml", 1, "http://a.test/p2")],
        "feed_url string, entry_pos long, link string",
    )
    plan = {r["url"]: r for r in feed_schedule(entries).collect()}
    assert plan["http://a.test/p1"]["priority"] == 1_000_000
    # duplicate announcement: best position wins, n_feeds counts both
    assert plan["http://a.test/p2"]["priority"] == 1_000_000
    assert plan["http://a.test/p2"]["n_feeds"] == 2
    assert plan["http://b.test/e2"]["priority"] == 500_000


def test_feed_to_frontier_enqueue(spark, tmp_path):
    """Integration: parsed feeds → schedule plan → enqueue_frame, with the
    seq order following feed freshness (best announced position first) and
    a replayed batch staying a no-op."""
    from pyspark.sql import functions as SF

    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.feeds import feed_schedule
    from scrape_spark.sources.webgraph import (
        generate_pages,
        robots_source_df,
        seed_urls,
    )

    job = CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / "store")),
        generate_pages(spark, 2, 10, 2, mega_host=None),
        robots_source_df(spark, 2, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
    )
    job.seed(seed_urls(2))

    rss = (
        "<rss><channel>"
        + "".join(
            f"<item><link>http://feedhost.test/p{i}</link></item>"
            for i in (3, 1, 2)  # newest-first: p3 freshest
        )
        + "</channel></rss>"
    )
    entries = feed_entries(_feeds(spark, rss))
    plan = feed_schedule(entries)
    links = plan.select(
        "url",
        SF.lit(None).cast("string").alias("referrer"),
        SF.lit("").alias("anchor_text"),
        SF.lit(0).alias("link_pos"),
        SF.timestamp_seconds(SF.lit(1700000000)).alias("discovered_at"),
        (-SF.col("priority")).alias("_neg_prio"),
    )
    n = job.enqueue_frame(links, order_cols=["_neg_prio", "url"])
    assert n == 3
    fr = job.frontier().where(SF.col("url").contains("feedhost"))
    got = [
        r["url"] for r in fr.orderBy("seq").select("url").collect()
    ]
    assert got == [
        "http://feedhost.test/p3",  # announced at position 1 → first
        "http://feedhost.test/p1",
        "http://feedhost.test/p2",
    ]
    # at-least-once replay: the same batch enqueues nothing new
    assert job.enqueue_frame(links, order_cols=["_neg_prio", "url"]) == 0


def test_rss_mentioning_feed_markup_stays_rss(spark):
    # a description QUOTING '<feed' must not flip dispatch to Atom
    rss = (
        "<rss version=\"2.0\"><channel>"
        "<item><link>http://a.test/p1</link>"
        "<description><![CDATA[see the <feed> tag]]></description></item>"
        "</channel></rss>"
    )
    rows = feed_entries(_feeds(spark, rss)).collect()
    assert [(r["kind"], r["link"]) for r in rows] == [
        ("rss", "http://a.test/p1")
    ]
