"""S3: POST fetch semantics — fetch identity is (url, method, payload).

Reference parity target: scraper.py:119-149 ``fetch_post_content`` posts the
row's payload and stores the response like any page (title/hash/links);
scraper.py:176-183 routes method=POST rows there. A POST page with the same
url as a GET page is a DIFFERENT page; an unmatched payload is a fetch error.
"""

from pyspark.sql import functions as F

from scrape_spark.oracle.pyref import ReferenceCrawler
from scrape_spark.plans.crawl import CrawlJob
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import (
    generate_pages,
    host_sizes,
    page_html,
    robots_txt_fixture,
    robots_source_df,
    seed_urls,
)

N_HOSTS = 2
PPH = 10
K = 3

POST_URL = "http://host0.test/api/search"
POST_PAYLOAD = '{"q": "spark"}'
POST_HTML = (
    "<html><head><title>POST result</title></head><body>"
    '<p>results</p><a href="/api/search/r1">R1</a>'
    '<a href="/api/search/r2">R2</a></body></html>'
)
# a GET page at the SAME url with different content — must NOT be fetched
GET_TWIN_HTML = "<html><head><title>GET twin</title></head><body>nope</body></html>"


def _pages(spark):
    base = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None)
    extra = spark.createDataFrame(
        [
            (POST_URL, POST_HTML, "POST", POST_PAYLOAD),
            (POST_URL, GET_TWIN_HTML, "GET", None),
        ],
        "url string, html_s string, method string, payload string",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode("html_s", "utf-8").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
        "method",
        "payload",
    )
    base = base.withColumn("method", F.lit("GET")).withColumn(
        "payload", F.lit(None).cast("string")
    )
    return base.unionByName(extra).persist()


def _seeds():
    return [
        *seed_urls(N_HOSTS),
        (POST_URL, "POST", POST_PAYLOAD),
        ("http://host0.test/api/miss", "POST", '{"q": "none"}'),
    ]


def _oracle():
    pages = {}
    for hi, size in enumerate(host_sizes(N_HOSTS, PPH, None, 1)):
        for node in range(size):
            url, html = page_html(f"host{hi}.test", node, K, size)
            pages[url] = html
    pages[POST_URL] = GET_TWIN_HTML
    crawler = ReferenceCrawler(
        pages=pages,
        robots_txt=dict(robots_txt_fixture(N_HOSTS, None)),
        post_pages={(POST_URL, POST_PAYLOAD): POST_HTML},
    )
    crawler.seed(_seeds())
    crawler.run()
    return crawler


def test_post_fetch_end_to_end(spark, tmp_path):
    pages = _pages(spark)
    job = CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / "post")),
        pages,
        robots_source_df(spark, N_HOSTS, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
    )
    job.seed(_seeds())
    job.run()
    engine = {r["url"]: r for r in job.frontier().collect()}
    oracle = {row.url: row for row in _oracle().rows()}

    assert set(engine) == set(oracle)

    # the POST row fetched the POST content, not the GET twin at the same url
    post_row = engine[POST_URL]
    assert post_row["status"] == "done"
    assert post_row["method"] == "POST" and post_row["payload"] == POST_PAYLOAD
    assert post_row["content_hash"] == oracle[POST_URL].hash
    assert post_row["page_title"] == "POST result"

    # links extracted from the POST response body were discovered (as GET)
    for link in ("http://host0.test/api/search/r1", "http://host0.test/api/search/r2"):
        assert link in engine
        assert engine[link]["referrer"] == POST_URL
        assert engine[link]["method"] == "GET"
        # no GET page exists at those urls → reference fetch-failure path
        assert engine[link]["status"] == "error"

    # unmatched POST payload → fetch error, never the GET page
    miss = engine["http://host0.test/api/miss"]
    assert miss["status"] == "error" and miss["error_message"] == "404 Not Found"

    # full status/error/hash parity with the oracle
    for url, row in oracle.items():
        if row.error_message == "Blocked by robots.txt":
            expected = "blocked"
        elif row.error_message:
            expected = "error"
        else:
            expected = "done"
        assert engine[url]["status"] == expected, url
        if row.hash:
            assert engine[url]["content_hash"] == row.hash, url
    pages.unpersist()


def test_all_get_web_post_seed_is_fetch_error(spark, tmp_path):
    """On a pages source without method columns (pure CC web), a POST seed
    can never hit — it must surface as the 404 path, not match a GET page."""
    pages = generate_pages(spark, 1, 5, K, mega_host=None).persist()
    job = CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / "ag")),
        pages,
        robots_source_df(spark, 1, mega_host=None),
        n_buckets=4,
        bucket_capacity=1 << 12,
    )
    job.seed([("http://host0.test/p/0", "POST", '{"x":1}'), "http://host0.test/p/0/1"])
    job.run()
    rows = {r["url"]: r for r in job.frontier().collect()}
    assert rows["http://host0.test/p/0"]["status"] == "error"
    assert rows["http://host0.test/p/0/1"]["status"] == "done"
    pages.unpersist()


def test_get_seed_with_payload_is_done_and_consistent(spark, tmp_path):
    """A GET seed that carries a payload must fetch like any GET (the
    reference's scrape_page never reads the payload): the row ends 'done'
    and its links enter the frontier — previously the fetch hit missed the
    payload-keyed outcome join, marking the row 'error' while its links were
    still enqueued (inconsistent state)."""
    pages = generate_pages(spark, 1, 5, K, mega_host=None).persist()
    job = CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / "gp")),
        pages,
        robots_source_df(spark, 1, mega_host=None),
        n_buckets=4,
        bucket_capacity=1 << 12,
    )
    job.seed([("http://host0.test/p/0", "GET", '{"ignored": true}')])
    job.run()
    rows = {r["url"]: r for r in job.frontier().collect()}
    root = rows["http://host0.test/p/0"]
    assert root["status"] == "done" and root["error_message"] is None
    assert root["payload"] == '{"ignored": true}'  # stored as given
    # links from the fetched page were discovered (state is consistent)
    children = [u for u in rows if u != "http://host0.test/p/0"]
    assert children and all(rows[u]["referrer"] == "http://host0.test/p/0"
                            or rows[u]["depth"] > 1 for u in children)
    pages.unpersist()
