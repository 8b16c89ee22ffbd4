"""SURVEY §7.4 strict-parity mode: MySQL ``url(255)`` prefix-key dedup.

The reference's unique key truncates at 255 chars (schema/scraped_pages.sql:14)
— two URLs sharing their first 255 characters collide, and the second INSERT's
duplicate-key upsert keeps the first row. Default engine mode dedups on the
full URL (documented divergence); ``url_key_chars=255`` reproduces MySQL.
"""

from pyspark.sql import functions as F

from scrape_spark.operators.seen import SeenSet
from scrape_spark.plans.crawl import CrawlJob
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import PAGES_SCHEMA

ROOT = "http://host0.test/p/0"
# full urls are 263 chars; they differ only at the last char → identical
# 255-char prefixes
TAIL = "a" * 240
LINK_X = f"http://host0.test/p/0/{TAIL}x"  # under the seed base path (P2)
LINK_Y = f"http://host0.test/p/0/{TAIL}y"
assert LINK_X[:255] == LINK_Y[:255] and LINK_X != LINK_Y

HTML = (
    "<html><head><title>Root</title></head><body>"
    f'<a href="{LINK_X}">X</a><a href="{LINK_Y}">Y</a>'
    "</body></html>"
)


def _pages(spark):
    from scrape_spark.functions.htmlparse import extract_text

    return spark.createDataFrame(
        [(ROOT, None, HTML.encode(), extract_text(HTML), "en")],
        PAGES_SCHEMA,
    )


def _job(spark, tmp_path, name, **kw):
    robots = spark.createDataFrame(
        [("host0.test", "User-agent: *\nAllow: /\n")], "host string, robots_txt string"
    )
    return CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / name)),
        _pages(spark),
        robots,
        n_buckets=4,
        bucket_capacity=1 << 10,
        **kw,
    )


def test_default_mode_keeps_both_long_urls(spark, tmp_path):
    job = _job(spark, tmp_path, "full")
    job.seed([ROOT])
    job.run()
    urls = set(job.all_urls())
    assert urls == {ROOT, LINK_X, LINK_Y}


def test_strict_255_collapses_prefix_collision(spark, tmp_path):
    job = _job(spark, tmp_path, "strict", url_key_chars=255)
    job.seed([ROOT])
    job.run()
    urls = set(job.all_urls())
    # first INSERT wins: the X link (smaller link_pos) defines the row
    assert urls == {ROOT, LINK_X}
    row = job.page(LINK_X)
    assert row["title"] == "X" and row["link_pos"] == 0


def test_strict_seenset_probe_truncates(spark, tmp_path):
    seen = SeenSet(
        SnapshotStore(spark, str(tmp_path / "s")),
        n_buckets=4,
        bucket_capacity=1 << 10,
        url_key_chars=255,
    )
    seen.add(spark.createDataFrame([(LINK_X,)], "url string"))
    cand = spark.createDataFrame([(LINK_Y,), ("http://fresh.test/a",)], "url string")
    out = {r["url"] for r in seen.filter_new(cand).collect()}
    assert out == {"http://fresh.test/a"}  # Y collides with X's 255-prefix
