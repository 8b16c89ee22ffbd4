"""Spark-side parity for the fused parse UDF and JVM expressions."""

import hashlib

from pyspark.sql import functions as F

from scrape_spark.functions.udfs import (
    content_hash,
    extract_text_udf,
    parse_page_expr,
    title_with_fallback,
)
from scrape_spark.functions.urls import normalize_url_expr, url_hash, url_host, url_path


def _pages_df(spark):
    rows = [
        (
            "http://example.com/p/0",
            (
                "<html><head><title>Root</title></head><body>"
                '<a href="/p/0/1">Child 1</a>'
                '<a href="/p/0/2"><img src="i.jpg" alt="Alt2" title="T2"></a>'
                '<a href="http://other.test/x">External</a>'
                '<a href="/other/x">UpPath</a>'
                '<a href="/p/0/1?utm=1">QueryDup</a>'
                "<a>NoHref</a>"
                "</body></html>"
            ).encode("utf-8"),
        ),
        ("http://example.com/empty", b""),
        ("http://example.com/notitle", b"<html><body>Just text</body></html>"),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_parse_page_expr_links(spark):
    df = _pages_df(spark).withColumn("parsed", parse_page_expr("html", "url"))
    out = {r["url"]: r for r in df.select("url", "parsed.*").collect()}

    root = out["http://example.com/p/0"]
    assert root["title"] == "Root"
    links = [(l["url"], l["anchor_text"], l["link_pos"]) for l in root["links"]]
    assert links == [
        ("http://example.com/p/0/1", "Child 1", 0),
        ("http://example.com/p/0/2", "Alt2 T2", 1),
        ("http://example.com/p/0/1", "QueryDup", 2),
    ]
    assert root["text"].startswith("Root")

    assert out["http://example.com/empty"]["links"] == []
    assert out["http://example.com/empty"]["title"] is None
    assert out["http://example.com/notitle"]["text"] == "Just text"


def test_posexplode_preserves_document_order(spark):
    df = (
        _pages_df(spark)
        .withColumn("parsed", parse_page_expr("html", "url"))
        .select("url", F.explode("parsed.links").alias("link"))
        .select("url", "link.url", "link.anchor_text", "link.link_pos")
    )
    rows = df.where(F.col("link_pos") == 0).collect()
    assert any(r["anchor_text"] == "Child 1" for r in rows)


def test_content_hash_matches_hashlib(spark):
    text = "<html><title>x</title></html>"
    df = spark.createDataFrame([(text,)], "content string").select(
        content_hash("content").alias("h")
    )
    assert df.collect()[0]["h"] == hashlib.sha256(text.encode()).hexdigest()


def test_extract_text_udf_byte_identical(spark):
    from scrape_spark.functions.htmlparse import extract_text

    html = "<html><head><title>T</title></head><body><h1> A </h1>\n<p> B </p></body></html>"
    df = spark.createDataFrame([(html.encode(),)], "html binary").select(
        extract_text_udf("html").alias("text")
    )
    assert df.collect()[0]["text"] == extract_text(html)


def test_url_expressions(spark):
    df = spark.createDataFrame(
        [("http://host0.test/p/0?x=1#f",), ("http://host1.test",)],
        "url string",
    ).select(
        "url",
        url_host("url").alias("host"),
        url_path("url").alias("path"),
        normalize_url_expr("url").alias("norm"),
        url_hash("url").alias("h"),
    )
    rows = {r["url"]: r for r in df.collect()}
    r0 = rows["http://host0.test/p/0?x=1#f"]
    assert r0["host"] == "host0.test"
    assert r0["path"] == "/p/0"
    assert r0["norm"] == "http://host0.test/p/0"
    assert isinstance(r0["h"], int)
    r1 = rows["http://host1.test"]
    assert r1["path"] == "/"  # reference 'or "/"' default (robots_handler.py:90)
    assert r1["norm"] == "http://host1.test"


def test_use_playwright_routing_matches_reference(spark):
    """S4 routing half: `any(pat in url for pat in PATTERNS)` parity
    (reference scraper.py:46, config.py USE_PLAYWRIGHT_PATTERNS)."""
    from scrape_spark.functions.urls import use_playwright_expr

    patterns = ["example.com", "/dynamic/"]
    urls = [
        "http://example.com/a",          # host pattern hit
        "http://sub.example.com.evil/x", # substring semantics: still a hit
        "http://other.test/dynamic/1",   # path pattern hit
        "http://other.test/static/1",    # miss
        "http://dynamic.test/x",         # '/dynamic/' not a substring — miss
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", use_playwright_expr("url", patterns).alias("pw")
    )
    got = {r["url"]: r["pw"] for r in df.collect()}
    want = {u: any(p in u for p in patterns) for u in urls}
    assert got == want
    assert want["http://sub.example.com.evil/x"] is True
    assert want["http://dynamic.test/x"] is False
    # empty pattern list routes nothing (any([]) is False)
    none_df = spark.createDataFrame([(urls[0],)], "url string").select(
        use_playwright_expr("url", []).alias("pw")
    )
    assert none_df.collect()[0]["pw"] is False


def test_title_fallback_to_host(spark):
    df = (
        _pages_df(spark)
        .withColumn("parsed", parse_page_expr("html", "url"))
        .select(
            "url",
            title_with_fallback(F.col("parsed.title"), F.col("url")).alias("title"),
        )
    )
    out = {r["url"]: r["title"] for r in df.collect()}
    assert out["http://example.com/p/0"] == "Root"
    assert out["http://example.com/notitle"] == "example.com"
