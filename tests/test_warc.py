"""WARC source/sink: codec roundtrip, Spark write→read parity, framing
robustness (payloads containing the header separator, truncated tails)."""

import gzip

from pyspark.sql import functions as F

from scrape_spark.sources.warc import (
    decode_records,
    encode_record,
    read_warc,
    warc_pages_view,
    write_warc,
)

_DATE = "2026-01-01T00:00:00Z"


def test_codec_roundtrip_including_adversarial_bodies():
    bodies = [
        b"<html>plain</html>",
        b"",  # empty body
        b"binary \x00\xff bytes",
        "unicode héllo 世界".encode("utf-8"),
        b"contains the separator \r\n\r\n inside the payload \r\n\r\n twice",
    ]
    blob = b"".join(
        gzip.compress(
            encode_record(f"http://t.test/{i}", b, _DATE, http_status=200 + i)
        )
        for i, b in enumerate(bodies)
    )
    recs = list(decode_records(blob))
    assert len(recs) == len(bodies)
    for i, (rec, body) in enumerate(zip(recs, bodies)):
        assert rec["target_uri"] == f"http://t.test/{i}"
        assert rec["warc_date"] == _DATE
        assert rec["http_status"] == 200 + i
        assert rec["body"] == body
        assert rec["warc_type"] == "response"
    # identical logical record → identical bytes (uuid5, no clock/random)
    a = encode_record("http://t.test/0", bodies[0], _DATE)
    assert a == encode_record("http://t.test/0", bodies[0], _DATE)


def test_decode_tolerates_truncated_tail():
    r1 = encode_record("http://t.test/ok", b"whole", _DATE)
    r2 = encode_record("http://t.test/cut", b"x" * 100, _DATE)
    blob = r1 + r2[: len(r2) - 60]  # killed writer mid-record
    recs = list(decode_records(blob))
    assert [r["target_uri"] for r in recs] == ["http://t.test/ok"]


def test_spark_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "warcs")
    rows = [
        (f"http://h{i % 3}.test/p/{i}", f"<html><body>doc {i} é</body></html>",
         _DATE, 200 + (i % 2))
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, body string, warc_date string, status int"
    ).repartition(4)
    n = write_warc(df, out, status_col="status")
    assert n == 50

    back = read_warc(spark, out)
    got = {
        r["target_uri"]: r
        for r in back.select(
            "target_uri", "http_status", F.col("body").cast("string").alias("text"),
            "warc_date", "warc_type",
        ).collect()
    }
    assert len(got) == 50
    for uri, body, date, status in rows:
        r = got[uri]
        assert r["text"] == body and r["http_status"] == status
        assert r["warc_date"] == date and r["warc_type"] == "response"
    # one .warc.gz per partition, each record its own gzip member
    import os

    files = sorted(os.listdir(out))
    assert len(files) == 4 and all(f.endswith(".warc.gz") for f in files)


def test_pages_view_produces_pages_schema(spark, tmp_path):
    """The adapter must yield the engine's PAGES_SCHEMA columns (url,
    warc_ts, html, text, lang) — the exact shape CrawlJob's fetch join
    selects — plus the HTTP metadata passengers."""
    out = str(tmp_path / "w2")
    df = spark.createDataFrame(
        [("http://a.test/", "<html><title>A</title><body>Hi</body></html>", _DATE)],
        "target_uri string, body string, warc_date string",
    )
    write_warc(df, out)
    pages = warc_pages_view(read_warc(spark, out))
    assert set(pages.columns) == {
        "url", "warc_ts", "html", "text", "lang", "status_code", "fetched_at",
    }
    row = pages.collect()[0]
    assert row["url"] == "http://a.test/"
    assert bytes(row["html"]).startswith(b"<html>")
    assert row["status_code"] == 200
    assert row["warc_ts"] is not None
    assert isinstance(row["text"], str)


def test_pages_view_feeds_crawl_fetch_join(spark, tmp_path):
    """End-to-end: a WARC lake written from the synthetic webgraph drives a
    real CrawlJob round through warc_pages_view — the contract the adapter
    exists for (same kernel extracts text on both sides, so the invariant
    path holds)."""
    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.webgraph import (
        generate_pages,
        robots_source_df,
        seed_urls,
    )

    out = str(tmp_path / "warc_lake")
    synth = generate_pages(spark, 2, 8, 3, mega_host=None)
    write_warc(
        synth.select(
            "url",
            F.col("html").alias("body"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "warc_date"
            ),
        ),
        out,
        uri_col="url",
    )
    pages = warc_pages_view(read_warc(spark, out))
    job = CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / "store")),
        pages,
        robots_source_df(spark, 2, mega_host=None),
        round_seconds=60,
        n_buckets=4,
    )
    job.seed(seed_urls(2))
    stats = job.run_round()
    assert stats is not None and stats["fetched"] > 0
    done = job.frontier().where(F.col("status") == "done")
    assert done.count() == stats["fetched"]
    # the adapter's text column came from the same kernel → invariant holds
    assert done.where(F.col("content_hash").isNull()).count() == 0


def test_write_warc_overwrites_stale_parts(spark, tmp_path):
    """Re-writing a directory with FEWER partitions must not leave stale
    part files from the previous write to be merged into later reads."""
    out = str(tmp_path / "ow")
    first = spark.createDataFrame(
        [(f"http://old.test/{i}", "old", _DATE) for i in range(8)],
        "target_uri string, body string, warc_date string",
    ).repartition(8)
    write_warc(first, out)
    second = spark.createDataFrame(
        [(f"http://new.test/{i}", "new", _DATE) for i in range(3)],
        "target_uri string, body string, warc_date string",
    ).repartition(2)
    write_warc(second, out)
    uris = [r["target_uri"] for r in read_warc(spark, out).collect()]
    assert sorted(uris) == sorted(f"http://new.test/{i}" for i in range(3))


def test_non_ascii_uri_roundtrip(spark, tmp_path):
    """Frontier URLs are stored verbatim — IRIs / raw-unicode hrefs must
    encode (UTF-8 headers) instead of crashing the write task."""
    out = str(tmp_path / "iri")
    uri = "http://例え.test/页/ü?q=日本語"
    df = spark.createDataFrame(
        [(uri, "<html>x</html>", _DATE)],
        "target_uri string, body string, warc_date string",
    )
    assert write_warc(df, out) == 1
    rec = read_warc(spark, out).collect()[0]
    assert rec["target_uri"] == uri


def test_null_body_status_date_roundtrip(spark, tmp_path):
    """NULLs are preserved, not rewritten as ''/200 — the same fidelity rule
    the curation ops follow (null-text docs must survive)."""
    out = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [
            ("http://n.test/body", None, _DATE, 200),
            ("http://n.test/status", "x", _DATE, None),
            ("http://n.test/date", "x", None, 200),
            ("http://n.test/all", None, None, None),
            ("http://n.test/none", "y", _DATE, 503),
        ],
        "target_uri string, body string, warc_date string, status int",
    )
    assert write_warc(df, out, status_col="status") == 5
    got = {
        r["target_uri"]: r
        for r in read_warc(spark, out)
        .select(
            "target_uri",
            F.col("body").cast("string").alias("text"),
            "http_status",
            "warc_date",
        )
        .collect()
    }
    assert got["http://n.test/body"]["text"] is None
    assert got["http://n.test/status"]["http_status"] is None
    assert got["http://n.test/status"]["text"] == "x"
    assert got["http://n.test/date"]["warc_date"] is None
    r = got["http://n.test/all"]
    assert r["text"] is None and r["http_status"] is None and r["warc_date"] is None
    r = got["http://n.test/none"]
    assert r["text"] == "y" and r["http_status"] == 503 and r["warc_date"] == _DATE


def test_decode_tolerates_corrupt_gzip_member():
    """Bit-rot mid-member (zlib.error, not just truncation) must end the
    scan after the complete leading records, never crash the task."""
    r1 = gzip.compress(encode_record("http://t.test/ok", b"whole", _DATE))
    r2 = bytearray(gzip.compress(encode_record("http://t.test/rot", b"x" * 200, _DATE)))
    r2[len(r2) // 2] ^= 0xFF  # flip a byte mid-member
    recs = list(decode_records(r1 + bytes(r2)))
    assert [r["target_uri"] for r in recs] == ["http://t.test/ok"]


def test_wet_roundtrip_preserves_null_text(spark, tmp_path):
    from scrape_spark.sources.warc import read_warc, write_wet

    docs = spark.createDataFrame(
        [("http://t/1", "hello text", "2026-01-01T00:00:00Z"),
         ("http://t/2", None, "2026-01-01T00:00:01Z")],
        "url string, text string, warc_date string",
    )
    out = str(tmp_path / "wet")
    assert write_wet(docs, out) == 2
    rec = {r.target_uri: r for r in read_warc(spark, out).collect()}
    assert rec["http://t/1"].warc_type == "conversion"
    assert rec["http://t/1"].content_type == "text/plain"
    assert bytes(rec["http://t/1"].body) == b"hello text"
    assert rec["http://t/2"].body is None  # X-Scrape-Null survives


def test_wat_records_minimal_and_full(spark, tmp_path):
    import json

    from scrape_spark.sources.warc import read_warc, wat_records, write_wat

    docs = spark.createDataFrame(
        [("http://t/1", "2026-01-01T00:00:00Z", 200, "T1",
          ["http://t/2", "http://t/3"])],
        "url string, warc_date string, status int, title string, "
        "links array<string>",
    )
    # minimal: url only in the envelope
    body = json.loads(wat_records(docs).collect()[0].body)
    assert body == {"url": "http://t/1"}
    # full envelope through the sink and back
    out = str(tmp_path / "wat")
    write_wat(docs, out, status_col="status", title_col="title",
              links_col="links")
    r = read_warc(spark, out).collect()[0]
    assert r.warc_type == "metadata" and r.content_type == "application/json"
    got = json.loads(bytes(r.body))
    assert got == {"url": "http://t/1", "status": 200, "title": "T1",
                   "links": ["http://t/2", "http://t/3"], "n_links": 2}


# ---------------------------------------------------------------------------
# revisit records (identical-payload-digest dedup)
# ---------------------------------------------------------------------------
def test_revisit_roundtrip_and_compression(spark, tmp_path):
    from scrape_spark.sources.warc import (
        read_warc,
        restore_revisits,
        write_warc,
        write_warc_deduped,
    )

    # incompressible payload — gzip would flatten a repetitive one and hide
    # the dedup saving this test pins
    import random as _rnd

    big = b"<html>" + _rnd.Random(7).randbytes(4000) + b"</html>"
    rows = [
        ("http://a.test/1", big, "2025-01-01T00:00:00Z", 200),
        ("http://a.test/2", big, "2025-01-02T00:00:00Z", 200),
        ("http://b.test/1", big, "2025-01-03T00:00:00Z", 200),
        ("http://c.test/u", b"<html>unique</html>", "2025-01-01T05:00:00Z", 200),
        ("http://d.test/n", None, "2025-01-04T00:00:00Z", 404),  # NULL body
    ]
    df = spark.createDataFrame(
        rows, "url string, body binary, warc_date string, status int"
    ).repartition(2)
    full_dir, dd_dir = str(tmp_path / "full"), str(tmp_path / "dd")
    assert write_warc(df, full_dir, uri_col="url", status_col="status") == 5
    assert write_warc_deduped(df, dd_dir, status_col="status") == 5
    import os

    size = lambda d: sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
    )
    assert size(dd_dir) < size(full_dir)  # revisit stubs beat repeated bodies

    recs = read_warc(spark, dd_dir)
    by_type = {
        r["warc_type"]: r["cnt"]
        for r in recs.groupBy("warc_type").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    # earliest capture of the shared payload is the one response; NULL body
    # is never a revisit
    assert by_type == {"response": 3, "revisit": 2}

    out = {
        (r["target_uri"], r["warc_date"]): (
            bytes(r["body"]) if r["body"] is not None else None,
            r["http_status"],
            r["was_revisit"],
        )
        for r in restore_revisits(recs).collect()
    }
    assert len(out) == 5
    for url, body, date, status in rows:
        got_body, got_status, _ = out[(url, date)]
        assert got_body == body, url
        assert got_status == status, url
    assert out[("http://a.test/1", "2025-01-01T00:00:00Z")][2] is False
    assert out[("http://a.test/2", "2025-01-02T00:00:00Z")][2] is True


def test_assign_revisits_deterministic_referent(spark):
    from scrape_spark.sources.warc import assign_revisits

    # same date: URL breaks the tie, so the referent is stable
    rows = [
        ("http://z.test/b", b"x", "2025-01-01T00:00:00Z"),
        ("http://z.test/a", b"x", "2025-01-01T00:00:00Z"),
    ]
    df = spark.createDataFrame(rows, "url string, body binary, warc_date string")
    got = {
        r["url"]: (r["is_revisit"], r["refers_to_uri"])
        for r in assign_revisits(df).collect()
    }
    assert got["http://z.test/a"] == (False, None)
    assert got["http://z.test/b"] == (True, "http://z.test/a")
