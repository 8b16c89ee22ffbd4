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


def test_pages_view_feeds_fetch_shape(spark, tmp_path):
    out = str(tmp_path / "w2")
    df = spark.createDataFrame(
        [("http://a.test/", "<html><title>A</title></html>", _DATE)],
        "target_uri string, body string, warc_date string",
    )
    write_warc(df, out)
    pages = warc_pages_view(read_warc(spark, out))
    row = pages.collect()[0]
    assert row["url"] == "http://a.test/"
    assert row["html"].startswith("<html>")
    assert row["status_code"] == 200
    assert set(pages.columns) == {"url", "html", "status_code", "fetched_at"}
