"""MIME sniff kernel: Spark == DuckDB == pure-Python spec, fuzzed."""

import random

import duckdb
import pytest

from scrape_spark.functions.mime import (
    mime_sniff_py,
    mime_sniff_sql,
    with_mime,
)
from scrape_spark.functions.textstats import DUCK_DIALECT, SPARK_DIALECT

GOLDENS = [
    (b"", "empty"),
    (b"\x1f\x8b\x08rest-of-gzip", "gzip"),
    (b"PK\x03\x04zipfile", "zip"),
    (b"%PDF-1.4\n%", "pdf"),
    (b"\x89PNG\r\n\x1a\x0aIHDR", "png"),
    (b"\xff\xd8\xff\xe0JFIF", "jpeg"),
    (b"GIF89a\x00", "gif"),
    (b"GIF87a\x00", "gif"),
    (b"RIFF\x12\x34\x56\x78WEBPVP8 ", "webp"),
    (b"RIFF\xaa\xbb\xcc\xddWAVEfmt ", "text"),  # RIFF alone is not webp
    (b"RIFF\x12\x34\x56\x78WAVEfmt ", "binary"),  # ...and \x12 is a ctrl byte
    (b"WARC/1.1\r\nWARC-Type:", "warc"),
    (b"<!DOCTYPE html><html>", "html"),
    (b"<!doctype HTML>", "html"),
    (b"  \t\r\n<HTML lang='en'>", "html"),
    (b"<body onload=x>", "html"),
    (b"\xef\xbb\xbf<?xml version='1.0'?>", "xml"),
    (b"<?xml version='1.0'?>", "xml"),
    (b"plain old prose, nothing else.", "text"),
    (b"<unknowntag>not html enough", "text"),
    (b"\x00\x01\x02\x03", "binary"),
    (b"looks texty until \x07 bell", "binary"),
    (b"   \r\n\t  ", "text"),  # all whitespace
    (b"\xef\xbb\xbfjust bom then text", "text"),
]


def test_python_spec_goldens():
    for raw, want in GOLDENS:
        assert mime_sniff_py(raw) == want, raw


def test_duckdb_matches_spec_on_goldens():
    con = duckdb.connect()
    for raw, want in GOLDENS:
        expr = mime_sniff_sql("unhex('" + raw.hex() + "')", DUCK_DIALECT)
        assert con.execute("SELECT " + expr).fetchone()[0] == want, raw


def _spark_labels(spark, blobs):
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "i int, html binary"
    )
    return [
        r["mime"]
        for r in with_mime(df).orderBy("i").select("mime").collect()
    ]


def test_spark_matches_spec_on_goldens(spark):
    got = _spark_labels(spark, [raw for raw, _ in GOLDENS])
    assert got == [want for _, want in GOLDENS]


def test_three_way_fuzz(spark):
    rng = random.Random(99)
    blobs = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 100)))
        for _ in range(80)
    ]
    blobs += [
        bytes(rng.choice(b" \t\r\n") for _ in range(rng.randrange(6)))
        + rng.choice([b"<html>", b"<DIV id=x>", b"<p>hi", b"<?XML x", b"words"])
        for _ in range(40)
    ]
    want = [mime_sniff_py(b) for b in blobs]
    assert _spark_labels(spark, blobs) == want
    con = duckdb.connect()
    for b, w in zip(blobs, want):
        expr = mime_sniff_sql("unhex('" + b.hex() + "')", DUCK_DIALECT)
        assert con.execute("SELECT " + expr).fetchone()[0] == w, b


def test_sniff_reads_prefix_only(spark):
    # signature past the 64-byte window must NOT flip the label
    raw = b"a" * 64 + b"\x1f\x8b"
    assert mime_sniff_py(raw) == "text"
    assert _spark_labels(spark, [raw]) == ["text"]


def test_plan_is_jvm_map_only(spark):
    # higher-order array exprs stay outside WSCG, but the plan must be a
    # bare JVM Project over the scan: no Python eval, no exchange
    df = spark.createDataFrame([(b"<html>",)], "html binary")
    plan = with_mime(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
