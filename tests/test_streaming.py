"""Structured Streaming frontier pipelines: streaming dedup + windowed metrics."""

from __future__ import annotations

import datetime as dt

from scrape_spark.streaming.frontier_stream import (
    dedup_link_stream,
    fetch_metrics_stream,
)

T0 = dt.datetime(2025, 6, 1, 0, 0, 0)


def _run_stream(out_df, name: str):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_dedup_drops_in_window_duplicates(spark, tmp_path):
    rows = [
        ("http://h.test/a", "seed", 0, T0),
        ("http://h.test/b", "seed", 1, T0 + dt.timedelta(seconds=10)),
        ("http://h.test/a", "other", 2, T0 + dt.timedelta(seconds=20)),  # dup
    ]
    src = spark.createDataFrame(
        rows, "url string, referrer string, link_pos int, discovered_at timestamp"
    )
    src_dir = str(tmp_path / "links")
    src.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    out = dedup_link_stream(stream, watermark="1 hour")
    _run_stream(out, "dedup_links")
    got = spark.sql("SELECT url FROM dedup_links").collect()
    assert sorted(r["url"] for r in got) == ["http://h.test/a", "http://h.test/b"]


def test_streaming_fetch_metrics_windows(spark, tmp_path):
    rows = [
        ("http://h1.test/a", 200, 100, T0 + dt.timedelta(seconds=5)),
        ("http://h1.test/b", 404, 0, T0 + dt.timedelta(seconds=30)),
        ("http://h2.test/a", 200, 50, T0 + dt.timedelta(seconds=70)),
        # append mode only emits windows the watermark has passed; this late
        # "flush" event closes the minute-1 window (its own window stays open)
        ("http://h9.test/z", 200, 1, T0 + dt.timedelta(seconds=600)),
    ]
    src = spark.createDataFrame(
        rows, "url string, status_code int, content_len long, fetched_at timestamp"
    )
    src_dir = str(tmp_path / "results")
    src.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    out = fetch_metrics_stream(stream, window="1 minute", watermark="0 seconds")
    _run_stream(out, "fetch_metrics")
    got = {
        (r["host"], r["win"]["start"].minute): (r["n_fetched"], r["n_errors"], r["bytes"])
        for r in spark.sql("SELECT * FROM fetch_metrics").collect()
    }
    assert got[("h1.test", 0)] == (2, 1, 100)
    assert got[("h2.test", 1)] == (1, 0, 50)
