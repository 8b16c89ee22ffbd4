"""Structured Streaming face of the frontier pipeline (live-fetch deployments).

The batch engine (plans/crawl.py) drives self-feeding crawl rounds through
snapshot tables — the right shape for a resumable 10^10-URL crawl (SURVEY.md
§2.8 T1). A *live* deployment additionally has unbounded inputs that are
genuinely streams, and this module gives them the Structured Streaming
treatment:

- **discovered-link stream** → watermarked streaming dedup
  (``dropDuplicatesWithinWatermark``) → frontier appends. The watermark
  bounds the in-memory seen-state; cross-window exactness still comes from
  the batch anti-join against the seen table at round boundaries (two-tier
  dedup, same contract as operators/seen.py).
- **fetch-result stream** → per-host event-time windowed metrics
  (tumbling windows + watermark for late results) → metrics sink.

Both pipelines are pure composition of built-in streaming operators — no
custom state store is needed because the crawl's durable state lives in the
snapshot tables, not in streaming state (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scrape_spark.functions.urls import url_hash, url_host


def dedup_link_stream(
    links: DataFrame,
    watermark: str = "10 minutes",
    time_col: str = "discovered_at",
) -> DataFrame:
    """Streaming first-discovery dedup over a discovered-link stream.

    Input: streaming DataFrame with (url, referrer, anchor_text, link_pos,
    ``time_col`` timestamp). One row per distinct URL within the watermark
    horizon; state is bounded by the watermark (late duplicates beyond it are
    caught by the batch seen-table anti-join downstream).
    """
    return (
        links.withColumn("url_hash", url_hash("url"))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )


def fetch_metrics_stream(
    results: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    time_col: str = "fetched_at",
) -> DataFrame:
    """Per-host tumbling-window fetch metrics with late-data handling.

    Input: streaming (url, status_code, content_len, ``time_col``).
    Output: (window, host, n_fetched, n_errors, bytes) — append-mode capable
    once the watermark passes each window.
    """
    return (
        results.withColumn("host", url_host("url"))
        .withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("win"), "host")
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(
                F.when(
                    F.col("status_code").isNull() | (F.col("status_code") >= 400), 1
                ).otherwise(0)
            ).alias("n_errors"),
            F.sum("content_len").alias("bytes"),
        )
    )


def frontier_file_stream(spark, frontier_dir: str, schema: str) -> DataFrame:
    """Tail a frontier append directory as a file stream (live enqueue feed)."""
    return spark.readStream.schema(schema).parquet(frontier_dir)
