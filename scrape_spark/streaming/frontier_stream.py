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


def politeness_slot_stream(
    candidates: DataFrame,
    crawl_delays: dict[str, int] | None = None,
    default_delay: int = 1,
    time_col: str = "enqueued_at",
) -> DataFrame:
    """Stateful per-host fetch-slot assignment over a candidate URL stream.

    The custom stateful operator of SURVEY §2.8: the reference's
    ``time.sleep(crawl_delay)``-before-every-fetch loop (scraper.py:28-36)
    becomes per-host **state** carried across micro-batches with
    ``applyInPandasWithState`` — each host's state is its last granted slot;
    a new candidate gets ``max(event_time, last_slot + delay)``, so per-host
    spacing ≥ crawl_delay holds across the entire stream lifetime (not just
    within one micro-batch), while hosts proceed in parallel.

    ``crawl_delays``: host → seconds (the robots dim collected once by the
    caller; small). State per host is one long — bounded by host count, the
    same cardinality the robots cache already carries.

    Input: streaming (url, ``time_col`` timestamp, …). Output: input columns
    + ``host`` + ``fetch_slot`` timestamp.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    delays = dict(crawl_delays or {})
    with_host = candidates.withColumn("host", url_host("url"))
    out_schema = StructType(
        list(with_host.schema.fields) + [StructField("fetch_slot", TimestampType())]
    )
    state_schema = StructType([StructField("last_slot_epoch", LongType())])

    def assign(key, pdfs, state):
        host = key[0]
        delay = int(delays.get(host, default_delay))
        last = state.get[0] if state.exists else None
        parts = [p for p in pdfs if not p.empty]
        if not parts:
            return
        batch = pd.concat(parts).sort_values([time_col, "url"])
        slots = []
        for t in batch[time_col]:
            epoch = int(pd.Timestamp(t).timestamp())
            nxt = epoch if last is None else max(epoch, last + delay)
            slots.append(nxt)
            last = nxt
        state.update((int(last),))
        batch = batch.assign(fetch_slot=pd.to_datetime(slots, unit="s"))
        yield batch

    return with_host.groupBy("host").applyInPandasWithState(
        assign,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enqueue_stream(
    links: DataFrame,
    job,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    time_col: str = "discovered_at",
    available_now: bool = True,
):
    """Continuous frontier ingest: discovered-link stream → live CrawlJob.

    The two-tier dedup contract of this module made durable: the streaming
    tier (`dedup_link_stream`) bounds in-flight duplicate state by the
    watermark; the batch tier inside ``CrawlJob.enqueue_frame`` — an exact
    URL anti-join against the seen table plus the (frontier delta, seen ref)
    commit pair — makes every micro-batch idempotent, so foreachBatch's
    at-least-once replay and cross-window duplicates both collapse to
    no-ops. The checkpoint gives the stream its own resume point; the
    snapshot store gives the frontier its own — a crash between the two
    replays the batch, which the anti-join absorbs.

    Returns the started StreamingQuery (caller awaits/stops). Batch order
    inside a micro-batch is pinned (``time_col``, url) so seq assignment
    is deterministic per batch.
    """
    deduped = dedup_link_stream(links, watermark=watermark, time_col=time_col)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        cols = [c for c in ("url", "referrer") if c in batch_df.columns]
        job.enqueue_frame(
            batch_df.select(*cols, F.col(time_col)),
            order_cols=[time_col, "url"],
        )

    writer = (
        deduped.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
