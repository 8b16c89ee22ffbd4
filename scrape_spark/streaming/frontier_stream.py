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

    Dedup keys on the URL TEXT (review r5): keying on xxhash64 alone let a
    64-bit collision between two DISTINCT new URLs inside one watermark
    window permanently drop one of them — the downstream exact anti-join
    can only remove rows, never resurrect them, and at the 10^10-URL scale
    this module targets a few 64-bit collisions are EXPECTED. The hash
    column still rides along for bucketing; exactness is the seen-set
    discipline (operators/seen.py: hash only where collisions are
    harmless).
    """
    return (
        links.withColumn("url_hash", url_hash("url"))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["url"])
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
            # a NULL event time must degrade, not kill the stream (the
            # repo's hostile-row convention, functions/urls.py): NaT
            # schedules at epoch 0 — i.e. "enqueued long ago", the next
            # available slot — instead of raising inside the state fn
            ts_t = pd.Timestamp(t)
            epoch = 0 if pd.isna(ts_t) else int(ts_t.timestamp())
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


# ---------------------------------------------------------------------------
# Continuously-maintained distinct-URL sketches (streaming KMV)
# ---------------------------------------------------------------------------
# A live crawl wants "distinct URLs seen per host" as a STANDING figure, not
# a scan-the-world batch job. KMV register arrays merge associatively,
# commutatively and IDEMPOTENTLY (k-min of a union = k-min of the parts'
# k-mins; re-merging the same batch is a set-union no-op), so foreachBatch's
# at-least-once replay needs no dedup machinery at all — the sketch state
# converges to exactly the batch-side answer by algebra, the same
# no-special-cases idempotence story as ``enqueue_stream``'s anti-join.
# State per group is k int64s regardless of stream length.


def _kmv_store_read(spark, store_dir: str):
    """(DataFrame, committed path, stored k), or (None, None, None) before
    the first commit."""
    import os

    ptr = os.path.join(store_dir, "_LATEST")
    if not os.path.exists(ptr):
        return None, None, None
    with open(ptr) as f:
        lines = f.read().splitlines()
    path = lines[0].strip() if lines else ""
    stored_k = int(lines[1]) if len(lines) > 1 else None
    if not path or not os.path.exists(path):
        return None, None, None
    return spark.read.parquet(path), path, stored_k


def kmv_sketch_stream(
    keys: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key_col: str = "url",
    group_col: str = "host",
    k: int = 64,
    available_now: bool = True,
    gc_keep: int = 8,
):
    """Maintain per-group KMV sketches over an unbounded key stream.

    Each micro-batch reduces to its own (group, mins) sketch table, merges
    with the stored table by the pairwise k-min merge (full-outer on group,
    empty side = empty array), and commits snapshot-style: write
    ``sketch_v{batch_id}``, flip the ``_LATEST`` pointer atomically
    (os.replace, carrying k for read-side validation), then GC versions
    older than the superseded one. Crash semantics: before the flip, the
    replay overwrites a never-referenced path; AFTER the flip the pointer
    already names this batch's output, so the replayed batch is detected
    and skipped — merging it again would be an algebraic no-op anyway, but
    re-writing the path the merge plan is lazily reading from is not
    expressible in Spark, so the skip is also what makes replay safe.
    Read the standing figure with :func:`read_kmv_estimates`.
    """
    import os
    import shutil

    from scrape_spark.operators.sketches import _kmv_merge, kmv_sketch
    from scrape_spark.functions import textstats as ts

    d = ts.SPARK_DIALECT
    empty = d["empty_bigint_array"]
    pair = f"array(coalesce(_ma, {empty}), coalesce(_mb, {empty}))"
    merged_expr = _kmv_merge(pair, k, d)
    spark = keys.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(store_dir, f"sketch_v{int(batch_id)}")
        prev, prev_path, stored_k = _kmv_store_read(spark, store_dir)
        if prev_path == out:
            return  # at-least-once replay of an already-committed batch
        if stored_k is not None and stored_k != int(k):
            raise ValueError(
                f"sketch store {store_dir} was built with k={stored_k}, "
                f"stream configured with k={k}"
            )
        batch_sk = kmv_sketch(batch_df, key_col, group_col, k).select(
            F.col(group_col).alias("_g"), F.col("mins").alias("_mb")
        )
        if prev is None:
            merged = batch_sk.select(
                F.col("_g").alias(group_col),
                F.expr(
                    d["aslice"].format(arr="_mb", k=str(int(k)))
                ).alias("mins"),
            )
        else:
            p = prev.select(
                F.col(group_col).alias("_g"), F.col("mins").alias("_ma")
            )
            merged = p.join(batch_sk, "_g", "full_outer").select(
                F.col("_g").alias(group_col),
                F.expr(merged_expr).alias("mins"),
            )
        merged.withColumn(
            "n_mins", F.expr(d["size"].format(arr="mins")).cast("long")
        ).write.mode("overwrite").parquet(out)
        tmp = os.path.join(store_dir, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(f"{out}\n{int(k)}\n")
        os.replace(tmp, os.path.join(store_dir, "_LATEST"))
        # GC: keep the ``gc_keep`` NEWEST versions (by batch id), not just
        # {current, predecessor} — a reader that resolved _LATEST several
        # micro-batches ago can still be mid-scan of an old directory, and
        # with fast triggers the window between its pointer read and scan
        # completion spans multiple commits (ADVICE r3). gc_keep bounds the
        # exposure to gc_keep trigger intervals while still capping store
        # growth at gc_keep table copies; raise it for slow readers.
        versions = sorted(
            (
                int(name[len("sketch_v"):])
                for name in os.listdir(store_dir)
                if name.startswith("sketch_v")
                and name[len("sketch_v"):].isdigit()
            ),
            reverse=True,
        )
        keep = {os.path.join(store_dir, f"sketch_v{v}") for v in
                versions[: max(int(gc_keep), 2)]}
        keep.update({out, prev_path})
        for name in os.listdir(store_dir):
            p_ = os.path.join(store_dir, name)
            if name.startswith("sketch_v") and p_ not in keep:
                shutil.rmtree(p_, ignore_errors=True)

    writer = keys.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_kmv_estimates(
    spark, store_dir: str, group_col: str = "host", k: int | None = None
):
    """(group, n_mins, est_distinct) from the standing sketch store —
    None before the first commit. ``k`` is read from the store's pointer
    (it was pinned at stream time); passing an explicit mismatching k
    raises instead of silently hitting the below-k exact branch with full
    sketches (a massive underestimate)."""
    from scrape_spark.operators.sketches import kmv_estimates

    sk, _, stored_k = _kmv_store_read(spark, store_dir)
    if sk is None:
        return None
    if stored_k is None:
        if k is None:
            # refuse to guess (review r5): interpreting a legacy store's
            # min-arrays with the wrong k silently mis-estimates (the
            # docstring promises a raise on mismatch — a guessed 64
            # against a k=256 store was exactly that mismatch)
            raise ValueError(
                f"sketch store {store_dir} predates the stored-k pointer "
                "line; pass the k it was built with explicitly"
            )
        stored_k = int(k)
    elif k is not None and int(k) != stored_k:
        raise ValueError(
            f"sketch store {store_dir} was built with k={stored_k}, "
            f"read requested k={k}"
        )
    return kmv_estimates(sk, group_col, stored_k)
