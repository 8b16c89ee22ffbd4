"""Deterministic crawl ordering — distributed replacement for AUTO_INCREMENT.

The reference's crawl order is MySQL insertion order (``id`` AUTO_INCREMENT,
schema/scraped_pages.sql:2) consumed FIFO (``ORDER BY id ASC LIMIT 1``,
models.py:122-129) — inherently sequential. The engine's equivalent total
order is the composite key ``(depth, parent_seq, link_pos)`` (SURVEY.md §7.4):
for a BFS crawl from the same seeds this reproduces the reference's discovery
order exactly (depth-major because FIFO is level-ordered; parent-seq-major
because an earlier-processed parent INSERTs first; link_pos-minor because
links are enqueued in document order, link_extractor.py:19-37).

``assign_global_seq`` densifies that key into an integer sequence WITHOUT a
single-partition global sort: range-partition by the key, rank within
partitions, then add driver-computed per-partition offsets (the per-partition
counts are a tiny aggregate). Wall-clock cost is one pass + one ~numPartitions
row collect — survives any scale the shuffle itself survives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark.storagelevel import StorageLevel

_PID = "_seq_pid"


DEFAULT_SEQ_SMALL_LIMIT = 1_000_000


def assign_global_seq(
    df: DataFrame,
    order_cols: list[str | Column],
    start: int = 0,
    seq_col: str = "seq",
    num_partitions: int | None = None,
    n_rows_est: int | None = None,
    small_limit: int = 0,
) -> DataFrame:
    """Add ``seq_col`` = start, start+1, ... in ``order_cols`` order.

    Equivalent to ``row_number() OVER (ORDER BY order_cols)`` but scalable:
    the global-order window would funnel every row through ONE task; this
    range-partitions instead, so each task ranks only its slice.

    Size-adaptive (the same size-based strategy switch AQE makes for joins):
    when the caller supplies ``n_rows_est ≤ small_limit``, the global window
    IS the right plan — one task ranks a bounded frame, the whole assignment
    stays LAZY (it rides whatever job consumes the result), and the range
    path's extra machinery (sample job + per-partition-counts collect, each
    of which AQE splits into several stage-jobs) disappears. A steady-state
    crawl round with thousands of new URLs pays zero extra Spark jobs for
    sequencing; a 10^8-row round takes the range path. An under-estimate only
    costs one oversized sort task, never correctness.

    The range path persists the input for the duration (range partitioning
    samples its bounds; two uncached evaluations could disagree on partition
    boundaries).
    """
    if n_rows_est is not None and 0 <= n_rows_est <= small_limit:
        w = Window.orderBy(*order_cols)
        return df.withColumn(seq_col, F.row_number().over(w) - 1 + start)
    spark = df.sparkSession
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r[_PID]: r["cnt"]
        for r in parted.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    from scrape_spark.session import local_df

    offsets_df = F.broadcast(
        local_df(
            spark,
            [(pid, off) for pid, off in offsets.items()],
            f"{_PID} int, _seq_off long",
        )
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    out = (
        parted.join(offsets_df, _PID)
        .withColumn(seq_col, F.col("_seq_off") + F.row_number().over(w) - 1)
        .drop(_PID, "_seq_off")
    )
    return out


def first_discovery(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Intra-round dedup: keep, per key, the row with the smallest order key.

    Matches the reference's first-INSERT-wins semantics for a URL reached via
    two parents (the second ``save_page_to_db`` hits the unique key and its
    non-NULL-wins upsert never replaces ``title``/``referrer``,
    models.py:50-114 — so the first discovery defines the row).

    Implemented as ``min_by`` aggregation (single shuffle, partial-agg
    map-side combine) rather than a window + filter (which could not combine
    map-side).
    """
    payload = payload_cols or [c for c in df.columns if c != key_col]
    # pack order cols first so struct MIN compares lexicographically on them;
    # dedupe names preserving order (order cols may also be payload cols).
    names: list[str] = []
    for c in list(order_cols) + payload:
        if c not in names:
            names.append(c)
    packed = F.struct(*[F.col(c) for c in names])
    agg = df.groupBy(key_col).agg(F.min(packed).alias("_first"))
    return agg.select(
        F.col(key_col), *[F.col(f"_first.{c}").alias(c) for c in names]
    )
