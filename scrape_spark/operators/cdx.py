"""CDX-style capture index — globally sorted SURT layout + prefix probes.

Common Crawl publishes its URL index as CDX shards: capture records sorted
by (SURT key, timestamp), so every per-host / per-domain / per-path-subtree
question is a CONTIGUOUS RANGE of one sorted file set instead of a 10^10-row
scan. This module is that layout on Spark primitives:

- ``build_cdx_index``   — stamp the SURT key (map-only JVM expression,
  functions/surt.py) and produce a GLOBALLY sorted frame:
  ``repartitionByRange`` on the key gives disjoint, ordered partition
  ranges (one range-exchange — the unavoidable sort shuffle), then
  ``sortWithinPartitions`` orders inside each. Written as parquet, every
  file covers a disjoint key range and carries min/max footer stats.
- ``write_cdx_index`` / ``read_cdx_index`` — persist/open the sorted shards.
- ``prefix_lookup``     — a SURT-prefix probe as a ``startswith`` predicate.
  Spark pushes ``StringStartsWith`` into the parquet scan (visible as
  ``PushedFilters`` in the formatted plan), and because the layout is
  range-sorted the footer stats prune every non-overlapping file: the probe
  reads O(matching captures), not O(index). That pruning is the entire
  reason the index exists at 100 TB.

The reference has no index (raw ``url(255)`` unique key only,
schema/scraped_pages.sql:14); this is the lake-side read path a crawl at
frontier scale needs for dedup lookups, recrawl policies and WARC replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scrape_spark.functions.surt import surt_key_col


def _next_prefix(prefix: str) -> str | None:
    """The smallest string greater than every ``prefix``-prefixed string.

    Increment the last code point, carrying over maxed-out ones — correct
    for ANY continuation (including supplementary-plane characters: SURT
    keys store URLs verbatim, so non-BMP bytes are possible and a naive
    ``prefix + chr(0xFFFF)`` bound would EXCLUDE keys whose continuation
    sorts above it). Comparison semantics match Spark's binary string
    order because incrementing a code point increments its first differing
    UTF-8 byte. Returns None when every char is U+10FFFF (no finite upper
    bound; practically unreachable for SURT keys).
    """
    out = list(prefix)
    while out:
        cp = ord(out[-1])
        if cp < 0x10FFFF:
            # skip the surrogate gap — lone surrogates don't round-trip
            nxt = 0xE000 if cp == 0xD7FF else cp + 1
            out[-1] = chr(nxt)
            return "".join(out)
        out.pop()
    return None


def build_cdx_index(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    num_ranges: int | None = None,
) -> DataFrame:
    """SURT-key and globally sort a capture frame.

    One range exchange (sampled split points, so mega-hosts spread across
    several ranges instead of hot-spotting one task — range partitioning is
    the skew-safe choice for sorted output), then a partition-local sort.
    Output column order: (surt_key, ts, *payload).
    """
    keyed = df.withColumn("surt_key", surt_key_col(url_col))
    cols = ["surt_key", ts_col] + [
        c for c in df.columns if c not in (ts_col, "surt_key")
    ]
    return _range_sort(keyed.select(*cols), ts_col, num_ranges)


def _range_sort(df: DataFrame, ts_col: str, num_ranges: int | None) -> DataFrame:
    """The index sort layout — ONE definition, shared by build and compact
    so a layout change (e.g. a secondary sort column) cannot diverge."""
    if num_ranges is not None:
        df = df.repartitionByRange(num_ranges, "surt_key", ts_col)
    else:
        df = df.repartitionByRange("surt_key", ts_col)
    return df.sortWithinPartitions("surt_key", ts_col)


def write_cdx_index(index: DataFrame, path: str) -> None:
    """Persist the sorted shards (order preserved within each file)."""
    index.write.mode("overwrite").parquet(path)


def read_cdx_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def prefix_range_pred(prefix: str, key_col: str = "surt_key") -> Column:
    """``startswith`` as a closed-open key range.

    Expressed as a range (not just ``startswith``) so BOTH pushdown forms
    are available to the scan: ``StringStartsWith`` plus ``GreaterThanOrEqual/
    LessThan`` — the latter is what prunes row groups on engines that only
    evaluate min/max against comparison predicates.
    """
    c = F.col(key_col)
    pred = c.startswith(F.lit(prefix)) & (c >= F.lit(prefix))
    upper = _next_prefix(prefix)
    if upper is not None:
        pred = pred & (c < F.lit(upper))
    return pred


def prefix_lookup(
    index: DataFrame,
    prefix: str,
    key_col: str = "surt_key",
    ts_col: str = "ts",
    with_rank: bool = True,
) -> DataFrame:
    """All captures whose SURT key starts with ``prefix``, replay-ordered.

    ``capture_rank`` numbers captures per key by timestamp (the CDX replay
    order). The rank window shuffles ONLY the matched rows — pruning has
    already cut the scan to the overlapping shards.
    """
    hits = index.where(prefix_range_pred(prefix, key_col))
    if not with_rank:
        return hits
    w = Window.partitionBy(key_col).orderBy(ts_col)
    return hits.withColumn("capture_rank", F.row_number().over(w))


# -- multi-run layout (LSM-style: per-crawl sorted runs + compaction) ----------
# Common Crawl publishes one CDX index PER CRAWL; clients probe every run
# and merge. The engine mirrors that: each capture batch writes its own
# sorted run (build_cdx_index + write_cdx_index), probes fan out across
# runs (each pruned independently — the union preserves per-run pruning),
# and a periodic compaction folds runs into one index, amortizing the sort
# the way the statestore's delta compaction amortizes snapshot merges.


def read_cdx_runs(spark: SparkSession, run_paths: list[str]) -> DataFrame:
    """Open several runs as one frame — a single multi-path scan node, so
    downstream predicates push into EVERY run's files identically."""
    if not run_paths:
        raise ValueError("run_paths must be non-empty")
    return spark.read.parquet(*run_paths)


def prefix_lookup_runs(
    spark: SparkSession,
    run_paths: list[str],
    prefix: str,
    ts_col: str = "ts",
    with_rank: bool = True,
) -> DataFrame:
    """Probe several sorted runs; rank replays across ALL runs by time.

    Delegates to :func:`prefix_lookup` over the multi-run scan — the
    predicate pushes through to each run's files, so pruning is identical
    to probing the runs one by one; only matched rows reach the rank
    window.
    """
    return prefix_lookup(
        read_cdx_runs(spark, run_paths), prefix, ts_col=ts_col,
        with_rank=with_rank,
    )


def compact_cdx_runs(
    spark: SparkSession,
    run_paths: list[str],
    out_path: str,
    ts_col: str = "ts",
    num_ranges: int | None = None,
) -> DataFrame:
    """Fold sorted runs into one globally sorted index at ``out_path``.

    One range exchange over the union — the same cost profile as building
    from scratch, paid once per compaction cycle instead of per probe.
    The inputs are already keyed, so the SURT kernel does not re-run;
    the sort layout is shared with ``build_cdx_index`` (``_range_sort``).
    """
    merged = read_cdx_runs(spark, run_paths)
    write_cdx_index(_range_sort(merged, ts_col, num_ranges), out_path)
    return read_cdx_index(spark, out_path)
