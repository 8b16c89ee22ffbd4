"""Iterative frontier-expansion crawl — one DataFrame plan per round.

The reference's ``while True: get_unprocessed_page(); process_single_page()``
loop (scraper.py:200-207) processes ONE page per iteration with ~20 MySQL
round-trips and a global sleep. Here one *round* processes the entire
politeness-capped pending frontier as a single declarative plan
(SURVEY.md §3.2):

    pending ⟵ frontier WHERE status='pending'
    robots refresh (stale hosts only) → broadcast-join → blocked / allowed
    per-host quota + salted top-k  → batch        (T3; skew-capped)
    virtual fetch slots             → politeness evidence (monotone per host)
    batch ⋈ pages (simulated fetch) → hits + misses (S2; 404 path)
    fused parse UDF                 → text, title, links  (F1-F6, one pass)
    posexplode links → first-discovery dedup → seen-set anti-join (D1)
    deterministic seq assignment    → new pending rows (SURVEY §7.4)
    frontier state transition + seen update + metrics → one snapshot each

Scale notes (10^10-URL frontier, 100 TB pages):

- The ``pages`` table is only ever SCANNED, never shuffled: the quota-capped
  batch broadcasts into an inner join (hits) and the misses are recovered by
  anti-joining the batch against the (small) hit-url set. With Iceberg, a
  bucket(url) layout upgrades this to a storage-partitioned join and dynamic
  partition pruning of the scan; html/text columns are pruned away on the
  scheduler path either way (column projection).
- Frontier state is re-written per round through the SnapshotStore
  (write-read-back), so the logical plan does NOT grow with round count —
  the classic iterative-lineage trap — and every round is a resumable
  checkpoint with metrics in its manifest entry (north_rule lineage).
- All counts for metrics are taken off cached round intermediates
  (bounded by the quota), never off the full frontier except one
  ``groupBy(status)`` per round (A1 parity).

Crawl-order determinism: rows get ``seq`` assigned at insertion ordered by
``(depth, parent_seq, link_pos)``; when politeness never defers, this equals
the reference's AUTO_INCREMENT insertion order (verified against the oracle).
``canonical_order`` re-derives the schedule-independent order after any crawl.
"""

from __future__ import annotations

import datetime as _dt
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from scrape_spark.functions.udfs import parse_page_expr, title_with_fallback
from scrape_spark.functions.urls import url_hash, url_host, url_path
from scrape_spark.operators.ordering import assign_global_seq, first_discovery
from scrape_spark.operators.politeness import (
    assign_fetch_slots,
    host_quota_expr,
    per_host_take,
)
from scrape_spark.operators.robots import join_robots, refresh_robots, stale_hosts
from scrape_spark.operators.seen import SeenSet
from scrape_spark.plans.statestore import SnapshotStore

VIRTUAL_EPOCH = _dt.datetime(2025, 6, 1, 0, 0, 0)

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, path string, referrer string, "
    "title string, depth int, parent_seq long, link_pos int, seq long, "
    "method string, payload string, status string, error_message string, "
    "status_code int, content_hash string, page_title string, "
    "text_sha string, text_match boolean, fetch_slot timestamp, "
    "round int"
)

_RESULT_COLS = [
    "status",
    "error_message",
    "status_code",
    "content_hash",
    "page_title",
    "text_sha",
    "text_match",
    "fetch_slot",
    "round",
]


class CrawlJob:
    """Driver-side crawl iteration over SnapshotStore state."""

    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        pages: DataFrame,
        robots_source: DataFrame,
        user_agent: str = "MyScraperBot",
        round_seconds: int = 60,
        zero_delay_cap: int = 1_000_000,
        n_buckets: int = 32,
        bucket_capacity: int = 1 << 17,
        broadcast_batch_limit: int = 2_000_000,
    ) -> None:
        self.spark = spark
        self.store = store
        self.pages = pages
        self.robots_source = robots_source
        self.user_agent = user_agent
        self.round_seconds = round_seconds
        self.zero_delay_cap = zero_delay_cap
        self.broadcast_batch_limit = broadcast_batch_limit
        self.seen = SeenSet(
            store, n_buckets=n_buckets, bucket_capacity=bucket_capacity
        )

    # -- setup -----------------------------------------------------------------
    def seed(self, urls: list[str]) -> None:
        """Initialize frontier + seen set from a seed list (S10)."""
        rows = [(u, i) for i, u in enumerate(urls)]
        seeds = (
            self.spark.createDataFrame(rows, "url string, _ord int")
            .select(
                "url",
                url_hash("url").alias("url_hash"),
                url_host("url").alias("host"),
                url_path("url").alias("path"),
                F.lit(None).cast("string").alias("referrer"),
                F.lit(None).cast("string").alias("title"),
                F.lit(0).alias("depth"),
                F.lit(-1).cast("long").alias("parent_seq"),
                F.col("_ord").alias("link_pos"),
                F.col("_ord").cast("long").alias("seq"),
                F.lit("GET").alias("method"),
                F.lit(None).cast("string").alias("payload"),
                F.lit("pending").alias("status"),
                *[
                    F.lit(None).cast(t).alias(c)
                    for c, t in [
                        ("error_message", "string"),
                        ("status_code", "int"),
                        ("content_hash", "string"),
                        ("page_title", "string"),
                        ("text_sha", "string"),
                        ("text_match", "boolean"),
                        ("fetch_slot", "timestamp"),
                        ("round", "int"),
                    ]
                ]
            )
            .drop("_ord")
        )
        self.store.write(
            "frontier",
            seeds,
            meta={"event": "seed", "urls": len(urls), "next_seq": len(urls)},
        )
        self.seen.add(seeds.select("url"))

    # -- state helpers -----------------------------------------------------------
    def frontier(self) -> DataFrame:
        return self.store.read("frontier")

    def _robots(self) -> DataFrame:
        if self.store.exists("robots"):
            return self.store.read("robots")
        from scrape_spark.operators.robots import ROBOTS_SCHEMA

        return self.spark.createDataFrame([], ROBOTS_SCHEMA)

    def _next_seq(self, frontier: DataFrame) -> int:
        # carried in snapshot metadata (one manifest read); reads the CURRENT
        # snapshot, not the lineage tail, so rollback rewinds the counter too;
        # agg fallback covers stores written before this optimization
        snap = self.store.current_snapshot("frontier")
        if snap and "next_seq" in snap["meta"]:
            return snap["meta"]["next_seq"]
        row = frontier.agg(F.max("seq").alias("m")).collect()[0]
        return (row["m"] or 0) + 1

    def _round_index(self) -> int:
        snaps = self.store.lineage("frontier")
        return sum(1 for s in snaps if s["meta"].get("event") == "round")

    # -- one round ---------------------------------------------------------------
    def run_round(self) -> dict | None:
        """Execute one frontier-expansion round; None when frontier is drained."""
        t0 = time.time()
        round_idx = self._round_index()
        frontier = self.frontier().persist(StorageLevel.MEMORY_AND_DISK)
        pending = frontier.where(F.col("status") == "pending")
        if pending.isEmpty():
            frontier.unpersist()
            return None

        # --- robots refresh for stale/missing hosts only (P4/S5) ---
        # skip the snapshot rewrite entirely when every pending host has valid
        # rules (the common steady-state: TTL is 24h, rounds are minutes)
        robots = self._robots()
        if not stale_hosts(robots, pending.select("host"), self.user_agent).isEmpty():
            robots = refresh_robots(
                robots, pending.select("host"), self.robots_source, self.user_agent
            )
            self.store.write(
                "robots", robots, meta={"event": "round", "round": round_idx}
            )
            robots = self.store.read("robots")  # cut lineage

        # --- robots gate (D2/P3) + politeness (T3) ---
        gated = join_robots(pending, robots, self.user_agent)
        blocked = gated.where(F.col("robots_denied"))
        allowed = gated.where(~F.col("robots_denied")).withColumn(
            "quota",
            host_quota_expr(
                F.col("crawl_delay"), self.round_seconds, self.zero_delay_cap
            ),
        )
        batch = per_host_take(allowed, "quota", order_cols=["seq"])
        round_start = F.lit(
            VIRTUAL_EPOCH + _dt.timedelta(seconds=round_idx * self.round_seconds)
        )
        batch = assign_fetch_slots(batch, round_start).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_batch = batch.count()

        # --- simulated fetch: batch ⟕ pages without shuffling pages (S2) ---
        probe = batch.select("url", "seq", "depth")
        if n_batch <= self.broadcast_batch_limit:
            probe = F.broadcast(probe)
        hits = (
            self.pages.select("url", "html", F.col("text").alias("src_text"))
            .join(probe, on="url", how="inner")
            .withColumn("parsed", parse_page_expr("html", "url"))
            .select(
                "url",
                "seq",
                "depth",
                "src_text",
                F.sha2(F.col("html"), 256).alias("content_hash"),  # F3/D3
                F.length("html").alias("content_len"),
                F.col("parsed.text").alias("text"),
                F.col("parsed.title").alias("raw_title"),
                F.col("parsed.links").alias("links"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        # --- link expansion (O2 → D1 → §7.4 ordering) ---
        edges = (
            # P7: empty content → processed, no links (explode drops empty arrays)
            hits.where(F.length(F.trim(F.col("text"))) >= 0)  # keep all; links==[] if empty
            .select(
                F.col("url").alias("referrer"),
                F.col("seq").alias("parent_seq"),
                (F.col("depth") + 1).alias("depth"),
                F.explode("links").alias("link"),
            )
            .select(
                F.col("link.url").alias("url"),
                F.col("link.anchor_text").alias("title"),
                F.col("link.link_pos").alias("link_pos"),
                "referrer",
                "parent_seq",
                "depth",
            )
        )
        fresh = first_discovery(
            edges, "url", ["parent_seq", "link_pos"], ["title", "referrer", "depth"]
        )
        new = self.seen.filter_new(fresh).persist(StorageLevel.MEMORY_AND_DISK)

        frontier_next, metrics = self._apply_round(
            frontier, batch, blocked, hits, new, round_idx, n_batch, t0
        )
        self.store.write("frontier", frontier_next, meta=metrics)
        if metrics["new_urls"]:
            self.seen.add(new.select("url"))
        for df in (frontier, batch, hits, new):
            df.unpersist()
        return metrics

    def _apply_round(
        self, frontier, batch, blocked, hits, new, round_idx, n_batch, t0
    ):
        next_seq = self._next_seq(frontier)

        # new pending rows with deterministic sequence (§7.4)
        new_rows = (
            assign_global_seq(
                new, ["depth", "parent_seq", "link_pos"], start=next_seq
            )
            .select(
                "url",
                url_hash("url").alias("url_hash"),
                url_host("url").alias("host"),
                url_path("url").alias("path"),
                "referrer",
                "title",
                "depth",
                "parent_seq",
                "link_pos",
                "seq",
                F.lit("GET").alias("method"),
                F.lit(None).cast("string").alias("payload"),
                F.lit("pending").alias("status"),
                F.lit(None).cast("string").alias("error_message"),
                F.lit(None).cast("int").alias("status_code"),
                F.lit(None).cast("string").alias("content_hash"),
                F.lit(None).cast("string").alias("page_title"),
                F.lit(None).cast("string").alias("text_sha"),
                F.lit(None).cast("boolean").alias("text_match"),
                F.lit(None).cast("timestamp").alias("fetch_slot"),
                F.lit(None).cast("int").alias("round"),
            )
        )

        # state transition for the processed batch (T5/S6 MERGE semantics)
        results = hits.select(
            "url",
            F.lit("done").alias("status"),
            F.lit(None).cast("string").alias("error_message"),
            F.lit(200).alias("status_code"),
            "content_hash",
            title_with_fallback(F.col("raw_title"), F.col("url")).alias("page_title"),
            F.sha2(F.col("text"), 256).alias("text_sha"),
            (F.col("text") == F.col("src_text")).alias("text_match"),
        )
        misses = batch.join(
            F.broadcast(hits.select("url")), on="url", how="left_anti"
        ).select(
            "url",
            F.lit("error").alias("status"),
            F.lit("404 Not Found").alias("error_message"),
            F.lit(None).cast("int").alias("status_code"),
            F.lit(None).cast("string").alias("content_hash"),
            F.lit(None).cast("string").alias("page_title"),
            F.lit(None).cast("string").alias("text_sha"),
            F.lit(None).cast("boolean").alias("text_match"),
        )
        blocked_res = blocked.select(
            "url",
            F.lit("blocked").alias("status"),
            F.lit("Blocked by robots.txt").alias("error_message"),
            F.lit(None).cast("int").alias("status_code"),
            F.lit(None).cast("string").alias("content_hash"),
            F.lit(None).cast("string").alias("page_title"),
            F.lit(None).cast("string").alias("text_sha"),
            F.lit(None).cast("boolean").alias("text_match"),
        )
        outcome = results.unionByName(misses).unionByName(blocked_res)

        slot_info = batch.select("url", "fetch_slot").unionByName(
            blocked.select("url", F.lit(None).cast("timestamp").alias("fetch_slot"))
        )
        updates = (
            frontier.drop(*_RESULT_COLS)
            .join(outcome, on="url", how="inner")
            .join(slot_info, on="url", how="left")
            .withColumn("round", F.lit(round_idx))
            .select(*frontier.columns)
        )
        untouched = frontier.join(
            outcome.select("url"), on="url", how="left_anti"
        )
        frontier_next = untouched.unionByName(updates).unionByName(
            new_rows.select(*frontier.columns)
        )

        # --- metrics (A1/A2/A4 parity + engine extensions) ---
        # one agg job over the (cached, quota-bounded) hits instead of three
        hit_row = hits.agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("text") == F.col("src_text"), 0).otherwise(1)
            ).alias("mism"),
        ).collect()[0]
        n_hits, text_mismatch = hit_row["n"], int(hit_row["mism"] or 0)
        n_blocked = blocked.count()
        n_new = new.count()
        metrics = {
            "event": "round",
            "round": round_idx,
            "scheduled": n_batch,
            "blocked": n_blocked,
            "fetched": n_hits,
            "fetch_errors": n_batch - n_hits,
            "new_urls": n_new,
            "text_mismatches": text_mismatch,
            "next_seq": next_seq + n_new,
            "round_wall_sec": round(time.time() - t0, 3),
        }
        return frontier_next, metrics

    # -- full crawl ---------------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> list[dict]:
        out = []
        while max_rounds is None or len(out) < max_rounds:
            m = self.run_round()
            if m is None:
                break
            out.append(m)
        return out

    # -- reporting ------------------------------------------------------------------
    def status_counts(self) -> dict[str, int]:
        """A1 parity: one grouped agg instead of two COUNT scans (models.py:174-192)."""
        return {
            r["status"]: r["count"]
            for r in self.frontier().groupBy("status").count().collect()
        }

    def statistics(self) -> dict:
        """A2 parity (models.py:418-442): one aggregate pass."""
        row = (
            self.frontier()
            .agg(
                F.count("*").alias("total"),
                F.sum(F.when(F.col("status") != "pending", 1).otherwise(0)).alias(
                    "processed"
                ),
                F.sum(F.when(F.col("status") == "pending", 1).otherwise(0)).alias(
                    "unprocessed"
                ),
            )
            .collect()[0]
        )
        return dict(total=row["total"], processed=row["processed"], unprocessed=row["unprocessed"])


def canonical_order(frontier: DataFrame) -> DataFrame:
    """Schedule-independent total order (depth, parent_canon, link_pos).

    Re-derives the reference's insertion order from the discovery tree alone
    (SURVEY.md §7.4): depth level 0 ordered by seed order, each next level
    ordered by (parent's canonical seq, link_pos). Equal to the stored ``seq``
    whenever politeness never deferred a page across rounds; under deferral
    this is the order the reference would have produced.

    Driver-iterates depth levels (crawl-tree depth is small); each level is
    one distributed rank. Returns (url, canon_seq, depth).
    """
    max_depth = frontier.agg(F.max("depth")).collect()[0][0]
    if max_depth is None:
        return frontier.sparkSession.createDataFrame(
            [], "url string, canon_seq long, depth int"
        )
    level = assign_global_seq(
        frontier.where(F.col("depth") == 0).select("url", "seq", "depth"),
        ["seq"],
        start=0,
        seq_col="canon_seq",
    ).select("url", "canon_seq", "depth")
    out = [level]
    start = level.count()
    parents = frontier.select(F.col("seq").alias("parent_seq"), F.col("url").alias("_purl"))
    for d in range(1, max_depth + 1):
        children = (
            frontier.where(F.col("depth") == d)
            .select("url", "parent_seq", "link_pos", "depth")
            .join(parents, on="parent_seq", how="inner")
            .join(
                out[-1].select(F.col("url").alias("_purl"), F.col("canon_seq").alias("parent_canon")),
                on="_purl",
                how="inner",
            )
        )
        level = assign_global_seq(
            children, ["parent_canon", "link_pos"], start=start, seq_col="canon_seq"
        ).select("url", "canon_seq", "depth")
        level = level.persist(StorageLevel.MEMORY_AND_DISK)
        cnt = level.count()
        if cnt == 0:
            break
        out.append(level)
        start += cnt
    result = out[0]
    for lv in out[1:]:
        result = result.unionByName(lv)
    return result
