"""Iterative frontier-expansion crawl — one DataFrame plan per round.

The reference's ``while True: get_unprocessed_page(); process_single_page()``
loop (scraper.py:200-207) processes ONE page per iteration with ~20 MySQL
round-trips and a global sleep. Here one *round* processes the entire
politeness-capped pending frontier as a single declarative plan
(SURVEY.md §3.2):

    pending ⟵ merge-on-read frontier WHERE status='pending'
    robots refresh (stale hosts only) → broadcast-join → blocked / allowed
    per-host quota + salted top-k  → batch        (T3; skew-capped)
    virtual fetch slots             → politeness evidence (monotone per host)
    batch ⋈ pages on (url, method, payload) → hits + misses (S2/S3; 404 path)
    fused parse UDF                 → text, title, links  (F1-F6, one pass)
    posexplode links → first-discovery dedup → seen-set anti-join (D1)
    deterministic seq assignment    → new pending rows (SURVEY §7.4)
    ROUND DELTA = touched batch rows + blocked rows + new rows
                  → ONE O(batch+new) snapshot append  (never a frontier rewrite)

Scale design (10^10-URL frontier, 100 TB pages):

- **Frontier state is delta-chained, not rewritten.** A round writes ONLY the
  rows it touched (outcome of the quota-bounded batch + newly discovered
  URLs); reads resolve last-writer-wins per url via
  ``SnapshotStore.read_merged`` (Iceberg merge-on-read): the base is scanned
  with a broadcast anti-join against the (small) delta key set, deltas merge
  with one O(delta)-sized shuffle. Periodic compaction (every
  ``compact_every`` rounds) rewrites the merged view as a fresh base so the
  chain never grows unboundedly. The reference's equivalent is a
  row-at-a-time ``UPDATE … WHERE url=%s`` per page (models.py:156-171).
- **The ``pages`` table is only ever SCANNED, never shuffled**: the
  quota-capped batch broadcasts into an inner join (hits). Above the
  broadcast limit, pass a bucketed pages table (``pages_bucketed=True`` with
  a ``CLUSTERED BY (url) SORTED BY (url)`` catalog table): only the probe
  shuffles to the bucket layout and the pre-sorted bucket files merge-join
  in place — the parquet stand-in for an Iceberg bucket(url)
  storage-partitioned join. html/text columns are pruned away on the
  scheduler path either way.
- **Driver-barrier diet**: the frontier's pending count and seq counter ride
  in snapshot metadata, so a steady-state round runs ~4 Spark jobs (seq
  offsets, one fused metrics agg over the cached round delta, the delta
  write, the seen append) — all over O(batch+new) rows; emptiness is decided
  from metadata arithmetic with zero jobs.

Crawl-order determinism: rows get ``seq`` assigned at insertion ordered by
``(depth, parent_seq, link_pos)``; when politeness never defers, this equals
the reference's AUTO_INCREMENT insertion order (verified against the oracle).
``canonical_order`` re-derives the schedule-independent order after any crawl.
"""

from __future__ import annotations

import datetime as _dt
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from scrape_spark.functions.udfs import parse_page_expr, title_with_fallback
from scrape_spark.functions.urls import url_hash, url_host, url_path
from scrape_spark.operators.ordering import (
    DEFAULT_SEQ_SMALL_LIMIT,
    assign_global_seq,
    first_discovery,
)
from scrape_spark.operators.politeness import (
    assign_fetch_slots,
    host_quota_expr,
    per_host_take,
)
from scrape_spark.operators.robots import join_robots, refresh_robots, stale_hosts
from scrape_spark.operators.seen import SeenSet
from scrape_spark.plans.statestore import SnapshotStore, commit_order
from scrape_spark.session import empty_df, local_df

VIRTUAL_EPOCH = _dt.datetime(2025, 6, 1, 0, 0, 0)

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, path string, referrer string, "
    "title string, depth int, parent_seq long, link_pos int, seq long, "
    "method string, payload string, status string, error_message string, "
    "status_code int, content_hash string, page_title string, "
    "text_sha string, text_match boolean, fetch_slot timestamp, "
    "round int"
)

FRONTIER_COLS = [s.split()[0] for s in FRONTIER_SCHEMA.split(", ")]

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

# fetch identity (S2/S3): a POST page is keyed by its payload too — same url
# with a different body is a DIFFERENT fetch (reference fetch_post_content,
# scraper.py:119-149, posts row["payload"] and stores the response per row).
# For GET the payload is IGNORED (reference scrape_page never reads it), so
# the key is method-aware: a GET row that happens to carry a payload must
# still key as '' or its fetch hit would miss the outcome join and the row
# would be marked error while its links entered the frontier.
_FETCH_KEYS = ["url", "method", "_payload_key"]


def _payload_key(
    col: Column | str = "payload", method_col: Column | str = "method"
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    m = F.col(method_col) if isinstance(method_col, str) else method_col
    return F.when(m == "GET", F.lit("")).otherwise(F.coalesce(c, F.lit("")))


def simulated_fetch(
    pages: DataFrame,
    probe: DataFrame,
    pages_have_methods: bool,
    broadcast: bool = True,
    bucketed: bool = False,
) -> DataFrame:
    """Fetch identity join: probe (url, method, _payload_key, …) ⋈ pages.

    The pages side is never shuffled:

    - all-GET web (``pages_have_methods=False`` — the Common-Crawl shape):
      ONE url-keyed join against a single pages scan. POST probes cannot hit
      an all-GET web, so they skip the join entirely and surface as fetch
      errors downstream (batch anti-join → 404) — this keeps the join key
      equal to the bucket key, so a ``CLUSTERED BY (url)`` pages table
      shuffles only the probe (``bucketed=True`` forces that sort-merge).
    - mixed web: the GET probe joins the GET page subset on url; the POST
      probe joins on the full (url, method, payload) identity (reference
      fetch_post_content, scraper.py:119-149 — same url + different body is
      a different page).

    Returns page rows with probe columns attached plus method/_payload_key.
    """
    get_probe = probe.where(F.col("method") == "GET").drop("method", "_payload_key")
    if broadcast:
        get_probe = F.broadcast(get_probe)
    elif bucketed:
        get_probe = get_probe.hint("merge")
    if not pages_have_methods:
        return (
            pages.drop("method", "payload")
            .join(get_probe, on="url", how="inner")
            .withColumn("method", F.lit("GET"))
            .withColumn("_payload_key", F.lit(""))
        )
    pages_keyed = pages.withColumn("_payload_key", _payload_key())
    hits_get = (
        pages_keyed.where(F.col("method") == "GET")
        .drop("method", "_payload_key", "payload")
        .join(get_probe, on="url", how="inner")
        .withColumn("method", F.lit("GET"))
        .withColumn("_payload_key", F.lit(""))
    )
    post_probe = probe.where(F.col("method") != "GET")
    if broadcast:
        post_probe = F.broadcast(post_probe)
    hits_post = pages_keyed.drop("payload").join(
        post_probe, on=_FETCH_KEYS, how="inner"
    )
    return hits_get.unionByName(hits_post.select(*hits_get.columns))


class CrawlJob:
    """Driver-side crawl iteration over SnapshotStore state."""

    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        pages: DataFrame,
        robots_source: DataFrame | None,
        user_agent: str = "MyScraperBot",
        round_seconds: int = 60,
        zero_delay_cap: int = 1_000_000,
        n_buckets: int = 32,
        bucket_capacity: int = 1 << 17,
        broadcast_batch_limit: int = 2_000_000,
        compact_every: int = 8,
        pages_bucketed: bool = False,
        url_key_chars: int | None = None,
        priority: Column | None = None,
        conditional_fetch: bool = False,
        fetcher=None,
        robots_scheme: str = "https",
    ) -> None:
        self.robots_scheme = robots_scheme
        self.spark = spark
        self.store = store
        # Live-network mode (S2 executable variant): a plans/httpfetch
        # HttpFetcher replaces the pages-table join — the scheduled batch is
        # actually fetched over HTTP (host-partitioned mapInPandas, bounded
        # pool, reference timeout/encoding/error semantics). ``pages`` may
        # then be None (a true live frontier) or kept as the parallel-truth
        # capture table: when present it still supplies ``src_text`` so the
        # byte-identical-extracted-text invariant (text_match) is verified
        # against the capture — the e2e equivalence suite runs both modes
        # over one corpus and asserts identical final state.
        self.fetcher = fetcher
        if pages is None and fetcher is None:
            raise ValueError("CrawlJob needs a pages table or a fetcher")
        # S3: fetch identity includes (method, payload); a pages source without
        # those columns is an all-GET web (the common Common-Crawl shape),
        # which keeps the fetch join url-keyed and bucket-layout-compatible
        self.pages_have_methods = pages is not None and "method" in pages.columns
        if self.pages_have_methods and "payload" not in pages.columns:
            pages = pages.withColumn("payload", F.lit(None).cast("string"))
        self.pages = pages
        self.pages_bucketed = pages_bucketed
        # Live robots mode (r5): robots_source=None with a fetcher means
        # rules are ACTUALLY fetched — {robots_scheme}://{host}/robots.txt
        # through the same HttpFetcher (plans/httpfetch.live_robots_source;
        # reference robots_handler.py:9-48) for stale hosts only, with
        # fetch-failure-stores-nothing semantics (URLError path,
        # robots_handler.py:42-44 — hence negative_cache=False there: a
        # dead host is re-probed next round, not cached empty).
        if robots_source is None and fetcher is None:
            raise ValueError(
                "CrawlJob needs a robots_source or a fetcher (live robots)"
            )
        self.robots_source = robots_source
        self.user_agent = user_agent
        self.round_seconds = round_seconds
        self.zero_delay_cap = zero_delay_cap
        self.broadcast_batch_limit = broadcast_batch_limit
        self.compact_every = compact_every
        # SURVEY §7.4 strict-parity mode: 255 reproduces the reference's
        # MySQL ``url(255)`` unique-key truncation for dedup; None = full URL
        self.url_key_chars = url_key_chars
        # Frontier dequeue priority (north-rule "priority queue"): an
        # expression over frontier columns ranked ASCENDING ahead of the FIFO
        # seq tiebreak (pass e.g. F.col("depth") for shallow-first, or a
        # negated score for highest-first). None = the reference's pure FIFO
        # (ORDER BY id ASC, models.py:122-129), which the equivalence suite
        # pins. The salted two-stage top-k is order-key-generic, so a
        # mega-host never funnels through one task either way.
        self.priority = priority
        # HTTP conditional-revisit extension (engine-only; the reference
        # re-downloads and re-parses unconditionally on every re-crawl,
        # scraper.py:73-109). When on, a scheduled row whose frontier
        # content_hash (the strong validator, = sha256 of the prior body —
        # the ETag analog) matches the current page body takes the 304 path:
        # status_code=304, prior page_title/text_sha/text_match preserved,
        # NO parse (the body is nulled BEFORE the Arrow transfer, so for
        # unchanged pages the Python stage receives zero bytes) and NO link
        # re-expansion. Observationally identical to a full re-fetch for the
        # frontier: an unchanged page's links were all enqueued on its first
        # crawl, so the seen anti-join would drop every one of them anyway
        # (pinned by tests/test_conditional_fetch.py equivalence cases) — the flag only
        # removes the wasted transfer/parse, which at 100 TB re-crawl scale
        # is most of the work (unchanged pages dominate real re-crawls).
        # Default off: the pyref-parity suites pin the reference's
        # always-200 re-download semantics.
        self.conditional_fetch = conditional_fetch
        self.seen = SeenSet(
            store,
            n_buckets=n_buckets,
            bucket_capacity=bucket_capacity,
            url_key_chars=url_key_chars,
        )
        # Pending-set carry-over: the hot loop's next-round pending is derived
        # from this round's persisted pending + the just-committed delta
        # (anti-join on seq + union of new rows) instead of re-merging the
        # whole snapshot chain every round — the merge-on-read cost leaves
        # the loop entirely. The store stays the durable truth: the cache is
        # tagged with the frontier snapshot id it reflects and any mismatch
        # (rollback, admin mutation, fresh job) falls back to read_merged.
        self._pending_cache: DataFrame | None = None
        self._pending_cache_snap: int | None = None
        self._pending_retired: list[DataFrame] = []
        # run once per (re)constructed job: repair the frontier→seen commit
        # pair if a crash split it (see _reconcile_seen_refs)
        self._seen_reconciled = False

    # -- pending-set cache ------------------------------------------------------
    def _pending_for_round(self) -> DataFrame:
        cur = self.store.current_snapshot("frontier")
        cur_id = cur["id"] if cur else None
        if (
            self._pending_cache is not None
            and self._pending_cache_snap == cur_id
        ):
            return self._pending_cache
        self._drop_pending_cache()
        df = (
            self.frontier()
            .where(F.col("status") == "pending")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._pending_cache, self._pending_cache_snap = df, cur_id
        return df

    def _advance_pending_cache(
        self, pending: DataFrame, delta_committed: DataFrame, n_delta: int
    ) -> None:
        """Roll the cache forward over the committed round delta.

        next pending = (pending − delta keys) ∪ delta's new pending rows.
        The delta key set is O(batch+new); under the broadcast limit the
        anti-join moves zero pending rows. The parent cache stays persisted
        for one more round (the child materializes lazily inside the next
        round's write job), then retires.
        """
        keys = delta_committed.select("seq")
        if n_delta <= self.broadcast_batch_limit:
            keys = F.broadcast(keys)
        nxt = (
            pending.join(keys, on="seq", how="left_anti")
            .unionByName(delta_committed.where(F.col("status") == "pending"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        for old in self._pending_retired:
            old.unpersist()
        self._pending_retired = [pending]
        self._pending_cache = nxt
        self._pending_cache_snap = self.store.current_snapshot("frontier")["id"]

    def _drop_pending_cache(self) -> None:
        for df in self._pending_retired:
            df.unpersist()
        if self._pending_cache is not None:
            self._pending_cache.unpersist()
        self._pending_cache = None
        self._pending_cache_snap = None
        self._pending_retired = []

    # -- setup -----------------------------------------------------------------
    def seed(self, urls: list) -> None:
        """Initialize frontier + seen set from a seed list (S10).

        Each seed is a url string (GET), a ``(url, method, payload)`` tuple
        (S3: the reference CLI's ``--method/--payload``, scraper.py:222-231),
        or a ``(url, method, payload, referrer)`` tuple — the reference CLI
        stamps ``--referrer`` onto the seeded row (scraper.py:249-257).
        """
        self._ensure_reconciled()  # repair any crashed pair before mutating
        rows = []
        for i, u in enumerate(urls):
            if isinstance(u, str):
                rows.append((u, "GET", None, None, i))
            elif len(u) == 3:
                url, method, payload = u
                rows.append((url, (method or "GET").upper(), payload, None, i))
            else:
                url, method, payload, referrer = u
                rows.append(
                    (url, (method or "GET").upper(), payload, referrer, i)
                )
        seeds = local_df(
            self.spark,
            rows,
            "url string, method string, payload string, "
            "referrer string, _ord int",
        ).select(
            "url", "method", "payload", "referrer",
            F.col("_ord").cast("long").alias("seq"),
        )
        self._finish_seed(self._seed_projection(seeds), n=len(urls))

    def seed_frame(
        self,
        seeds: DataFrame,
        order_cols: list | None = None,
        dedup: bool = True,
    ) -> int:
        """Distributed seeding from a DataFrame — the sitemap-bootstrap path.

        ``seed()`` takes a driver-side list, which is right for the
        reference-parity CLI but cannot carry a 10^8-row seed set (e.g.
        every ``loc`` of a domain's sitemaps, sources/sitemap.py). This
        variant stays distributed end to end: ordering comes from
        ``assign_global_seq`` (range-partitioned ranking, never a global
        single-task sort at scale), first-occurrence dedup is a per-url
        window (the frontier's unique-url invariant — sitemaps repeat URLs
        across files), and the counts the snapshot meta needs fall out of
        one small aggregate. Returns the number of rows seeded.

        ``seeds`` columns: ``url`` required; ``method``/``payload``/
        ``referrer`` optional (defaulted like the list path). ``order_cols``
        defines the seq order (default: url ascending — deterministic for
        any input partitioning; sitemap callers pass
        ``[sitemap_url, entry_pos]`` to keep document order).
        """
        self._ensure_reconciled()
        norm, order = self._norm_seed_frame(seeds, order_cols, dedup)
        seqd = assign_global_seq(norm, order, seq_col="seq").select(
            "url", "method", "payload", "referrer", "seq"
        )
        proj = self._seed_projection(seqd).persist(StorageLevel.MEMORY_AND_DISK)
        n = proj.count()  # one job; seeding is a once-per-crawl admin cost
        try:
            self._finish_seed(proj, n=n)
        finally:
            proj.unpersist()
        return n

    @staticmethod
    def _norm_seed_frame(
        seeds: DataFrame, order_cols: list | None, dedup: bool
    ) -> tuple[DataFrame, list]:
        """Shared normalization for the DataFrame ingest paths (seed_frame /
        enqueue_frame): default method/payload/referrer like the list path,
        keep caller order columns, first-occurrence dedup per url."""
        cols = set(seeds.columns)
        norm = seeds.select(
            F.col("url"),
            (
                F.upper(F.coalesce(F.col("method"), F.lit("GET")))
                if "method" in cols
                else F.lit("GET")
            ).alias("method"),
            (
                F.col("payload") if "payload" in cols
                else F.lit(None).cast("string")
            ).alias("payload"),
            (
                F.col("referrer") if "referrer" in cols
                else F.lit(None).cast("string")
            ).alias("referrer"),
            *[F.col(c) for c in (order_cols or []) if c not in
              ("url", "method", "payload", "referrer")],
        )
        order = [F.col(c) if isinstance(c, str) else c
                 for c in (order_cols or ["url"])]
        if dedup:
            w = Window.partitionBy("url").orderBy(*order)
            norm = (
                norm.withColumn("_first", F.row_number().over(w))
                .where(F.col("_first") == 1)
                .drop("_first")
            )
        return norm, order

    def enqueue_frame(
        self,
        links: DataFrame,
        order_cols: list | None = None,
        dedup: bool = True,
    ) -> int:
        """Distributed incremental enqueue into an EXISTING frontier — the
        continuous-ingest path (streaming ``foreachBatch`` micro-batches,
        bulk sitemap refreshes, out-of-band discovery feeds).

        ``seed_frame`` writes a fresh BASE (a new crawl); this appends a
        DELTA to a live one: batch-normalize + within-batch dedup (shared
        ``_norm_seed_frame``), exact anti-join against the seen set (so a
        REPLAYED micro-batch — foreachBatch's at-least-once contract — is
        an idempotent no-op), seq continuation from the metadata counter,
        then the same two-step (frontier delta, seen ref) durable commit
        pair as the crawl round, stamped ``src_snap`` so a crash between
        the steps is repaired on resume (``_reconcile_seen_refs``).
        Returns the number of rows actually enqueued.

        Scale shape: O(batch + new) — one anti-join against the seen set
        (bloom-pruned, broadcast below the probe limit), one range-ranked
        seq assignment over the batch, one delta write sized to the batch.
        The frontier itself is never rewritten.
        """
        if not self.store.exists("frontier"):
            raise ValueError(
                "enqueue_frame appends to an existing frontier — "
                "seed()/seed_frame() a new crawl first"
            )
        self._ensure_reconciled()
        norm, order = self._norm_seed_frame(links, order_cols, dedup)
        new = self.seen.filter_new(norm, url_col="url")
        meta0 = self._meta()
        next_seq = self._next_seq(meta0)
        seqd = assign_global_seq(
            new, order, start=next_seq, seq_col="seq"
        ).select("url", "method", "payload", "referrer", "seq")
        proj = self._seed_projection(seqd).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n = proj.count()
            if n == 0:
                return 0
            m = self._carry_meta("enqueue")
            m["next_seq"] = next_seq + n
            m["new_urls"] = n
            if meta0.get("pending") is not None:
                m["pending"] = meta0["pending"] + n
            sid = self.store.write(
                "frontier",
                proj.select(*FRONTIER_COLS),
                coalesce=SnapshotStore.partitions_for(n),
                meta=m,
            )
            snap = self.store.current_snapshot("frontier")
            self.seen.add_ref(
                snap["path"], n_rows=n, meta={"round": -1, "src_snap": sid}
            )
            # new hosts may lack robots rows; same invariant as seeding
            robots = self._robots()
            hosts = proj.select("host", "url")
            if not stale_hosts(robots, hosts, self.user_agent).isEmpty():
                self._refresh_robots_write(robots, hosts, round_idx=-1)
            else:
                self._bump_robots_watermark()
            self._drop_pending_cache()
            return n
        finally:
            proj.unpersist()

    def _seed_projection(self, seeds: DataFrame) -> DataFrame:
        """(url, method, payload, referrer, seq) → full frontier row shape."""
        return seeds.select(
            "url",
            url_hash("url").alias("url_hash"),
            url_host("url").alias("host"),
            url_path("url").alias("path"),
            "referrer",
            F.lit(None).cast("string").alias("title"),
            F.lit(0).alias("depth"),
            F.lit(-1).cast("long").alias("parent_seq"),
            F.col("seq").cast("int").alias("link_pos"),
            F.col("seq").cast("long").alias("seq"),
            "method",
            "payload",
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
            ],
        )

    def _finish_seed(self, seeds: DataFrame, n: int) -> None:
        """Shared tail of both seed paths: the (frontier, seen) commit pair
        plus the robots coverage invariant (see ``_reconcile_seen_refs`` for
        the crash-repair contract this pair participates in)."""
        self.store.write(
            "frontier",
            seeds,
            coalesce=SnapshotStore.partitions_for(n),
            meta={
                "event": "seed",
                "base": True,
                "urls": n,
                "next_seq": n,
                "n_rounds": 0,
                "pending": n,
            },
        )
        self.seen.add(seeds.select("url"), meta={"round": -1})
        # establish the robots coverage invariant at seed time: every host
        # present in the frontier has a (possibly negative-cached) rules row,
        # so rounds only ever need to check NEWLY-discovered hosts
        robots = self._robots()
        seed_hosts = seeds.select("host", "url")
        if not stale_hosts(robots, seed_hosts, self.user_agent).isEmpty():
            self._refresh_robots_write(robots, seed_hosts, round_idx=-1)
        else:
            self._bump_robots_watermark()

    # -- state helpers -----------------------------------------------------------
    def frontier(self) -> DataFrame:
        """Merge-on-read view: base scan + broadcast anti-join + delta LWW."""
        return self.store.read_merged(
            "frontier", key="url", broadcast_keys_limit=self.broadcast_batch_limit
        )

    def _robots(self) -> DataFrame:
        if self.store.exists("robots"):
            return self.store.read("robots")
        from scrape_spark.operators.robots import ROBOTS_SCHEMA

        return empty_df(self.spark, ROBOTS_SCHEMA)

    # -- robots bookkeeping (P4/S5 at scale) ----------------------------------
    # Invariant: the robots table covers every host present in the frontier
    # (fetch failures are negative-cached with the same TTL — identical
    # allow/deny outcome). Two watermarks in the robots snapshot meta make the
    # steady-state round cost ZERO robots jobs:
    #   min_expires   — earliest TTL in the table; before it, no row can be
    #                   stale, so nothing needs re-fetching;
    #   frontier_snap — last frontier snapshot whose hosts were checked; only
    #                   frontier deltas AFTER it can introduce new hosts, so
    #                   the check reads O(recent new rows), never the frontier.

    def _bump_robots_watermark(self) -> None:
        f_snap = self.store.current_snapshot("frontier")
        if self.store.exists("robots") and f_snap is not None:
            self.store.update_meta("robots", frontier_snap=f_snap["id"])

    def _refresh_robots_write(
        self, robots: DataFrame, hosts: DataFrame, round_idx: int
    ) -> DataFrame:
        if self.robots_source is not None:
            source, neg_cache, now_col = self.robots_source, True, None
        else:
            # live mode: probe only the STALE hosts (valid rows never
            # trigger a network fetch), store nothing on transport failure.
            # The url column (when the caller supplies it) provides the
            # per-host authority exemplar — ports survive. `now` is pinned
            # ONCE for this write (review r5): the staleness predicate
            # evaluates both here and inside refresh_robots, and a row
            # expiring between two wall-clock reads would make the live
            # source and the internal stale set disagree for a round.
            from scrape_spark.plans.httpfetch import live_robots_source

            now_col = F.lit(
                _dt.datetime.now(_dt.UTC).replace(tzinfo=None)
            ).cast("timestamp")
            stale = stale_hosts(robots, hosts, self.user_agent, now=now_col)
            cand = (
                hosts.join(stale, "host", "left_semi")
                if "url" in hosts.columns
                else stale
            )
            source = live_robots_source(
                self.fetcher, cand, scheme=self.robots_scheme
            )
            neg_cache = False
        refreshed = refresh_robots(
            robots,
            hosts,
            source,
            self.user_agent,
            now=now_col,
            negative_cache=neg_cache,
        )
        self.store.write(
            "robots",
            refreshed,
            meta={"event": "round", "round": round_idx},
            coalesce=1,  # per-host dim table: small rows, one file
        )
        refreshed = self.store.read("robots")  # cut lineage
        row = refreshed.agg(F.min("expires_at").alias("m")).collect()[0]
        me = row["m"].isoformat() if row["m"] is not None else None
        f_snap = self.store.current_snapshot("frontier")
        self.store.update_meta(
            "robots",
            min_expires=me,
            frontier_snap=f_snap["id"] if f_snap else -1,
        )
        return refreshed

    def _robots_for_round(self, pending: DataFrame, round_idx: int) -> DataFrame:
        """Rules table for the round — usually zero Spark jobs (see above)."""
        robots = self._robots()
        snap = self.store.current_snapshot("robots")
        check = None
        full_check = False
        if snap is None:
            check, full_check = pending.select("host", "url"), True
        else:
            m = snap["meta"]
            me, fs = m.get("min_expires"), m.get("frontier_snap")
            now = _dt.datetime.now(_dt.UTC).replace(tzinfo=None)
            if me is None or fs is None or now >= _dt.datetime.fromisoformat(me):
                check, full_check = pending.select("host", "url"), True  # TTL lapsed
            else:
                newer = [
                    p for p in self.store.chain_parts("frontier") if p["id"] > fs
                ]
                for p in newer:  # O(new rows since last check), tiny
                    # a round delta that added no URLs cannot add a host:
                    # its pending rows are exactly its new rows (metrics are
                    # patched into the meta right after commit; a missing
                    # field — crash window, non-round event — keeps the scan)
                    pm = p["meta"]
                    if pm.get("event") == "round" and (
                        pm.get("new_urls") == 0
                        or pm.get("new_hosts_uncovered") == 0
                    ):
                        continue
                    d = (
                        self.spark.read.parquet(p["path"])
                        .where(F.col("status") == "pending")
                        .select("host", "url")
                    )
                    check = d if check is None else check.unionByName(d)
                if check is None and newer:
                    # nothing to scan — advance the watermark so later rounds
                    # skip these parts without walking the manifest again
                    self._bump_robots_watermark()
        if check is not None:
            if not stale_hosts(robots, check, self.user_agent).isEmpty():
                robots = self._refresh_robots_write(robots, check, round_idx)
            else:
                self._bump_robots_watermark()
                if full_check:
                    # TTL lapsed but every PENDING host still has valid rows
                    # (the expired ones left the frontier): advance
                    # min_expires over the still-valid rows, else every
                    # subsequent round repeats the full pending-host scan
                    from scrape_spark.operators.robots import valid_rules

                    row = (
                        valid_rules(robots)
                        .agg(F.min("expires_at").alias("m"))
                        .collect()[0]
                    )
                    if row["m"] is not None:
                        self.store.update_meta(
                            "robots", min_expires=row["m"].isoformat()
                        )
        return robots

    def _meta(self) -> dict:
        snap = self.store.current_snapshot("frontier")
        return snap["meta"] if snap else {}

    def _next_seq(self, meta: dict) -> int:
        # carried in snapshot metadata (one manifest read); reads the CURRENT
        # snapshot, not the lineage tail, so rollback rewinds the counter too;
        # agg fallback covers stores written before this optimization
        if "next_seq" in meta:
            return meta["next_seq"]
        row = self.frontier().agg(F.max("seq").alias("m")).collect()[0]
        return (row["m"] or 0) + 1

    def _round_index(self, meta: dict) -> int:
        # n_rounds in the CURRENT snapshot's meta (not a lineage count):
        # orphaned forward snapshots after a rollback must not inflate the
        # replayed round index (its `round` column and virtual fetch slots
        # would diverge from the original run)
        if "n_rounds" in meta:
            return meta["n_rounds"]
        cur = self.store.current_snapshot("frontier")
        cur_id = cur["id"] if cur else -1
        return sum(
            1
            for s in self.store.lineage("frontier")
            if s["meta"].get("event") == "round" and s["id"] <= cur_id
        )

    # -- one round ---------------------------------------------------------------
    def _seen_live_snaps(self) -> list[dict]:
        """Seen-set snapshots on the LIVE chain (id up to current — entries
        past a rollback are orphaned futures and excluded), cut at the LAST
        ``truncate`` event: a truncate starts a new marker epoch, so round /
        src_snap markers from before it must not vouch for commits of the
        run that followed (truncate + re-seed reuses round indices from 0).
        Manifest-only; used by the resume repair."""
        if not self.store.exists(self.seen.name):
            return []
        cur = self.store.current_snapshot(self.seen.name)
        out: list[dict] = []
        for s in self.store.lineage(self.seen.name):
            if s["id"] > cur["id"]:
                continue
            if s["meta"].get("event") == "truncate":
                out = []
            out.append(s)
        return out

    def _pair_completed(
        self, f: dict, marker_match: bool, snaps: list[dict]
    ) -> bool:
        """Did the two-step (frontier write, seen write) commit pair finish?

        Two independent pieces of evidence, either suffices:
        - ``marker_match``: an epoch-bounded round/src_snap marker names the
          frontier snapshot (the precise signal, but admin ops can erase it —
          ``prune`` drops old ref entries, markers and all);
        - any live seen snapshot committed AFTER the frontier head (compared
          by the store's monotonic ``commit_seq``, not wall clocks — see
          ``commit_order``): every seen-mutating entry point of this class
          runs ``_ensure_reconciled`` FIRST, so a seen commit later than the
          frontier head was made either by step 2 itself or by a process
          that had already repaired the pair. Either way the pair is whole,
          and re-registering the old ref would clobber purpose-made state
          (e.g. resurrect a just-removed URL). This soundness argument is
          exactly why mutations must go through CrawlJob, never the raw
          SeenSet/SnapshotStore surface.
        """
        if marker_match:
            return True
        forder = commit_order(f)
        return any(commit_order(s) >= forder for s in snaps)

    def _reconcile_seen_refs(self) -> None:
        """Resume-time repair of the round's two-step durable commit.

        A round commits in two manifest steps: (1) the frontier round delta,
        (2) the seen-set ref to that delta's new URLs (``seen.add_ref``). A
        crash between the two resumes with the last round's new URLs missing
        from the seen set, so a later round could re-discover one and enqueue
        a DUPLICATE frontier row — the reference's unique url key forbids
        that. Repair: if the current frontier snapshot is a round delta whose
        round exceeds the seen chain's newest registered round, register it
        now — the same one-manifest-write add_ref the crashed process
        skipped. ``new_urls`` comes from the snapshot meta when the metrics
        patch landed; if the crash hit even earlier, the O(batch+new) delta
        file is counted once. Manifest-only in the no-crash case (zero Spark
        jobs).
        """
        f = self.store.current_snapshot("frontier")
        if not f:
            return
        # one manifest walk serves every evidence check below (the manifest
        # cannot change mid-call — this process holds the only handle)
        snaps = self._seen_live_snaps()
        metas = [s["meta"] for s in snaps]
        if f["meta"].get("event") == "seed":
            # seed() is the same two-step pair (frontier seed write, then
            # seen.add): a crash between them resumes with the seeds missing
            # from the seen set — replay the add from the seed snapshot.
            # Completion evidence is the generic commit-order rule (an
            # is_empty() check misses the truncate+re-seed flow, where the
            # seen table EXISTS as an older empty base yet the seeds are
            # still missing).
            if not self._pair_completed(f, False, snaps):
                seeds = self.spark.read.parquet(self.store.abspath(f["path"]))
                self.seen.add(seeds.select("url"), meta={"round": -1})
            return
        # markers are searched across the WHOLE live seen lineage (ids up to
        # current), not just the head snapshot: an unrelated seen write that
        # carries no marker (remove(), truncate) must not make a completed
        # pair look crashed — re-registering the ref would silently resurrect
        # the just-removed URLs into the seen set
        if f["meta"].get("event") in ("cli_seed", "enqueue"):
            # the CLI's existing-store append and the distributed
            # enqueue_frame path are the same two-step pair (frontier delta,
            # then seen.add_ref stamped with the delta's snapshot id) — a
            # crash between them resumes with the appended URLs missing from
            # the seen set; re-register the ref.
            # src_snap survives seen compaction (_compact carries base_meta),
            # so an already-completed pair is never double-added.
            marker = any(m.get("src_snap") == f["id"] for m in metas)
            if not self._pair_completed(f, marker, snaps):
                self.seen.add_ref(
                    f["path"],
                    n_rows=f["rows"] if f["rows"] >= 0 else 1,
                    meta={"round": -1, "src_snap": f["id"]},
                )
            return
        if f["meta"].get("event") == "admin_delete":
            # delete_by_url's pair: frontier base without the URLs, then
            # seen.remove stamped src_snap=<frontier snap id>. Replay the
            # remove if a crash split the pair — otherwise the deleted URLs
            # stay in the seen set and are anti-joined away forever on
            # re-discovery. The replayed remove is a no-op on an empty seen
            # set (nothing to unlearn — also the correct repair); it then
            # writes no marker, so the retry recurs until any later seen
            # commit supplies the generic completion evidence. Cheap
            # (manifest-only check) and safe (idempotent).
            marker = any(m.get("src_snap") == f["id"] for m in metas)
            urls = f["meta"].get("deleted_urls")
            if urls and not self._pair_completed(f, marker, snaps):
                self.seen.remove(list(urls), meta={"src_snap": f["id"]})
            return
        if f["meta"].get("event") == "admin_truncate":
            # truncate()'s pair: empty frontier base, then seen.truncate
            # stamped src_snap. Stale seen keys surviving a crashed truncate
            # would suppress the ENTIRE next crawl after a re-seed, so the
            # replay must land before any other write — and it does: every
            # mutating entry point gates on _ensure_reconciled. Idempotent
            # (truncating an already-truncated set is a no-op write). The
            # marker survives the epoch cut: _seen_live_snaps resets AT the
            # truncate snapshot but keeps the truncate snapshot itself.
            marker = any(m.get("src_snap") == f["id"] for m in metas)
            if not self._pair_completed(f, marker, snaps):
                self.seen.truncate(meta={"src_snap": f["id"]})
            return
        if f["meta"].get("event") != "round" or not f["meta"].get("delta"):
            return
        r = f["meta"].get("round", -1)
        seen_r = max(
            (m["round"] for m in metas if m.get("round") is not None),
            default=-1,
        )
        if self._pair_completed(f, r <= seen_r, snaps):
            return
        n_new = f["meta"].get("new_urls")
        if n_new is None:
            n_new = (
                self.spark.read.parquet(self.store.abspath(f["path"]))
                .where(F.col("status") == "pending")
                .count()
            )
        if n_new:
            self.seen.add_ref(f["path"], n_rows=n_new, meta={"round": r})

    def _ensure_reconciled(self) -> None:
        """Resume-time commit-pair repair, run once per job instance.

        EVERY mutating entry point calls this first (run_round, seed, the
        admin ops): a mutation before the repair would either bury the
        crashed round head under a newer frontier snapshot (the repair keys
        off the head) or commit a seen write that fakes the "later seen
        commit" completion evidence in ``_pair_completed``. Manifest-only in
        the no-crash case, so the gate costs zero Spark jobs.
        """
        if not self._seen_reconciled:
            self._reconcile_seen_refs()
            self._seen_reconciled = True

    def run_round(self) -> dict | None:
        """Execute one frontier-expansion round; None when frontier is drained."""
        t0 = time.time()
        self._ensure_reconciled()
        meta0 = self._meta()
        round_idx = self._round_index(meta0)
        pending_est = meta0.get("pending")  # exact when maintained; None = unknown
        if pending_est == 0:
            return None  # drained — decided from metadata, zero Spark jobs

        pending = self._pending_for_round()
        if pending_est is None:
            pending_est = pending.count()
            if pending_est == 0:
                self._drop_pending_cache()
                return None

        # --- robots refresh for stale/missing hosts only (P4/S5) ---
        robots = self._robots_for_round(pending, round_idx)

        # --- robots gate (D2/P3) + politeness (T3) ---
        gated = join_robots(pending, robots, self.user_agent)
        blocked = gated.where(F.col("robots_denied"))
        allowed = gated.where(~F.col("robots_denied")).withColumn(
            "quota",
            host_quota_expr(
                F.col("crawl_delay"),
                self.round_seconds,
                self.zero_delay_cap,
                round_idx=round_idx,
            ),
        )
        # pending_est (snapshot metadata, zero jobs) picks the ranking
        # strategy: small frontiers take one per-host window; large ones the
        # salted two-stage path (mega-host skew control) — identical output
        if self.priority is not None:
            allowed = allowed.withColumn("_prio", self.priority)
            batch = per_host_take(
                allowed,
                "quota",
                order_cols=["_prio", "seq"],
                n_rows_est=pending_est,
                small_limit=DEFAULT_SEQ_SMALL_LIMIT,
            ).drop("_prio")
        else:
            batch = per_host_take(
                allowed,
                "quota",
                order_cols=["seq"],
                n_rows_est=pending_est,
                small_limit=DEFAULT_SEQ_SMALL_LIMIT,
            )
        round_start = F.lit(
            VIRTUAL_EPOCH + _dt.timedelta(seconds=round_idx * self.round_seconds)
        )
        batch = assign_fetch_slots(
            batch,
            round_start,
            round_seconds=self.round_seconds,
            round_idx=round_idx,
        ).persist(StorageLevel.MEMORY_AND_DISK)

        # --- fetch: live HTTP (mapInPandas pool) or the simulated
        #     batch ⋈ pages join — the pages side never shuffles either way
        raw_fetch = None
        fetch_errors = None
        if self.fetcher is not None:
            extra = [
                c
                for c in ("host", "payload", "referrer", "fetch_slot",
                          "crawl_delay")
                if c in batch.columns
            ]
            probe_r = batch.select(
                "url",
                "method",
                _payload_key().alias("_payload_key"),
                "seq",
                "depth",
                F.col("content_hash").alias("_prior_hash"),
                *extra,
            )
            # persisted: the fetch stage feeds BOTH the hit pipeline and the
            # error rows — without a persist the network fetch would run
            # twice (and non-idempotently)
            raw_fetch = self.fetcher.fetch(probe_r).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            okf = raw_fetch.where(F.col("error_message").isNull())
            fetch_errors = raw_fetch.where(
                F.col("error_message").isNotNull()
            ).select(
                *_FETCH_KEYS, F.col("error_message").alias("_err")
            )
            fetched = okf.select(
                "url",
                "html",
                "seq",
                "depth",
                "method",
                "_payload_key",
                "_prior_hash",
                F.col("status_code").alias("_real_status"),
            )
            if self.pages is not None:
                # verification mode: the capture table supplies src_text for
                # the byte-identical-text invariant. Pages is scanned once
                # and never shuffled: the fetched url sliver broadcasts into
                # it, then the (batch-sized) result broadcasts back.
                src = self.pages.select(
                    "url", F.col("text").alias("src_text")
                ).join(
                    F.broadcast(okf.select("url").dropDuplicates(["url"])),
                    on="url",
                )
                fetched = fetched.join(F.broadcast(src), on="url", how="left")
            else:
                fetched = fetched.withColumn(
                    "src_text", F.lit(None).cast("string")
                )
            results_nm = None
            hits = self._parse_hits(
                fetched, in_stream_304=self.conditional_fetch
            )
            return self._finish_round(
                t0, round_idx, meta0, pending, pending_est, robots,
                batch, blocked, allowed, hits, results_nm, fetch_errors,
                raw_fetch,
            )
        probe = batch.select(
            "url",
            "method",
            _payload_key().alias("_payload_key"),
            "seq",
            "depth",
            # conditional revisit (see __init__): the prior content hash is
            # the validator sent with the fetch — NULL on first crawl
            F.col("content_hash").alias("_prior_hash"),
        )
        pages_cols = ["url", "html", F.col("text").alias("src_text")] + (
            ["method", "payload"] if self.pages_have_methods else []
        )
        do_broadcast = pending_est <= self.broadcast_batch_limit
        # Conditional revisit, DIGEST mode: when the (all-GET) pages table
        # carries a payload_digest column (the WARC-Payload-Digest analog CC
        # ships with every capture), the 304 decision joins probe validators
        # against a DIGEST-ONLY projection — parquet column pruning means the
        # html bytes of unchanged pages are never read off storage at all,
        # which at re-crawl scale is the difference between scanning the
        # whole body corpus and scanning a 64-byte column + changed pages.
        # Matched rows bypass the fetch join and re-enter at the outcome
        # union (results_nm below); everything else flows the normal path.
        results_nm = None
        digest_mode = (
            self.conditional_fetch
            and not self.pages_have_methods
            and "payload_digest" in self.pages.columns
        )
        if digest_mode:
            digests = self.pages.select("url", "payload_digest")
            get_probe = probe.where(
                (F.col("method") == "GET") & F.col("_prior_hash").isNotNull()
            )
            if do_broadcast:
                get_probe = F.broadcast(get_probe)
            nm_rows = (
                digests.join(get_probe, on="url", how="inner")
                .where(F.col("payload_digest") == F.col("_prior_hash"))
                .select("url", "method", "_payload_key", "_prior_hash")
            )
            probe = probe.join(
                nm_rows.select(*_FETCH_KEYS),
                on=_FETCH_KEYS,
                how="left_anti",
            )
            results_nm = nm_rows.select(
                *_FETCH_KEYS,
                F.lit(True).alias("_hit"),
                F.lit(True).alias("_nm"),
                F.lit(None).cast("int").alias("_real_status"),
                F.col("_prior_hash").alias("_content_hash"),
                F.lit(None).cast("string").alias("_page_title"),
                F.lit(None).cast("string").alias("_text_sha"),
                F.lit(None).cast("boolean").alias("_text_match"),
            )
        # batch ≤ pending: the metadata estimate decides the join strategy
        # without a count job (conservative: a quota-capped batch can be far
        # smaller than pending, but a wrong guess only costs a sort-merge);
        # above the broadcast limit a bucketed pages table (CLUSTERED BY url
        # SORTED BY url) makes the sort-merge shuffle ONLY the probe
        fetched = simulated_fetch(
            self.pages.select(*pages_cols),
            probe,
            pages_have_methods=self.pages_have_methods,
            broadcast=do_broadcast,
            bucketed=self.pages_bucketed,
        ).withColumn("_real_status", F.lit(None).cast("int"))
        hits = self._parse_hits(
            fetched, in_stream_304=self.conditional_fetch and not digest_mode
        )
        return self._finish_round(
            t0, round_idx, meta0, pending, pending_est, robots,
            batch, blocked, allowed, hits, results_nm, None, None,
        )

    def _parse_hits(self, fetched: DataFrame, in_stream_304: bool) -> DataFrame:
        """The fused parse stage over fetched rows — shared by the simulated
        join and the live HTTP fetcher (both deliver the same shape: url,
        html, src_text, seq, depth, method, _payload_key, _prior_hash,
        _real_status)."""
        if in_stream_304:
            # in-stream 304 path (no digest column): hash equality is decided
            # JVM-side in the scan stage; unchanged bodies are nulled HERE so
            # they never cross the Arrow boundary into the parse UDF and
            # never enter the persist (the bytes are still READ — only the
            # digest-mode pre-join avoids that)
            not_mod = F.col("_prior_hash").isNotNull() & (
                F.col("_prior_hash") == F.sha2(F.col("html"), 256)
            )
        else:
            not_mod = F.lit(False)
        return (
            fetched
            .withColumn("_not_modified", not_mod)
            .withColumn(
                "parsed",
                parse_page_expr(
                    F.when(~F.col("_not_modified"), F.col("html")), "url"
                ),
            )
            .select(
                "url",
                "method",
                "_payload_key",
                "seq",
                "depth",
                "src_text",
                "_not_modified",
                "_real_status",
                F.sha2(F.col("html"), 256).alias("content_hash"),  # F3/D3
                # P7: the reference extracts links only from non-blank content
                # (scraper.py:186-193); blank pages are still marked done.
                # 304 rows skip link re-expansion: every link of an unchanged
                # page is already in the seen set (first-crawl invariant).
                (
                    (F.length(F.trim(F.col("html").cast("string"))) > 0)
                    & ~F.col("_not_modified")
                ).alias("has_content"),
                F.col("parsed.text").alias("text"),
                F.col("parsed.title").alias("raw_title"),
                F.col("parsed.links").alias("links"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    def _finish_round(
        self, t0, round_idx, meta0, pending, pending_est, robots,
        batch, blocked, allowed, hits, results_nm, fetch_errors, raw_fetch,
    ) -> dict | None:
        """Link expansion → round delta → snapshot commit + metrics —
        identical for both fetch modes."""
        # --- link expansion (O2 → D1 → §7.4 ordering) ---
        edges = (
            hits.where(F.col("has_content"))  # P7 empty-content branch
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
        if self.url_key_chars:
            # MySQL url(255) prefix-key collisions: first INSERT wins, the
            # stored row keeps the first full url (ON DUPLICATE KEY upsert
            # never replaces the url column)
            fresh = first_discovery(
                edges.withColumn(
                    "_ukey", F.substring("url", 1, self.url_key_chars)
                ),
                "_ukey",
                ["parent_seq", "link_pos"],
                ["url", "title", "referrer", "depth"],
            ).drop("_ukey")
        else:
            fresh = first_discovery(
                edges, "url", ["parent_seq", "link_pos"], ["title", "referrer", "depth"]
            )
        # persisted so assign_global_seq's partition-offset job and the
        # snapshot write share one computation of the discovery pipeline
        # (first_discovery shuffle + seen-set probe) instead of running it
        # twice per round
        new = self.seen.filter_new(fresh).persist(StorageLevel.MEMORY_AND_DISK)

        delta, next_seq = self._round_delta(
            batch, blocked, hits, new, round_idx, meta0, robots=robots,
            results_nm=results_nm, fetch_errors=fetch_errors,
        )

        # --- metrics (A1/A2/A4 parity + engine extensions) ride ON the write
        # job via observe(): the round delta is computed ONCE — no separate
        # agg action, no delta cache. The snapshot commits with provisional
        # counters and the metrics patch the manifest right after (crash
        # between the two → resume falls back to the recount paths).
        from pyspark.sql import Observation

        is_done = F.col("status") == "done"
        obs = Observation()
        delta = delta.observe(
            obs,
            F.sum(is_done.cast("int")).alias("fetched"),
            F.sum((F.col("status") == "error").cast("int")).alias("errors"),
            F.sum((F.col("status") == "blocked").cast("int")).alias("blocked"),
            F.sum((F.col("status") == "pending").cast("int")).alias("new"),
            F.sum((is_done & ~F.col("text_match")).cast("int")).alias("mism"),
            F.sum(F.col("_robots_known").isNull().cast("int")).alias("uncov"),
            F.sum(
                (F.col("status_code") == 304).cast("int")
            ).alias("nm304"),
        ).select(*FRONTIER_COLS)
        prev_snap_id = self.store.current_snapshot("frontier")["id"]
        self.store.write(
            "frontier",
            delta,
            meta={"event": "round", "round": round_idx, "delta": True,
                  "n_rounds": round_idx + 1},
            # file sizing: the exact row count is only known after the write,
            # so size from the previous round's delta (crawl growth is
            # smooth); first round falls back to the pending bound
            coalesce=SnapshotStore.partitions_for(
                meta0["scheduled"] + meta0["blocked"] + meta0["new_urls"]
                if "scheduled" in meta0
                else pending_est * 4
            ),
        )
        row = obs.get
        n_done, n_err = int(row["fetched"] or 0), int(row["errors"] or 0)
        n_blocked, n_new = int(row["blocked"] or 0), int(row["new"] or 0)
        if n_done + n_err + n_blocked + n_new == 0:
            # Zero progress with pending rows: every schedulable host has
            # crawl_delay > round_seconds and none aligned to its delay grid
            # this round (host_quota_expr liveness branch). The reference
            # crawls such hosts after sleeping (scraper.py:34-36) — so do we:
            # discard the empty snapshot and JUMP the round clock forward to
            # the first round in which some pending host aligns, instead of
            # terminating with work still in the frontier.
            self.store.rollback("frontier", prev_snap_id)
            rs = self.round_seconds
            nxt = (
                allowed.where(F.col("crawl_delay") > rs)
                .agg(
                    F.min(
                        F.floor(
                            F.ceil(
                                F.lit((round_idx + 1) * rs) / F.col("crawl_delay")
                            )
                            * F.col("crawl_delay")
                            / F.lit(rs)
                        )
                    ).alias("nxt")
                )
                .collect()[0]["nxt"]
            )
            for df in (batch, hits, new) + (
                (raw_fetch,) if raw_fetch is not None else ()
            ):
                df.unpersist()  # pending stays: the cache still reflects
            # the rolled-back (= unchanged) frontier snapshot
            if nxt is None:
                return None  # no schedulable pending host at all — drained
            self.store.update_meta("frontier", n_rounds=int(nxt))
            return {
                "event": "skip",
                "round": round_idx,
                "skipped_to": int(nxt),
                "scheduled": 0,
                "blocked": 0,
                "fetched": 0,
                "fetch_errors": 0,
                "new_urls": 0,
                "pending": pending_est,
                "round_wall_sec": round(time.time() - t0, 3),
            }
        metrics = {
            "event": "round",
            "round": round_idx,
            "scheduled": n_done + n_err,
            "blocked": n_blocked,
            "fetched": n_done,
            "fetch_errors": n_err,
            "new_urls": n_new,
            "new_hosts_uncovered": int(row["uncov"] or 0),
            "text_mismatches": int(row["mism"] or 0),
            "not_modified": int(row["nm304"] or 0),
            "next_seq": next_seq + n_new,
            "n_rounds": round_idx + 1,
            "pending": pending_est - (n_done + n_err) - n_blocked + n_new,
            "delta": True,
            "round_wall_sec": round(time.time() - t0, 3),
        }
        self.store.update_meta("frontier", **metrics)
        # the just-committed delta snapshot (O(batch+new) rows on disk) feeds
        # both the seen-set append and the pending carry-over
        delta_committed = self.store.read("frontier")
        if n_new:
            # the just-committed frontier delta already holds the round's new
            # URLs (status=pending rows) on disk — register it as the seen
            # set's next key delta by manifest reference: one JSON write, no
            # Spark job, no second copy of the key bytes per round
            self.seen.add_ref(
                self.store.current_snapshot("frontier")["path"],
                n_rows=n_new,
                meta={"round": round_idx},
            )
        self._advance_pending_cache(
            pending, delta_committed, n_done + n_err + n_blocked + n_new
        )
        for df in (batch, hits, new) + (
            (raw_fetch,) if raw_fetch is not None else ()
        ):
            df.unpersist()
        self._maybe_compact(metrics)
        return metrics

    def _round_delta(
        self, batch, blocked, hits, new, round_idx: int, meta0: dict,
        robots: DataFrame | None = None,
        results_nm: DataFrame | None = None,
        fetch_errors: DataFrame | None = None,
    ) -> tuple[DataFrame, int]:
        """The round's O(batch+new) state delta: touched rows + new rows.

        Built WITHOUT joining the full frontier — ``batch`` and ``blocked``
        already carry every frontier column (they are pending rows), so the
        outcome join is batch ⋈ hit-results on the fetch key: O(batch).

        The delta carries one extra transient column ``_robots_known``: True
        unless the row is a NEW url whose host has no rules row in ``robots``
        (batch/blocked hosts are covered by the robots invariant). Observing
        its sum rides the write job and lets the NEXT round skip its robots
        staleness check entirely when every new host was already covered —
        the common case once a crawl's host set stabilizes.
        """
        next_seq = self._next_seq(meta0)

        # new pending rows with deterministic sequence (§7.4). The previous
        # round's new-URL count (snapshot metadata — crawl growth is smooth)
        # picks the sequencing strategy: small rounds take the lazy global
        # window (zero extra Spark jobs — the event-log profile showed the
        # range path's sample + offsets collect splinter into ~17 AQE
        # stage-jobs per round, pure driver latency at round scale); huge
        # rounds keep the range-partitioned path. A mis-estimate only costs
        # one oversized sort task, never correctness (ordering.py).
        # seed rounds have no new_urls yet; the seed count is the same-scale
        # stand-in (seeds × links/page stays well inside the small limit)
        new_est = meta0.get("new_urls", meta0.get("pending"))
        new_rows = (
            assign_global_seq(
                new,
                ["depth", "parent_seq", "link_pos"],
                start=next_seq,
                n_rows_est=new_est,
                small_limit=DEFAULT_SEQ_SMALL_LIMIT,
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
        if robots is not None:
            covered = (
                robots.where(F.col("user_agent") == self.user_agent)
                .select("host")
                .dropDuplicates(["host"])
                .withColumn("_robots_known", F.lit(True))
            )
            new_rows = new_rows.join(F.broadcast(covered), on="host", how="left")
        else:
            new_rows = new_rows.withColumn("_robots_known", F.lit(True))

        # state transition for the processed batch (T5/S6 MERGE semantics):
        # hit → done row; no hit → the reference's fetch-failure path
        # (content '', status NULL, error set — scraper.py:100-109)
        results = hits.select(
            *_FETCH_KEYS,
            F.lit(True).alias("_hit"),
            F.col("_not_modified").alias("_nm"),
            F.col("_real_status"),
            F.col("content_hash").alias("_content_hash"),
            title_with_fallback(F.col("raw_title"), F.col("url")).alias("_page_title"),
            F.sha2(F.col("text"), 256).alias("_text_sha"),
            (F.col("text") == F.col("src_text")).alias("_text_match"),
        )
        if results_nm is not None:
            # digest-mode 304 rows bypassed the fetch join entirely; their
            # derived columns are the batch row's priors (nm when-branches)
            results = results.unionByName(results_nm)
        # 304 rows (conditional revisit) keep the batch row's PRIOR derived
        # columns — the parse was skipped, and the body is byte-identical to
        # the capture those columns were computed from, so they still hold
        nm = F.col("_hit") & F.col("_nm")
        keyed_batch = batch.withColumn("_payload_key", _payload_key())
        if fetch_errors is not None:
            # live-fetch mode: transport/HTTP failures carry their real
            # message (timeout, "503 Service Unavailable", DNS error — the
            # reference's str(e), scraper.py:100-109); rows in neither
            # results nor errors keep the simulated-miss constant below
            keyed_batch = keyed_batch.join(
                fetch_errors, on=_FETCH_KEYS, how="left"
            )
        else:
            keyed_batch = keyed_batch.withColumn(
                "_err", F.lit(None).cast("string")
            )
        updated = (
            keyed_batch
            .join(results, on=_FETCH_KEYS, how="left")
            .select(
                *[c for c in FRONTIER_COLS if c not in _RESULT_COLS],
                F.when(F.col("_hit"), F.lit("done"))
                .otherwise(F.lit("error"))
                .alias("status"),
                F.when(F.col("_hit"), F.lit(None).cast("string"))
                .otherwise(F.coalesce(F.col("_err"), F.lit("404 Not Found")))
                .alias("error_message"),
                F.when(nm, F.lit(304))
                .when(F.col("_hit"), F.coalesce(F.col("_real_status"),
                                                F.lit(200)))
                .cast("int")
                .alias("status_code"),
                F.when(F.col("_hit"), F.col("_content_hash")).alias("content_hash"),
                F.when(nm, F.col("page_title"))
                .when(F.col("_hit"), F.col("_page_title"))
                .alias("page_title"),
                F.when(nm, F.col("text_sha"))
                .when(F.col("_hit"), F.col("_text_sha"))
                .alias("text_sha"),
                F.when(nm, F.col("text_match"))
                .when(F.col("_hit"), F.col("_text_match"))
                .alias("text_match"),
                F.col("fetch_slot"),
                F.lit(round_idx).alias("round"),
            )
        )
        blocked_rows = blocked.select(
            *[c for c in FRONTIER_COLS if c not in _RESULT_COLS],
            F.lit("blocked").alias("status"),
            F.lit("Blocked by robots.txt").alias("error_message"),
            F.lit(None).cast("int").alias("status_code"),
            F.lit(None).cast("string").alias("content_hash"),
            F.lit(None).cast("string").alias("page_title"),
            F.lit(None).cast("string").alias("text_sha"),
            F.lit(None).cast("boolean").alias("text_match"),
            F.lit(None).cast("timestamp").alias("fetch_slot"),
            F.lit(round_idx).alias("round"),
        )
        known = F.lit(True).alias("_robots_known")
        delta = (
            updated.select(*FRONTIER_COLS, known)
            .unionByName(blocked_rows.select(*FRONTIER_COLS, known))
            .unionByName(new_rows.select(*FRONTIER_COLS, "_robots_known"))
        )
        return delta, next_seq

    def _maybe_compact(self, counters: dict) -> None:
        """Rewrite the merged view as a fresh base when the chain grows long.

        Bounds merge-on-read cost at O(total + compact_every × batch); the
        counters (next_seq / n_rounds / pending) ride along so resume and the
        barrier diet survive compaction.
        """
        if self.store.chain_length("frontier") < self.compact_every:
            return
        merged = self.frontier()
        total = sum(max(p["rows"], 0) for p in self.store.chain_parts("frontier"))
        self.store.write(
            "frontier",
            merged,
            coalesce=SnapshotStore.partitions_for(total),
            meta={
                "event": "compaction",
                "base": True,
                "next_seq": counters["next_seq"],
                "n_rounds": counters["n_rounds"],
                "pending": counters["pending"],
            },
        )
        if self._pending_cache is not None:
            # compaction rewrites state without changing it: the carried
            # pending set still reflects the new snapshot — retag instead of
            # dropping, but re-root its lineage on the compacted base so the
            # carry-over chain never outgrows the compaction cadence
            self._drop_pending_cache()
            cur = self.store.current_snapshot("frontier")
            self._pending_cache = (
                self.store.read("frontier")
                .where(F.col("status") == "pending")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            self._pending_cache_snap = cur["id"]

    # -- full crawl ---------------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> list[dict]:
        out = []
        while max_rounds is None or len(out) < max_rounds:
            m = self.run_round()
            if m is None:
                break
            out.append(m)
        return out

    # -- checkpoint admin -----------------------------------------------------------
    def rollback_to_round(self, round_idx: int) -> None:
        """Rewind frontier + seen + robots to the state after ``round_idx``.

        The frontier snapshot for a round carries the round index in its
        meta; seen/robots snapshots are stamped with the round that wrote
        them, so the coordinated target is the LATEST snapshot of each table
        with ``meta.round <= round_idx`` (rounds that add no new URLs write
        no seen snapshot — the previous one is still exact). Rolling back
        only the frontier would desync the seen set: URLs discovered in
        discarded rounds would stay 'seen' and never be re-enqueued.
        """

        self._ensure_reconciled()  # repair any crashed pair before rewinding

        def _target(table: str) -> int | None:
            best = None
            for s in self.store.lineage(table):
                r = s["meta"].get("round")
                if r is None and s["meta"].get("event") == "seed":
                    r = -1
                if r is not None and r <= round_idx:
                    best = s["id"]
            return best

        f_target = None
        for s in self.store.lineage("frontier"):
            ev = s["meta"].get("event")
            if ev == "seed" and round_idx < 0:
                f_target = s["id"]
            if ev == "round" and s["meta"].get("round") == round_idx:
                f_target = s["id"]
        if f_target is None:
            raise KeyError(f"no frontier snapshot for round {round_idx}")
        self.store.rollback("frontier", f_target)
        for table in ("seen", "seen_bloom", "robots"):
            if self.store.exists(table):
                t = _target(table)
                if t is not None:
                    self.store.rollback(table, t)

    # -- admin ops (T6/T7: reference models.py bulk state mutations) -----------------
    # Subset mutations are O(touched) delta commits (Iceberg MERGE in prod);
    # whole-table mutations are a base rewrite — exactly the cost class of the
    # reference's full-table UPDATE/DELETE (models.py:195-204, 350-371).
    # Admin writes drop the 'pending' counter from metadata (unknown without a
    # count); the next run_round recounts once and re-establishes it.

    def _carry_meta(self, event: str, **extra) -> dict:
        """Meta dict for an admin write. Every admin op builds its meta here
        BEFORE writing, so this is also the shared resume-repair gate: an
        admin write on an un-reconciled store would bury a crashed round
        head (frontier ops) or fake the completion evidence (seen ops) —
        see ``_ensure_reconciled``."""
        self._ensure_reconciled()
        m = self._meta()
        out = {"event": event, **extra}
        for k in ("next_seq", "n_rounds"):
            if k in m:
                out[k] = m[k]
        return out

    def _rows_for(self, urls: list[str]) -> DataFrame:
        return self.frontier().where(F.col("url").isin(list(urls)))

    def mark_processed(self, urls: list[str], error_message: str | None = None) -> None:
        """mark_page_as_processed (models.py:156-171): processed=TRUE +
        error_message := given value (including NULL overwrite)."""
        delta = (
            self._rows_for(urls)
            .withColumn(
                "status", F.lit("error" if error_message else "done")
            )
            .withColumn("error_message", F.lit(error_message).cast("string"))
        )
        self.store.write(
            "frontier",
            delta.select(*FRONTIER_COLS),
            meta=self._carry_meta("admin_mark_processed"),
        )

    def reset_processed(self, urls: list[str] | None = None) -> None:
        """reset_all_processed / mark_all_as_unprocessed (models.py:195-204,
        363-371) and the per-url variant: processed=FALSE, everything else
        (content hash, titles, errors) untouched — the rows re-enter the
        pending frontier and will be re-crawled."""
        src = self.frontier() if urls is None else self._rows_for(urls)
        out = src.withColumn("status", F.lit("pending"))
        meta = self._carry_meta("admin_reset_processed")
        if urls is None:
            meta["base"] = True
        self.store.write("frontier", out.select(*FRONTIER_COLS), meta=meta)

    def reset_due(self, caps: DataFrame, now: int) -> int:
        """Freshness-driven re-crawl enqueue over a capture lake.

        The scheduling half the reference lacks entirely (its only path
        back to pending is the manual reset, models.py:195-204): estimate
        each URL's change interval from its capture history
        (operators/recrawl.py ``change_estimate``), and re-pend exactly the
        frontier rows that are past due at ``now`` AND already fully
        processed (done/error — in-flight pending/blocked rows are never
        touched). Returns the number of re-pended URLs.

        Cost is O(due), not O(frontier): the due set joins the frontier
        once on url (broadcast when small, AQE otherwise) and the write is
        a normal delta — merge-on-read surfaces the new pending status, no
        base rewrite. The pending cache self-invalidates on the snapshot
        bump like every admin write.
        """
        from scrape_spark.operators.recrawl import change_estimate

        # the count() below materializes the frontier BEFORE _carry_meta
        # would run the repair gate — gate explicitly first (idempotent).
        self._ensure_reconciled()
        due = (
            change_estimate(caps, now=now)
            .where(F.col("next_due") <= F.lit(int(now)))
            .select("url")
        )
        delta = (
            self.frontier()
            .where(F.col("status").isin("done", "error"))
            .join(due, "url", "left_semi")
            .withColumn("status", F.lit("pending"))
            .withColumn("error_message", F.lit(None).cast("string"))
        )
        out = delta.select(*FRONTIER_COLS).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n = out.count()
            if n:
                self.store.write(
                    "frontier",
                    out,
                    meta=self._carry_meta("admin_reset_due", n_due=n),
                )
            return n
        finally:
            out.unpersist()

    def mark_all_processed(self) -> None:
        """mark_all_as_processed (models.py:350-361): processed=TRUE for every
        row; rows holding an error keep error status (the reference's
        processed flag + error_message tuple maps onto the status taxonomy)."""
        out = self.frontier().withColumn(
            "status",
            F.when(F.col("status") == "blocked", F.lit("blocked"))
            .when(F.col("error_message").isNotNull(), F.lit("error"))
            .otherwise(F.lit("done")),
        )
        meta = self._carry_meta("admin_mark_all_processed", base=True)
        self.store.write("frontier", out.select(*FRONTIER_COLS), meta=meta)

    def update_error_message(self, url: str, error_message: str | None) -> None:
        """update_error_message (models.py:374-387): message only, status kept."""
        delta = self._rows_for([url]).withColumn(
            "error_message", F.lit(error_message).cast("string")
        )
        self.store.write(
            "frontier",
            delta.select(*FRONTIER_COLS),
            meta=self._carry_meta("admin_update_error"),
        )

    def clear_errors(self) -> None:
        """clear_error_messages (models.py:406-415): every error_message →
        NULL (full-table UPDATE → base rewrite); status taxonomy kept."""
        out = self.frontier().withColumn(
            "error_message", F.lit(None).cast("string")
        )
        meta = self._carry_meta("admin_clear_errors", base=True)
        self.store.write("frontier", out.select(*FRONTIER_COLS), meta=meta)

    def update_content(self, url: str, content: str) -> None:
        """update_page_content (models.py:256-278): content hash re-stamped
        (the engine stores the hash, not the bytes — pages live in the lake)."""
        import hashlib

        sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
        delta = self._rows_for([url]).withColumn("content_hash", F.lit(sha))
        self.store.write(
            "frontier",
            delta.select(*FRONTIER_COLS),
            meta=self._carry_meta("admin_update_content"),
        )

    def delete_by_url(self, urls: list[str]) -> None:
        """delete_page_by_url (models.py:237-253). Deletion also removes the
        URL from the seen set (reference: a deleted row makes exists_in_db
        false, so the URL can be re-discovered and re-crawled). Merge-on-read
        has no tombstones here, so both tables compact to a new base — the
        admin-grade cost of the rare op, not the per-round path.

        This is a repairable two-step commit pair like the round's
        (frontier, seen) writes: the frontier snapshot records the deleted
        URLs (admin deletes are driver-issued point lists, so the meta
        payload is small by construction) and the seen write is stamped with
        ``src_snap``; a crash between the two is replayed by
        ``_reconcile_seen_refs`` — otherwise the URL would stay in the seen
        set and be anti-joined away forever on re-discovery, silently
        violating the documented delete semantics."""
        keep = self.frontier().where(~F.col("url").isin(list(urls)))
        meta = self._carry_meta("admin_delete", base=True)
        meta["deleted_urls"] = list(urls)
        snap_id = self.store.write(
            "frontier", keep.select(*FRONTIER_COLS), meta=meta
        )
        self.seen.remove(urls, meta={"src_snap": snap_id})

    def truncate(self) -> None:
        """clear_all_pages (models.py:281-292): empty frontier + seen set.

        Same two-step repairable pair as ``delete_by_url``: a crash after
        the frontier truncate but before the seen truncate would leave stale
        seen keys that suppress the ENTIRE next crawl after a re-seed;
        ``_reconcile_seen_refs`` replays the seen truncate on resume."""
        empty = empty_df(self.spark, FRONTIER_SCHEMA)
        meta = self._carry_meta("admin_truncate", base=True)
        meta["pending"] = 0
        snap_id = self.store.write("frontier", empty, meta=meta)
        self.seen.truncate(meta={"src_snap": snap_id})

    # -- point/bulk reads (models.py read surface) -----------------------------------
    def page(self, url: str) -> dict | None:
        """get_page_by_url (models.py:219-234; payload JSON-decoded by caller)."""
        rows = self._rows_for([url]).limit(1).collect()
        return rows[0].asDict() if rows else None

    def page_by_seq(self, seq: int) -> dict | None:
        """get_page_by_id (models.py:445-459): seq is the engine's id."""
        rows = self.frontier().where(F.col("seq") == seq).limit(1).collect()
        return rows[0].asDict() if rows else None

    def all_urls(self) -> list[str]:
        """get_all_urls (models.py:317-333)."""
        return [r["url"] for r in self.frontier().select("url").collect()]

    def processed_urls(self) -> list[str]:
        return [
            r["url"]
            for r in self.frontier()
            .where(F.col("status") != "pending")
            .select("url")
            .collect()
        ]

    def unprocessed_urls(self) -> list[str]:
        return [
            r["url"]
            for r in self.frontier()
            .where(F.col("status") == "pending")
            .select("url")
            .collect()
        ]

    def error_messages(self) -> list[tuple[str, str]]:
        """get_error_messages (models.py:390-403)."""
        return [
            (r["url"], r["error_message"])
            for r in self.frontier()
            .where(F.col("error_message").isNotNull())
            .select("url", "error_message")
            .collect()
        ]

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
        return empty_df(
            frontier.sparkSession, "url string, canon_seq long, depth int"
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
