"""Partitioned URL-seen set: bloom prefilter + exact anti-join.

Replaces the reference's row-at-a-time duplicate probe
(``exists_in_db``: ``SELECT 1 FROM scraped_pages WHERE url=%s LIMIT 1``,
models.py:207-216, called once per extracted link at scraper.py:159-162) with
a two-tier distributed design sized for a 10^10-URL frontier:

1. **Base blooms** (fast path): the seen set is hash-bucketed by
   ``pmod(xxhash64(url), n_buckets)``. At every BASE write (first add and
   each compaction) a per-bucket numpy bloom filter is built distributedly
   (``groupBy(bucket).applyInPandas``) and stored as a ``(bucket, bloom)``
   TABLE in the SnapshotStore — never collected to the driver, never written
   as a driver-local sidecar file. Probing is a bucket-cogroup: candidates
   shuffle to their bucket, each task receives exactly its bucket's bloom row
   (at 10^10 keys / 4096 buckets / 16 bits/key ≈ 5 MB per bucket; nothing is
   broadcast, no task ever holds more than its own buckets' blooms).

2. **Exact checks** (correctness path):

   - rows the base bloom flags "maybe seen" — true duplicates plus the
     bloom's ~1e-4 false positives — are resolved with a semi-join +
     anti-join pair in which the seen table is only ever SCANNED
     (column-pruned to the key; the small maybe/present sides broadcast),
     never shuffled;
   - rows the base bloom clears ("definitely not in the base") still
     anti-join the DELTA key set — the keys appended since the last
     compaction, a bounded O(compact_every × round_new) broadcast side.

   Both exact checks (and the small-set broadcast fast path) resolve on the
   URL TEXT itself (the reference's unique key, scraped_pages.sql:14), not
   on ``xxhash64(url)`` — a 64-bit birthday collision (≈3 expected at 10^10
   keys) therefore cannot silently drop a genuinely-new URL. The hash is
   used ONLY where collisions are harmless: bloom membership and bucket
   assignment (a collision there is just one extra exact check).

   Dedup is therefore EXACT on the URL; blooms only shrink the checks.

Below ``probe_broadcast_limit`` keys (known from snapshot metadata, zero
jobs) the whole probe collapses to ONE broadcast anti-join — the same
size-based strategy switch AQE applies to joins.

Writes are O(new) per round: ``add`` appends one key delta (Iceberg append
commit in production); blooms are rebuilt only at compaction, so a crawl
round writes no bloom bytes at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scrape_spark.operators import bloom as bloom_kernel
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.session import empty_df

_BUCKET = "seen_bucket"

BLOOM_SCHEMA = f"{_BUCKET} int, bloom binary, n_keys long"


class SeenSet:
    """URL-seen set backed by SnapshotStore tables (keys + per-bucket blooms)."""

    def __init__(
        self,
        store: SnapshotStore,
        n_buckets: int = 64,
        bits_per_key: int = bloom_kernel.DEFAULT_BITS_PER_KEY,
        bucket_capacity: int = 1 << 17,
        name: str = "seen",
        url_key_chars: int | None = None,
        probe_broadcast_limit: int = 2_000_000,
        bloom_build_min: int | None = None,
    ) -> None:
        self.store = store
        self.spark = store.spark
        self.n_buckets = n_buckets
        self.bits_per_key = bits_per_key
        # SURVEY §7.4 strict-parity mode: the reference's MySQL unique key is
        # ``url(255)`` (schema/scraped_pages.sql:14) — two URLs sharing their
        # first 255 chars collide there. url_key_chars=255 reproduces that;
        # None (default) dedups on the full URL (the better behavior,
        # divergence documented).
        self.url_key_chars = url_key_chars
        # below this many seen keys, filter_new uses one broadcast anti-join
        # instead of the bloom machinery (size known from snapshot metadata)
        self.probe_broadcast_limit = probe_broadcast_limit
        # blooms are never PROBED below probe_broadcast_limit (the broadcast
        # fast path wins), so building them there is a wasted Python stage per
        # base write — defer until the key count can actually exceed the
        # broadcast path. Once a bloom table EXISTS it is rebuilt at every
        # base write regardless: a bloom staler than the base it is probed
        # against would yield false "definitely new" verdicts (those rows
        # skip the base exact check), which is a correctness bug, not a
        # performance one.
        self.bloom_build_min = (
            probe_broadcast_limit if bloom_build_min is None else bloom_build_min
        )
        # blooms are FIXED-SIZE per bucket (sized for bucket_capacity keys):
        # size n_buckets × bucket_capacity ≥ expected total URLs (10^10 →
        # 4096 buckets of 2.5M keys ≈ 5 MB each). Exceeding capacity only
        # degrades the FP rate gradually — correctness is unaffected (exact
        # anti-join).
        self.m_bits = bloom_kernel.sizeof_bits(bucket_capacity, bits_per_key)
        self.name = name
        self.bloom_name = f"{name}_bloom"

    # -- helpers -----------------------------------------------------------
    def _key_text(self, url_col: str = "url") -> Column:
        """The dedup key: the URL text (truncated in strict url(255) mode)."""
        key = F.col(url_col)
        if self.url_key_chars is not None:
            key = F.substring(key, 1, self.url_key_chars)
        return key

    def _key_hash(self, url_col: str) -> Column:
        """Bloom/bucket hash of the key — NEVER used for exact resolution."""
        return F.xxhash64(self._key_text(url_col))

    def _with_bucket(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        return df.withColumn(_BUCKET, F.pmod(F.col(hash_col), F.lit(self.n_buckets)))

    def is_empty(self) -> bool:
        return not self.store.exists(self.name)

    def _read_part(self, p: dict) -> DataFrame:
        """One chain snapshot, normalized to (url, url_hash, seen_bucket).

        A ``ref`` part is a zero-copy reference to a FRONTIER round-delta
        file (``add_ref``): its pending rows ARE that round's new URLs, and
        the key hash/bucket are recomputed from the url text so strict
        url(255) truncation is honored regardless of the frontier's own
        ``url_hash`` column.
        """
        df = self.spark.read.parquet(p["path"])
        if p["meta"].get("ref"):
            df = self._with_bucket(
                df.where(F.col("status") == "pending").select(
                    "url", self._key_hash("url").alias("url_hash")
                )
            )
        return df.select("url", "url_hash", _BUCKET)

    def read(self) -> DataFrame:
        """Current seen table: (url string, url_hash long, seen_bucket int).

        Union of the delta-snapshot chain since the last compaction base —
        per-round appends are ONLY new keys (O(new), not O(total): a
        10^10-key table must never be rewritten per crawl round), with
        periodic compaction bounding the chain length.
        """
        parts = self.store.chain_parts(self.name)
        df = self._read_part(parts[0])
        for p in parts[1:]:
            df = df.unionByName(self._read_part(p))
        return df

    def _delta_keys(self) -> DataFrame | None:
        """Keys appended since the last base, or None when the base is current."""
        parts = self.store.chain_parts(self.name)
        if len(parts) == 1:
            return None
        df = None
        for p in parts[1:]:
            d = self._read_part(p)
            df = d if df is None else df.unionByName(d)
        return df

    # -- write path ----------------------------------------------------------
    def add(
        self,
        urls: DataFrame,
        url_col: str = "url",
        compact_every: int = 16,
        meta: dict | None = None,
        assume_unique: bool = False,
        n_rows: int | None = None,
    ) -> int:
        """Append new (url, url_hash) keys as a delta snapshot.

        ``urls`` must already be deduplicated against the seen set (the crawl
        round guarantees this: filter_new → first-discovery min_by). The
        parquet side appends one sized delta (bucket as a plain column) per
        round (Iceberg append commit in prod) and compacts to a fresh base every
        ``compact_every`` deltas; per-bucket blooms are rebuilt —
        distributedly, as a store table — only at those base writes.

        ``meta`` (e.g. the crawl round index) is stamped into the snapshot so
        checkpoint rollback can rewind the seen set in lockstep with the
        frontier (CrawlJob.rollback_to_round).
        """
        new = urls.select(
            F.col(url_col).alias("url"),
            self._key_hash(url_col).alias("url_hash"),
        )
        if not assume_unique:
            # dedup on the KEY TEXT (not the hash — a 64-bit collision
            # between two distinct new URLs must not drop one of them)
            new = new.withColumn("_k", self._key_text("url")).dropDuplicates(
                ["_k"]
            ).drop("_k")
        # else: caller guarantees key-uniqueness (the crawl round's new rows
        # went through first-discovery + filter_new) — skip the extra shuffle
        new = self._with_bucket(new)
        base_meta = dict(meta or {})
        if self.is_empty():
            merged, snap_meta = new, {**base_meta, "base": True}
        elif self.store.chain_length(self.name) >= compact_every:
            merged = (
                self.read().unionByName(new)
                .withColumn("_k", self._key_text("url"))
                .dropDuplicates(["_k"]).drop("_k")
            )
            snap_meta = {**base_meta, "base": True, "compaction": True}
        else:
            # the bucket is a PLAIN column, not a hive partition: nothing
            # ever partition-prunes the seen table (the probe cogroup
            # shuffles on the column regardless), and a dynamic-partition
            # write fans a tiny per-round delta into n_buckets directories —
            # one file per round, not n_buckets, is the right layout
            snap_id = self.store.write(
                self.name, new, meta={**base_meta, "delta": True},
                coalesce=(
                    self.store.partitions_for(n_rows) if n_rows is not None else None
                ),
            )
            return snap_id

        # base write → maybe rebuild the per-bucket blooms from the full key
        # set, entirely on executors (groupBy-bucket build, store-table
        # write); nothing is collected and no local sidecar files exist
        total = 0 if self.is_empty() else self._total_rows()
        # an unknown-size FIRST base (seed path with n_rows=None) must not
        # collapse to partitions_for(0)=1 — a multi-million-URL seed list
        # would dedup and write through a single task (review r5); leave
        # the partitioning alone when nothing is known about the size
        size_known = n_rows is not None or not self.is_empty()
        snap_id = self.store.write(
            self.name, merged, meta=snap_meta,
            coalesce=(
                self.store.partitions_for(total + (n_rows or 0))
                if total >= 0 and size_known else None
            ),
        )
        self._maybe_build_blooms(base_meta)
        return snap_id

    def add_ref(
        self,
        path: str,
        n_rows: int,
        meta: dict | None = None,
        compact_every: int = 16,
    ) -> int:
        """Zero-job append: register an existing FRONTIER round-delta file as
        this table's next key delta (its pending rows are exactly that
        round's new URLs — see ``_read_part``).

        This is the crawl round's fast path: the new keys are already on disk
        in the frontier delta the round just committed, so appending them to
        the seen set is one manifest write — no Spark job, no second copy of
        the key bytes (``SnapshotStore.write_ref``). Every ``compact_every``
        deltas the chain is materialized into a real base, which also
        releases the frontier-file references.
        """
        base_meta = dict(meta or {})
        snap_id = self.store.write_ref(
            self.name, path, n_rows, {**base_meta, "delta": True}
        )
        if self.store.chain_length(self.name) >= compact_every:
            return self._compact(base_meta)
        return snap_id

    def _compact(self, base_meta: dict) -> int:
        """Materialize the chain (base + deltas + refs) into a fresh base."""
        merged = (
            self.read()
            .withColumn("_k", self._key_text("url"))
            .dropDuplicates(["_k"])
            .drop("_k")
        )
        total = self._total_rows()
        snap_id = self.store.write(
            self.name,
            merged,
            meta={**base_meta, "base": True, "compaction": True},
            coalesce=self.store.partitions_for(total) if total >= 0 else None,
        )
        self._maybe_build_blooms(base_meta)
        return snap_id

    def _maybe_build_blooms(self, base_meta: dict) -> None:
        """Rebuild blooms for the CURRENT base snapshot when warranted.

        Skipped while the key count stays ≤ ``bloom_build_min`` AND no bloom
        table exists yet: filter_new's broadcast fast path never probes
        blooms there, so building them is a dead Python stage per base write
        (the crawl's seed path in particular). An existing bloom table is
        ALWAYS refreshed — a bloom older than the base it is probed against
        gives false "definitely new" verdicts (correctness, see __init__).
        Built from the CHAIN BASE part (at the normal call sites that is
        the just-committed snapshot — exact manifest row count, zero extra
        lineage; on the repair path it is whatever base the chain
        currently starts at) and stamped with that base's snapshot id
        (``for_snap``) so ``filter_new`` can DETECT a stale bloom: a crash
        between the base commit and this bloom write used to leave the
        old bloom silently probing the new base — false "definitely new"
        verdicts for every key the compaction folded in (review r5).
        """
        rows = self.store.current_snapshot(self.name)["rows"]
        if not self.store.exists(self.bloom_name) and 0 <= rows <= self.bloom_build_min:
            return
        base_part = self.store.chain_parts(self.name)[0]
        base = self._read_part(base_part)
        blooms = base.select(_BUCKET, "url_hash").groupBy(_BUCKET).applyInPandas(
            _build_bloom_fn(self.m_bits), schema=BLOOM_SCHEMA
        )
        # ~24 blooms (~120 MB at the 10^10 sizing) per file
        self.store.write(
            self.bloom_name, blooms,
            meta={**base_meta, "base": True, "for_snap": base_part["id"]},
            coalesce=max(1, self.n_buckets // 24),
        )

    def remove(
        self,
        urls: list[str] | DataFrame,
        url_col: str = "url",
        meta: dict | None = None,
    ) -> None:
        """Delete keys (reference delete_page_by_url makes exists_in_db false
        → the URL becomes re-discoverable). Blooms cannot unlearn, so removal
        compacts to a fresh base + bloom rebuild — admin-grade cost, never on
        the per-round path. ``meta`` lets CrawlJob stamp the commit-pair
        marker (``src_snap``) used by the resume repair."""
        if self.is_empty():
            return
        if isinstance(urls, DataFrame):
            gone = urls.select(self._key_text(url_col).alias("_seen_key"))
        else:
            from scrape_spark.session import local_df

            gone = local_df(
                self.spark, [(u,) for u in urls], "url string"
            ).select(self._key_text("url").alias("_seen_key"))
        kept = (
            self.read()
            .withColumn("_seen_key", self._key_text("url"))
            .join(F.broadcast(gone), on="_seen_key", how="left_anti")
            .drop("_seen_key")
        )
        self.store.write(
            self.name, kept, meta={**(meta or {}), "base": True, "event": "remove"},
        )
        self._maybe_build_blooms({"event": "remove"})

    def truncate(self, meta: dict | None = None) -> None:
        """Empty the seen set (reference clear_all_pages). ``meta`` carries
        CrawlJob's commit-pair marker (``src_snap``) for the resume repair."""
        empty = empty_df(self.spark, f"url string, url_hash long, {_BUCKET} int")
        self.store.write(
            self.name,
            empty,
            meta={**(meta or {}), "base": True, "event": "truncate"},
        )
        self.store.write(
            self.bloom_name,
            empty_df(self.spark, BLOOM_SCHEMA),
            meta={"base": True, "event": "truncate"},
        )

    # -- probe path ----------------------------------------------------------
    def _total_rows(self) -> int:
        """Upper bound on seen keys from manifest row counts — zero jobs.

        Chain rows over-count only by cross-delta duplicates (none in normal
        operation); -1 when any snapshot's count is unavailable.
        """
        total = 0
        for p in self.store.chain_parts(self.name):
            if p["rows"] < 0:
                return -1
            total += p["rows"]
        return total

    def filter_new(
        self,
        candidates: DataFrame,
        url_col: str = "url",
        exact_on_url: bool = True,
        broadcast_limit: int | None = None,
    ) -> DataFrame:
        """Rows of ``candidates`` whose URL is NOT in the seen set. Exact.

        Exactness ALWAYS resolves on the URL text (``_key_text``) — the
        reference's unique key — never on ``xxhash64``; ``exact_on_url`` is
        retained for API compatibility and ignored (it is always true now).
        The hash appears only inside the bloom probe and bucket assignment,
        where a collision costs one extra exact check, never a dropped URL.

        Size-adaptive plan (the seen-set row count is known from snapshot
        metadata, zero Spark jobs — the same size-based strategy choice AQE
        makes for joins):

        - **small seen set** (≤ ``broadcast_limit`` keys): ONE broadcast
          anti-join. No bloom probe, no repartition, no Python workers.
        - **large seen set** (the 10^10 path): bucket-cogroup bloom probe
          against the base blooms; "maybe seen" rows (dups + ~1e-4 FPs) are
          checked exactly with a semi-join + anti-join pair in which the big
          seen side is only ever SCANNED (column-pruned to the key, AQE
          broadcasts the small sides) — the seen table never crosses an
          exchange; "definitely new" rows check only the post-base delta
          keys (bounded by compaction cadence).

        With an empty seen set the input is returned unchanged.
        """
        del exact_on_url  # always exact on URL text; kept for API compat
        if self.is_empty():
            return candidates
        if broadcast_limit is None:
            broadcast_limit = self.probe_broadcast_limit

        KEY = "_seen_key"

        def _keys(df: DataFrame, col: str = "url") -> DataFrame:
            """Key frame (one column ``_seen_key``) for exact resolution."""
            return df.select(self._key_text(col).alias(KEY))

        added = [KEY]

        total = self._total_rows()
        if 0 <= total <= broadcast_limit:
            cand = candidates.withColumn(KEY, self._key_text(url_col))
            return cand.join(
                F.broadcast(_keys(self.read())), on=KEY, how="left_anti"
            ).drop(*added)

        if "url_hash" not in candidates.columns:
            added.append("url_hash")
        cand = self._with_bucket(
            candidates.withColumn(KEY, self._key_text(url_col)).withColumn(
                "url_hash", self._key_hash(url_col)
            )
        )
        # NB: StructType.add MUTATES the df's cached schema object — build a
        # fresh StructType for the probe output schema instead
        from pyspark.sql.types import BooleanType, StructField, StructType

        schema = StructType(
            list(cand.schema.fields) + [StructField("maybe_seen", BooleanType())]
        )

        if self.store.exists(self.bloom_name):
            # freshness gate (review r5): the bloom must cover EXACTLY the
            # current chain base — a crash between a base commit and the
            # bloom rebuild leaves the old bloom on disk, whose missing
            # keys would flow out as false "definitely new" (the delta
            # chain they used to live in is gone after compaction).
            # Self-heal by rebuilding; legacy blooms without the stamp are
            # treated as stale once, then stamped.
            base_id = self.store.chain_parts(self.name)[0]["id"]
            bloom_for = self.store.current_snapshot(self.bloom_name)[
                "meta"
            ].get("for_snap")
            if bloom_for != base_id:
                self._maybe_build_blooms({"event": "bloom-repair"})
            blooms = self.store.read(self.bloom_name)
            probed = (
                cand.groupBy(_BUCKET)
                .cogroup(blooms.groupBy(_BUCKET))
                .applyInPandas(_probe_fn, schema=schema)
                # NOTE (review r5): both split branches below consume this
                # frame, so the union plan contains the Python cogroup
                # stage twice (ReuseExchange dedups the shuffle beneath
                # it, not the Arrow probe). Caching here is NOT safe:
                # .persist() on this cogroup output made the downstream
                # anti-joins return wrong rows (seen keys leaked through
                # as new — caught by test_large_path_bloom_cogroup_
                # matches_small_path when the fix was attempted), so the
                # double probe is the accepted cost — numpy-vectorized
                # over the politeness-capped batch.
            )
        else:  # store predates bloom tables: everything goes to the exact check
            probed = cand.withColumn("maybe_seen", F.lit(True))

        definitely_new = probed.where(~F.col("maybe_seen"))
        maybe_seen = probed.where(F.col("maybe_seen"))

        # exact check without shuffling the seen table: PRESENT = seen ⋉ maybe
        # (scan seen, AQE-broadcast the small maybe key set), then
        # survivors = maybe ⋉̸ PRESENT (PRESENT is tiny → broadcast anti-join).
        # Both joins key on the URL TEXT, so a hash collision between a new
        # URL and a seen one cannot drop the new URL.
        present = _keys(self.read()).join(
            maybe_seen.select(KEY), on=KEY, how="left_semi"
        )
        survivors = maybe_seen.join(present, on=KEY, how="left_anti")

        # base bloom says "not in base" — only the post-base deltas can still
        # contain the key (bounded by compaction cadence → broadcastable)
        deltas = self._delta_keys()
        if deltas is not None:
            definitely_new = definitely_new.join(
                F.broadcast(_keys(deltas)), on=KEY, how="left_anti"
            )
        return definitely_new.unionByName(survivors).drop(
            "maybe_seen", _BUCKET, *added
        )


def _build_bloom_fn(m_bits: int):
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf["url_hash"].to_numpy()
        blm = bloom_kernel.build(hashes, m_bits)
        return pd.DataFrame(
            {
                _BUCKET: [int(pdf[_BUCKET].iloc[0])],
                "bloom": [blm],
                "n_keys": [len(hashes)],
            }
        )

    return build


def _probe_fn(cand: pd.DataFrame, blooms: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped bucket probe: candidates × (their bucket's bloom row).

    ``blooms`` has 0 or 1 rows (one bloom per bucket). A bucket with no bloom
    row has no base keys → nothing is "maybe seen". Buckets present only on
    the bloom side produce no candidate rows.
    """
    if cand.empty:
        return cand.assign(maybe_seen=pd.Series([], dtype=bool))
    if blooms.empty:
        return cand.assign(maybe_seen=False)
    blm = bytes(blooms["bloom"].iloc[0])
    maybe = bloom_kernel.might_contain(blm, cand["url_hash"].to_numpy())
    return cand.assign(maybe_seen=maybe)


# ---------------------------------------------------------------------------
# KMV distinct-count sketch — "how many URLs has this crawl seen?"
# ---------------------------------------------------------------------------
def _kmv_hash_sql(col: str, d: dict) -> str:
    """The shared [0, P²) dual-fold digest (textstats.kmv_digest64_sql).

    Earlier revisions mixed a single fold as (h² + 7) mod P — that fixes
    the fold's trailing-char lattice (measured: 29% high on /page/<i>
    URLs vs ~10% after, k=128) but leaves quadratic-residue clustering on
    short sequential keys (measured 2× over-estimate at k=64) AND a
    universe that saturates near 2.1e9 distinct keys. The shared 64-bit
    digest addresses both; sketches.py's grouped/set-algebra/HyperBall
    variants use the identical kernel.
    """
    from scrape_spark.functions import textstats as ts

    return ts.kmv_digest64_sql(col, d)


def kmv_distinct(
    df: DataFrame,
    col: str = "url",
    k: int = 256,
) -> DataFrame:
    """One-row frame (n_kept, threshold, estimate): the k-minimum-values
    cardinality sketch (Bar-Yossef et al. 2002) over ``col``.

    If the k smallest DISTINCT hash values in [0, U = P²) have maximum
    h_k, the distinct count is ≈ (k-1) * U / h_k. Unlike HyperLogLog this
    is exactly reproducible across engines — the hash is the shared
    dual-fold digest, the estimate pure integer arithmetic
    (textstats.kmv_estimate_sql), so the DuckDB oracle pins it
    bit-for-bit (approx_count_distinct never could: each engine's HLL
    differs).

    This is the global one-row variant; ``operators.sketches`` carries the
    grouped sketch (``kmv_distinct``), two-stream set algebra
    (``kmv_overlap``) and the HyperBall family built on the same
    square-mixed registers.

    Scale shape: one map-side-combined int64 groupBy (hash dedup — the
    combiner collapses repeats before the wire) feeding a
    TakeOrderedAndProject(k) — per-partition top-k then a k-row merge at
    the driver side of the plan, never a full sort. Fewer than k distinct
    values -> the estimate IS the exact count.
    """
    from scrape_spark.functions import textstats as ts

    h = _kmv_hash_sql(col, ts.SPARK_DIALECT)
    kept = (
        df.select(F.expr(h).alias("_kmv_h"))
        # NULL keys digest to NULL: excluded on both engines (Spark sorts
        # NULLs first, DuckDB last — counting one desyncs n_kept/threshold)
        .where(F.col("_kmv_h").isNotNull())
        # distinct, not groupBy+count: the count column was never read
        # (review r5) — .distinct() is the same map-side-combined hash
        # dedup without the dead int64 per key, and matches the DuckDB
        # twin's SELECT DISTINCT
        .distinct()
        .orderBy("_kmv_h")
        .limit(int(k))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("_kmv_h").cast("long").alias("threshold"),
        )
    )
    return kept.select(
        "n_kept",
        "threshold",
        F.expr(
            ts.kmv_estimate_sql("n_kept", "threshold", k, ts.SPARK_DIALECT)
        )
        .cast("long")
        .alias("estimate"),
    )


def kmv_distinct_sql(rows_sql: str, col: str = "url", k: int = 256) -> str:
    """The SAME sketch for the DuckDB oracle (``rows_sql`` yields ``col``)."""
    from scrape_spark.functions import textstats as ts

    h = _kmv_hash_sql(col, ts.DUCK_DIALECT)
    est = ts.kmv_estimate_sql("n_kept", "threshold", k, ts.DUCK_DIALECT)
    return f"""\
WITH _kmv_r AS (SELECT {h} AS h FROM ({rows_sql})),
_kmv_k AS (SELECT DISTINCT h FROM _kmv_r WHERE h IS NOT NULL
           ORDER BY h LIMIT {int(k)}),
_kmv_a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
                  CAST(MAX(h) AS BIGINT) AS threshold FROM _kmv_k)
SELECT n_kept, threshold, {est} AS estimate
FROM _kmv_a"""
