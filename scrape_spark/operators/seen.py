"""Partitioned URL-seen set: bloom prefilter + exact anti-join.

Replaces the reference's row-at-a-time duplicate probe
(``exists_in_db``: ``SELECT 1 FROM scraped_pages WHERE url=%s LIMIT 1``,
models.py:207-216, called once per extracted link at scraper.py:159-162) with
a two-tier distributed design sized for a 10^10-URL frontier:

1. **Bloom prefilter** (fast path): the seen set is hash-bucketed by
   ``pmod(xxhash64(url), n_buckets)``; each bucket owns a numpy bloom filter
   persisted as one sidecar file. Candidate links are repartitioned by bucket
   and probed via ``mapInPandas`` — each task lazily loads ONLY its own
   buckets' blooms (worker-local cache), so memory per task stays bounded at
   any scale (at 10^10 keys / 4096 buckets / 16 bits/key ≈ 5 MB per bucket;
   nothing is broadcast). "Definitely new" rows (the overwhelming majority in
   a healthy crawl round) skip the join entirely.

2. **Exact anti-join** (correctness path): "maybe seen" rows — true
   duplicates plus the bloom's ~1e-4 false positives — go through a real
   ``left_anti`` join against the seen table on ``url_hash`` (64-bit collision
   risk over 10^10 keys ≈ 2.7e-3 table-wide; both sides also carry ``url`` so
   strict mode can join on the full string). Dedup is therefore EXACT; the
   bloom only shrinks the shuffle.

The seen table and its blooms are updated per crawl round with the newly
scheduled URLs; only buckets that received keys rebuild their bloom
(incremental OR-merge, ``bloom.merge``).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scrape_spark.operators import bloom as bloom_kernel
from scrape_spark.plans.statestore import SnapshotStore

_BUCKET = "seen_bucket"


class SeenSet:
    """URL-seen set backed by a SnapshotStore table + bloom sidecar files."""

    def __init__(
        self,
        store: SnapshotStore,
        n_buckets: int = 64,
        bits_per_key: int = bloom_kernel.DEFAULT_BITS_PER_KEY,
        bucket_capacity: int = 1 << 17,
        name: str = "seen",
    ) -> None:
        self.store = store
        self.spark = store.spark
        self.n_buckets = n_buckets
        self.bits_per_key = bits_per_key
        # blooms are FIXED-SIZE per bucket (sized for bucket_capacity keys)
        # so incremental updates are a same-size OR-merge; size n_buckets ×
        # bucket_capacity ≥ expected total URLs (10^10 → 4096 buckets of
        # 2.5M keys ≈ 5 MB each). Exceeding capacity only degrades the FP
        # rate gradually — correctness is unaffected (exact anti-join).
        self.m_bits = bloom_kernel.sizeof_bits(bucket_capacity, bits_per_key)
        self.name = name
        self.bloom_dir = os.path.join(store.root, f"{name}_bloom")
        os.makedirs(self.bloom_dir, exist_ok=True)

    # -- helpers -----------------------------------------------------------
    def _with_bucket(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        return df.withColumn(_BUCKET, F.pmod(F.col(hash_col), F.lit(self.n_buckets)))

    def is_empty(self) -> bool:
        return not self.store.exists(self.name)

    def read(self) -> DataFrame:
        """Current seen table: (url string, url_hash long, seen_bucket int).

        Union of the delta-snapshot chain since the last compaction base —
        add() appends ONLY new keys per round (O(new), not O(total): a
        10^10-key table must never be rewritten per crawl round), with
        periodic compaction bounding the chain length.
        """
        return self.store.read_chain(self.name)

    # -- write path ----------------------------------------------------------
    def add(
        self, urls: DataFrame, url_col: str = "url", compact_every: int = 16
    ) -> int:
        """Append new (url, url_hash) keys as a delta snapshot + refresh blooms.

        ``urls`` must already be deduplicated against the seen set (the crawl
        round guarantees this: filter_new → first-discovery min_by). Only
        buckets receiving new keys have their bloom files rewritten
        (read-modify-write of a few MB each); the parquet side appends one
        bucket-partitioned delta per round (Iceberg append commit in prod)
        and compacts to a fresh base every ``compact_every`` deltas.
        """
        new = (
            urls.select(
                F.col(url_col).alias("url"),
                F.xxhash64(F.col(url_col)).alias("url_hash"),
            )
            .dropDuplicates(["url_hash"])
        )
        new = self._with_bucket(new)
        if self.is_empty():
            merged, meta = new, {"base": True}
        elif self.store.chain_length(self.name) >= compact_every:
            merged = (
                self.read().unionByName(new).dropDuplicates(["url_hash"])
            )
            meta = {"base": True, "compaction": True}
        else:
            merged, meta = new, {"delta": True}

        # bloom refresh for touched buckets — build per-bucket partial blooms
        # distributedly over the NEW keys only, collect just the (bucket,
        # bytes) pairs (bounded: ≤ touched_buckets × bloom_size), OR-merge
        # into the sidecar files.
        new_blooms = (
            new.select(_BUCKET, "url_hash")
            .groupBy(_BUCKET)
            .applyInPandas(
                _build_bloom_fn(self.m_bits),
                schema=f"{_BUCKET} int, bloom binary, n_keys long",
            )
            .collect()
        )
        for row in new_blooms:
            path = os.path.join(self.bloom_dir, f"bucket_{row[_BUCKET]:05d}.bloom")
            new_bytes = bytes(row["bloom"])
            if os.path.exists(path):
                with open(path, "rb") as f:
                    new_bytes = bloom_kernel.merge([f.read(), new_bytes])
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(new_bytes)
            os.replace(tmp, path)

        return self.store.write(self.name, merged, meta=meta, partition_by=[_BUCKET])

    # -- probe path ----------------------------------------------------------
    def filter_new(
        self, candidates: DataFrame, url_col: str = "url", exact_on_url: bool = False
    ) -> DataFrame:
        """Rows of ``candidates`` whose URL is NOT in the seen set.

        Plan shape (see module doc): bucket → mapInPandas bloom probe →
        maybe-seen rows anti-join the seen table (bucket-pruned by the join
        key), definitely-new rows bypass the join. With an empty seen set the
        input is returned unchanged (minus helper columns).
        """
        if self.is_empty():
            return candidates

        cand = self._with_bucket(
            candidates.withColumn("url_hash", F.xxhash64(F.col(url_col)))
        )
        bloom_dir = self.bloom_dir
        schema = cand.schema.add("maybe_seen", "boolean")

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cache: dict[int, bytes | None] = {}
            for pdf in batches:
                if pdf.empty:
                    continue
                maybe = pd.Series(False, index=pdf.index)
                for bucket, idx in pdf.groupby(_BUCKET).groups.items():
                    if bucket not in cache:
                        path = os.path.join(
                            bloom_dir, f"bucket_{int(bucket):05d}.bloom"
                        )
                        cache[bucket] = (
                            open(path, "rb").read() if os.path.exists(path) else None
                        )
                    blm = cache[bucket]
                    if blm is not None:
                        maybe.loc[idx] = bloom_kernel.might_contain(
                            blm, pdf.loc[idx, "url_hash"].to_numpy()
                        )
                pdf = pdf.copy()
                pdf["maybe_seen"] = maybe
                yield pdf

        probed = cand.repartition(self.n_buckets, _BUCKET).mapInPandas(
            probe, schema=schema
        )
        definitely_new = probed.where(~F.col("maybe_seen"))
        maybe_seen = probed.where(F.col("maybe_seen"))

        seen = self.read()
        if exact_on_url:
            survivors = maybe_seen.join(
                seen.select(F.col("url").alias(url_col)), on=url_col, how="left_anti"
            )
        else:
            survivors = maybe_seen.join(
                seen.select("url_hash"), on="url_hash", how="left_anti"
            )
        return definitely_new.unionByName(survivors).drop(
            "maybe_seen", _BUCKET, *(["url_hash"] if "url_hash" not in candidates.columns else [])
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
