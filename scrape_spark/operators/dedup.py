"""Document-level deduplication operators for training-data pipelines.

The reference dedups URLs only (unique key + per-link existence probe,
models.py:207-216 / schema/scraped_pages.sql:14); content-level dedup is
limited to *storing* a SHA-256 (scraper.py:23-25) that is never used as a
key. A 100 TB corpus needs real content dedup, so the engine adds, as
first-class operators over the ``documents`` table shape:

- **exact dedup** — hash-groupBy on sha256(text), keep first doc per group
  (one shuffle on the 64-hex hash; partial agg combines map-side).
- **MinHash + LSH near-dup** — k=8 signature (textstats.minhash_signature,
  pure JVM expression), banded into b single-row bands; candidate pairs =
  self-join on (band_idx, band_value) buckets, then estimated Jaccard =
  matching-signature fraction filter. Shuffle is on band values — only
  near-colliding docs ever meet, never O(n²).
- **SimHash** — 16-bit majority-vote fingerprint; near-dups = bucket join on
  the fingerprint (hamming-0) or rotate-band variants.
- **n-gram Jaccard** — exact word-3-gram Jaccard for candidate pairs
  (verification stage after LSH, or direct on small pair lists).

All signature math is exact int64 arithmetic from
``scrape_spark.functions.textstats`` — every operator here is
DuckDB-oracle-checkable (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scrape_spark.functions import textstats as ts


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct text: (content_sha, keep_id, n_dups).

    ``keep_id`` = smallest doc id in the group (deterministic first-wins,
    mirroring the reference's first-INSERT-wins upsert, models.py:50-114).
    """
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("content_sha"), id_col)
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sig array<bigint> of length N_MINHASH) — pure expression, no UDF."""
    return docs.select(
        F.col(id_col), ts.minhash_signature(text_col).alias("sig")
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    min_est_jaccard: float = 0.25,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH + signature-overlap filter.

    Returns (id_1, id_2, n_sig_match) with id_1 < id_2 and
    n_sig_match/k >= min_est_jaccard. Plan shape: signatures (map-only) →
    posexplode bands (×b) → shuffle on band value → per-bucket pairs →
    distinct → overlap filter. Bucket sizes are bounded by collision rate,
    not corpus size; a pathological all-identical corpus degrades to the
    exact-dedup case which should run FIRST at scale.
    """
    sigs = minhash_signatures(docs, id_col, text_col)
    bands = sigs.select(
        F.col(id_col).alias("id"),
        "sig",
        F.posexplode(F.slice(F.col("sig"), 1, n_bands)).alias("band_idx", "band_val"),
    )
    left = bands.select("band_idx", "band_val", F.col("id").alias("id_1"), F.col("sig").alias("sig_1"))
    right = bands.select("band_idx", "band_val", F.col("id").alias("id_2"), F.col("sig").alias("sig_2"))
    pairs = (
        left.join(right, on=["band_idx", "band_val"], how="inner")
        .where(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", "sig_1", "sig_2")
        .dropDuplicates(["id_1", "id_2"])
    )
    k = ts.N_MINHASH
    overlap = F.expr(
        "size(filter(zip_with(sig_1, sig_2, (a, b) -> a = b), x -> x))"
    ).cast("long")
    return (
        pairs.withColumn("n_sig_match", overlap)
        .where(F.col("n_sig_match") >= F.lit(min_est_jaccard * k))
        .select("id_1", "id_2", "n_sig_match")
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash int64) — 16-bit majority-vote fingerprint."""
    return docs.select(F.col(id_col), ts.simhash(text_col).alias("simhash"))


def simhash_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of docs sharing a simhash: (simhash, n_docs, min_id)."""
    return (
        simhash_fingerprints(docs, id_col, text_col)
        .groupBy("simhash")
        .agg(F.count("*").cast("long").alias("n_docs"), F.min(id_col).alias("min_id"))
    )


def _shingle_set(text_col: str):
    return F.array_distinct(F.expr(ts.shingle_hashes_sql(text_col, ts.SPARK_DIALECT)))


def ngram_jaccard_pairs(
    pairs: DataFrame,
    text_1: str = "text_1",
    text_2: str = "text_2",
) -> DataFrame:
    """Exact word-3-gram Jaccard for pre-paired rows; adds ``jaccard`` double.

    Intersection/union on distinct shingle-hash sets — integer division is
    exact, so the double is engine-reproducible bit-for-bit.
    """
    s1, s2 = _shingle_set(text_1), _shingle_set(text_2)
    inter = F.size(F.array_intersect(s1, s2)).cast("double")
    union = F.size(F.array_union(s1, s2)).cast("double")
    return pairs.withColumn(
        "jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    )


def latest_capture(
    pages: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    tiebreak_col: str | None = "text",
) -> DataFrame:
    """Latest WARC capture per URL — the CC-lake snapshot-dedup view.

    A Common-Crawl-style lake holds MULTIPLE captures of the same URL
    (recrawls); the crawl and every downstream curation op want exactly one
    row per URL, the newest. Two-phase so page payloads never ride the
    aggregation shuffle:

    1. per-key max timestamp — a (key, ts) hash agg with map-side combine;
       shuffle bytes are O(urls × 16 B) regardless of page size;
    2. equi-join back on (key, ts) — over a url-bucketed pages layout this
       reuses the bucketing (probe-only shuffle, same as the fetch join);
    3. exact ts ties (same url AND ts) resolve by max rolling hash of
       ``tiebreak_col`` — a max_by on the join output, which is already
       partitioned on the join keys, so Catalyst reuses that exchange
       rather than shuffling payloads again.
    """
    others = [c for c in pages.columns if c not in (key, ts_col)]
    if tiebreak_col is not None and tiebreak_col not in others:
        # silently degrading to a constant tie-break would make exact-ts
        # ties NONDETERMINISTIC (max_by over lit(0) picks an arbitrary
        # row) — a typo'd column name must fail loudly instead
        raise ValueError(
            f"tiebreak_col {tiebreak_col!r} is not a payload column of the "
            f"input (payload columns: {others}); pass tiebreak_col=None to "
            "accept arbitrary tie resolution explicitly"
        )
    maxts = pages.groupBy(key).agg(F.max(ts_col).alias(ts_col))
    # NULL-SAFE equality on both join keys: a url whose captures ALL lack a
    # timestamp has max(ts) = NULL, and a null-unsafe join would silently
    # drop that url from the output entirely; <=> keeps it (one capture
    # survives via the tie-break). Mixed groups still prefer timestamped
    # captures — max() ignores NULLs.
    p, m = pages.alias("_lc_p"), maxts.alias("_lc_m")
    matched = p.join(
        m,
        F.col(f"_lc_p.{key}").eqNullSafe(F.col(f"_lc_m.{key}"))
        & F.col(f"_lc_p.{ts_col}").eqNullSafe(F.col(f"_lc_m.{ts_col}")),
    ).select("_lc_p.*")
    tie = (
        F.coalesce(
            F.expr(ts.text_hash_sql(tiebreak_col, ts.SPARK_DIALECT)), F.lit(0)
        )
        if tiebreak_col is not None
        else F.lit(0)
    )
    packed = F.struct(*[F.col(c) for c in others])
    return (
        matched.groupBy(key, ts_col)
        .agg(F.max_by(packed, tie).alias("_r"))
        .select(key, ts_col, *[F.col(f"_r.{c}").alias(c) for c in others])
    )


def canonical_dedup(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Collapse pages onto their declared ``rel=canonical`` target.

    Cluster key = the page's canonical declaration
    (functions/canonical.py), or its own URL when none is declared
    (every page is self-canonical by default). Per page:

    - ``canonical_url``  — the cluster key;
    - ``is_rep``         — representative flag: the member whose URL equals
      the key (the canonical page itself, when captured), else the
      lexicographically smallest member URL — a total order, so exactly
      one representative per cluster, deterministically;
    - ``cluster_size``   — members sharing the key.

    Scale shape: one map-side regexp to stamp the key, then a single
    window over the key (equivalently one groupBy+join) — the same
    one-shuffle profile as ``exact_dedup``, keyed on canonical URL instead
    of content hash. The two compose: content dedup removes byte-identical
    captures, canonical dedup removes page-declared logical duplicates
    that differ in bytes.
    """
    from pyspark.sql import Window

    from scrape_spark.functions.canonical import canonical_col

    keyed = pages.select(
        F.col(url_col).alias("url"),
        F.coalesce(canonical_col(html_col), F.col(url_col)).alias(
            "canonical_url"
        ),
    )
    w = Window.partitionBy("canonical_url")
    ranked = keyed.select(
        "url",
        "canonical_url",
        F.row_number()
        .over(
            w.orderBy(
                (F.col("url") != F.col("canonical_url")).cast("int"), "url"
            )
        )
        .alias("_rn"),
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
    )
    return ranked.select(
        "url", "canonical_url", (F.col("_rn") == 1).alias("is_rep"),
        "cluster_size",
    )
