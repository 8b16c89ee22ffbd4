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
- **SimHash** — majority-vote fingerprint; hamming-0 near-dups = bucket join
  on the fingerprint, hamming-<=k = Manku block-pigeonhole search
  (``simhash_neardup_pairs`` — exact recall, never all-pairs).
- **n-gram Jaccard** — exact word-3-gram Jaccard for candidate pairs
  (verification stage after LSH, or direct on small pair lists).
- **mirror hosts** — host-LEVEL replication (Bharat & Broder):
  content-set Jaccard per host pair via a content-key self-join
  (``host_mirror_pairs``), with a stop-content cap against viral bodies.

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


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 28,
    max_hamming: int = 3,
) -> DataFrame:
    """All pairs within Hamming distance ``max_hamming`` of each other's
    SimHash — Manku/Jain/Das Sarma's block-pigeonhole search (WWW'07,
    "Detecting Near-Duplicates for Web Crawling"), NOT an approximation.

    Split the ``bits``-wide fingerprint into ``max_hamming + 1`` contiguous
    blocks: a pair at Hamming distance <= k differs in at most k blocks, so
    by pigeonhole it agrees EXACTLY on at least one block. Candidate
    generation is therefore a union of bucket self-joins on
    (block_idx, block_value) — recall 1.0 by construction — and the verify
    stage keeps ``bit_count(sh_1 ^ sh_2) <= k``.

    Plan shape: fingerprints (map-only JVM expression) → posexplode into
    n_blocks rows each → ONE shuffle on (block_idx, block_val) → per-bucket
    pairs → dropDuplicates → map-side popcount verify. Never all-pairs: a
    doc only ever meets docs sharing a block value. At 10^10 docs, pass
    ``bits > 31``: the fingerprint switches to the two-mix wide kernel
    (``textstats.simhash_wide``, Manku-scale — bits=56, k=3 gives 14-bit
    blocks), so each block spans 2^14 values and bucket fan-in stays flat;
    block width, not corpus size, bounds bucket sizes on non-adversarial
    corpora.

    Returns (id_1, id_2, hamming) with id_1 < id_2.
    """
    fp = ts.simhash_wide(text_col, bits) if bits > 31 else ts.simhash(text_col, bits)
    return fingerprint_neardup_pairs(
        docs.select(F.col(id_col).alias("id"), fp.alias("sh")),
        bits=bits,
        max_hamming=max_hamming,
    )


def fingerprint_neardup_pairs(
    fps: DataFrame,
    bits: int,
    max_hamming: int = 3,
    id_col: str = "id",
    fp_col: str = "sh",
) -> DataFrame:
    """The Manku block-pigeonhole search over an ARBITRARY non-negative
    fingerprint column — the machinery behind :func:`simhash_neardup_pairs`,
    shared with the media average-hash path (functions/multimodal.py
    ``media_neardup_pairs``): any map-computable <= 63-bit fingerprint gets
    exact Hamming-<= k pairing with one bucket shuffle. Same plan shape and
    guarantees as documented above. Returns (id_1, id_2, hamming)."""
    n_blocks = max_hamming + 1
    if bits % n_blocks:
        raise ValueError(f"bits={bits} must divide into {n_blocks} blocks")
    width = bits // n_blocks
    sh = fps.select(F.col(id_col).alias("id"), F.col(fp_col).alias("sh"))
    block_vals = F.array(
        *[
            F.expr(f"(sh div {1 << (j * width)}) % {1 << width}")
            for j in range(n_blocks)
        ]
    )
    blocks = sh.select(
        "id", "sh", F.posexplode(block_vals).alias("block_idx", "block_val")
    )
    left = blocks.select(
        "block_idx", "block_val", F.col("id").alias("id_1"), F.col("sh").alias("sh_1")
    )
    right = blocks.select(
        "block_idx", "block_val", F.col("id").alias("id_2"), F.col("sh").alias("sh_2")
    )
    return (
        left.join(right, on=["block_idx", "block_val"], how="inner")
        .where(F.col("id_1") < F.col("id_2"))
        # popcount verify BEFORE the dedupe shuffle: the sf1 stress sweep
        # caught the old order (dedupe first) moving the ENTIRE raw
        # candidate volume through the exchange — on a corpus whose
        # fingerprint bits correlate (any shared-vocabulary web corpus), a
        # hot block can hold 10^4-10^5 docs and the candidate set runs to
        # 10^9 rows; the map-side Hamming filter kills ~99.9% of them for
        # free (hamming is a pure function of the pair, so filtering
        # before or after duplicate removal is semantically identical)
        .withColumn("hamming", F.expr("bit_count(sh_1 ^ sh_2)").cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_1", "id_2"])
        .select("id_1", "id_2", "hamming")
    )


def host_mirror_pairs(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    max_content_hosts: int = 64,
) -> DataFrame:
    """Mirror-host detection (Bharat & Broder, "A study of host pairs with
    replicated content", WWW8 1999): host pairs whose content SETS overlap.

    The page-level dedup family (exact/MinHash/SimHash/canonical) collapses
    duplicate DOCUMENTS; mirrors are a HOST-level phenomenon — the same site
    served under several hosts (www./m./CDN/regional clones) — and the right
    output is a host-pair similarity so a crawler can stop fetching the
    clone entirely. The reference has no notion of this (it crawls one base
    host, scraper.py:249); at Common-Crawl breadth it is a first-class
    budget decision.

    Exact set semantics, no sketch: content identity is the full sha256 hex
    of the body text; candidate pairs are generated by a self-join on the
    content key, so only hosts that actually share a body ever meet — the
    shuffle is keyed by content, never all host pairs. The one adversarial
    input is VIRAL content (a boilerplate page on millions of hosts would
    quadratically explode its bucket): contents appearing on more than
    ``max_content_hosts`` distinct hosts are excluded from pairing AND from
    the per-host set sizes — the standard stop-shingle trick; the reported
    ``jaccard`` is therefore over non-viral contents (mirrors replicate the
    distinctive long tail, which is exactly the signal).

    Returns (host_1, host_2, n_common, n_1, n_2, jaccard) with
    host_1 < host_2 and jaccard >= min_jaccard.
    """
    contents = (
        pages.select(
            F.col(host_col).alias("host"),
            F.sha2(F.col(text_col), 256).alias("ckey"),
        )
        .dropDuplicates(["host", "ckey"])
    )
    non_viral = (
        contents.groupBy("ckey")
        .agg(F.count("*").alias("_spread"))
        .where(F.col("_spread") <= max_content_hosts)
        .select("ckey")
    )
    kept = contents.join(non_viral, on="ckey", how="left_semi")
    sizes = kept.groupBy("host").agg(F.count("*").cast("long").alias("n"))
    inter = (
        kept.select(F.col("host").alias("host_1"), "ckey")
        .join(kept.select(F.col("host").alias("host_2"), "ckey"), on="ckey")
        .where(F.col("host_1") < F.col("host_2"))
        .groupBy("host_1", "host_2")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("host").alias("host_1"), F.col("n").alias("n_1")), "host_1")
        .join(sizes.select(F.col("host").alias("host_2"), F.col("n").alias("n_2")), "host_2")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_1") + F.col("n_2") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("host_1", "host_2", "n_common", "n_1", "n_2", "jaccard")
    )


def _shingle_set(text_col: str):
    return F.array_distinct(F.expr(ts.shingle_hashes_sql(text_col, ts.SPARK_DIALECT)))


def ngram_jaccard_pairs(
    pairs: DataFrame,
    text_1: str = "text_1",
    text_2: str = "text_2",
) -> DataFrame:
    """Exact word-3-gram Jaccard for pre-paired rows; adds ``jaccard`` double.

    Intersection/union on distinct shingle-hash sets.
    double-audit: the one double op is a single division of two exact
    small ints — IEEE correct rounding makes it bit-identical across
    engines and environments (no libm, no reassociation).
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


# ---------------------------------------------------------------------------
# exact-substring span dedup (Lee et al. 2021, hash-window approximation)
# ---------------------------------------------------------------------------
#: duplicate-window width in tokens. Lee et al. use 50-token spans over BPE
#: ids with a suffix array; this engine marks w-token WORD windows whose
#: rolling hash repeats corpus-wide — the shuffle-friendly approximation.
DUP_SPAN_W = 8


def window_hashes_sql(text: str, d: dict, w: int = DUP_SPAN_W) -> str:
    """int64 rolling hash per w-token window (element i = window at token i).

    hash(s) = fold_{j=s..s+w-1} (acc * 1000003 + wordhash_j) mod P — exact
    int64 (acc < P, so acc*1e6 + h < 2^52), identical on both engines.
    The word-hash array is let-bound once (the shingle kernel's measured
    ~100x blowup guard) and each window refolds w elements: O(n*w) ops,
    map-only, cost capped by w, not document length squared.
    """
    wh = ts.word_hashes_sql(text, d, cap=None)
    n = d["size"].format(arr="__dwh")
    at_j = d["at"].format(arr="__dwh", i="CAST(_dj AS INT)")
    fold = d["fold0"].format(
        arr=d["seq"].format(a="CAST(_ds AS BIGINT)", b=f"CAST(_ds + {w - 1} AS BIGINT)"),
        lam=f"(_da, _dj) -> (_da * 1000003 + {at_j}) % {ts.HASH_P}",
    )
    body = d["transform"].format(
        arr=d["seq"].format(a="CAST(1 AS BIGINT)", b=f"CAST({n} - {w - 1} AS BIGINT)"),
        lam=f"_ds -> {fold}",
    )
    guarded = (
        f"CASE WHEN {n} < {w} THEN {d['empty_bigint_array']} ELSE {body} END"
    )
    return ts._bind(guarded, "__dwh", wh, d)


def _covered_sql(starts: str, d: dict, w: int) -> str:
    """Distinct token indices covered by dup windows starting at ``starts``."""
    spans = d["transform"].format(
        arr=starts,
        lam=f"_dc -> " + d["seq"].format(a="CAST(_dc AS BIGINT)", b=f"CAST(_dc + {w - 1} AS BIGINT)"),
    )
    return d["adistinct"].format(arr=d["aflatten"].format(arr=f"({spans})"))


def _dup_starts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    w: int,
    min_count: int,
) -> DataFrame:
    """(id, starts) — sorted distinct start positions of corpus-duplicated
    windows per doc. The ONE shuffle pair of the operator: a window-hash
    keyed count (map-side combined; rolling hashes are uniform, no skew)
    and the hash-keyed join carrying (id, pos) pairs back — int64 triples
    only, never text."""
    d = ts.SPARK_DIALECT
    tok = docs.select(
        F.col(id_col).alias("_dd_id"),
        F.posexplode(F.expr(window_hashes_sql(text_col, d, w))).alias(
            "_dd_p0", "_dd_h"
        ),
    ).select("_dd_id", (F.col("_dd_p0") + 1).alias("_dd_pos"), "_dd_h")
    dup = (
        tok.groupBy("_dd_h")
        .agg(F.count(F.lit(1)).alias("_dd_c"))
        .where(F.col("_dd_c") >= F.lit(int(min_count)))
        .select("_dd_h")
    )
    return (
        tok.join(dup, "_dd_h")
        .groupBy("_dd_id")
        .agg(F.sort_array(F.collect_set("_dd_pos")).alias("_dd_starts"))
    )


def dup_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DUP_SPAN_W,
    min_count: int = 2,
) -> DataFrame:
    """Per-doc duplicate-span coverage: (id, n_tokens, n_dup_windows,
    dup_tokens, dup_frac_q4) — the train-data health metric that decides
    whether to strip spans or drop the page."""
    d = ts.SPARK_DIALECT
    starts = _dup_starts(docs, id_col, text_col, w, min_count)
    n = d["size"].format(arr=d["split"].format(s=text_col))
    cov = d["size"].format(arr=_covered_sql("_dd_starts", d, w))
    return (
        docs.join(
            starts.withColumnRenamed("_dd_id", id_col), id_col, "left"
        )
        .select(
            id_col,
            F.expr(f"CAST({n} AS BIGINT)").alias("n_tokens"),
            F.coalesce(F.size("_dd_starts").cast("long"), F.lit(0)).alias(
                "n_dup_windows"
            ),
            F.coalesce(F.expr(f"CAST({cov} AS BIGINT)"), F.lit(0)).alias(
                "dup_tokens"
            ),
        )
        .withColumn(
            "dup_frac_q4",
            F.expr(
                "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
                "ELSE (10000 * dup_tokens) div n_tokens END"
            ),
        )
    )


def _kept_text_sql(text: str, starts: str, d: dict, w: int) -> str:
    """kept_text expression: ``text`` minus the tokens covered by dup
    windows at ``starts`` (NULL starts -> text unchanged). The word array
    AND the covered set are each let-bound once — inlining the split per
    token reference is the O(n^2) blowup the shingle kernel documents."""
    at_i = d["at"].format(arr="__dwd", i="CAST(_di AS INT)")
    n = d["size"].format(arr="__dwd")
    kept = d["ajoin"].format(
        arr=d["transform"].format(
            arr=d["filter"].format(
                arr=d["seq"].format(
                    a="CAST(1 AS BIGINT)", b=f"CAST({n} AS BIGINT)"
                ),
                lam="_di -> NOT " + d["acontains"].format(arr="(__dcv)", x="_di"),
            ),
            lam=f"_di -> {at_i}",
        ),
        sep="' '",
    )
    # empty keep-list joins to NULL on DuckDB (array_to_string divergence)
    kept = "COALESCE(" + kept + ", '')"
    body = ts._bind(kept, "__dcv", _covered_sql(starts, d, w), d)
    body = ts._bind(body, "__dwd", d["split"].format(s=text), d)
    return f"CASE WHEN {starts} IS NULL THEN {text} ELSE {body} END"


def strip_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DUP_SPAN_W,
    min_count: int = 2,
) -> DataFrame:
    """(id, kept_text) — the doc with every corpus-duplicated w-token span
    removed (Lee et al.'s ExactSubstr dedup, hash-window form). Docs with
    no duplicated span pass through byte-identical."""
    d = ts.SPARK_DIALECT
    starts = _dup_starts(docs, id_col, text_col, w, min_count)
    expr = _kept_text_sql(text_col, "_dd_starts", d, w)
    return docs.join(
        starts.withColumnRenamed("_dd_id", id_col), id_col, "left"
    ).select(id_col, F.expr(expr).alias("kept_text"))


def _dup_span_duck_ctes(docs_sql: str, w: int, min_count: int) -> str:
    """Shared DuckDB CTE prefix: (doc_id, text) -> _dsp (doc_id, starts)."""
    d = ts.DUCK_DIALECT
    wharr = window_hashes_sql("text", d, w)
    return f"""\
WITH _dsd AS (SELECT doc_id, text FROM ({docs_sql})),
_dsw AS (SELECT doc_id,
           unnest({wharr}) AS whash,
           unnest(range(1, len({wharr}) + 1)) AS pos
         FROM _dsd),
_dsc AS (SELECT whash FROM _dsw GROUP BY whash
         HAVING COUNT(*) >= {int(min_count)}),
_dsp AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS starts
         FROM _dsw JOIN _dsc USING (whash) GROUP BY doc_id)"""


def dup_span_stats_sql(
    docs_sql: str, w: int = DUP_SPAN_W, min_count: int = 2
) -> str:
    """The SAME coverage stats for the DuckDB oracle."""
    d = ts.DUCK_DIALECT
    n = d["size"].format(arr=d["split"].format(s="text"))
    cov = d["size"].format(arr=_covered_sql("starts", d, w))
    return (
        _dup_span_duck_ctes(docs_sql, w, min_count)
        + f"""
SELECT d.doc_id,
       CAST({n} AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(p.starts), 0) AS BIGINT) AS n_dup_windows,
       CAST(COALESCE({cov}, 0) AS BIGINT) AS dup_tokens,
       CAST(CASE WHEN {n} = 0 THEN 0
            ELSE (10000 * COALESCE({cov}, 0)) // {n} END AS BIGINT)
         AS dup_frac_q4
FROM _dsd d LEFT JOIN _dsp p USING (doc_id)"""
    )


def strip_dup_spans_sql(
    docs_sql: str, w: int = DUP_SPAN_W, min_count: int = 2
) -> str:
    """The SAME span removal for the DuckDB oracle."""
    d = ts.DUCK_DIALECT
    expr = _kept_text_sql("d.text", "p.starts", d, w)
    return (
        _dup_span_duck_ctes(docs_sql, w, min_count)
        + f"""
SELECT d.doc_id, {expr} AS kept_text
FROM _dsd d LEFT JOIN _dsp p USING (doc_id)"""
    )


# ---------------------------------------------------------------------------
# standing near-dup index (incremental LSH, LSM discipline)
# ---------------------------------------------------------------------------
class NearDupIndex:
    """A standing MinHash-LSH band-bucket index as one SnapshotStore table.

    At lake scale the corpus is NOT re-signed per crawl: near-dup checking
    an incoming batch (the round's new/changed captures) against 10^10
    standing documents must touch only the band buckets the batch hashes
    into. This class keeps the banded signatures as a persistent LSM table
    (the same snapshot discipline as the CDX runs and ``PostingsIndex``):

    - table ``neardup_lsh`` rows ``(op, band_idx, band_val, doc_id, sig)``;
      ``op='add'`` is one live band row (``n_bands`` rows per doc, each
      carrying the full signature for the verify stage), ``op='del'`` a
      doc-level tombstone deleting every older row of that doc.
    - :meth:`build` writes a base; :meth:`update` folds one crawl-to-crawl
      ``capture_diff`` in as ONE atomic delta (tombstones for
      removed+changed, re-signed rows for added+changed) — no two-table
      commit pair to repair; :meth:`compact` materializes the
      merge-on-read fold as a new base when the chain grows.
    - :meth:`probe` joins a batch's map-side band rows against the live
      index on ``(band_idx, band_val)`` — the only shuffle is batch-sized
      band keys (in a real deployment the index table is bucketed by
      ``band_val`` so the probe is a bucket-pruned scan), then verifies
      candidates by exact signature overlap. Never all-pairs.

    Tests pin every state bit-identical to a from-scratch :meth:`build`
    on the live corpus, and probe results to a brute-force banded check.
    The reference has no content dedup at all (its README's "duplicate
    check by SHA-256" is URL-only, models.py:207-216); this is the
    engine's scale path for the training-data extension.
    """

    TABLE = "neardup_lsh"
    _SCHEMA = ["op", "band_idx", "band_val", "doc_id", "sig"]

    def __init__(
        self,
        store,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_bands: int = 4,
        min_est_jaccard: float = 0.25,
    ):
        if not 1 <= n_bands <= ts.N_MINHASH:
            raise ValueError(f"n_bands must be in 1..{ts.N_MINHASH}")
        self.store = store
        self.id_col = id_col
        self.text_col = text_col
        self.n_bands = n_bands
        self.min_est_jaccard = min_est_jaccard

    # -- shared shapes ---------------------------------------------------------
    def _band_rows(self, docs: DataFrame) -> DataFrame:
        """Map-side banded signatures: (band_idx, band_val, doc_id, sig)."""
        sigs = docs.select(
            F.col(self.id_col).alias("doc_id"),
            ts.minhash_signature(self.text_col).alias("sig"),
        )
        return sigs.select(
            F.posexplode(F.slice(F.col("sig"), 1, self.n_bands)).alias(
                "band_idx", "band_val"
            ),
            "doc_id",
            "sig",
        ).select(*self._SCHEMA[1:])

    def _op_rows(self, op: str, frame: DataFrame) -> DataFrame:
        cols = [F.lit(op).alias("op")]
        for c in self._SCHEMA[1:]:
            if c in frame.columns:
                cols.append(F.col(c))
            elif c == "sig":
                cols.append(
                    F.expr("CAST(array() AS array<bigint>)").alias("sig")
                )
            elif c == "band_idx":
                cols.append(F.lit(0).cast("int").alias(c))
            else:
                cols.append(F.lit(0).cast("long").alias(c))
        return frame.select(*cols)

    def _check_meta(self) -> None:
        snap = self.store.current_snapshot(self.TABLE)
        if snap is None:
            raise KeyError("near-dup index not built")
        nb = int(snap["meta"]["n_bands"])
        if nb != self.n_bands:
            raise ValueError(
                f"index was built with n_bands={nb}, opened with {self.n_bands}"
            )

    # -- writes ----------------------------------------------------------------
    def build(self, docs: DataFrame) -> None:
        """Full (re)build: one base snapshot of banded signatures."""
        self.store.write(
            self.TABLE,
            self._op_rows("add", self._band_rows(docs)),
            meta={"base": True, "n_bands": self.n_bands},
        )

    def update(self, diff: DataFrame, new_docs: DataFrame) -> None:
        """Fold one capture diff in — a single atomic delta commit.

        ``diff`` carries (id_col, status in added|removed|changed|unchanged);
        removed+changed tombstone, added+changed are re-signed from
        ``new_docs`` (the post-diff corpus).
        """
        self._check_meta()
        dels = diff.where(F.col("status").isin("removed", "changed")).select(
            F.col(self.id_col).alias("doc_id")
        )
        upserted = diff.where(F.col("status").isin("added", "changed")).select(
            F.col(self.id_col)
        )
        adds = self._band_rows(
            new_docs.join(upserted, self.id_col, "left_semi")
        )
        self.store.write(
            self.TABLE,
            self._op_rows("del", dels).unionByName(self._op_rows("add", adds)),
            meta={"n_bands": self.n_bands},
        )

    def compact(self) -> None:
        """Materialize the merge-on-read fold as a new base snapshot."""
        self._check_meta()
        self.store.write(
            self.TABLE,
            self._op_rows("add", self.rows()),
            meta={"base": True, "n_bands": self.n_bands},
        )

    # -- reads -----------------------------------------------------------------
    def rows(self) -> DataFrame:
        """Live band rows: fold base + deltas, applying doc tombstones."""
        self._check_meta()
        cur = None
        for p in self.store.chain_parts(self.TABLE):
            df = self.store.read(self.TABLE, p["id"])
            adds = df.where(F.col("op") == "add").select(*self._SCHEMA[1:])
            if cur is None:
                cur = adds
                continue
            dels = df.where(F.col("op") == "del").select("doc_id")
            cur = (
                cur.join(dels, "doc_id", "left_anti")
                .select(*self._SCHEMA[1:])
                .unionByName(adds)
            )
        return cur

    def probe(self, batch: DataFrame) -> DataFrame:
        """Near-dup candidates of ``batch`` against the standing corpus.

        Returns (probe_id, index_id, n_sig_match) with signature overlap
        >= min_est_jaccard * k, self-matches (same id on both sides)
        excluded. Plan: batch band rows (map-only) ⋈ index band rows on
        (band_idx, band_val) → distinct pairs → exact overlap verify.
        """
        idx = self.rows().select(
            "band_idx",
            "band_val",
            F.col("doc_id").alias("index_id"),
            F.col("sig").alias("sig_i"),
        )
        pb = self._band_rows(batch).select(
            "band_idx",
            "band_val",
            F.col("doc_id").alias("probe_id"),
            F.col("sig").alias("sig_p"),
        )
        cand = (
            pb.join(idx, on=["band_idx", "band_val"], how="inner")
            .where(F.col("probe_id") != F.col("index_id"))
            .dropDuplicates(["probe_id", "index_id"])
        )
        overlap = F.expr(
            "size(filter(zip_with(sig_p, sig_i, (a, b) -> a = b), x -> x))"
        ).cast("long")
        return (
            cand.withColumn("n_sig_match", overlap)
            .where(
                F.col("n_sig_match")
                >= F.lit(self.min_est_jaccard * ts.N_MINHASH)
            )
            .select("probe_id", "index_id", "n_sig_match")
        )


# ---------------------------------------------------------------------------
# semantic near-dup straight from raw text (no learned embeddings needed)
# ---------------------------------------------------------------------------


def text_semantic_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    n_bits: int = 8,
    n_tables: int = 3,
    min_cosine: float = 0.90,
) -> DataFrame:
    """SemDeDup-shaped near-dup pairs from raw text: hashed bag-of-words
    embedding (textstats.hash_embedding — exact int64 feature hashing) →
    multi-table sign-bit LSH buckets → within-bucket cosine ≥ threshold.

    The raw-text on-ramp to the vector dedup stack when no learned
    embeddings exist: the embedding and all ``n_tables`` bucket signatures
    are ONE map-side projection (corpus scanned once, never hash-shuffled
    on content), exploded to (table, bucket) rows; the pair join is
    bucket-local per table (never all-pairs), candidate pairs are deduped
    across tables BEFORE scoring so each pair's cosine is computed once.
    Recall grows with ``n_tables`` at fixed ``n_bits`` — the same knob as
    ``lsh_topk``. Only (id, vector, bucket) rows ride the exchange — text
    stays in the scan. Returns (id_1, id_2, cosine), id_1 < id_2.
    Zero-vector docs (no tokens) yield NULL cosine and drop at the
    threshold — both engines agree (NULL comparison semantics).
    """
    from scrape_spark.operators.similarity import cosine_expr, lsh_signature

    emb = docs.select(
        F.col(id_col),
        F.expr(
            "transform("
            + ts.hash_embedding_sql(text_col, ts.SPARK_DIALECT, dim)
            + ", x -> CAST(x AS DOUBLE))"
        ).alias("_hv"),
    )
    sig_arr = F.array(
        *[
            F.struct(
                F.lit(t).alias("_tbl"),
                lsh_signature("_hv", n_bits, table=t).alias("_bkt"),
            )
            for t in range(n_tables)
        ]
    )
    b = emb.select(id_col, "_hv", F.explode(sig_arr).alias("_s")).select(
        id_col, "_hv", "_s._tbl", "_s._bkt"
    )
    left = b.select(
        F.col(id_col).alias("id_1"), F.col("_hv").alias("v1"), "_tbl", "_bkt"
    )
    right = b.select(
        F.col(id_col).alias("id_2"), F.col("_hv").alias("v2"), "_tbl", "_bkt"
    )
    return (
        left.join(right, on=["_tbl", "_bkt"], how="inner")
        .where(F.col("id_1") < F.col("id_2"))
        .dropDuplicates(["id_1", "id_2"])
        .withColumn("cosine", cosine_expr("v1", "v2"))
        .where(F.col("cosine") >= F.lit(min_cosine))
        .select("id_1", "id_2", "cosine")
    )


def text_semantic_pairs_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    n_bits: int = 8,
    n_tables: int = 3,
    min_cosine: float = 0.90,
) -> str:
    """DuckDB replay of ``text_semantic_pairs`` (same kernels, same fold
    order — embedding via hash_embedding_sql, per-table buckets via
    lsh_signature_duck_sql, OR-of-collisions with DISTINCT pair dedup,
    cosine via the cast-first in-order list_sum)."""
    from scrape_spark.operators.similarity import lsh_signature_duck_sql

    def dot(x: str, y: str) -> str:
        return (
            f"list_sum(list_transform(range(1, len({x}) + 1), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))"
        )

    cos = (
        f"({dot('v1', 'v2')} / "
        f"(sqrt({dot('v1', 'v1')}) * sqrt({dot('v2', 'v2')})))"
    )
    hv = (
        "list_transform("
        + ts.hash_embedding_sql(text_col, ts.DUCK_DIALECT, dim)
        + ", x -> CAST(x AS DOUBLE))"
    )
    sigs = ", ".join(
        f"{lsh_signature_duck_sql('_hv', n_bits, t)} AS _b{t}"
        for t in range(n_tables)
    )
    collide = " OR ".join(f"a._b{t} = b._b{t}" for t in range(n_tables))
    return f"""WITH _e AS (SELECT {id_col}, {hv} AS _hv FROM ({docs_sql})),
_b AS (SELECT *, {sigs} FROM _e),
_c AS (SELECT DISTINCT a.{id_col} AS id_1, b.{id_col} AS id_2,
              a._hv AS v1, b._hv AS v2
       FROM _b a JOIN _b b ON ({collide}) AND a.{id_col} < b.{id_col}),
_p AS (SELECT id_1, id_2, {cos} AS cosine FROM _c)
SELECT id_1, id_2, cosine FROM _p WHERE cosine >= {min_cosine}"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003, MOSS)
# ---------------------------------------------------------------------------
# The span-dedup above emits EVERY w-token window hash — one shuffled row
# per token. Winnowing is the classic state reducer: slide a window of
# ``window`` consecutive g-gram hashes and keep only each window's MINIMUM,
# for an expected selected density of 2/(window+1) — with the GUARANTEE
# (SWA03 Thm.) that any shared token run of length >= g + window - 1
# produces at least one shared fingerprint in both documents (the run's
# minimal gram hash is the min of every window containing it, and each
# document has such a window fully inside the run). So candidate recall
# for long shared passages is preserved while the shuffled row count drops
# ~(window+1)/2-fold — the difference between feasible and not at 100 TB.

WINNOW_G = 4  # token g-gram size
WINNOW_W = 8  # winnowing window (in gram hashes)


def winnow_fingerprints_sql(
    text: str, d: dict, g: int = WINNOW_G, window: int = WINNOW_W
) -> str:
    """Sorted distinct winnowed fingerprints of ``text`` — int64 array.

    Gram hashes come from :func:`window_hashes_sql` (the shared rolling
    kernel); selection is min-by-value per window (value ties collapse in
    the distinct anyway). Documents shorter than one full window keep the
    single global min — short docs must not vanish from the index.
    """
    grams = window_hashes_sql(text, d, w=g)
    n = d["size"].format(arr="__wfh")
    win_min = d["amin"].format(
        arr=d["asliceat"].format(arr="__wfh", i="CAST(_wi AS INT)", n=str(int(window)))
    )
    body = d["transform"].format(
        arr=d["seq"].format(
            a="CAST(1 AS BIGINT)", b=f"CAST({n} - {window - 1} AS BIGINT)"
        ),
        lam=f"_wi -> {win_min}",
    )
    picked = (
        f"CASE WHEN {n} = 0 THEN {d['empty_bigint_array']} "
        f"WHEN {n} < {window} THEN {d['mkarr'].format(x=d['amin'].format(arr='__wfh'))} "
        f"ELSE {body} END"
    )
    out = d["asort"].format(arr=d["adistinct"].format(arr=f"({picked})"))
    return ts._bind(out, "__wfh", grams, d)


def winnow_fingerprint_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    g: int = WINNOW_G,
    window: int = WINNOW_W,
) -> DataFrame:
    """(id, fp): one row per selected fingerprint — the postings the
    candidate join runs on. Map-only until the caller shuffles."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(winnow_fingerprints_sql(text_col, ts.SPARK_DIALECT, g, window))
        ).alias("fp"),
    )


def winnowed_dup_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    g: int = WINNOW_G,
    window: int = WINNOW_W,
    min_shared: int = 1,
    max_df: int = 64,
) -> DataFrame:
    """(id_1, id_2, n_shared): pairs sharing ≥ ``min_shared`` winnowed
    fingerprints — the partial-copy candidates shingle-Jaccard misses when
    two documents share a long passage but differ overall.

    Fingerprints appearing in more than ``max_df`` documents are dropped
    before pairing (stop-fingerprints: boilerplate runs would otherwise
    quadratically explode a bucket — same screen every postings-based
    matcher applies). Plan shape: map-only selection → one fp-keyed
    shuffle with the document-frequency screen → per-bucket pairs
    (bounded by max_df²) → pair-keyed count.
    """
    fps = winnow_fingerprint_table(docs, id_col, text_col, g, window)
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= int(max_df))
        .select("fp")
    )
    kept = fps.join(keep, "fp")
    left = kept.select("fp", F.col("id").alias("id_1"))
    right = kept.select("fp", F.col("id").alias("id_2"))
    return (
        left.join(right, "fp")
        .where(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= int(min_shared))
    )


def winnowed_dup_candidates_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    g: int = WINNOW_G,
    window: int = WINNOW_W,
    min_shared: int = 1,
    max_df: int = 64,
) -> str:
    """DuckDB oracle: identical selection, screen, pairing, and counts."""
    d = ts.DUCK_DIALECT
    fp_arr = winnow_fingerprints_sql(text_col, d, g, window)
    return f"""WITH _src AS ({docs_sql}),
_fp AS (SELECT {id_col} AS id, unnest({fp_arr}) AS fp FROM _src),
_keep AS (SELECT fp FROM _fp GROUP BY fp HAVING count(*) <= {int(max_df)}),
_k AS (SELECT f.id, f.fp FROM _fp f JOIN _keep USING (fp))
SELECT a.id AS id_1, b.id AS id_2, CAST(count(*) AS BIGINT) AS n_shared
FROM _k a JOIN _k b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2
HAVING count(*) >= {int(min_shared)}"""


def winnow_novelty(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    g: int = WINNOW_G,
    window: int = WINNOW_W,
) -> DataFrame:
    """(id, n_fp, n_novel, novelty_ppm): how much genuinely NEW content a
    candidate document adds over an existing corpus.

    novelty = fraction of the doc's winnowed fingerprints absent from the
    corpus's fingerprint set (ppm, integer). The crawl-value signal: a
    revisit-heavy or mirror-heavy frontier scores near 0 and can be
    deprioritized before fetching its whole tail; docs with no grams
    (shorter than g tokens) report NULL novelty rather than pretending
    either extreme.

    Scale shape: both sides reduce to fingerprint postings (map-only
    selection, 2/(window+1) density); the corpus side is distinct-ed and
    the membership join runs fp-keyed — int64 postings only, never text.
    The fingerprint kernel runs ONCE per side: a left join with a seen
    flag feeds one aggregation computing both counts (two independent
    subtrees would re-run the selection kernel — Spark does not reuse
    common subplans).
    """
    fps = winnow_fingerprint_table(new_docs, id_col, text_col, g, window)
    seen = (
        winnow_fingerprint_table(corpus, id_col, text_col, g, window)
        .select("fp")
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    counts = (
        fps.join(seen, "fp", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fp"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    base = new_docs.select(F.col(id_col).alias("id"))
    out = base.join(counts, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_fp", F.lit(0)).cast("long").alias("n_fp"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
    )
    ppm = F.expr("CAST((n_novel * 1000000) div n_fp AS BIGINT)")
    return out.withColumn(
        "novelty_ppm", F.when(F.col("n_fp") > 0, ppm).otherwise(F.lit(None))
    )


def winnow_novelty_sql(
    new_sql: str,
    corpus_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    g: int = WINNOW_G,
    window: int = WINNOW_W,
) -> str:
    """DuckDB oracle: identical postings, anti-join, and ppm arithmetic."""
    d = ts.DUCK_DIALECT
    fp_arr = winnow_fingerprints_sql(text_col, d, g, window)
    return f"""WITH _new AS ({new_sql}),
_nfp AS (SELECT {id_col} AS id, unnest({fp_arr}) AS fp FROM _new),
_seen AS (SELECT DISTINCT unnest({fp_arr}) AS fp FROM ({corpus_sql})),
_nov AS (SELECT id, CAST(count(*) AS BIGINT) AS n_novel
         FROM _nfp WHERE fp NOT IN (SELECT fp FROM _seen) GROUP BY id),
_tot AS (SELECT id, CAST(count(*) AS BIGINT) AS n_fp FROM _nfp GROUP BY id)
SELECT b.{id_col}, coalesce(t.n_fp, 0) AS n_fp,
       coalesce(v.n_novel, 0) AS n_novel,
       CASE WHEN coalesce(t.n_fp, 0) > 0
            THEN (coalesce(v.n_novel, 0) * 1000000) // t.n_fp END AS novelty_ppm
FROM (SELECT {id_col} FROM _new) b
LEFT JOIN _tot t ON t.id = b.{id_col}
LEFT JOIN _nov v ON v.id = b.{id_col}"""
