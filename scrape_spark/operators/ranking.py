"""Lexical retrieval over the crawled corpus: inverted postings + BM25.

The reference stores extracted page text but has no way to QUERY it
(models.py get_page_by_url is the only read path — key lookup, no ranking).
Any real crawl corpus grows a lexical search face next to the embedding ANN
one (operators/similarity.py): an inverted index (term -> postings) and a
BM25 ranker over it. Both live here, dialect-disciplined like every other
kernel so DuckDB can replay the exact formula.

Two query shapes, chosen by what exists ahead of time:

* ``bm25_topk`` — query-literal scoring with NO index: the per-term tf
  counts are map-side array expressions over the tokenized text (the term
  list is a small literal), corpus stats (N, total length, per-term df)
  are ONE scalar aggregate broadcast back, and scoring + global top-k is a
  second map pass ending in TakeOrderedAndProject. Zero wide shuffle: the
  only exchange is the single-row stats aggregate. This is the right plan
  for ad-hoc queries — at 100 TB it is two scans, both whole-stage-codegen.
* ``term_postings`` + ``bm25_over_postings`` — the index build (one
  map-side-combined shuffle keyed (term, doc)) and the probe path that
  reads only matching postings (partition-prunable when the postings table
  is written partitioned/bucketed by term), joins per-term idf, and
  aggregates scores per doc. This is the right plan for a standing index
  serving many queries; tests pin it result-identical to ``bm25_topk``.

Scoring is the Lucene BM25 variant: idf = ln(1 + (N - df + 0.5)/(df + 0.5))
(always positive), tf part = tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl)).
Scores are IEEE doubles, and (r5 double-audit) every one is bit-identical
across engines AND environments by construction: ln comes off the spliced
integer table (_idf_sql / _pmi_sql — libm ln is only 1-ulp-accurate and
platform-dependent, the class the r4 driver gate falsified), the /2^20
rescale is IEEE-exact, and the rest of the chain is +,−,×,÷ over
exactly-representable inputs in pinned evaluation order — all correctly
rounded, hence deterministic. The oracle renders floats at 6 significant
digits on top of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scrape_spark.functions import textstats as ts

BM25_K1 = 1.2
BM25_B = 0.75


def _term_literal(term: str) -> str:
    """A SQL single-quoted literal for a query term (quote-escaped)."""
    return ts.sql_str_literal(term)


def _norm_terms(terms: list[str]) -> list[str]:
    """Lowercase + order-preserving dedup; reject an empty query.

    Dedup is load-bearing: a repeated term would otherwise be scored once
    per occurrence in the literal path but once total in the postings
    path (its isin() matches each posting row a single time) — silently
    doubling scores and breaking the two paths' pinned equivalence.
    """
    out = list(dict.fromkeys(t.lower() for t in terms))
    if not out:
        raise ValueError("terms must be a non-empty list of query terms")
    return out


def _tf_sql(words: str, term: str, d: dict) -> str:
    """Occurrences of ``term`` in the bound words array — map-side count."""
    hits = d["filter"].format(arr=words, lam=f"__w -> __w = {_term_literal(term)}")
    return f"CAST({d['size'].format(arr=hits)} AS BIGINT)"


def doc_term_stats_sql(text: str, terms: list[str], d: dict) -> str:
    """ONE expression: bigint array [doclen, tf_0, ..., tf_{n-1}].

    All per-doc statistics come out of a single let-binding
    (``transform(array(split(...)), __ws -> array(...))[1]``, the SURT
    linearization trick — functions/surt.py), so the tokenizing split
    genuinely runs once per row regardless of term count; callers project
    the array elements into named columns.
    """
    toks = ts.words_sql(f"lower({text})", d)
    cells = ["CAST({} AS BIGINT)".format(d["size"].format(arr="__ws"))]
    cells.extend(_tf_sql("__ws", t, d) for t in terms)
    arr = d["mkarr"].format(x=", ".join(cells))
    return ts._bind(arr, "__ws", toks, d)


def _stat_cols(terms: list[str], d: dict, arr: str = "_st") -> dict[str, str]:
    """Named projections of the stats array (1-based element access)."""
    out = {"doclen": d["at"].format(arr=arr, i="1")}
    for i in range(len(terms)):
        out[f"tf_{i}"] = d["at"].format(arr=arr, i=str(i + 2))
    return out


def _idf_sql(df: str, n: str, d: dict) -> str:
    """Lucene BM25 idf, environment-proof (r5 double-audit).

    ``ln(1 + (N − df + 0.5)/(df + 0.5)) = ln((2N+2)/(2df+1))`` — integer
    arguments, so the libm ln (only 1-ulp-accurate, platform-dependent)
    is replaced by the spliced integer table
    (``(lnq(2N+2) − lnq(2df+1)) / 2^20``; textstats.lnq_sql). The final
    division by 2^20 is IEEE-EXACT (power of two), so the idf double is
    bit-identical across engines AND environments; every other op in the
    BM25 score chain (+,−,×,÷ over exactly-representable inputs, fixed
    evaluation order) is correctly rounded and therefore already
    deterministic. Score values move by ≤3e-5 relative vs true ln —
    inside the 6-significant-digit contract the oracle renders.
    """
    num = ts.lnq_sql(f"2 * ({n}) + 2", d)
    den = ts.lnq_sql(f"2 * ({df}) + 1", d)
    return f"(CAST({num} - {den} AS DOUBLE) / {float(1 << 20)!r})"


def _tf_part_sql(tf: str, doclen: str, sumlen: str, n: str, k1: float, b: float) -> str:
    """BM25 tf saturation with length normalization (avgdl = sumlen/N)."""
    norm = (
        f"({k1} * (1.0 - {b} + {b} * CAST({doclen} AS DOUBLE)"
        f" / (CAST({sumlen} AS DOUBLE) / CAST({n} AS DOUBLE))))"
    )
    return (
        f"(CAST({tf} AS DOUBLE) * ({k1} + 1.0)"
        f" / (CAST({tf} AS DOUBLE) + {norm}))"
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score, rank) for the top-k BM25 matches of ``terms``.

    Plan shape: map pass (doclen + per-term tf, one tokenize per row) →
    one single-row aggregate (N, sum doclen, per-term df) broadcast back →
    map-side score → global top-k (orderBy+limit lowers to
    TakeOrderedAndProject — per-partition heaps, only k rows reach the
    driver-side merge). Docs matching no term score 0 and are dropped
    before the top-k. Ties broken by id ascending.
    """
    terms = _norm_terms(terms)
    d = ts.SPARK_DIALECT
    per = docs.select(
        F.col(id_col),
        F.expr(doc_term_stats_sql(text_col, terms, d)).alias("_st"),
    ).select(
        F.col(id_col),
        *[
            F.expr(e).alias(c)
            for c, e in _stat_cols(terms, d).items()
        ],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doclen").cast("long").alias("sumlen"),
    ]
    for i in range(len(terms)):
        aggs.append(
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
        )
    stats = per.agg(*aggs)
    scored = per.crossJoin(F.broadcast(stats))
    parts = []
    for i in range(len(terms)):
        idf = _idf_sql(f"df_{i}", "n_docs", d)
        tfp = _tf_part_sql(f"tf_{i}", "doclen", "sumlen", "n_docs", k1, b)
        parts.append(f"(CASE WHEN tf_{i} > 0 THEN {idf} * {tfp} ELSE 0.0 END)")
    scored = scored.withColumn("score", F.expr(" + ".join(parts)))
    top = (
        scored.where(F.col("score") > 0)
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    return _rank_topk(top, id_col)


def _rank_topk(top: DataFrame, id_col: str) -> DataFrame:
    """Attach 1-based rank to an already-limited top-k frame.

    The unpartitioned window sits ABOVE the limit, so it only ever sees
    the k surviving rows (the planner still prints its single-partition
    warning — here that single partition is the k-row result, by design);
    the big scan below ends in TakeOrderedAndProject and stays
    window-free.
    """
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def bm25_topk_sql(
    docs_sql: str,
    terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The identical query as portable SQL (the DuckDB oracle side)."""
    terms = _norm_terms(terms)
    d = ts.DUCK_DIALECT
    per_cols = ", ".join(
        f"{e} AS {c}" for c, e in _stat_cols(terms, d).items()
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    parts = []
    for i in range(len(terms)):
        idf = _idf_sql(f"df_{i}", "n_docs", d)
        tfp = _tf_part_sql(f"tf_{i}", "doclen", "sumlen", "n_docs", k1, b)
        parts.append(f"(CASE WHEN tf_{i} > 0 THEN {idf} * {tfp} ELSE 0.0 END)")
    return f"""WITH _docs AS ({docs_sql}),
_tok AS (SELECT {id_col},
           {doc_term_stats_sql(text_col, terms, d)} AS _st FROM _docs),
_per AS (SELECT {id_col}, {per_cols} FROM _tok),
_stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(doclen) AS BIGINT) AS sumlen, {df_cols} FROM _per),
_scored AS (SELECT {id_col}, {' + '.join(parts)} AS score
            FROM _per, _stats),
_ranked AS (SELECT {id_col}, score,
              row_number() OVER (ORDER BY score DESC, {id_col}) AS rank
            FROM _scored WHERE score > 0)
SELECT {id_col}, score, CAST(rank AS BIGINT) AS rank
FROM _ranked WHERE rank <= {int(k)}"""


def term_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted index build: (term, doc_id, tf, doclen) — one shuffle.

    Tokenize + doclen map-side, explode to (doc, term), then a
    map-side-combined count keyed (term, doc). ``doclen`` rides the
    grouping as ``max`` (constant within the group) so no second join is
    needed at query time. Write the result partitioned or bucketed by
    ``term`` and the probe path becomes a pruned scan.
    """
    toks = ts.words_sql(f"lower({text_col})", ts.SPARK_DIALECT)
    base = docs.select(
        F.col(id_col),
        F.expr(toks).alias("_ws"),
    ).select(
        F.col(id_col),
        F.size("_ws").cast("long").alias("doclen"),
        F.explode("_ws").alias("term"),
    )
    return (
        base.where(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("doclen").alias("doclen"),
        )
    )


def bm25_over_postings(
    postings: DataFrame,
    terms: list[str],
    n_docs: int,
    sumlen: int,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k served from a standing postings table.

    ``n_docs``/``sumlen`` are corpus constants kept with the index (the
    stats row every index format stores); df per term is an aggregate over
    only the MATCHING postings. The term filter is a literal IN — a pruned
    scan when the table is partitioned by term. The score aggregate
    shuffles (doc, partial score) pairs for matching docs only.

    The per-doc score folds its ≤|terms| double partials in QUERY-TERM
    ORDER (collect, sort by term index, fold) — not via F.sum, whose
    partition-dependent accumulation order would make the result only
    ulp-approximately equal to ``bm25_topk``. Absent terms contribute an
    exact +0.0 in the literal path, so the two paths' IEEE sums are
    bit-identical and the equivalence test pins them with ==.
    """
    terms = _norm_terms(terms)
    hits = postings.where(F.col("term").isin(terms))
    df_tbl = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    joined = hits.join(F.broadcast(df_tbl), on="term")
    idf = _idf_sql("df", str(int(n_docs)), ts.SPARK_DIALECT)
    tfp = _tf_part_sql("tf", "doclen", str(int(sumlen)), str(int(n_docs)), k1, b)
    term_idx = "CASE term " + " ".join(
        f"WHEN {_term_literal(t)} THEN {i}" for i, t in enumerate(terms)
    ) + " END"
    scored = joined.select(
        F.col(id_col),
        F.expr(term_idx).alias("_ti"),
        F.expr(f"{idf} * {tfp}").alias("_part"),
    )
    top = (
        scored.groupBy(id_col)
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list("
                "struct(_ti, _part))), x -> x._part), "
                "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
            ).alias("score")
        )
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    return _rank_topk(top, id_col)


def postings_delta(
    diff: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Incremental index maintenance from a crawl-to-crawl diff.

    ``diff`` is (id, status) in capture_diff's taxonomy
    (operators/recrawl.py): only ``added``/``changed`` docs are
    re-tokenized (from ``new_docs``), and only ``changed``/``removed``
    docs produce tombstones. Returns ``(adds, dels)`` — ``adds`` has
    term_postings' schema, ``dels`` is a doc-id delete set (a doc-level
    tombstone deletes every term row of the old version, so no term
    enumeration of the OLD text is ever needed).

    This is deliberately a DELTA, not a rewritten table: a standing
    postings table is partitioned by term, and an eager anti-join on doc
    id would reshuffle all of it per crawl. Publish (adds, dels) as side
    runs and fold them in at compaction (``apply_postings_delta``) —
    the same LSM discipline as the CDX multi-run index (operators/cdx.py).
    """
    upserted = diff.where(F.col("status").isin("added", "changed")).select(
        F.col(id_col)
    )
    dels = diff.where(F.col("status").isin("changed", "removed")).select(
        F.col(id_col)
    )
    adds = term_postings(
        new_docs.join(upserted, id_col, "left_semi"),
        id_col=id_col,
        text_col=text_col,
    )
    return adds, dels


def apply_postings_delta(
    postings: DataFrame,
    adds: DataFrame,
    dels: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Compaction: fold one (adds, dels) delta into a postings base.

    One anti-join keyed on doc id (the delete set is crawl-delta-sized —
    broadcast in practice) plus a union with the adds. Result is
    term_postings(new corpus) exactly; tests pin that equivalence.
    """
    # a string-key join moves the key column first — restore the base order
    kept = postings.join(dels, id_col, "left_anti").select(*postings.columns)
    return kept.unionByName(adds)


def snippet_sql(
    text: str, terms: list[str], d: dict, width: int = 4
) -> str:
    """Match snippet: ±``width`` tokens around the first query-term hit.

    Pure map-side array expression (no UDF, no shuffle): tokenize once
    (let-bound), find the smallest 1-based index whose token is a query
    term, slice the surrounding window, re-join with spaces. '' when no
    term matches — and the join is coalesced because an empty slice is
    NULL on DuckDB but '' on Spark (the array_to_string divergence,
    operators/corpus.py).
    """
    lits = ", ".join(_term_literal(t) for t in _norm_terms(terms))
    idxs = d["transform"].format(
        arr=d["seq"].format(a="1", b=d["size"].format(arr="__ws")),
        lam=(
            "__i -> CASE WHEN "
            + d["at"].format(arr="__ws", i="CAST(__i AS INT)")
            + f" IN ({lits}) THEN __i ELSE NULL END"
        ),
    )
    hit = d["amin"].format(
        arr=d["filter"].format(arr=idxs, lam="__x -> __x IS NOT NULL")
    )
    body = (
        "CASE WHEN __h IS NULL THEN '' ELSE coalesce("
        + d["ajoin"].format(
            arr=d["transform"].format(
                arr=d["seq"].format(
                    a=f"greatest(1, __h - {int(width)})",
                    b=(
                        "least("
                        + d["size"].format(arr="__ws")
                        + f", __h + {int(width)})"
                    ),
                ),
                lam=(
                    "__j -> "
                    + d["at"].format(arr="__ws", i="CAST(__j AS INT)")
                ),
            ),
            sep="' '",
        )
        + ", '') END"
    )
    with_hit = ts._bind(body, "__h", hit, d)
    toks = ts.words_sql(f"lower({text})", d)
    return ts._bind(with_hit, "__ws", toks, d)


def with_snippet(
    docs: DataFrame,
    terms: list[str],
    width: int = 4,
    text_col: str = "text",
    out_col: str = "snippet",
) -> DataFrame:
    """Attach the match snippet column (map-only, codegen-friendly)."""
    return docs.withColumn(
        out_col,
        F.expr(snippet_sql(text_col, terms, ts.SPARK_DIALECT, width)),
    )


def term_cooccurrence(
    docs: DataFrame,
    seed_term: str,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-level PMI of every vocabulary term with ``seed_term``.

    pmi(t) = ln( (n_both * N) / (n_term * n_seed) ) over doc-level
    presence — the standard query-expansion signal. One exploded
    DISTINCT-terms pass (map-side combined groupBy term; the distinct is
    per-row array work, so no (doc, term) shuffle dedup), one broadcast
    of the two scalar counts. ``min_docs`` floors the co-occurrence
    support to keep the tail of one-off terms out. The seed term itself
    is excluded from the output.
    """
    seed = seed_term.lower()
    toks = ts.words_sql(f"lower({text_col})", ts.SPARK_DIALECT)
    base = docs.select(
        F.col(id_col),
        F.expr(
            ts.SPARK_DIALECT["adistinct"].format(arr=toks)
        ).alias("_terms"),
    ).withColumn(
        "_has_seed",
        F.array_contains("_terms", F.lit(seed)).cast("long"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_has_seed").alias("n_seed"),
    )
    per_term = (
        base.select(
            F.col("_has_seed"), F.explode("_terms").alias("term")
        )
        .where((F.col("term") != "") & (F.col("term") != seed))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_term"),
            F.sum("_has_seed").alias("n_both"),
        )
        .where(F.col("n_both") >= int(min_docs))
    )
    return per_term.crossJoin(F.broadcast(stats)).select(
        "term",
        "n_term",
        "n_both",
        F.expr(_pmi_sql(ts.SPARK_DIALECT)).alias("pmi"),
    )


def _pmi_sql(d: dict) -> str:
    """``ln((n_both·N)/(n_term·n_seed))`` decomposed into four integer
    lnq lookups (products of two 10^10-scale counts would overflow int64
    AND the lnq domain; sums of logs don't), divided by 2^20 — an
    IEEE-exact power-of-two division, so the pmi double is bit-identical
    across engines and environments (r5 double-audit; same rationale as
    :func:`_idf_sql`)."""
    s = (
        f"({ts.lnq_sql('n_both', d)} + {ts.lnq_sql('n_docs', d)}"
        f" - {ts.lnq_sql('n_term', d)} - {ts.lnq_sql('n_seed', d)})"
    )
    return f"(CAST({s} AS DOUBLE) / {float(1 << 20)!r})"


def term_cooccurrence_sql(
    docs_sql: str,
    seed_term: str,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The identical kernel as portable SQL (the DuckDB oracle side)."""
    seed = ts.sql_str_literal(seed_term.lower())
    d = ts.DUCK_DIALECT
    toks = d["adistinct"].format(arr=ts.words_sql(f"lower({text_col})", d))
    return f"""WITH _docs AS ({docs_sql}),
_base AS (SELECT {id_col}, {toks} AS _terms,
    CAST(CASE WHEN list_contains({toks}, {seed}) THEN 1 ELSE 0 END
         AS BIGINT) AS _has_seed
  FROM _docs),
_stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(_has_seed) AS BIGINT) AS n_seed FROM _base),
_expl AS (SELECT _has_seed, unnest(_terms) AS term FROM _base),
_per AS (SELECT term, CAST(count(*) AS BIGINT) AS n_term,
                CAST(sum(_has_seed) AS BIGINT) AS n_both
         FROM _expl WHERE term <> '' AND term <> {seed}
         GROUP BY term HAVING CAST(sum(_has_seed) AS BIGINT) >= {int(min_docs)})
SELECT term, n_term, n_both,
  {_pmi_sql(d)} AS pmi
FROM _per, _stats"""


class PostingsIndex:
    """A standing BM25 index as one SnapshotStore table — LSM semantics.

    Table ``postings`` holds rows (op, term, doc_id, tf, doclen):
    ``op='add'`` with a non-empty term is a live posting; ``op='add'``
    with ``term=''`` is the doc's LENGTH MARKER (exactly one per indexed
    doc — docs whose every token is empty produce no postings but still
    have BM25 doclen 1, and without the marker the maintained corpus
    stats would drift from a full rebuild); ``op='del'`` is a doc-level
    tombstone deleting every OLDER row of that doc. Each :meth:`update`
    commits ONE delta (tombstones + re-tokenized rows together), so there
    is no two-table commit pair to repair after a crash — the atomicity
    the frontier/seen pair needs epoch markers for (plans/crawl.py) comes
    free here. Corpus stats (n_docs, sum of doclens — the constants BM25
    needs besides df) ride the write's snapshot metadata, maintained
    arithmetically from the marker rows, so :meth:`query` never re-scans
    the corpus for them.

    Read path (:meth:`postings`): fold the snapshot chain — base, then per
    delta ``anti-join its tombstones, union its adds`` — the same
    merge-on-read shape as the frontier store; ``compact()`` materializes
    the fold as a new base (meta ``base=True`` cuts the chain) when the
    delta count grows. Tests pin every state against a from-scratch
    ``term_postings`` rebuild and ``bm25_topk`` on the live corpus.
    """

    TABLE = "postings"
    _SCHEMA = ["op", "term", "doc_id", "tf", "doclen"]

    def __init__(self, store, id_col: str = "doc_id", text_col: str = "text"):
        self.store = store
        self.id_col = id_col
        self.text_col = text_col

    # -- stats ----------------------------------------------------------------
    def stats(self) -> dict:
        snap = self.store.current_snapshot(self.TABLE)
        if snap is None:
            raise KeyError("index not built")
        m = snap["meta"]
        return {"n_docs": int(m["n_docs"]), "sumlen": int(m["sumlen"])}

    def _markers(self, docs: DataFrame) -> DataFrame:
        """One (doc_id, doclen) length-marker row per doc — the same
        tokenization as term_postings, so the two agree on doclen."""
        return docs.select(
            F.col(self.id_col).alias("doc_id"),
            F.size(F.split(F.lower(self.text_col), " "))
            .cast("long")
            .alias("doclen"),
        )

    @staticmethod
    def _marker_stats(markers: DataFrame) -> tuple[int, int]:
        row = markers.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("doclen"), F.lit(0)).alias("s"),
        ).collect()[0]
        return int(row["n"]), int(row["s"])

    def _rows(self, op: str, frame: DataFrame) -> DataFrame:
        cols = [F.lit(op).alias("op")]
        for c in self._SCHEMA[1:]:
            if c in frame.columns:
                cols.append(F.col(c))
            elif c == "term":
                cols.append(F.lit("").alias("term"))
            else:
                cols.append(F.lit(0).cast("long").alias(c))
        return frame.select(*cols)

    def _payload(self, post: DataFrame, markers: DataFrame) -> DataFrame:
        """Add-rows for a (postings, markers) pair of frames."""
        return self._rows("add", post).unionByName(
            self._rows("add", markers)
        )

    # -- writes ---------------------------------------------------------------
    def build(self, docs: DataFrame) -> None:
        """Full (re)build: one base snapshot + fresh stats."""
        markers = self._markers(docs).persist()
        try:
            n, s = self._marker_stats(markers)
            post = term_postings(
                docs, id_col=self.id_col, text_col=self.text_col
            ).withColumnRenamed(self.id_col, "doc_id")
            self.store.write(
                self.TABLE,
                self._payload(post, markers),
                meta={"base": True, "n_docs": n, "sumlen": s},
            )
        finally:
            markers.unpersist()

    def update(self, diff: DataFrame, new_docs: DataFrame) -> None:
        """Fold one crawl-to-crawl diff in — a single atomic delta commit.

        Stats arithmetic runs over length markers only: the outgoing side
        aggregates the CURRENT index's markers semi-joined to the
        tombstone set, the incoming side the re-tokenized docs' markers —
        exact even for docs that produce no postings.
        """
        adds, dels = postings_delta(
            diff, new_docs, id_col=self.id_col, text_col=self.text_col
        )
        adds = adds.withColumnRenamed(self.id_col, "doc_id")
        dels = dels.withColumnRenamed(self.id_col, "doc_id").persist()
        upserted = diff.where(
            F.col("status").isin("added", "changed")
        ).select(F.col(self.id_col))
        markers = self._markers(
            new_docs.join(upserted, self.id_col, "left_semi")
        ).persist()
        try:
            st = self.stats()
            out_n, out_s = self._marker_stats(
                self.postings()
                .where(F.col("term") == "")
                .join(dels, "doc_id", "left_semi")
            )
            in_n, in_s = self._marker_stats(markers)
            delta = self._rows("del", dels).unionByName(
                self._payload(adds, markers)
            )
            self.store.write(
                self.TABLE,
                delta,
                meta={
                    "n_docs": st["n_docs"] - out_n + in_n,
                    "sumlen": st["sumlen"] - out_s + in_s,
                },
            )
        finally:
            dels.unpersist()
            markers.unpersist()

    def compact(self) -> None:
        """Materialize the merge-on-read fold as a new base snapshot."""
        st = self.stats()
        self.store.write(
            self.TABLE,
            self._rows("add", self.postings()),
            meta={"base": True, **st},
        )

    # -- reads ----------------------------------------------------------------
    def postings(self) -> DataFrame:
        """Live rows (postings + length markers): fold base + deltas,
        applying doc tombstones. ``bm25_over_postings`` never sees the
        markers — no query term is the empty string."""
        parts = self.store.chain_parts(self.TABLE)
        cur = None
        for p in parts:
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
        if cur is None:
            raise KeyError("index not built")
        return cur

    def query(self, terms: list[str], k: int = 10, **kw) -> DataFrame:
        st = self.stats()
        return bm25_over_postings(
            self.postings(),
            terms,
            n_docs=st["n_docs"],
            sumlen=st["sumlen"],
            k=k,
            id_col="doc_id",
            **kw,
        )


# ---------------------------------------------------------------------------
# positional postings + phrase queries
# ---------------------------------------------------------------------------
def positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional inverted index: (term, doc_id, positions, tf, doclen).

    Same build shape as :func:`term_postings` (ONE map-side-combined
    shuffle keyed (term, doc)) but each posting carries the sorted
    1-based token positions, which is what phrase and proximity queries
    intersect. Positions index the EMPTY-FILTERED token sequence, so
    "adjacent" means adjacent visible words regardless of run-length of
    separators. ``tf = size(positions)`` rides for free; write the table
    partitioned/bucketed by term for pruned probes, exactly like the
    non-positional index.

    The position payload multiplies index size by ~2-3x (ints vs one
    count) — the standard positional-index cost; build both and serve
    non-phrase queries from the slim one.
    """
    toks = (
        "filter(split(lower(" + text_col + "), ' '), __w -> __w <> '')"
    )
    base = docs.select(
        F.col(id_col),
        F.expr(toks).alias("_ws"),
    ).select(
        F.col(id_col),
        F.size("_ws").cast("long").alias("doclen"),
        F.posexplode("_ws").alias("_p0", "term"),
    )
    return (
        base.groupBy("term", id_col)
        .agg(
            F.sort_array(F.collect_list(F.col("_p0") + 1)).alias("positions"),
            F.max("doclen").alias("doclen"),
        )
        .withColumn("tf", F.size("positions").cast("long"))
    )


def phrase_match(
    postings: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Docs containing the exact consecutive ``phrase``, from the
    positional index: (doc_id, n_occurrences, first_pos).

    The classic positional-list intersection, shuffled ONCE: probe the
    index with a literal term IN (a pruned scan on a term-partitioned
    table), group the ≤|distinct terms| matching postings per doc, and
    check adjacency with array math — a start position ``p`` matches when
    term_i's positions contain ``p + i`` for every phrase offset.
    Repeated terms ("the cat the") reuse one posting list per distinct
    term. Docs missing any phrase term are dropped BEFORE the array work
    by a group-size check. No text is rescanned, no Python runs.
    """
    terms = [t.lower() for t in phrase]
    if not terms or any(not t for t in terms):
        raise ValueError("phrase must be non-empty terms")
    distinct = list(dict.fromkeys(terms))
    term_idx = "CASE term " + " ".join(
        f"WHEN {_term_literal(t)} THEN {i}" for i, t in enumerate(distinct)
    ) + " END"
    hits = postings.where(F.col("term").isin(distinct))
    per_doc = (
        hits.select(
            F.col(id_col),
            F.expr(term_idx).alias("_ti"),
            F.col("positions").alias("_pp"),
        )
        .groupBy(id_col)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(_ti, _pp))),"
                " x -> x._pp)"
            ).alias("_pl")
        )
        .where(F.size("_pl") == len(distinct))
    )
    # starts: positions p of phrase[0] with p+i in the offset-i term's list
    first = f"element_at(_pl, {distinct.index(terms[0]) + 1})"
    conds = " AND ".join(
        f"array_contains(element_at(_pl, {distinct.index(t) + 1}), _sp + {i})"
        for i, t in enumerate(terms[1:], start=1)
    ) or "true"
    starts = f"filter({first}, _sp -> {conds})"
    return (
        per_doc.select(
            id_col,
            F.expr(f"CAST(size({starts}) AS BIGINT)").alias("n_occurrences"),
            F.expr(f"array_min({starts})").alias("first_pos"),
        )
        .where(F.col("n_occurrences") > 0)
    )


def phrase_scan_sql(docs_sql: str, phrase: list[str]) -> str:
    """Independent DuckDB oracle: phrase hits recomputed by DIRECT text
    scan (not a mirror of the index plumbing — a stronger check).

    ``docs_sql`` yields (doc_id, text); output matches
    :func:`phrase_match` over :func:`positional_postings` of the same
    docs.
    """
    terms = [t.lower() for t in phrase]
    toks = "list_filter(string_split(lower(text), ' '), __w -> __w <> '')"
    k = len(terms)
    conds = " AND ".join(
        f"__t[_sp + {i}] = {_term_literal(t)}" for i, t in enumerate(terms)
    )
    starts = (
        f"list_filter(range(1, len(__t) - {k - 1} + 1), _sp -> {conds})"
    )
    body = (
        f"SELECT doc_id, CAST(len({starts}) AS BIGINT) AS n_occurrences, "
        f"list_min({starts}) AS first_pos "
        f"FROM (SELECT doc_id, {toks} AS __t FROM ({docs_sql}) "
        f"WHERE len({toks}) >= {k})"
    )
    return f"SELECT * FROM ({body}) WHERE n_occurrences > 0"
