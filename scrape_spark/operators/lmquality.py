"""Statistical-LM data curation: CCNet perplexity buckets + DSIR weights.

Two published corpus-selection methods a webtext training pipeline runs
after the rule filters (corpus.gopher_rules / c4 line rules):

* **CCNet-style perplexity bucketing** (Wenzek et al. 2020, "CCNet:
  Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  score every document by cross-entropy under a statistical n-gram LM and
  split the corpus into head / middle / tail quality buckets. CCNet uses a
  KenLM 5-gram; the engine trains a Laplace-smoothed word-bigram model on
  the corpus itself — the same operator shape (model table + per-doc score
  + value-bucketing), expressed as pure relational algebra so the DuckDB
  oracle replays it exactly.
* **DSIR importance weights** (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed bigram features,
  per-doc log importance ratio between a target-domain distribution and
  the raw-corpus distribution. The paper's estimator is exactly a pair of
  hashed-bag-of-ngrams count tables; sampling ∝ exp(weight) happens
  downstream (dataset_split / stratified_sample own that step).

The reference crawler stores extracted text but has no quality analytics
(models.py get_page_statistics is row counts only) — these are engine
extensions in the dialect-templated style of textstats/corpus.

Scale shape (the design constraint per operator):

- ``doc_bigrams`` — tokenize once per row map-side, explode to
  (doc, w1, w2): the canonical word-count explode; no Python anywhere.
- ``lm_cross_entropy`` — the model is two map-side-combined count
  shuffles (bigram types, then contexts); scoring joins the per-doc
  DISTINCT bigram table (occurrence-compressed by tf) against the model
  on (w1, w2) — AQE's skew-join handles the hot-bigram tail ("of the").
  The per-doc fold runs over ≤ doclen collected terms in (w1, w2) order,
  so the IEEE double sum is reproducible regardless of partitioning —
  same discipline as bm25_over_postings (operators/ranking.py).
- ``ccnet_buckets`` — thresholds come from a cumulative window over the
  quantized-CE **histogram** (one row per distinct value), never a window
  over the documents table: at 10^10 docs the histogram is bounded by the
  value grid, and docs join their bucket back by value.
- ``dsir_weights`` — features are mod-prime hashed buckets (int64), so
  both count tables have ≤ n_buckets rows and broadcast; scoring is one
  map-side join + the same ordered fold.

Cross-entropy / weights are quantized to integer micro-nats
(``floor(1e6 · x)``) for exact cross-engine comparison — the q4 ratio
discipline of corpus.shingle_dup_stats, two digits finer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scrape_spark.functions import textstats as ts

#: quantization grid for scores: integer micro-nats
SCORE_Q = 1_000_000
#: default hashed-feature bucket count for DSIR (paper uses 10^4; tests
#: shrink it so bucket collisions are actually exercised)
DSIR_BUCKETS = 128
_SD = ts.SPARK_DIALECT
_DD = ts.DUCK_DIALECT


def tokens_sql(text: str, d: dict) -> str:
    """Lowercased whitespace tokens with empties dropped (portable)."""
    ws = ts.words_sql(f"lower({text})", d)
    return d["filter"].format(arr=ws, lam="__w -> __w <> ''")


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per bigram OCCURRENCE, document order lost.

    Docs with fewer than two tokens produce no rows (the guard also dodges
    Spark's descending ``sequence(1, 0)`` trap — see
    textstats.top_bigram_cover_q4_sql). Extra input columns are dropped.
    """
    return (
        docs.select(
            F.col(id_col), F.expr(tokens_sql(text_col, _SD)).alias("_toks")
        )
        .where(F.size("_toks") >= 2)
        .select(
            F.col(id_col),
            "_toks",
            F.explode(F.expr("sequence(1, size(_toks) - 1)")).alias("_i"),
        )
        .select(
            F.col(id_col),
            F.expr("element_at(_toks, _i)").alias("w1"),
            F.expr("element_at(_toks, _i + 1)").alias("w2"),
        )
    )


def _doc_bigram_tf(bg: DataFrame, id_col: str) -> DataFrame:
    """Occurrence table → per-doc distinct-bigram tf (join compression)."""
    return bg.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


#: two-limb scaled floor division: ``floor(scale * num / den)`` for
#: non-negative num without the ``num * scale`` overflow — ``q*scale +
#: (r*scale) div den`` with q/r the staged div/mod columns. Exact int64;
#: remainder bound documents the per-doc size contract (den = Q·n, so
#: n < 2^23 ≈ 8.4M bigrams/features per doc keeps r*scale < 2^63).
def _scaled_div_sql(q: str, r: str, den: str, scale: int, d: dict) -> str:
    rest = d["idiv"].format(a=f"(({r}) * {scale})", b=f"({den})")
    return f"CAST(({q}) * {scale} + {rest} AS BIGINT)"


def lm_cross_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bigrams, ce_q6): Laplace-bigram cross-entropy per document.

    Model: p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V) with V = corpus
    distinct-token count; CE = (Σ tf·(lnq(c1+V) − lnq(c12+1))) / (Q·n),
    quantized to integer micro-nats. Lower = more in-distribution
    (CCNet's "head"). Docs without bigrams drop out (no denominator).

    double-audit: NO doubles anywhere — ln is the spliced integer table
    (textstats.lnq_sql, engine- and environment-proof by construction;
    round 4's driver gate falsified bit-identity assumptions for IEEE
    selection paths), terms are exact int64 so the per-doc sum needs no
    order pinning, and the micro-nat quantizer is a two-limb integer
    floor division. This also deletes the old per-doc
    collect_list+array_sort fold — a plain map-side-combined sum now.
    """
    bg = doc_bigrams(docs, id_col, text_col)
    dbg = _doc_bigram_tf(bg, id_col)
    c12 = dbg.groupBy("w1", "w2").agg(F.sum("tf").cast("long").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    model = c12.join(c1, "w1")
    vocab = (
        bg.select(F.col("w1").alias("_w"))
        .union(bg.select(F.col("w2").alias("_w")))
        .agg(F.countDistinct("_w").cast("long").alias("n_vocab"))
    )
    term = (
        f"tf * ({ts.lnq_sql('c1 + n_vocab', _SD)}"
        f" - {ts.lnq_sql('c12 + 1', _SD)})"
    )
    scored = (
        dbg.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .withColumn("_term", F.expr(f"CAST({term} AS BIGINT)"))
    )
    per = scored.groupBy(id_col).agg(
        F.sum("_term").cast("long").alias("_s"),
        F.sum("tf").cast("long").alias("n_bigrams"),
    )
    den = f"(n_bigrams * {ts._LNQ_Q})"
    return (
        per.select(
            F.col(id_col),
            "n_bigrams",
            F.expr(f"_s div {den}").alias("_q1"),
            F.expr(f"_s % {den}").alias("_r1"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            F.expr(
                _scaled_div_sql("_q1", "_r1", den, SCORE_Q, _SD)
            ).alias("ce_q6"),
        )
    )


def ccnet_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bigrams, ce_q6, ppl_bucket) — head / middle / tail thirds.

    Bucketing is BY VALUE: a doc's bucket is decided by where its ce_q6
    group STARTS in the cumulative histogram (prev·3 < n → head,
    prev·3 < 2n → middle, else tail), so equal scores always share a
    bucket and the windows run over the distinct-value histogram, not the
    corpus (scale note in the module doc). All-integer arithmetic.
    """
    per = lm_cross_entropy(docs, id_col, text_col)
    hist = per.groupBy("ce_q6").agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    cum_w = Window.orderBy("ce_q6").rowsBetween(Window.unboundedPreceding, 0)
    tot_w = Window.partitionBy()
    buckets = (
        hist.withColumn("_cum", F.sum("_cnt").over(cum_w))
        .withColumn("_n", F.sum("_cnt").over(tot_w))
        .withColumn("_prev", F.col("_cum") - F.col("_cnt"))
        .select(
            "ce_q6",
            F.when(F.col("_prev") * 3 < F.col("_n"), F.lit("head"))
            .when(F.col("_prev") * 3 < 2 * F.col("_n"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )
    return per.join(buckets, "ce_q6").select(
        id_col, "n_bigrams", "ce_q6", "ppl_bucket"
    )


def lm_cross_entropy_sql(docs_sql: str, id_col: str = "doc_id") -> str:
    """The identical computation as portable SQL (DuckDB oracle side).

    ``docs_sql`` must project (id_col, text). Terms are exact int64 (the
    same spliced lnq table as the Spark side — see
    :func:`lm_cross_entropy`'s double-audit note), so no ordered
    aggregate is needed: integer sums commute.
    """
    toks = tokens_sql("text", _DD)
    term = (
        f"tf * ({ts.lnq_sql('c1 + n_vocab', _DD)}"
        f" - {ts.lnq_sql('c12 + 1', _DD)})"
    )
    den = f"(n_bigrams * {ts._LNQ_Q})"
    out = _scaled_div_sql("_q1", "_r1", den, SCORE_Q, _DD)
    return f"""WITH _docs AS ({docs_sql}),
_tok AS (SELECT {id_col}, {toks} AS toks FROM _docs),
_pos AS (SELECT {id_col}, toks, unnest(range(1, len(toks))) AS i FROM _tok),
_bg AS (SELECT {id_col}, toks[i] AS w1, toks[i + 1] AS w2 FROM _pos),
_dbg AS (SELECT {id_col}, w1, w2, CAST(count(*) AS BIGINT) AS tf
         FROM _bg GROUP BY {id_col}, w1, w2),
_c12 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12
         FROM _dbg GROUP BY w1, w2),
_c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM _c12 GROUP BY w1),
_v AS (SELECT CAST(count(DISTINCT _w) AS BIGINT) AS n_vocab FROM
       (SELECT w1 AS _w FROM _bg UNION ALL SELECT w2 AS _w FROM _bg)),
_sc AS (SELECT {id_col}, w1, w2, tf,
          CAST({term} AS BIGINT) AS _term
        FROM _dbg JOIN _c12 USING (w1, w2) JOIN _c1 USING (w1), _v),
_per AS (SELECT {id_col},
           CAST(sum(_term) AS BIGINT) AS _s,
           CAST(sum(tf) AS BIGINT) AS n_bigrams
         FROM _sc GROUP BY {id_col}),
_lim AS (SELECT {id_col}, n_bigrams,
           _s // {den} AS _q1, _s % {den} AS _r1
         FROM _per)
SELECT {id_col}, n_bigrams, {out} AS ce_q6
FROM _lim"""


def ccnet_buckets_sql(docs_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB oracle for ccnet_buckets (histogram-window bucketing)."""
    return f"""WITH _ce AS ({lm_cross_entropy_sql(docs_sql, id_col)}),
_hist AS (SELECT ce_q6, CAST(count(*) AS BIGINT) AS _cnt
          FROM _ce GROUP BY ce_q6),
_bkt AS (SELECT ce_q6,
           sum(_cnt) OVER (ORDER BY ce_q6) - _cnt AS _prev,
           sum(_cnt) OVER () AS _n
         FROM _hist)
SELECT c.{id_col}, c.n_bigrams, c.ce_q6,
  CASE WHEN b._prev * 3 < b._n THEN 'head'
       WHEN b._prev * 3 < 2 * b._n THEN 'middle'
       ELSE 'tail' END AS ppl_bucket
FROM _ce c JOIN _bkt b USING (ce_q6)"""


# ---------------------------------------------------------------------------
# DSIR: hashed-ngram importance weights (target vs raw distribution)
# ---------------------------------------------------------------------------


def _bucket_sql(d: dict, n_buckets: int) -> str:
    """Feature bucket of the (w1, w2) columns: mod-prime word-hash mixing
    (textstats.top_bigram_cover_q4_sql's bigram combiner) reduced mod B."""
    h1 = ts._char_fold("w1", d)
    h2 = ts._char_fold("w2", d)
    return f"((({h1}) * 1000003 + ({h2})) % {ts.HASH_P}) % {int(n_buckets)}"


def _dsir_ratio_sql(n_buckets: int, d: dict) -> str:
    """Integer log importance ratio over the smoothed count columns:
    ``(lnq(t_b+1) − lnq(t_tot+B)) − (lnq(r_b+1) − lnq(r_tot+B))`` — exact
    int64 via the spliced lnq table (see :func:`lm_cross_entropy`'s
    double-audit note; same r4-driver-gate rationale)."""
    b = int(n_buckets)
    return (
        f"({ts.lnq_sql('t_b + 1', d)} - {ts.lnq_sql(f't_tot + {b}', d)})"
        f" - ({ts.lnq_sql('r_b + 1', d)} - {ts.lnq_sql(f'r_tot + {b}', d)})"
    )


def dsir_weights(
    docs: DataFrame,
    target_col: str = "is_target",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, n_feats, logw_q6): per-doc mean hashed-bigram log importance
    ratio ln p_target(b) − ln p_raw(b), Laplace-smoothed, micro-nats.

    ``target_col`` is a boolean column on ``docs`` marking the target
    domain (e.g. lang = 'en', or a quality-rule pass flag). Raw counts are
    over ALL docs, so the raw table covers every bucket the scorer can
    probe; target-absent buckets smooth to (0 + 1)/(T + B). Positive
    weight ⇒ resample toward the doc (DSIR samples ∝ exp(weight)
    downstream). Both count tables are ≤ n_buckets rows — broadcast joins.

    double-audit: NO doubles — the log ratio is the spliced integer lnq
    table (:func:`_dsir_ratio_sql`), terms and sums are exact int64 (no
    ordered fold needed), and the quantizer is a two-limb integer floor
    division over the +128-shifted sum (keeps the dividend non-negative,
    where Spark ``div`` and DuckDB ``//`` agree).
    """
    bg = doc_bigrams(
        docs.select(id_col, text_col), id_col, text_col
    ).withColumn("b", F.expr(_bucket_sql(_SD, n_buckets)).cast("long"))
    feats = bg.groupBy(id_col, "b").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    targets = docs.where(F.col(target_col)).select(id_col)
    raw = feats.groupBy("b").agg(F.sum("tf").cast("long").alias("r_b"))
    tgt = (
        feats.join(targets, id_col, "left_semi")
        .groupBy("b")
        .agg(F.sum("tf").cast("long").alias("t_b"))
    )
    model = raw.join(tgt, "b", "left").select(
        "b", "r_b", F.coalesce("t_b", F.lit(0)).cast("long").alias("t_b")
    )
    totals = model.agg(
        F.sum("r_b").cast("long").alias("r_tot"),
        F.sum("t_b").cast("long").alias("t_tot"),
    )
    ratio = _dsir_ratio_sql(n_buckets, _SD)
    scored = (
        feats.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(totals))
        .withColumn("_term", F.expr(f"CAST(tf * ({ratio}) AS BIGINT)"))
    )
    per = scored.groupBy(id_col).agg(
        F.sum("_term").cast("long").alias("_s"),
        F.sum("tf").cast("long").alias("n_feats"),
    )
    den = f"(n_feats * {ts._LNQ_Q})"
    shifted = f"(_s + 128 * {den})"
    return (
        per.select(
            F.col(id_col),
            "n_feats",
            F.expr(f"{shifted} div {den}").alias("_q1"),
            F.expr(f"{shifted} % {den}").alias("_r1"),
        )
        .select(
            F.col(id_col),
            "n_feats",
            F.expr(
                _scaled_div_sql("_q1", "_r1", den, SCORE_Q, _SD)
                + f" - {128 * SCORE_Q}"
            ).cast("long").alias("logw_q6"),
        )
    )


def dsir_weights_sql(
    docs_sql: str,
    target_col: str = "is_target",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> str:
    """DuckDB oracle: identical counts, smoothing, and ordered fold.

    ``docs_sql`` must project (id_col, text, target_col boolean).
    """
    toks = tokens_sql("text", _DD)
    bucket = _bucket_sql(_DD, n_buckets)
    ratio = _dsir_ratio_sql(n_buckets, _DD)
    den = f"(n_feats * {ts._LNQ_Q})"
    shifted = f"(_s + 128 * {den})"
    out = _scaled_div_sql("_q1", "_r1", den, SCORE_Q, _DD)
    return f"""WITH _docs AS ({docs_sql}),
_tok AS (SELECT {id_col}, {toks} AS toks FROM _docs),
_pos AS (SELECT {id_col}, toks, unnest(range(1, len(toks))) AS i FROM _tok),
_bg AS (SELECT {id_col}, toks[i] AS w1, toks[i + 1] AS w2 FROM _pos),
_f AS (SELECT {id_col}, CAST({bucket} AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS tf
       FROM _bg GROUP BY 1, 2),
_raw AS (SELECT b, CAST(sum(tf) AS BIGINT) AS r_b FROM _f GROUP BY b),
_tgt AS (SELECT b, CAST(sum(tf) AS BIGINT) AS t_b FROM _f
         WHERE {id_col} IN (SELECT {id_col} FROM _docs WHERE {target_col})
         GROUP BY b),
_m AS (SELECT b, r_b, CAST(coalesce(t_b, 0) AS BIGINT) AS t_b
       FROM _raw LEFT JOIN _tgt USING (b)),
_tot AS (SELECT CAST(sum(r_b) AS BIGINT) AS r_tot,
                CAST(sum(t_b) AS BIGINT) AS t_tot FROM _m),
_sc AS (SELECT {id_col}, b, tf, CAST(tf * ({ratio}) AS BIGINT) AS _term
        FROM _f JOIN _m USING (b), _tot),
_per AS (SELECT {id_col},
           CAST(sum(_term) AS BIGINT) AS _s,
           CAST(sum(tf) AS BIGINT) AS n_feats
         FROM _sc GROUP BY {id_col}),
_lim AS (SELECT {id_col}, n_feats,
           {shifted} // {den} AS _q1, {shifted} % {den} AS _r1
         FROM _per)
SELECT {id_col}, n_feats,
  CAST({out} - {128 * SCORE_Q} AS BIGINT) AS logw_q6
FROM _lim"""


# ---------------------------------------------------------------------------
# linear text-classifier inference (fastText-style bag-of-words scoring)
# ---------------------------------------------------------------------------


def _token_weight_agg(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    token_col: str,
    weight_col: str,
) -> DataFrame:
    """Shared explode → broadcast-left-join → doc-keyed (count, Σweight)
    core behind ``classifier_score`` and ``corpus.badword_stats``:
    ``(id, n_tokens, _wsum)`` with OOV occurrences contributing 0.

    Weight-table tokens are LOWERCASED to match the tokenizer — a
    mixed-case vocab row ('The', 'NASA') would otherwise be permanent OOV.
    Tokens must be unique after lowercasing (duplicates would multiply
    matching occurrences). ONE doc-keyed shuffle, map-side combined; the
    model never shuffles. Zero-token docs yield no row.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.expr(tokens_sql(text_col, _SD))).alias("_tok"),
    )
    w = F.broadcast(
        weights.select(
            F.lower(F.col(token_col)).alias("_tok"),
            F.col(weight_col).cast("long").alias("_w"),
        )
    )
    return (
        toks.join(w, on="_tok", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("_w"), F.lit(0)))
            .cast("long")
            .alias("_wsum"),
        )
    )


def _token_weight_agg_sql(
    docs_sql: str,
    weights_sql: str,
    id_col: str,
    text_col: str,
    token_col: str,
    weight_col: str,
) -> str:
    """DuckDB replay of ``_token_weight_agg`` (same tokenizer + lowercase)."""
    toks = tokens_sql(text_col, _DD)
    return f"""SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(_wv) AS BIGINT) AS _wsum
FROM (SELECT t.{id_col}, CAST(coalesce(w.{weight_col}, 0) AS BIGINT) AS _wv
      FROM (SELECT {id_col}, unnest({toks}) AS _t FROM ({docs_sql})) t
      LEFT JOIN (SELECT lower({token_col}) AS _t, {weight_col}
                 FROM ({weights_sql})) w USING (_t))
GROUP BY {id_col}"""


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
    weight_col: str = "weight",
    bias: int = 0,
    threshold_q6: int = 0,
) -> DataFrame:
    """Linear bag-of-words classifier inference at corpus scale.

    The FineWeb-Edu / fastText-supervised serving shape: a trained linear
    model (one integer weight per vocabulary token — quantize float weights
    upstream; tokens unique after lowercasing) is broadcast, every token
    occurrence looks its weight up map-side, and the per-doc score is the
    weight mean: ``score_q6 = floor(1e6 · (bias + Σ w(tok)) / n_tokens)``
    with OOV tokens contributing 0. ``label = score_q6 >= threshold_q6``.
    Exact int64 sums; only the final mean touches IEEE doubles.
    double-audit: that mean is one correctly-rounded multiply + divide
    over exact ints in identical expression text on both engines — no
    libm, deterministic everywhere. Scale shape and zero-token contract:
    see ``_token_weight_agg``.
    """
    agg = _token_weight_agg(
        docs, weights, id_col, text_col, token_col, weight_col
    ).withColumn("raw_score", (F.col("_wsum") + F.lit(bias)).cast("long"))
    return agg.select(
        F.col(id_col),
        "n_tokens",
        "raw_score",
        F.expr(
            f"CAST(floor({SCORE_Q}.0 * CAST(raw_score AS DOUBLE) "
            f"/ CAST(n_tokens AS DOUBLE)) AS BIGINT)"
        ).alias("score_q6"),
    ).withColumn("label", F.col("score_q6") >= F.lit(threshold_q6))


def classifier_score_sql(
    docs_sql: str,
    weights_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
    weight_col: str = "weight",
    bias: int = 0,
    threshold_q6: int = 0,
) -> str:
    """DuckDB replay of ``classifier_score`` (same tokenizer, same floor)."""
    core = _token_weight_agg_sql(
        docs_sql, weights_sql, id_col, text_col, token_col, weight_col
    )
    return f"""WITH _a AS (
  SELECT {id_col}, n_tokens,
         CAST(_wsum + {bias} AS BIGINT) AS raw_score
  FROM ({core})),
_s AS (SELECT *, CAST(floor({SCORE_Q}.0 * CAST(raw_score AS DOUBLE)
                      / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS score_q6
       FROM _a)
SELECT {id_col}, n_tokens, raw_score, score_q6,
       (score_q6 >= {threshold_q6}) AS label
FROM _s"""


# ---------------------------------------------------------------------------
# linear text-classifier TRAINING (fixed-point batch gradient descent)
# ---------------------------------------------------------------------------
# Completes the classifier story: ``classifier_score`` serves a (token,
# weight) table; this trains one in-engine from labeled documents
# (curated-vs-random, the FineWeb-Edu / CCNet recipe) without ever moving
# the corpus to one machine. All arithmetic is EXACT int64 fixed-point
# (q6), with a hard-sigmoid link instead of exp — so training is
# bit-reproducible across engines and partitionings, and even the
# iterative loop is oracle-checkable by unrolling iterations into CTEs.
# Divisions use TRUNCATION toward zero on both engines (Spark's `div`
# truncates; DuckDB's `//` floors, so the oracle splices the sign-split
# form below).


def _idiv_trunc_sql(x: str, d: str) -> str:
    """Truncating integer division, identical on both engines."""
    return (
        f"(CASE WHEN ({x}) >= 0 THEN ({x}) div ({d}) "
        f"ELSE -((-({x})) div ({d})) END)"
    )


def _idiv_trunc_duck(x: str, d: str) -> str:
    return (
        f"(CASE WHEN ({x}) >= 0 THEN ({x}) // ({d}) "
        f"ELSE -((-({x})) // ({d})) END)"
    )


def train_token_classifier(
    docs: DataFrame,
    n_iters: int = 3,
    lr_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> DataFrame:
    """Train a linear bag-of-words classifier; returns (token, weight_q6).

    Batch gradient descent on mean-of-token features (``x_t = cnt_t / n``,
    matching ``classifier_score``'s weight-mean scoring) with a
    hard-sigmoid link ``p = clamp(1/2 + s/4, 0, 1)``: per iteration, score
    every doc (one doc-keyed agg over the cached token-count sliver joined
    with the weight table — the planner broadcasts it while it fits and
    shuffle-joins a web-scale vocabulary; no hint forces a driver
    round-trip), form integer residuals ``p_q6 - y*1e6``,
    accumulate per-token gradients ``sum(trunc(resid * cnt / n))`` (one
    token-keyed agg), and step ``w -= trunc(grad / (lr_den * n_docs))``.
    The corpus is tokenized ONCE; each iteration touches only the
    (id, token, cnt, n, y) sliver, the weight table stays distributed
    (never collected), and per-iteration driver traffic is zero. Bias is
    intentionally absent: token-mean features make a bias redundant with a
    constant shift of the decision threshold, and dropping it keeps every
    update corpus-side.

    ``label_col`` is 0/1 (1 = quality/curated). Zero-token docs carry no
    gradient. n_iters Spark jobs total, like the BPE trainer's loop —
    gradient descent is inherently sequential; each step is fully
    distributed.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("long").alias("_y"),
        F.explode(F.expr(tokens_sql(text_col, _SD))).alias("token"),
    )
    counts = (
        toks.groupBy("_id", "_y", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
        .withColumn(
            "_n", F.sum("_cnt").over(Window.partitionBy("_id")).cast("long")
        )
        .cache()
    )
    n_docs = counts.select("_id").distinct().count()
    weights = counts.select("token").distinct().withColumn(
        "weight_q6", F.lit(0).cast("long")
    )
    step_den = lr_den * n_docs
    for _ in range(n_iters):
        scored = (
            counts.join(weights, "token")
            .groupBy("_id", "_y", "_n")
            .agg(F.sum(F.col("weight_q6") * F.col("_cnt")).alias("_ws"))
            .select(
                "_id",
                "_y",
                "_n",
                F.expr(_idiv_trunc_sql("_ws", "_n")).alias("_s"),
            )
            .select(
                "_id",
                "_n",
                (
                    F.greatest(
                        F.lit(0).cast("long"),
                        F.least(
                            F.lit(SCORE_Q).cast("long"),
                            F.lit(SCORE_Q // 2)
                            + F.expr(_idiv_trunc_sql("_s", "4")),
                        ),
                    )
                    - F.col("_y") * F.lit(SCORE_Q)
                ).alias("_resid"),
            )
        )
        grads = (
            counts.join(scored.select("_id", "_resid"), "_id")
            .select(
                "token",
                F.expr(_idiv_trunc_sql("_resid * _cnt", "_n")).alias("_g"),
            )
            .groupBy("token")
            .agg(F.sum("_g").cast("long").alias("_grad"))
        )
        nxt = (
            weights.join(grads, "token", "left")
            .select(
                "token",
                (
                    F.col("weight_q6")
                    - F.expr(
                        _idiv_trunc_sql("coalesce(_grad, 0)", str(step_den))
                    )
                ).cast("long").alias("weight_q6"),
            )
            .cache()
        )
        nxt.count()  # materialize before dropping the parent cache
        weights.unpersist()
        weights = nxt
    counts.unpersist()
    return weights


def train_token_classifier_sql(
    docs_sql: str,
    n_iters: int = 3,
    lr_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> str:
    """DuckDB replay of :func:`train_token_classifier` — iterations
    UNROLLED into a CTE chain (training is deterministic integer math, so
    parity is exact, not approximate)."""
    toks = tokens_sql(text_col, _DD)
    parts = [
        f"""T AS (
  SELECT _id, _y, token, CAST(count(*) AS BIGINT) AS _cnt,
         CAST(sum(count(*)) OVER (PARTITION BY _id) AS BIGINT) AS _n
  FROM (SELECT {id_col} AS _id, CAST({label_col} AS BIGINT) AS _y,
               unnest({toks}) AS token
        FROM ({docs_sql}))
  GROUP BY _id, _y, token),
ND AS (SELECT count(DISTINCT _id) AS n_docs FROM T),
W0 AS (SELECT DISTINCT token, CAST(0 AS BIGINT) AS weight_q6 FROM T)"""
    ]
    half, full = SCORE_Q // 2, SCORE_Q
    for i in range(n_iters):
        s = _idiv_trunc_duck("_ws", "_n")
        p = f"greatest(0, least({full}, {half} + {_idiv_trunc_duck('_s', '4')}))"
        g = _idiv_trunc_duck("_resid * _cnt", "_n")
        step = _idiv_trunc_duck("coalesce(_grad, 0)", f"{lr_den} * n_docs")
        parts.append(
            f"""S{i} AS (
  SELECT _id, _y, _n, {s} AS _s
  FROM (SELECT T._id, T._y, T._n,
          CAST(sum(W{i}.weight_q6 * T._cnt) AS BIGINT) AS _ws
        FROM T JOIN W{i} USING (token)
        GROUP BY T._id, T._y, T._n)),
R{i} AS (SELECT _id, CAST({p} - _y * {full} AS BIGINT) AS _resid FROM S{i}),
G{i} AS (SELECT token, CAST(sum({g}) AS BIGINT) AS _grad
         FROM T JOIN R{i} USING (_id) GROUP BY token),
W{i + 1} AS (SELECT W{i}.token,
         CAST(W{i}.weight_q6 - {step} AS BIGINT) AS weight_q6
       FROM W{i} LEFT JOIN G{i} USING (token), ND)"""
        )
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT token, weight_q6 FROM W{n_iters}"
