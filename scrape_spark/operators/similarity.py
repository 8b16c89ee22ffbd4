"""Embedding similarity search — brute-force cosine baseline + LSH scale path.

Engine extension (the reference has no numeric columns at all): approximate
nearest neighbors over an ``array<float>`` embedding column, as a
training-data pipeline needs for semantic dedup / retrieval filtering.

- ``cosine_topk`` — exact brute-force baseline: broadcast the (small) query
  set, JVM-side ``zip_with``/``aggregate`` dot product (no Python, no UDF),
  per-query top-k via window. Cost O(|queries|·|corpus|) — correct tool when
  queries are few; it is the *oracle* for the approximate path.
- ``lsh_topk`` — random-hyperplane LSH: deterministic pseudo-hyperplanes
  derived from an integer hash (no RNG — resumable & oracle-friendly), docs
  and queries bucketed by sign-bit signature; candidates = bucket-join over
  multiple tables (repetitions), exact re-rank within candidates. Shuffle is
  bucket-local; at 10^10 vectors the bucket join touches only matching
  signatures instead of the full corpus.

Dot products stay exact-reproducible across engines: float32 inputs are cast
to float64 *before* multiply, summed in array order (sequential fold both in
Spark's ``aggregate`` and DuckDB's ``list_sum`` over the same order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_P = 2_147_483_647


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0 AS DOUBLE), "
            f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def cosine_expr(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = "label",
    min_cosine: float = 0.0,
) -> DataFrame:
    """All within-group pairs (id_1 < id_2) with cosine >= threshold.

    ``group_col`` bounds the pair blow-up (e.g. LSH bucket or class label);
    pass None for the full cross product (small corpora only).
    """
    lcols = [F.col(id_col).alias("id_1"), F.col(vec_col).alias("v1")]
    rcols = [F.col(id_col).alias("id_2"), F.col(vec_col).alias("v2")]
    on = []
    if group_col:
        lcols.append(F.col(group_col))
        rcols.append(F.col(group_col))
        on = [group_col]
    left, right = emb.select(*lcols), emb.select(*rcols)
    joined = left.join(right, on=on, how="inner") if on else left.crossJoin(right)
    return (
        joined.where(F.col("id_1") < F.col("id_2"))
        .withColumn("cosine", cosine_expr("v1", "v2"))
        .where(F.col("cosine") >= F.lit(min_cosine))
        .select("id_1", "id_2", "cosine")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, rank, cosine).

    The query side is broadcast (small); ranking excludes self-matches when
    query_id equals a corpus id. Ties broken by vec_id for determinism.
    """
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("qv"))
    )
    scored = (
        corpus.select(id_col, vec_col)
        .crossJoin(q)
        .where(F.col(query_id_col) != F.col(id_col))
        .withColumn("cosine", cosine_expr("qv", vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )


# -- LSH scale path -----------------------------------------------------------


def _plane_component(bit: int, dim_idx: str) -> str:
    """Deterministic pseudo-random hyperplane component in {-1, +1}.

    plane[bit][d] = sign derived from an affine hash of (bit, d) — no RNG, so
    signatures are stable across runs/partitions (resume + oracle safety).
    """
    a = 1_103_515_245 + 12_345 * (bit + 1)
    return (
        f"((CAST({a} AS BIGINT) * (CAST({dim_idx} AS BIGINT) + 1) "
        f"+ {7919 * (bit + 1)}) % {HASH_P} % 2) * 2 - 1"
    )


def lsh_signature(vec_col: str, n_bits: int = 8):
    """Sign-bit signature: bit b = [dot(vec, plane_b) > 0], packed to int."""
    terms = []
    for b in range(n_bits):
        comp = _plane_component(b, "i")
        dot = (
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
            f"(x, i) -> CAST(x AS DOUBLE) * ({comp})), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << b} ELSE 0 END)")
    return F.expr("(" + " + ".join(terms) + ")").cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, exact re-rank inside.

    Recall is tuned by ``n_bits`` (fewer bits → bigger buckets → higher
    recall & cost). The bucket join shuffles only on the signature — at
    10^10 vectors each task handles one bucket range, never the corpus.
    """
    c = corpus.withColumn("bucket", lsh_signature(vec_col, n_bits))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("qv")
        ).withColumn("bucket", lsh_signature("qv", n_bits))
    )
    cand = (
        c.join(q, on="bucket", how="inner")
        .where(F.col(query_id_col) != F.col(id_col))
        .withColumn("cosine", cosine_expr("qv", vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )
