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


def _plane_seed(bit: int) -> int:
    """Per-plane seed via a splitmix-style avalanche (driver-side Python, so
    64-bit wraparound is fine), reduced mod the Mersenne prime. No RNG —
    signatures are stable across runs/partitions (resume + oracle safety)."""
    x = ((bit + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return x % HASH_P or 1


def _plane_component(bit: int, one_based_dim: str) -> str:
    """Deterministic pseudo-random hyperplane component in {-1, +1}.

    plane[bit][d] = low bit of one MINSTD step seeded per (bit, d):
    ``((seed_bit * d + off) % P * 48271) % P % 2``. All intermediates fit in
    a signed 64-bit BIGINT (seed < P ≈ 2.1e9, P * 48271 ≈ 1e14), so the
    expression is safe under Spark's ANSI overflow checking and renders
    identically in DuckDB. The affine family used before this had a period-4
    sign pattern — every table saw the same two planes; the MINSTD step
    decorrelates bits and tables.
    """
    seed = _plane_seed(bit)
    off = _plane_seed(bit + 1_000_003)
    return (
        f"((({seed} * ({one_based_dim}) + {off}) % {HASH_P} * 48271) "
        f"% {HASH_P} % 2) * 2 - 1"
    )


def lsh_signature(vec_col: str, n_bits: int = 8, table: int = 0):
    """Sign-bit signature: bit b = [dot(vec, plane_b) > 0], packed to int.

    ``table`` selects an independent hyperplane family (global plane index
    ``table * n_bits + b``), so multiple hash tables see independent bucket
    partitions of the same corpus. Table 0 reproduces the single-table
    signature exactly.
    """
    terms = []
    for b in range(n_bits):
        comp = _plane_component(table * n_bits + b, "CAST(i AS BIGINT) + 1")
        dot = (
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
            f"(x, i) -> CAST(x AS DOUBLE) * CAST({comp} AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << b} ELSE 0 END)")
    return F.expr("(" + " + ".join(terms) + ")").cast("long")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_stride: int = 50,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantize → probe nearest lists.

    The coarse quantizer is DETERMINISTIC (no RNG, resumable, oracle-safe):
    centroids are the corpus rows with ``id % centroid_stride == 0``. Every
    vector is assigned to its highest-cosine centroid (one map-side pass —
    the centroid set is small and broadcast); a query probes its ``nprobe``
    nearest centroids and exact-re-ranks only those inverted lists.

    Scale shape: assignment is a broadcast join (corpus scanned once, never
    shuffled on vectors); the candidate join shuffles on ``centroid_id``
    (list-local tasks). Cost ≈ |corpus|·k_centroids map-side +
    |corpus|·nprobe/k_centroids per query — at 10^10 vectors a query never
    touches the full corpus. Recall is tuned by ``nprobe`` (monotone —
    asserted in tests); ``lsh_topk`` is the alternative scale path,
    ``cosine_topk`` the exact oracle.
    """
    cent = F.broadcast(
        corpus.where(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv")
        )
    )
    # assign each vector to its nearest centroid (ties → smallest centroid id)
    assigned = (
        corpus.select(id_col, vec_col)
        .join(cent, how="cross")
        .withColumn("_ccos", cosine_expr(vec_col, "cv"))
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.struct("centroid_id", vec_col),
                F.struct(F.col("_ccos"), -F.col("centroid_id")),
            ).alias("_a")
        )
        .select(
            id_col,
            F.col("_a.centroid_id").alias("centroid_id"),
            F.col(f"_a.{vec_col}").alias(vec_col),
        )
    )
    # per-query nprobe nearest centroids
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("qv"))
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_qcos").desc(), F.col("centroid_id")
    )
    probes = (
        q.join(cent, how="cross")
        .withColumn("_qcos", cosine_expr("qv", "cv"))
        .withColumn("_pr", F.row_number().over(wq))
        .where(F.col("_pr") <= nprobe)
        .select(query_id_col, "qv", "centroid_id")
    )
    cand = (
        assigned.join(probes, on="centroid_id", how="inner")
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


def lsh_signature_duck_sql(vec: str, n_bits: int = 8, table: int = 0) -> str:
    """DuckDB rendering of ``lsh_signature`` — same planes, same fold order.

    Mirrors the Spark expression exactly (double-cast before multiply,
    sequential in-order sum, strict ``> 0`` sign test) so the LSH ANN path is
    oracle-checkable end-to-end, like the textstats kernels.
    """
    terms = []
    for b in range(n_bits):
        comp = _plane_component(table * n_bits + b, "i")
        dot = (
            f"list_sum(list_transform(range(1, len({vec}) + 1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * CAST({comp} AS DOUBLE)))"
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << b} ELSE 0 END)")
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ANY of
    ``n_tables`` hash tables; exact re-rank inside the candidate set.

    Recall tuning: fewer ``n_bits`` → bigger buckets → higher recall & cost;
    more ``n_tables`` → more independent chances for a true neighbor to
    collide with its query (recall@k grows monotonically with n_tables at
    fixed n_bits — asserted in tests/test_training_ops.py). Each table's
    bucket join shuffles only on the signature — at 10^10 vectors a task
    handles one bucket range, never the corpus; candidate pairs are deduped
    across tables before scoring so each pair is scored once.
    """
    cand = None
    for t in range(n_tables):
        c = corpus.select(id_col, vec_col).withColumn(
            "bucket", lsh_signature(vec_col, n_bits, table=t)
        )
        q = F.broadcast(
            queries.select(
                F.col(query_id_col), F.col(vec_col).alias("qv")
            ).withColumn("bucket", lsh_signature("qv", n_bits, table=t))
        )
        pairs = c.join(q, on="bucket", how="inner").where(
            F.col(query_id_col) != F.col(id_col)
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates([query_id_col, id_col]).withColumn(
        "cosine", cosine_expr("qv", vec_col)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cosine")
    )
