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
double-audit (r5): every double op in the cosine chain — per-element
multiply, pinned-order sum, sqrt, final divide — is IEEE-correctly-rounded,
so the scores are bit-identical across engines AND environments by
construction; no libm transcendental (ln/exp/pow) appears anywhere in this
module.
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


def _argmax_centroid_expr(vec_col: str):
    """Map-side nearest-centroid: fold over the broadcast ``_cents`` array.

    ``_cents`` is ``array<struct<centroid_id, cv, cnorm>>`` attached to every
    corpus row by a broadcast of a single collected row; the fold picks the
    highest-cosine centroid with ties broken toward the smallest id — the
    exact semantics of ``row_number() OVER (ORDER BY ccos DESC, centroid_id)``
    in the DuckDB oracle. The comparison is order-independent, so the
    (nondeterministic) ``collect_list`` element order cannot change the
    result. Everything is a JVM higher-order-function expression: no Python,
    no groupBy, no Exchange on the corpus side.
    """
    ccos = (
        f"aggregate(zip_with({vec_col}, c.cv, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc2, v) -> acc2 + v) / (_vnorm * c.cnorm)"
    )
    return F.expr(
        f"""aggregate(
  transform(_cents, c -> named_struct('cid', c.centroid_id, 'ccos', {ccos})),
  named_struct('bid', CAST(-1 AS BIGINT), 'bcos', CAST(-2.0 AS DOUBLE)),
  (acc, s) -> CASE
      WHEN s.ccos > acc.bcos OR (s.ccos = acc.bcos AND s.cid < acc.bid)
      THEN named_struct('bid', s.cid, 'bcos', s.ccos)
      ELSE acc END,
  acc -> acc.bid)"""
    )


def ivf_assign(
    corpus: DataFrame,
    centroid_stride: int | None = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: ``(centroids, assigned)``.

    The coarse quantizer is DETERMINISTIC (no RNG, resumable, oracle-safe):
    centroids are the corpus rows with ``id % centroid_stride == 0``. Pass
    ``centroid_stride=None`` to derive it as ``isqrt(|corpus|)`` — the
    classic IVF balance point (k_centroids ≈ sqrt(n), list length ≈
    sqrt(n)); a fixed stride only stays balanced if it grows with the
    corpus. An empty centroid set (no id divisible by the stride) raises
    instead of silently returning zero candidates.

    Every vector is assigned to its highest-cosine centroid by a map-side
    fold over the broadcast centroid array (``_argmax_centroid_expr``) —
    one corpus scan, no groupBy, no Exchange. In production the ``assigned``
    frame is the inverted-list index: write it out partitioned by
    ``centroid_id`` once and amortize the build over every query batch
    (``ivf_topk(..., assigned=index_df)``).
    """
    if centroid_stride is None:
        import math

        centroid_stride = max(1, math.isqrt(corpus.count()))
    cent = corpus.where(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("cv"),
        _norm(vec_col).alias("cnorm"),
    )
    if cent.isEmpty():
        raise ValueError(
            f"ivf_assign: no corpus id divisible by centroid_stride="
            f"{centroid_stride}; every inverted list would be empty. "
            "Pass centroid_stride=None to derive it from the corpus size."
        )
    # single-row array<struct> of all centroids, broadcast onto every corpus
    # row; the tiny Exchange SinglePartition here moves centroids only.
    # coalesce() makes the key non-nullable so the candidate join does not
    # push an isnotnull(<fold>) copy of the expression back into the plan.
    cent_arr = cent.agg(
        F.collect_list(F.struct("centroid_id", "cv", "cnorm")).alias("_cents")
    )
    assigned = (
        corpus.select(id_col, vec_col)
        .withColumn("_vnorm", _norm(vec_col))
        .join(F.broadcast(cent_arr))
        .withColumn(
            "centroid_id",
            F.coalesce(_argmax_centroid_expr(vec_col), F.lit(-1).cast("long")),
        )
        .select(id_col, vec_col, "centroid_id")
    )
    return cent, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_stride: int | None = 50,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantize → probe nearest lists.

    A query probes its ``nprobe`` nearest centroids and exact-re-ranks only
    those inverted lists, with the (|queries|·nprobe)-row probe table
    broadcast into the candidate join. Pass ``index=ivf_assign(...)``
    (optionally persisted/written-back) to reuse a built index across query
    batches — the production path; otherwise the index plan is built inline
    from ``corpus``.

    Scale shape: the corpus is scanned ONCE and never hash-shuffled — not
    for assignment (broadcast fold, no groupBy) and not for the candidate
    join (probes broadcast). The only hash shuffle in the whole plan is the
    final per-query top-k window over the candidate subset
    (≈ |queries|·nprobe·n/k_centroids rows), which is inherent to ranking —
    asserted on the formatted physical plan in tests. (In the inline-index
    path Catalyst's constraint propagation re-infers the vacuously-true
    ``centroid_id % stride = 0`` filter into the candidate join, costing one
    extra evaluation of the assignment fold; a materialized ``index`` reads
    ``centroid_id`` as a plain column and avoids it.) Cost ≈
    |corpus|·k_centroids map-side multiply-adds + list-local re-ranking.
    Recall is tuned by ``nprobe`` (monotone — asserted in tests);
    ``lsh_topk`` is the alternative scale path, ``cosine_topk`` the exact
    oracle.
    """
    cent, assigned = index if index is not None else ivf_assign(
        corpus, centroid_stride, id_col, vec_col
    )
    # per-query nprobe nearest centroids (queries are few by contract)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("qv"))
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_qcos").desc(), F.col("centroid_id")
    )
    probes = (
        q.join(F.broadcast(cent.select("centroid_id", "cv")), how="cross")
        .withColumn("_qcos", cosine_expr("qv", "cv"))
        .withColumn("_pr", F.row_number().over(wq))
        .where(F.col("_pr") <= nprobe)
        .select(query_id_col, "qv", "centroid_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), on="centroid_id", how="inner")
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


# -- Product quantization (ADC) ----------------------------------------------
#
# The genuinely-10^10-scale vector path: PQ replaces each d-dim float vector
# with m small codes (one per subspace), so the query-time corpus scan reads
# m bytes per row instead of 4d — the standing `codes` table is ~32× smaller
# than the vector table at d=64/m=8, and the scan is the whole cost at scale.
# Asymmetric distance computation (ADC, Jégou et al. TPAMI'11): the query
# keeps its exact vector, each subspace contributes the exact distance from
# the query subvector to the row's assigned codeword, looked up from a tiny
# per-query distance table built ONCE (m·ksub entries) and broadcast.
#
# Determinism discipline matches the IVF path: no k-means RNG — codewords are
# the subvectors of stride-sampled corpus rows; all distances are double
# in-order folds; argmin ties break toward the smaller code. Every stage is
# therefore replayable in DuckDB (oracle `pq_ann_topk`).


def _l2sq(a: str, b: str) -> str:
    """Squared L2 between two double arrays — in-order fold, exact replay."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        f"* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _subvec(vec_col: str, start_1b: str, dsub: int) -> str:
    """Double-cast subvector slice (1-based start may be an expression)."""
    return (
        f"transform(slice({vec_col}, {start_1b}, {dsub}), "
        f"x -> CAST(x AS DOUBLE))"
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    stride: int = 25,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic PQ codebooks: ``(sub, code, cv)`` — ksub codewords per
    subspace, taken from the subvectors of corpus rows with
    ``id % stride == 0`` (no k-means RNG: resumable, oracle-replayable).
    ``code`` is the rank of the sampled row's id, so codes are dense
    ``0..ksub-1`` and identical across subspaces. The unpartitioned
    row_number window is safe: the codebook is tiny by construction
    (ksub = n/stride rows; pass ``stride=None``-style sqrt sizing upstream
    if needed — ksub ≈ 256 is the classic operating point)."""
    if dim is None:
        first = corpus.select(vec_col).first()
        if first is None:
            raise ValueError("pq_codebooks: empty corpus")
        dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    dsub = dim // m
    rows = corpus.where(F.col(id_col) % stride == 0).select(id_col, vec_col)
    if rows.isEmpty():
        raise ValueError(
            f"pq_codebooks: no corpus id divisible by stride={stride}; "
            "every codebook would be empty."
        )
    coded = rows.withColumn(
        "code", (F.row_number().over(Window.orderBy(id_col)) - 1).cast("long")
    )
    subs = F.array(
        *[
            F.expr(
                f"named_struct('sub', CAST({s} AS INT), "
                f"'cv', {_subvec(vec_col, str(s * dsub + 1), dsub)})"
            )
            for s in range(m)
        ]
    )
    return coded.select("code", F.explode(subs).alias("_e")).select(
        F.col("_e.sub").alias("sub"), "code", F.col("_e.cv").alias("cv")
    )


def _argmin_code_expr(vec_col: str, s: int, dsub: int) -> str:
    """Map-side nearest-codeword for subspace ``s``: fold over the broadcast
    ``_cb`` entry array (same order-independent min-compare as the IVF
    argmax; ties break toward the smaller code)."""
    dist = _l2sq(_subvec(vec_col, str(s * dsub + 1), dsub), "e.cv")
    return f"""aggregate(
  transform(filter(_cb, e -> e.sub = {s}),
            e -> named_struct('c', e.code, 'd', {dist})),
  named_struct('bc', CAST(-1 AS BIGINT), 'bd', CAST('Infinity' AS DOUBLE)),
  (acc, x) -> CASE
      WHEN x.d < acc.bd OR (x.d = acc.bd AND x.c < acc.bc)
      THEN named_struct('bc', x.c, 'bd', x.d)
      ELSE acc END,
  acc -> acc.bc)"""


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to ``(id, codes: array<bigint>)`` — one corpus
    scan, codebooks broadcast as a single collected array row, argmin per
    subspace as a JVM fold (no Python, no groupBy, no Exchange on the corpus
    side). In production the result is the standing index table: write it
    out once and amortize over every query batch."""
    dsub = dim // m
    cb_arr = codebooks.agg(
        F.collect_list(F.struct("sub", "code", "cv")).alias("_cb")
    )
    codes = F.array(
        *[F.expr(_argmin_code_expr(vec_col, s, dsub)) for s in range(m)]
    )
    return (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(cb_arr))
        .select(id_col, codes.alias("codes"))
    )


def pq_index(
    corpus: DataFrame,
    m: int = 8,
    stride: int = 25,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Convenience: ``(codebooks, codes)`` for ``pq_topk(codes, codebooks,…)``."""
    if dim is None:
        # infer ONCE here (pq_codebooks would otherwise run its own
        # first() — a second single-row corpus job at build time)
        first = corpus.select(vec_col).first()
        if first is None:
            raise ValueError("pq_index: empty corpus")
        dim = len(first[0])
    cb = pq_codebooks(corpus, m, stride, dim, id_col, vec_col)
    return cb, pq_encode(corpus, cb, m, dim, id_col, vec_col)


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC approximate top-k by squared L2: ``(query_id, vec_id, rank, adist)``.

    Per-query distance table = queries × codebooks (both tiny; m·ksub rows
    per query), collapsed to one array row per query and broadcast. The
    corpus-side scan touches ONLY the codes table — never the vectors — and
    each row costs m table lookups (the in-order sum keeps adist
    bit-replayable). The only hash shuffle is the final per-query top-k
    window, same as the IVF/LSH paths. Compose with IVF for list pruning
    (filter codes by probed centroid ids before scoring) — classic IVF-PQ;
    plain ADC is the exhaustive-scan variant (still ~32× less I/O than
    brute force at d=64, m=8).

    stride=1 codebooks make encoding lossless (every subvector is its own
    codeword at distance 0), so ``pq_topk`` degrades exactly to brute-force
    squared-L2 ranking — pinned in tests.
    """
    dsub = dim // m
    q = queries.select(query_id_col, F.col(vec_col).alias("qv"))
    d_expr = _l2sq(_subvec("qv", f"sub * {dsub} + 1", dsub), "cv")
    dt = (
        q.crossJoin(F.broadcast(codebooks))
        .select(query_id_col, "sub", "code", F.expr(d_expr).alias("d"))
        .groupBy(query_id_col)
        .agg(F.collect_list(F.struct("sub", "code", "d")).alias("_dt"))
    )
    # (sub, code) is unique within _dt, so the filter-lookup is order-safe
    # under collect_list's nondeterministic element order.
    adist = F.expr(
        f"""aggregate(
  transform(sequence(0, {m - 1}), s ->
    element_at(filter(_dt, e -> e.sub = s
                             AND e.code = element_at(codes, s + 1)), 1).d),
  CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""
    )
    scored = (
        codes.join(F.broadcast(dt))
        .where(F.col(query_id_col) != F.col(id_col))
        .withColumn("adist", adist)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("adist"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "adist")
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
    fixed n_bits — asserted in tests/test_training_ops.py).

    Scale shape: the corpus is scanned ONCE — all ``n_tables`` signatures are
    computed in a single map-side projection and exploded to (table, bucket)
    rows (CPU-only fan-out; a union-of-per-table-joins would rescan the
    10^10-vector corpus n_tables times). The query side is broadcast, so the
    corpus never hash-shuffles into the bucket join either; candidate pairs
    are deduped across tables before scoring so each pair is scored once.
    """

    def _sig_rows(df: DataFrame, idc: str, vc: str, out_vec: str) -> DataFrame:
        sig_arr = F.array(
            *[
                F.struct(
                    F.lit(t).alias("_tbl"),
                    lsh_signature(vc, n_bits, table=t).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(idc), F.col(vc).alias(out_vec), F.explode(sig_arr).alias("_s")
        ).select(idc, out_vec, "_s._tbl", "_s.bucket")

    c = _sig_rows(corpus, id_col, vec_col, vec_col)
    q = F.broadcast(_sig_rows(queries, query_id_col, vec_col, "qv"))
    cand = c.join(q, on=["_tbl", "bucket"], how="inner").where(
        F.col(query_id_col) != F.col(id_col)
    )
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


# ---------------------------------------------------------------------------
# Cross-lingual bitext mining (margin-based, CCMatrix/LASER-style)
# ---------------------------------------------------------------------------


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mine translation pairs between two embedding sets by ratio margin:
    (src_id, tgt_id, cosine, margin, mutual).

    The Artetxe-Schwenk criterion behind CCMatrix/WikiMatrix corpora: raw
    cosine over-selects hub sentences (near everything in the other
    language), so each source row's BEST target is scored by
    ``margin = cos(x, y) / ((avgNN_k(x→tgt) + avgNN_k(y→src)) / 2)`` and
    kept when the margin clears the threshold; ``mutual`` marks pairs
    that are each other's rank-1 match (the high-precision subset).

    The candidate stage here is the exact scorer (one pass over
    src × broadcast(tgt), the oracle baseline — same positioning as
    ``cosine_topk``): both direction's top-k lists and both margin
    denominators are derived from that single scored sliver
    ((src_id, tgt_id, cosine) — vectors never enter the windows'
    exchanges). At CC scale swap the scored frame for LSH/IVF candidates
    (``lsh_topk`` / ``ivf_topk`` produce the same (query, id, cosine)
    shape); margin math and mutuality are unchanged downstream.
    """
    s = src.select(F.col(id_col).alias("src_id"), F.col(vec_col).alias("sv"))
    t = tgt.select(F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("tv"))
    scored = (
        s.crossJoin(F.broadcast(t))
        .withColumn("cosine", cosine_expr("sv", "tv"))
        .select("src_id", "tgt_id", "cosine")
    )
    wf = Window.partitionBy("src_id").orderBy(
        F.col("cosine").desc(), F.col("tgt_id")
    )
    wb = Window.partitionBy("tgt_id").orderBy(
        F.col("cosine").desc(), F.col("src_id")
    )
    ranked = scored.withColumn("fr", F.row_number().over(wf)).withColumn(
        "br", F.row_number().over(wb)
    )
    fwd_avg = (
        ranked.where(F.col("fr") <= k)
        .groupBy("src_id")
        .agg(F.avg("cosine").alias("favg"))
    )
    bwd_avg = (
        ranked.where(F.col("br") <= k)
        .groupBy("tgt_id")
        .agg(F.avg("cosine").alias("bavg"))
    )
    best = ranked.where(F.col("fr") == 1)
    return (
        best.join(fwd_avg, "src_id")
        .join(bwd_avg, "tgt_id")
        .withColumn(
            "margin", F.col("cosine") / ((F.col("favg") + F.col("bavg")) / 2)
        )
        .where(F.col("margin") >= F.lit(margin_threshold))
        .select(
            "src_id",
            "tgt_id",
            "cosine",
            "margin",
            (F.col("br") == 1).alias("mutual"),
        )
    )


def bitext_mine_sql(
    src_sql: str,
    tgt_sql: str,
    duck_cos: "callable",
    k: int = 4,
    margin_threshold: float = 1.0,
) -> str:
    """DuckDB replay of :func:`bitext_mine` over ``(vec_id, embedding)``
    relations; ``duck_cos(a, b)`` renders the engine-parity cosine (the
    caller owns it so the fold order matches its Spark twin)."""
    return f"""WITH S AS ({src_sql}), T AS ({tgt_sql}),
SC AS (SELECT S.vec_id AS src_id, T.vec_id AS tgt_id,
         {duck_cos('S.embedding', 'T.embedding')} AS cosine
       FROM S, T),
R AS (SELECT *,
        row_number() OVER (PARTITION BY src_id
                           ORDER BY cosine DESC, tgt_id) AS fr,
        row_number() OVER (PARTITION BY tgt_id
                           ORDER BY cosine DESC, src_id) AS br
      FROM SC),
FA AS (SELECT src_id, avg(cosine) AS favg FROM R WHERE fr <= {k}
       GROUP BY src_id),
BA AS (SELECT tgt_id, avg(cosine) AS bavg FROM R WHERE br <= {k}
       GROUP BY tgt_id),
B AS (SELECT R.*, FA.favg, BA.bavg FROM R
      JOIN FA USING (src_id) JOIN BA USING (tgt_id) WHERE R.fr = 1)
SELECT src_id, tgt_id, cosine, cosine / ((favg + bavg) / 2) AS margin,
  (br = 1) AS mutual
FROM B WHERE cosine / ((favg + bavg) / 2) >= {margin_threshold}"""
