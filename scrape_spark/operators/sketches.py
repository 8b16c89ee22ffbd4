"""Count-Min sketch heavy hitters — the mega-host detector for salting.

The frontier's skew controls (politeness.per_host_take's salted two-stage
top-k, the bucketed fetch join) need to KNOW which hosts are mega-hosts.
An exact per-host count is one shuffle whose map-side combine state is
O(distinct hosts per partition) — at 10^10 URLs over ~10^7 hosts each task
holds millions of combiner entries. The Count-Min sketch (Cormode &
Muthukrishnan 2005) caps that state at depth × width int64 cells per
partition regardless of key cardinality, and the shuffle moves only
O(partitions · depth · width) rows. Estimates never UNDER-count
(est ≥ true, one-sided), so a heavy-hitter screen built on it has no
false negatives — exactly the guarantee a salting plan needs: a missed
mega-host breaks a round; an over-salted small host only costs one extra
window stage.

Everything is exact int64 mod-prime arithmetic (textstats._char_fold keys,
pairwise-independent (a·x + b) mod P row hashes), so the DuckDB oracle
reproduces the sketch — and the decisions built on it — bit-for-bit.

``salt_plan`` turns estimates into the per-host fan-out that
politeness.per_host_take consumes: n_salts = ceil(est / target_per_salt)
clamped to [1, max_salts]. The reference crawler has no analogue (it is
single-host-at-a-time, scraper.py:28-36); this is engine machinery for the
north rule's "salted host-hash-partitioned … explicit skew handling".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scrape_spark.functions import textstats as ts

#: default sketch geometry: depth 4 rows × width 1024 gives ε = 2e/w ≈ 0.5%
#: of the stream total per estimate, failure prob e^-4 < 2%
CMS_DEPTH = 4
CMS_WIDTH = 1024
#: fixed odd multipliers / offsets for the row hashes (a_i·x + b_i) mod P —
#: literal constants so both engines evaluate the identical expression
_CMS_A = (1000003, 2000029, 3000073, 4000037, 5000011, 6000047, 7000003)
_CMS_B = (12345, 54321, 192837, 918273, 564738, 837465, 111111)


def _key_fold(key: str, d: dict) -> str:
    """int64 key digest (Karp-Rabin char fold mod P, textstats kernel)."""
    return ts._char_fold(key, d)


def _row_hash(x: str, i: int, width: int) -> str:
    """Bucket of digest ``x`` in sketch row ``i`` — same text both engines."""
    a, b = _CMS_A[i], _CMS_B[i]
    return f"((({a} * ({x}) + {b}) % {ts.HASH_P}) % {int(width)})"


def cms_cells(
    df: DataFrame,
    key_col: str = "host",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: (row_i, bucket, c) — at most depth·width rows.

    One map pass computes the key digest, a depth-way explode assigns each
    occurrence to its per-row bucket, and a map-side-combined count
    collapses every partition to ≤ depth·width cells before the shuffle.
    """
    if not 1 <= depth <= len(_CMS_A):
        raise ValueError(f"depth must be in [1, {len(_CMS_A)}], got {depth}")
    digest = df.select(
        F.expr(_key_fold(key_col, ts.SPARK_DIALECT)).alias("_x")
    )
    rows = digest.select(
        "_x", F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row_i")
    )
    bucket = " ".join(
        f"WHEN row_i = {i} THEN {_row_hash('_x', i, width)}"
        for i in range(depth)
    )
    return (
        rows.select(
            F.col("row_i").cast("long"),
            F.expr(f"CASE {bucket} END").cast("long").alias("bucket"),
        )
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str = "host",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    threshold_ppm: int = 10_000,
) -> DataFrame:
    """(key, est) for every distinct key whose CMS estimate is at least
    ``threshold_ppm`` parts-per-million of the stream total.

    est = min over sketch rows of the row's bucket count (the CMS point
    query). The threshold compare is integer cross-multiplied
    (est · 10^6 ≥ total · ppm) — no division, no doubles. The cells table
    is broadcast (≤ depth·width rows), so the probe over distinct keys is
    map-side; the only wide shuffles are the cell build and the distinct.
    """
    cells = cms_cells(df, key_col, depth, width)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    keys = (
        df.select(F.col(key_col).alias("key"))
        .distinct()
        .withColumn("_x", F.expr(_key_fold("key", ts.SPARK_DIALECT)))
    )
    probes = keys.select(
        "key", "_x", F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row_i")
    )
    bucket = " ".join(
        f"WHEN row_i = {i} THEN {_row_hash('_x', i, width)}"
        for i in range(depth)
    )
    probes = probes.withColumn(
        "bucket", F.expr(f"CASE {bucket} END").cast("long")
    ).withColumn("row_i", F.col("row_i").cast("long"))
    est = (
        probes.join(F.broadcast(cells), ["row_i", "bucket"])
        .groupBy("key")
        .agg(F.min("c").cast("long").alias("est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est") * 1_000_000 >= F.col("n_total") * int(threshold_ppm))
        .select(F.col("key").alias(key_col), "est")
    )


def salt_plan(
    hitters: DataFrame,
    target_per_salt: int = 100_000,
    max_salts: int = 64,
    key_col: str = "host",
) -> DataFrame:
    """(key, est, n_salts): the per-host fan-out for the salted top-k.

    ceil-divide the estimated frontier share by the per-salt target,
    clamped to [1, max_salts]. Hosts absent from ``hitters`` implicitly get
    n_salts = 1 (the default fan-out politeness.per_host_take applies
    anyway) — the plan only needs rows for the heavy tail. Integer-only.
    """
    # ceil-div via (est + t - 1) div t: positive operands only, so Spark's
    # truncate-toward-zero div and DuckDB's floor // agree
    t = int(target_per_salt)
    n = F.expr(
        f"least(CAST({int(max_salts)} AS BIGINT), "
        f"greatest(CAST(1 AS BIGINT), "
        f"CAST((est + {t - 1}) div {t} AS BIGINT)))"
    )
    return hitters.select(key_col, "est", n.alias("n_salts"))


def cms_heavy_hitters_sql(
    src_sql: str,
    key_col: str = "host",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    threshold_ppm: int = 10_000,
    target_per_salt: int = 100_000,
    max_salts: int = 64,
) -> str:
    """DuckDB oracle: identical sketch build, probe, screen, and salt plan.

    ``src_sql`` must project ``key_col``. Returns the salted plan —
    (key, est, n_salts) — for the heavy hitters.
    """
    if not 1 <= depth <= len(_CMS_A):
        raise ValueError(f"depth must be in [1, {len(_CMS_A)}], got {depth}")
    d = ts.DUCK_DIALECT
    fold = _key_fold(key_col, d)
    bucket = " ".join(
        f"WHEN i = {i} THEN {_row_hash('_x', i, width)}" for i in range(depth)
    )
    return f"""WITH _src AS ({src_sql}),
_dig AS (SELECT {fold} AS _x FROM _src),
_rows AS (SELECT _x, unnest(range(0, {depth})) AS i FROM _dig),
_cells AS (SELECT CAST(i AS BIGINT) AS row_i,
             CAST(CASE {bucket} END AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS c
           FROM _rows GROUP BY 1, 2),
_tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM _src),
_keys AS (SELECT DISTINCT {key_col} AS key FROM _src),
_kd AS (SELECT key, {_key_fold('key', d)} AS _x FROM _keys),
_probe AS (SELECT key, CAST(i AS BIGINT) AS row_i,
             CAST(CASE {bucket} END AS BIGINT) AS bucket
           FROM (SELECT key, _x, unnest(range(0, {depth})) AS i FROM _kd)),
_est AS (SELECT key, CAST(min(c) AS BIGINT) AS est
         FROM _probe JOIN _cells USING (row_i, bucket) GROUP BY key),
_hh AS (SELECT key, est FROM _est, _tot
        WHERE est * 1000000 >= n_total * {int(threshold_ppm)})
SELECT key AS {key_col}, est,
  CAST(least({int(max_salts)}, greatest(1,
    (est + {int(target_per_salt) - 1}) // {int(target_per_salt)}))
    AS BIGINT) AS n_salts
FROM _hh"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the theta-sketch core
# ---------------------------------------------------------------------------
# CMS above answers "how OFTEN does this key occur"; crawl accounting also
# needs "how many DISTINCT keys" — distinct URLs per host for frontier
# sizing, and distinct-set OVERLAP between two crawls (how much of this
# month's crawl did last month already cover?). An exact per-group distinct
# is a full shuffle of the distinct key set; the KMV sketch (Bar-Yossef et
# al. 2002; the DataSketches theta core) keeps only the k smallest hash
# values per group: est = (k-1)·P / h_(k), RSE ≈ 1/sqrt(k-2). Because the
# k-min set of a union is computable from the k-min sets of the parts,
# sketches MERGE — per-partition partial sketches combine associatively,
# and set algebra (union / intersection / Jaccard) falls out of comparing
# two sketches under the union's threshold.
#
# Everything is exact int64 over the shared [0, P²) dual-fold digest, so
# the DuckDB oracle reproduces sketches AND estimates bit-for-bit. The
# reference has no analogue (single-host loop); this is engine machinery
# for frontier accounting at 10^10-URL scale.

KMV_K = 64


def _kmv_digest(key: str, d: dict) -> str:
    """String-key digest over the [0, P²) universe — the shared
    :func:`textstats.kmv_digest64_sql` kernel (two independent folds,
    square-then-affine mixed per lane). A 31-bit universe would saturate
    near 2.1e9 distinct keys; P² keeps order statistics unbiased through
    the 10^10-URL regime, with every product exact int64 on both engines
    (measured estimate quality matches a true-random baseline across
    sequential/URL/zero-padded/mixed-length key families).
    """
    return ts.kmv_digest64_sql(key, d)


def _kmv_est(mins: str, n: str, k: int, d: dict) -> str:
    """Estimate over an array sketch: the shared scalar estimator
    (:func:`textstats.kmv_estimate_sql`) with θ = the sketch's k-th min."""
    theta = d["at"].format(arr=mins, i=str(int(k)))
    return ts.kmv_estimate_sql(n, theta, k, d)


def kmv_sketch(
    df: DataFrame,
    key_col: str = "url",
    group_col: str = "host",
    k: int = KMV_K,
) -> DataFrame:
    """(group, mins, n_mins): the per-group k-min register arrays.

    Scale shape: the distinct pass has ordinary map-side combine; the k-min
    selection reuses ``politeness.per_host_take``'s salted two-stage top-k,
    so a mega-group's distinct set never funnels through one window task —
    each stage-1 task ranks 1/n_salts of a group's slice and keeps k, the
    stage-2 merge ranks ≤ k·n_salts survivors, and the final per-group
    state is exactly k int64s. The arrays MERGE (k-min of a union = k-min
    of the parts' k-mins — associative, commutative, idempotent), which is
    what the streaming maintenance path builds on.
    """
    from scrape_spark.operators.politeness import per_host_take

    # NULL keys digest to NULL and are EXCLUDED on both engines (Spark
    # sorts NULLs first but collect_list drops them — counting one would
    # desync n_mins from the array and NULL the estimate; the DuckDB twin
    # filters identically). A distinct-count of "no key" is 0 by fiat.
    hashed = (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(_kmv_digest(key_col, ts.SPARK_DIALECT)).alias("_h"),
        )
        .where(F.col("_h").isNotNull())
        .distinct()
        .withColumn("_q", F.lit(int(k)))
    )
    kept = per_host_take(hashed, quota_col="_q", host_col="grp", order_cols=("_h",))
    return kept.groupBy("grp").agg(
        F.sort_array(F.collect_list("_h")).alias("mins"),
        F.count(F.lit(1)).cast("long").alias("n_mins"),
    ).select(F.col("grp").alias(group_col), "mins", "n_mins")


def kmv_estimates(
    sketches: DataFrame, group_col: str = "host", k: int = KMV_K
) -> DataFrame:
    """(group, n_mins, est_distinct) from a (group, mins, n_mins) frame."""
    est = _kmv_est("mins", "n_mins", k, ts.SPARK_DIALECT)
    return sketches.select(
        group_col, "n_mins", F.expr(est).alias("est_distinct")
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str = "url",
    group_col: str = "host",
    k: int = KMV_K,
) -> DataFrame:
    """(group, n_mins, est_distinct): KMV distinct estimate per group —
    :func:`kmv_sketch` composed with :func:`kmv_estimates`. Estimates are
    exact below k (the sketch IS the set)."""
    return kmv_estimates(kmv_sketch(df, key_col, group_col, k), group_col, k)


def kmv_distinct_sql(
    src_sql: str,
    key_col: str = "url",
    group_col: str = "host",
    k: int = KMV_K,
) -> str:
    """DuckDB oracle: identical digest, k-min set, and estimate."""
    d = ts.DUCK_DIALECT
    fold = _kmv_digest(key_col, d)
    est = _kmv_est("mins", "n_mins", k, d)
    return f"""WITH _src AS ({src_sql}),
_d AS (SELECT DISTINCT grp, _h FROM
         (SELECT {group_col} AS grp, {fold} AS _h FROM _src)
       WHERE _h IS NOT NULL),
_r AS (SELECT grp, _h, row_number() OVER (PARTITION BY grp ORDER BY _h) AS rn
       FROM _d),
_k AS (SELECT grp, list_sort(list(_h)) AS mins,
              CAST(count(*) AS BIGINT) AS n_mins
       FROM _r WHERE rn <= {int(k)} GROUP BY grp)
SELECT grp AS {group_col}, n_mins, {est} AS est_distinct FROM _k"""


def _kmv_global(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """One-row (mins, n_mins) global sketch of a key stream.

    ``orderBy.limit(k)`` compiles to TakeOrderedAndProject — per-partition
    top-k then a k-row merge, never a global sort — so the driver-side
    state is exactly k int64s regardless of input size.
    """
    mins = (
        df.select(F.expr(_kmv_digest(key_col, ts.SPARK_DIALECT)).alias("_h"))
        .where(F.col("_h").isNotNull())
        .distinct()
        .orderBy("_h")
        .limit(int(k))
    )
    return mins.agg(
        F.sort_array(F.collect_list("_h")).alias("mins"),
        F.count(F.lit(1)).cast("long").alias("n_mins"),
    )


def _kmv_overlap_cols(k: int, d: dict) -> dict[str, str]:
    """Per-output-column overlap formulas over sketch columns (ma,na,mb,nb).

    Self-contained expression texts (the union sketch is inlined where
    used) so the identical formula compiles on both engines — same
    discipline as every dialect kernel."""
    mu = "(" + d["aslice"].format(
        arr=d["asort"].format(
            arr=d["adistinct"].format(arr=d["aconcat"].format(a="ma", b="mb"))
        ),
        k=str(int(k)),
    ) + ")"
    nu = f"CAST({d['size'].format(arr=mu)} AS BIGINT)"
    common = d["ainter"].format(
        arr=d["ainter"].format(arr=mu, brr="ma"), brr="mb"
    )
    nc = f"CAST({d['size'].format(arr=common)} AS BIGINT)"
    est_u = _kmv_est(mu, nu, k, d)
    # intersection = nc·est_u div nu, split-divided: est_u ranges over the
    # P² universe so the naive product reaches k·U ≈ 3e20. nc ≤ nu (the
    # numerator counts members OF the union sketch), so nc·(est_u div nu)
    # ≤ est_u ≤ U and nc·(est_u mod nu) < nu² ≤ k² — both in int64; the
    # split sum equals floor(nc·est_u/nu) EXACTLY (nc·E = nu·nc·q + nc·r).
    nu1 = f"greatest({nu}, 1)"
    inter = (
        f"({nc}) * {d['idiv'].format(a=f'({est_u})', b=nu1)} + "
        + d["idiv"].format(a=f"(({nc}) * (({est_u}) % {nu1}))", b=nu1)
    )
    jacc = d["idiv"].format(a=f"({nc}) * 1000000", b=nu1)
    return {
        "est_a": _kmv_est("ma", "na", k, d),
        "est_b": _kmv_est("mb", "nb", k, d),
        "est_union": est_u,
        "est_intersection": f"CAST({inter} AS BIGINT)",
        "jaccard_ppm": f"CAST({jacc} AS BIGINT)",
    }


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str = "url",
    k: int = KMV_K,
) -> DataFrame:
    """One-row set-algebra estimate between two key streams.

    (est_a, est_b, est_union, est_intersection, jaccard_ppm) — the theta
    framework: merge both k-min sets, truncate to k (the union sketch);
    union-sketch members present in BOTH input sketches are the Jaccard
    numerator; intersection = numerator·est_union div |union sketch|
    (cross-multiplied before the single integer division). When the union
    sketch is not full every estimate is exact — the sketches ARE the
    hash sets. Jaccard is reported in ppm to stay integer-only.

    The crawl-accounting use: df_a = last crawl's URL set, df_b = this
    crawl's — est_intersection is re-crawl coverage, est_b − inter the
    newly-discovered mass. Scale shape: each side reduces to one k-row
    sketch (TakeOrderedAndProject, see ``_kmv_global``) before the single
    1×1-row cross join; the combine is O(k) however large the inputs.
    """
    cols = _kmv_overlap_cols(k, ts.SPARK_DIALECT)
    a = _kmv_global(df_a, key_col, k).select(
        F.col("mins").alias("ma"), F.col("n_mins").alias("na")
    )
    b = _kmv_global(df_b, key_col, k).select(
        F.col("mins").alias("mb"), F.col("n_mins").alias("nb")
    )
    return a.crossJoin(b).select(
        *[F.expr(t).alias(c) for c, t in cols.items()]
    )


def kmv_overlap_sql(
    a_sql: str,
    b_sql: str,
    key_col: str = "url",
    k: int = KMV_K,
) -> str:
    """DuckDB oracle: identical sketches and set-algebra estimates."""
    d = ts.DUCK_DIALECT
    fold = _kmv_digest(key_col, d)
    cols = _kmv_overlap_cols(k, d)
    sel = ",\n  ".join(f"{t} AS {c}" for c, t in cols.items())
    return f"""WITH _ad AS (SELECT DISTINCT {fold} AS _h FROM ({a_sql})
                            WHERE {fold} IS NOT NULL),
_ak AS (SELECT _h FROM _ad ORDER BY _h LIMIT {int(k)}),
_a AS (SELECT coalesce(list_sort(list(_h)), CAST([] AS BIGINT[])) AS ma,
              CAST(count(*) AS BIGINT) AS na
       FROM _ak),
_bd AS (SELECT DISTINCT {fold} AS _h FROM ({b_sql})
                        WHERE {fold} IS NOT NULL),
_bk AS (SELECT _h FROM _bd ORDER BY _h LIMIT {int(k)}),
_b AS (SELECT coalesce(list_sort(list(_h)), CAST([] AS BIGINT[])) AS mb,
              CAST(count(*) AS BIGINT) AS nb
       FROM _bk)
SELECT {sel}
FROM _a, _b"""


# ---------------------------------------------------------------------------
# HyperBall-style neighborhood function over the webgraph (KMV registers)
# ---------------------------------------------------------------------------
# Boldi & Vigna's HyperBall computes, for every node, the approximate size
# of its radius-r out-ball (|{w : dist(v,w) ≤ r}|) by iterating "my ball =
# me ∪ my successors' balls" with a MERGEABLE distinct sketch as the ball
# register — the scale path to neighborhood functions and harmonic
# centrality on graphs where exact per-node BFS is hopeless. The original
# uses HyperLogLog registers; the KMV sketch above has the same merge
# property (k-min of a union = k-min of the parts' k-mins) with exact
# int64 arithmetic, so the whole iteration — registers, merges, estimates
# — replays bit-for-bit on the DuckDB oracle as r unrolled CTEs.
#
# Crawl use: est_ball at r=1,2 ranks hub pages by how much frontier a
# fetch unlocks (a discovery-priority signal PageRank can't give — it
# scores popularity, not reach); the full neighborhood function profiles
# the webgraph's expansion rate.


def _kmv_node_digest(node: str) -> str:
    """[0, P²) digest for int64 node ids — the shared
    :func:`textstats.kmv_id_digest64_sql` kernel (CRT lane inputs, mixed
    per lane; sequential ids are the lattice case par excellence)."""
    return f"CAST({ts.kmv_id_digest64_sql(node)} AS BIGINT)"


def _kmv_merge(arr_of_arrs: str, k: int, d: dict) -> str:
    """k-min of a bag of k-min arrays — the associative sketch merge."""
    return d["aslice"].format(
        arr=d["asort"].format(
            arr=d["adistinct"].format(arr=d["aflatten"].format(arr=arr_of_arrs))
        ),
        k=str(int(k)),
    )


def hyperball_counts(
    edges: DataFrame,
    radius: int = 2,
    k: int = KMV_K,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, n_mins, est_ball): approximate out-ball sizes at ``radius``.

    Each round is one (dst-keyed) join moving only k-int64 registers plus
    one node-keyed merge — O(E·k) state motion per round, never the ball
    sets themselves; ``radius`` rounds unroll into one linear plan. Node
    ids must be nonnegative int64 (the crawl's seq/doc ids are). With
    k ≥ every true ball size the sketch holds the whole reachable hash set
    and ``n_mins`` IS the exact ball size (modulo 1/P² hash collisions)
    — the property the parity test pins.
    """
    d = ts.SPARK_DIALECT
    rounds = _hyperball_rounds(edges, radius, k, src_col, dst_col)
    n = f"CAST({d['size'].format(arr='mins')} AS BIGINT)"
    return rounds.select(
        "node",
        F.expr(n).alias("n_mins"),
        F.col(f"_e{int(radius)}").alias("est_ball"),
    )


def hyperball_counts_sql(
    edges_sql: str,
    radius: int = 2,
    k: int = KMV_K,
    src_col: str = "src",
    dst_col: str = "dst",
) -> str:
    """DuckDB oracle: the shared round chain, read at the final round."""
    d = ts.DUCK_DIALECT
    ctes = _hyperball_chain_sql(edges_sql, radius, k, src_col, dst_col)
    n = f"CAST({d['size'].format(arr='mins')} AS BIGINT)"
    est = _kmv_est("mins", n, k, d)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, {n} AS n_mins, {est} AS est_ball FROM _s{int(radius)}"
    )


# ---------------------------------------------------------------------------
# HyperANF follow-ons: harmonic centrality + neighborhood function
# ---------------------------------------------------------------------------
# The per-radius ball estimates the HyperBall iteration yields are the raw
# material for the two classic global analyses (Boldi & Vigna 2013):
#
# * **Harmonic centrality** H(v) = Σ_{w≠v} 1/d(w,v), approximated as
#   Σ_t (|ball_in(v,t)| − |ball_in(v,t−1)|)/t — the centrality measure
#   recommended over closeness for the (always disconnected) webgraph.
#   In-balls = out-balls of the reversed graph, so the same iteration runs
#   on flipped edges. A spam-resistant page-importance signal: reach is
#   harder to fake than in-degree.
# * **Neighborhood function** N(t) = Σ_v |ball(v,t)| and the EFFECTIVE
#   DIAMETER (first t where N(t) ≥ 90% of N(r)) — the expansion profile
#   of the crawl's webgraph.
#
# Ball estimates are monotone in t (the k-min set at t+1 is the k-min of a
# superset: h_k can only fall, the estimate only rise; below-k counts only
# grow), so the per-term deltas are ≥ 0. 1/t terms are kept integer as
# delta·10^6 div t — both engines truncate identically (documented ≤ r ppm
# absolute error, deterministic).


def _hyperball_rounds(
    edges: DataFrame,
    radius: int,
    k: int,
    src_col: str,
    dst_col: str,
) -> DataFrame:
    """(node, mins, _e0.._eR): final registers + per-radius KMV ball
    estimates, one linear plan — the single implementation every
    HyperBall-family operator reads."""
    d = ts.SPARK_DIALECT
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n_expr = f"CAST({d['size'].format(arr='mins')} AS BIGINT)"
    est = _kmv_est("mins", n_expr, k, d)
    sk_df = nodes.select(
        "node", F.expr(d["mkarr"].format(x=_kmv_node_digest("node"))).alias("mins")
    ).withColumn("_e0", F.expr(est))
    merge = _kmv_merge("_ls", k, d)
    for t in range(1, int(radius) + 1):
        contrib = e.join(
            sk_df.select(F.col("node").alias("_d"), "mins"), "_d"
        ).select(F.col("_s").alias("node"), "mins")
        keep = [
            F.first(f"_e{i}", ignorenulls=True).alias(f"_e{i}") for i in range(t)
        ]
        sk_df = (
            contrib.withColumns(
                {f"_e{i}": F.lit(None).cast("long") for i in range(t)}
            )
            .unionByName(sk_df.select("node", "mins", *[f"_e{i}" for i in range(t)]))
            .groupBy("node")
            .agg(F.collect_list("mins").alias("_ls"), *keep)
            .select("node", F.expr(merge).alias("mins"), *[f"_e{i}" for i in range(t)])
            .withColumn(f"_e{t}", F.expr(est))
        )
    return sk_df


def _harmonic_expr(radius: int, d: dict) -> str:
    """Σ_{t=1..r} (e_t − e_{t−1})·10^6 div t over columns _e0.._eR."""
    terms = [
        d["idiv"].format(a=f"(_e{t} - _e{t - 1}) * 1000000", b=str(t))
        for t in range(1, int(radius) + 1)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def harmonic_centrality(
    edges: DataFrame,
    radius: int = 3,
    k: int = KMV_K,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, est_ball, harmonic_ppm): truncated harmonic centrality.

    Runs HyperBall over the REVERSED edges (in-balls). ``est_ball`` is the
    radius-r in-ball estimate; ``harmonic_ppm`` the Σ delta/t sum ×10^6.
    Same scale shape as ``hyperball_counts`` — per-round register motion
    only; the per-radius estimate columns ride the same plan (carried
    through each merge by ``first()``, they are functionally determined by
    the node key).
    """
    rounds = _hyperball_rounds(edges, radius, k, src_col=dst_col, dst_col=src_col)
    return rounds.select(
        "node",
        F.col(f"_e{int(radius)}").alias("est_ball"),
        F.expr(_harmonic_expr(radius, ts.SPARK_DIALECT)).alias("harmonic_ppm"),
    )


def _hyperball_chain_sql(
    edges_sql: str,
    radius: int,
    k: int,
    src_col: str,
    dst_col: str,
) -> list[str]:
    """The round CTEs ``_e, _n, _s0.._sR`` — the single DuckDB replay of
    the iteration, shared by every HyperBall-family twin."""
    d = ts.DUCK_DIALECT
    merge = _kmv_merge("list(mins)", k, d)
    ctes = [
        f"_e AS ({edges_sql})",
        f"_n AS (SELECT {src_col} AS node FROM _e "
        f"UNION SELECT {dst_col} AS node FROM _e)",
        "_s0 AS (SELECT node, "
        + d["mkarr"].format(x=_kmv_node_digest("node"))
        + " AS mins FROM _n)",
    ]
    for t in range(1, int(radius) + 1):
        prev = f"_s{t - 1}"
        ctes.append(
            f"_s{t} AS (SELECT node, {merge} AS mins FROM ("
            f"SELECT e.{src_col} AS node, s.mins FROM _e e "
            f"JOIN {prev} s ON s.node = e.{dst_col} "
            f"UNION ALL SELECT node, mins FROM {prev}) GROUP BY node)"
        )
    return ctes


def _hyperball_rounds_sql(
    edges_sql: str,
    radius: int,
    k: int,
    src_col: str,
    dst_col: str,
) -> str:
    """CTE chain ending in ``_hb`` with (node, _e0.._eR) — DuckDB replay."""
    d = ts.DUCK_DIALECT
    n_expr = f"CAST({d['size'].format(arr='mins')} AS BIGINT)"
    est = _kmv_est("mins", n_expr, k, d)
    ctes = _hyperball_chain_sql(edges_sql, radius, k, src_col, dst_col)
    evals = ", ".join(
        f"(SELECT {est} FROM _s{t} s WHERE s.node = _n.node) AS _e{t}"
        for t in range(0, int(radius) + 1)
    )
    ctes.append(f"_hb AS (SELECT _n.node AS node, {evals} FROM _n)")
    return "WITH " + ",\n".join(ctes)


def harmonic_centrality_sql(
    edges_sql: str,
    radius: int = 3,
    k: int = KMV_K,
    src_col: str = "src",
    dst_col: str = "dst",
) -> str:
    """DuckDB oracle: reversed-edge rounds + the identical delta/t fold."""
    chain = _hyperball_rounds_sql(
        edges_sql, radius, k, src_col=dst_col, dst_col=src_col
    )
    h = _harmonic_expr(radius, ts.DUCK_DIALECT)
    return (
        f"{chain}\nSELECT node, _e{int(radius)} AS est_ball, "
        f"{h} AS harmonic_ppm FROM _hb"
    )


def neighborhood_function(
    edges: DataFrame,
    radius: int = 3,
    k: int = KMV_K,
    src_col: str = "src",
    dst_col: str = "dst",
    eff_ppm: int = 900_000,
) -> DataFrame:
    """(t, n_reach, frac_ppm, is_eff_diameter): the graph expansion profile.

    ``n_reach`` = Σ_v est_ball(v, t); ``frac_ppm`` its share of N(radius);
    ``is_eff_diameter`` marks the FIRST t reaching ``eff_ppm`` (default
    90%) — the effective-diameter estimate. The per-node table collapses
    to radius+1 global sums (map-side combined) before a tiny unpivot, so
    the output is radius+1 rows regardless of graph size. The total
    N(radius) rides the SAME select as the unpivot generator — the round
    pipeline is computed once, never re-read for the scalar.

    Domain: ``n_reach`` is an exact int64 sum — valid while
    Σ est_ball < 2^63 (up to ~3×10^9 nodes at full mutual reach; the
    HyperANF float path is the escape hatch beyond, as in Boldi & Vigna).
    """
    rounds = _hyperball_rounds(edges, radius, k, src_col, dst_col)
    r = int(radius)
    sums = rounds.agg(
        *[F.sum(f"_e{t}").cast("long").alias(f"_s{t}") for t in range(r + 1)]
    )
    stack = ", ".join(f"CAST({t} AS BIGINT), _s{t}" for t in range(r + 1))
    per_t = sums.selectExpr(
        f"stack({r + 1}, {stack}) AS (t, n_reach)", f"_s{r} AS _nr"
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("t")
    out = per_t.select(
        "t", "n_reach", F.expr(_frac_ppm_sql(ts.SPARK_DIALECT)).alias("frac_ppm")
    ).withColumn(
        "is_eff_diameter",
        (F.col("frac_ppm") >= int(eff_ppm))
        & (
            F.coalesce(F.lag("frac_ppm").over(w), F.lit(0)) < int(eff_ppm)
        ),
    )
    return out


def _frac_ppm_sql(d: dict) -> str:
    """Overflow-safe ppm share over (n_reach, _nr) — identical both engines.

    ``n_reach·10^6`` overflows int64 once N(r) passes ~9.2e12 (well inside
    the sums the P²-universe estimates produce), so both operands are
    pre-scaled by G = 1 + _nr div 2^42 — after which numerator·10^6 ≤
    2^42·10^6 < 2^62. G = 1 (exact) until N(r) ≈ 4.4e12; beyond, the ppm
    value is deterministic on both engines with ≤ ~2 ppm scaling error.
    The least() clamp pins the t = radius row to exactly 10^6.
    """
    g = f"(1 + {d['idiv'].format(a='_nr', b=str(1 << 42))})"
    num = f"({d['idiv'].format(a='n_reach', b=g)} * 1000000)"
    den = f"greatest({d['idiv'].format(a='_nr', b=g)}, 1)"
    return f"CAST(least(1000000, {d['idiv'].format(a=num, b=den)}) AS BIGINT)"


def neighborhood_function_sql(
    edges_sql: str,
    radius: int = 3,
    k: int = KMV_K,
    src_col: str = "src",
    dst_col: str = "dst",
    eff_ppm: int = 900_000,
) -> str:
    """DuckDB oracle: identical sums, shares, and first-crossing flag."""
    chain = _hyperball_rounds_sql(edges_sql, radius, k, src_col, dst_col)
    r = int(radius)
    sums = ", ".join(
        f"CAST(sum(_e{t}) AS BIGINT) AS _s{t}" for t in range(r + 1)
    )
    unpiv = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS t, _s{t} AS n_reach, _s{r} AS _nr "
        f"FROM _sums"
        for t in range(r + 1)
    )
    frac = _frac_ppm_sql(ts.DUCK_DIALECT)
    return f"""{chain},
_sums AS (SELECT {sums} FROM _hb),
_pt AS ({unpiv}),
_fr AS (SELECT t, n_reach, {frac} AS frac_ppm
        FROM _pt)
SELECT t, n_reach, frac_ppm,
       frac_ppm >= {int(eff_ppm)} AND
         COALESCE(lag(frac_ppm) OVER (ORDER BY t), 0) < {int(eff_ppm)}
         AS is_eff_diameter
FROM _fr"""
