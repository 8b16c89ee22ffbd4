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
