"""Cross-engine parity fuzz for the integer fixed-point ln kernel (r5).

``textstats.lnq_sql`` / ``lnq_wide_sql`` replaced libm ln in every
quantized selection path after the r4 driver gate proved IEEE chains are
not environment-proof. These tests pin the three-way contract: the Spark
expression, the DuckDB expression and the Python spec replica
(``lnq_py`` / ``lnq_wide_py``) agree bit-for-bit on random draws over the
full documented domain, and the spec tracks true ln within the documented
accuracy bound (~3e-5 nats for m < 2^46, ~5e-5 over the wide domain —
the rounded k·ln2 term contributes up to k/2 q-units).
"""

from __future__ import annotations

import math
import random

import duckdb
from pyspark.sql import functions as F

from scrape_spark.functions import textstats as ts


def _draws(lo: int, hi: int, n: int, seed: int) -> list[int]:
    rng = random.Random(seed)
    edge = [lo, lo + 1, 127, 128, 129, 255, 256, hi - 1, hi]
    draws = [rng.randrange(lo, hi) for _ in range(n)]
    # log-uniform spread too — plain randrange almost never hits small m
    draws += [
        int(math.exp(rng.uniform(0, math.log(hi)))) or 1 for _ in range(n)
    ]
    return sorted({min(max(v, lo), hi) for v in edge + draws})


def test_lnq_three_way_parity(spark):
    vals = _draws(1, (1 << 46) - 1, 150, seed=5)
    duck = {
        m: v
        for m, v in duckdb.sql(
            f"SELECT m, {ts.lnq_sql('m', ts.DUCK_DIALECT)} AS v "
            f"FROM (SELECT unnest({vals}) AS m)"
        ).fetchall()
    }
    sdf = spark.createDataFrame([(m,) for m in vals], "m long")
    got = {
        r["m"]: r["v"]
        for r in sdf.select(
            "m", F.expr(ts.lnq_sql("m", ts.SPARK_DIALECT)).alias("v")
        ).collect()
    }
    for m in vals:
        spec = ts.lnq_py(m)
        assert got[m] == spec, (m, got[m], spec)
        assert duck[m] == spec, (m, duck[m], spec)
        assert abs(spec / ts._LNQ_Q - math.log(m)) < 3.5e-5, m


def test_lnq_wide_three_way_parity(spark):
    vals = _draws(1, (1 << 62) - 1, 150, seed=7)
    duck = {
        m: v
        for m, v in duckdb.sql(
            f"SELECT m, {ts.lnq_wide_sql('m', ts.DUCK_DIALECT)} AS v "
            f"FROM (SELECT unnest({vals}) AS m)"
        ).fetchall()
    }
    sdf = spark.createDataFrame([(m,) for m in vals], "m long")
    got = {
        r["m"]: r["v"]
        for r in sdf.select(
            "m", F.expr(ts.lnq_wide_sql("m", ts.SPARK_DIALECT)).alias("v")
        ).collect()
    }
    for m in vals:
        spec = ts.lnq_wide_py(m)
        assert got[m] == spec, (m, got[m], spec)
        assert duck[m] == spec, (m, duck[m], spec)
        assert abs(spec / ts._LNQ_Q - math.log(m)) < 5e-5, m


def test_lnq_monotone_on_small_domain():
    """Score kernels compare lnq differences; non-monotonicity would let a
    LARGER count score a SMALLER log. Exhaustive over the dense low range
    plus stratified spot checks above it."""
    prev = ts.lnq_py(1)
    for m in range(2, 5000):
        cur = ts.lnq_py(m)
        assert cur >= prev, m
        prev = cur
    rng = random.Random(11)
    for _ in range(2000):
        m = rng.randrange(1, (1 << 46) - 2)
        assert ts.lnq_py(m + 1) >= ts.lnq_py(m), m
