"""Product-quantization (ADC) tests: lossless degradation, determinism,
recall floor vs exact L2, and the codes-only-scan plan shape."""

import math
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scrape_spark.operators.similarity import (
    pq_codebooks,
    pq_encode,
    pq_index,
    pq_topk,
)

DIM, M = 16, 4


def _synth_emb(spark, n=60, dim=DIM):
    """Deterministic synthetic vectors: v[j] = affine-hash(i, j) scaled."""
    rows = [
        (
            i,
            [((i * 1_000_003 + j * 769_121 + 12_289) % 997) / 997.0 for j in range(dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _exact_l2_topk(spark, emb, queries, k):
    q = queries.select(F.col("query_id"), F.col("embedding").alias("qv"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "l2",
            F.expr(
                "aggregate(zip_with(embedding, qv, (x, y) -> "
                "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
                "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
                "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "l2")
    )


@pytest.fixture(scope="module")
def emb(spark):
    return _synth_emb(spark).cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_stride1_is_exact_l2(spark, emb, queries):
    """stride=1 codebooks are lossless: ADC == brute-force squared L2."""
    cb, codes = pq_index(emb, m=M, stride=1, dim=DIM)
    got = {
        (r.query_id, r.rank): (r.vec_id, r.adist)
        for r in pq_topk(codes, cb, queries, k=8, m=M, dim=DIM).collect()
    }
    want = {
        (r.query_id, r.rank): (r.vec_id, r.l2)
        for r in _exact_l2_topk(spark, emb, queries, 8).collect()
    }
    assert set(got) == set(want)
    for key, (vid, adist) in got.items():
        wvid, wl2 = want[key]
        assert vid == wvid
        assert math.isclose(adist, wl2, rel_tol=1e-9, abs_tol=1e-12)


def test_encode_deterministic(spark, emb):
    cb = pq_codebooks(emb, m=M, stride=10, dim=DIM)
    a = sorted(map(tuple, pq_encode(emb, cb, m=M, dim=DIM).collect()))
    b = sorted(map(tuple, pq_encode(emb, cb, m=M, dim=DIM).collect()))
    assert a == b
    # codes are dense ranks within the codebook
    ksub = emb.where(F.col("vec_id") % 10 == 0).count()
    for _, codes in a:
        assert len(codes) == M
        assert all(0 <= c < ksub for c in codes)


def test_recall_floor_vs_exact(spark, emb, queries):
    """Coarse codebooks still recover most true L2 neighbors."""
    cb, codes = pq_index(emb, m=M, stride=10, dim=DIM)
    approx = pq_topk(codes, cb, queries, k=10, m=M, dim=DIM).collect()
    exact = _exact_l2_topk(spark, emb, queries, 10).collect()
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    recall = len(approx_set & exact_set) / len(exact_set)
    assert recall >= 0.4, f"recall {recall}"


def test_codes_scan_never_reads_vectors(spark, emb, queries):
    """The standing-index path: the ADC scan reads codes only — the vector
    column never appears in the scored side's read schema."""
    tmp = tempfile.mkdtemp(prefix="pq_codes_")
    try:
        cb, codes = pq_index(emb, m=M, stride=10, dim=DIM)
        codes.write.mode("overwrite").parquet(os.path.join(tmp, "codes"))
        stored = spark.read.parquet(os.path.join(tmp, "codes"))
        out = pq_topk(stored, cb, queries, k=5, m=M, dim=DIM)
        plan = out._jdf.queryExecution().executedPlan().toString()
        scan_lines = [
            ln for ln in plan.splitlines() if "codes" in ln and "Scan" in ln
        ]
        assert scan_lines, plan
        assert all("embedding" not in ln for ln in scan_lines)
        assert out.count() > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_empty_codebook_raises(spark, emb):
    with pytest.raises(ValueError):
        pq_codebooks(emb.where(F.col("vec_id") < 0), m=M, stride=1, dim=DIM)
    with pytest.raises(ValueError):
        pq_codebooks(emb, m=3, stride=10, dim=DIM)  # 16 % 3 != 0
