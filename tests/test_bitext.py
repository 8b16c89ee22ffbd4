"""Margin-based bitext mining semantics (hub penalty, mutuality)."""

import math

from scrape_spark.operators.similarity import bitext_mine


def _frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mutual_pair_and_margin(spark):
    # src 0 and tgt 10 are near-identical; tgt 11 is a hub (moderately close
    # to everything); src 1 aligns with nothing in particular.
    src = _frame(
        spark,
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
    )
    tgt = _frame(
        spark,
        [
            (10, [0.99, 0.1, 0.0]),
            (11, [0.6, 0.6, 0.5]),
            (12, [0.0, 0.0, 1.0]),
        ],
    )
    rows = {r["src_id"]: r for r in bitext_mine(src, tgt, k=2, margin_threshold=0.0).collect()}
    r0 = rows[0]
    assert r0["tgt_id"] == 10 and r0["mutual"]
    # margin of the aligned pair beats the hub-matched src 1
    assert r0["margin"] > rows[1]["margin"]


def test_margin_formula(spark):
    src = _frame(spark, [(0, [1.0, 0.0])])
    tgt = _frame(spark, [(10, [1.0, 0.0]), (11, [0.0, 1.0])])
    r = bitext_mine(src, tgt, k=2, margin_threshold=0.0).first()
    # cos(0,10)=1, cos(0,11)=0 → favg=(1+0)/2=0.5
    # bwd: tgt10's only src is 0 → bavg(10)=1.0 (k=2 but one candidate)
    want = 1.0 / ((0.5 + 1.0) / 2)
    assert math.isclose(r["margin"], want, rel_tol=1e-9)
    assert r["mutual"]


def test_threshold_filters(spark):
    src = _frame(spark, [(0, [1.0, 0.0]), (1, [0.7, 0.7])])
    tgt = _frame(spark, [(10, [1.0, 0.0]), (11, [0.0, 1.0])])
    all_rows = bitext_mine(src, tgt, k=2, margin_threshold=0.0).collect()
    kept = bitext_mine(src, tgt, k=2, margin_threshold=1.2).collect()
    assert len(kept) < len(all_rows)
    assert all(r["margin"] >= 1.2 for r in kept)


def test_vectors_not_in_window_exchange(spark):
    src = _frame(spark, [(0, [1.0, 0.0])])
    tgt = _frame(spark, [(10, [1.0, 0.0])])
    plan = (
        bitext_mine(src, tgt)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "sv" not in line and "tv" not in line
