"""Fixed-point classifier trainer: exact parity + learning behavior."""

from collections import Counter

from scrape_spark.operators.lmquality import (
    classifier_score,
    train_token_classifier,
    train_token_classifier_sql,
)

_DOCS = [
    (0, "good great fine good", 1),
    (1, "good solid good great", 1),
    (2, "bad awful bad poor", 0),
    (3, "bad poor awful terrible", 0),
    (4, "fine solid plain plain", 1),
    (5, "plain terrible plain bad", 0),
]


def _trunc_div(x: int, d: int) -> int:
    q = abs(x) // d
    return q if x >= 0 else -q


def _py_train(docs, n_iters, lr_den):
    """Pure-Python replica of the exact integer training arithmetic."""
    counts = []
    for _id, text, y in docs:
        c = Counter(t for t in text.lower().split() if t)
        n = sum(c.values())
        if n:
            counts.append((_id, y, c, n))
    n_docs = len(counts)
    w = {t: 0 for _, _, c, _ in counts for t in c}
    for _ in range(n_iters):
        grads = {t: 0 for t in w}
        for _id, y, c, n in counts:
            ws = sum(w[t] * cnt for t, cnt in c.items())
            s = _trunc_div(ws, n)
            p = max(0, min(1_000_000, 500_000 + _trunc_div(s, 4)))
            resid = p - y * 1_000_000
            for t, cnt in c.items():
                grads[t] += _trunc_div(resid * cnt, n)
        for t in w:
            w[t] -= _trunc_div(grads[t], lr_den * n_docs)
    return w


def _frame(spark, docs=_DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string, label int")


def test_trainer_matches_python_replica(spark):
    got = {
        r["token"]: r["weight_q6"]
        for r in train_token_classifier(_frame(spark), n_iters=3).collect()
    }
    assert got == _py_train(_DOCS, n_iters=3, lr_den=2)


def test_trainer_duckdb_parity(spark):
    import duckdb

    got = sorted(
        tuple(r)
        for r in train_token_classifier(_frame(spark), n_iters=2).collect()
    )
    docs_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text, {y} AS label"
        for i, t, y in _DOCS
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            train_token_classifier_sql(docs_sql, n_iters=2)
        ).fetchall()
    )
    assert got == want


def test_trained_weights_separate(spark):
    weights = train_token_classifier(_frame(spark), n_iters=4)
    by_tok = {r["token"]: r["weight_q6"] for r in weights.collect()}
    assert by_tok["good"] > 0 > by_tok["bad"]
    # held-out docs score on the right sides of 0 via the serving kernel
    held = spark.createDataFrame(
        [(10, "good great stuff"), (11, "awful bad junk")],
        "doc_id long, text string",
    )
    w = weights.selectExpr("token", "weight_q6 AS weight")
    scores = {
        r["doc_id"]: r["score_q6"]
        for r in classifier_score(held, w).collect()
    }
    assert scores[10] > scores[11]
