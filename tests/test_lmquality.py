"""LM-quality curation ops: CCNet perplexity buckets + DSIR weights."""

import math

from pyspark.sql import functions as F

from scrape_spark.operators.lmquality import (
    SCORE_Q,
    ccnet_buckets,
    ccnet_buckets_sql,
    dsir_weights,
    dsir_weights_sql,
    lm_cross_entropy,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _lnq(m: int) -> int:
    """Python replica of textstats.lnq_sql — the spec the engines implement."""
    from scrape_spark.functions.textstats import _lnq_tables

    t, ln2q = _lnq_tables()
    k = m.bit_length() - 1
    p = 1 << k
    i = (m * 128) // p - 128
    f16 = ((m * 128) % p) * 65536 // p
    return k * ln2q + t[i] + (t[i + 1] - t[i]) * f16 // 65536


def test_lm_cross_entropy_hand_computed(spark):
    # corpus: d1 = "a b a b", d2 = "a c"
    # bigram counts: (a,b)=2 (b,a)=1 (a,c)=1; contexts: a=3, b=1; V=3
    # p(b|a) = 3/6, p(a|b) = 2/4, p(c|a) = 2/6
    # CE(d1) = -(2 ln .5 + ln .5)/3 = ln 2;  CE(d2) = ln 3
    # Scores come off the integer lnq table (r5: doubles left the
    # selection path), so the goldens are the table-spec values — which
    # must ALSO land within the table's 3e-5-nat bound of true ln.
    from scrape_spark.functions.textstats import _LNQ_Q

    docs = _docs(spark, [(1, "a b a b"), (2, "a c")])
    got = {r["doc_id"]: r for r in lm_cross_entropy(docs).collect()}
    assert got[1]["n_bigrams"] == 3 and got[2]["n_bigrams"] == 1

    def ce_q6(terms, n):
        s = sum(tf * (_lnq(c1v) - _lnq(c12p)) for tf, c12p, c1v in terms)
        q1, r1 = divmod(s, n * _LNQ_Q)
        return q1 * SCORE_Q + r1 * SCORE_Q // (n * _LNQ_Q)

    exp1 = ce_q6([(2, 3, 6), (1, 2, 4)], 3)
    exp2 = ce_q6([(1, 2, 6)], 1)
    assert got[1]["ce_q6"] == exp1
    assert got[2]["ce_q6"] == exp2
    assert abs(exp1 - SCORE_Q * math.log(2.0)) < 60
    assert abs(exp2 - SCORE_Q * math.log(3.0)) < 60


def test_lm_skips_docs_without_bigrams(spark):
    docs = _docs(spark, [(1, "only"), (2, ""), (3, "  "), (4, "two words")])
    got = {r["doc_id"] for r in lm_cross_entropy(docs).collect()}
    assert got == {4}


def test_lm_in_distribution_scores_better(spark):
    # ten copies of one sentence vs one doc of corpus-unique words: the
    # repeated doc's bigrams dominate the model => lower cross-entropy
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((99, "zq xw vv kj pq mn"))
    got = {r["doc_id"]: r["ce_q6"] for r in lm_cross_entropy(_docs(spark, rows)).collect()}
    assert got[0] < got[99]
    assert all(got[i] == got[0] for i in range(10))


def test_ccnet_buckets_value_order_and_sharing(spark):
    rows = [(i, "the cat sat on the mat") for i in range(4)]
    rows += [(10, "the cat sat on a rug"), (11, "a dog ran to the cat")]
    rows += [(20, "zq xw vv kj pq mn"), (21, "aa bb cc dd ee ff")]
    out = ccnet_buckets(_docs(spark, rows)).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["ppl_bucket"], []).append(r["ce_q6"])
    # value-ordered: every head score <= every middle <= every tail
    if "head" in by_bucket and "middle" in by_bucket:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    if "middle" in by_bucket and "tail" in by_bucket:
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # equal scores share a bucket: the four identical docs agree
    ident = {r["ppl_bucket"] for r in out if r["doc_id"] < 4}
    assert len(ident) == 1


def test_dsir_weights_separate_target_domain(spark):
    # target docs share a bigram vocabulary; out-domain docs use another
    rows = [(i, "alpha beta alpha beta", True) for i in range(5)]
    rows += [(10 + i, "gamma delta gamma delta", False) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_target boolean")
    got = {r["doc_id"]: r["logw_q6"] for r in dsir_weights(docs).collect()}
    assert got[0] > 0 > got[10]
    assert all(got[i] == got[0] for i in range(5))


def test_lm_and_dsir_match_duckdb(spark):
    import duckdb

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the rug", "en"),
        (3, "le chat est sur le tapis", "fr"),
        (4, "der hund sitzt auf dem teppich", "de"),
        (5, "the cat and the dog", "en"),
        (6, "un deux trois quatre", "fr"),
        (7, "one", "en"),  # no bigrams: must drop from both engines
        (8, "", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO documents VALUES (?, ?, ?)", list(r))

    got = sorted(
        (r["doc_id"], r["n_bigrams"], r["ce_q6"], r["ppl_bucket"])
        for r in ccnet_buckets(docs).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            ccnet_buckets_sql("SELECT doc_id, text FROM documents")
        ).fetchall()
    )
    assert got == want
    assert {g[0] for g in got} == {1, 2, 3, 4, 5, 6}

    d2 = docs.withColumn("is_target", F.col("lang") == "en")
    got2 = sorted(
        (r["doc_id"], r["n_feats"], r["logw_q6"])
        for r in dsir_weights(d2).collect()
    )
    want2 = sorted(
        tuple(r)
        for r in con.execute(
            dsir_weights_sql(
                "SELECT doc_id, text, lang = 'en' AS is_target FROM documents"
            )
        ).fetchall()
    )
    assert got2 == want2


# -- linear classifier inference ----------------------------------------------


def test_classifier_score_hand_computed(spark):
    from scrape_spark.operators.lmquality import classifier_score

    docs = _docs(spark, [(1, "Good good bad"), (2, "meh meh"), (3, "")])
    weights = spark.createDataFrame(
        [("good", 10), ("bad", -30)], "token string, weight long"
    )
    got = {r["doc_id"]: r for r in classifier_score(docs, weights).collect()}
    # d1: tokens good,good,bad (lowercased) -> raw -10, mean -10/3
    assert got[1]["n_tokens"] == 3 and got[1]["raw_score"] == -10
    assert got[1]["score_q6"] == math.floor(1e6 * -10 / 3)
    assert not got[1]["label"]
    # d2: both OOV -> raw 0, label at threshold 0 is True
    assert got[2]["raw_score"] == 0 and got[2]["label"]
    # d3: zero tokens -> no row
    assert 3 not in got


def test_classifier_bias_threshold(spark):
    from scrape_spark.operators.lmquality import classifier_score

    docs = _docs(spark, [(1, "x y")])
    weights = spark.createDataFrame([("x", 4)], "token string, weight long")
    r = classifier_score(docs, weights, bias=6, threshold_q6=5_000_000).head()
    # raw = 4 + 6 = 10, mean 5.0 -> q6 exactly 5e6 -> label True
    assert r["raw_score"] == 10 and r["score_q6"] == 5_000_000 and r["label"]


def test_classifier_negative_floor_matches_duck(spark):
    """floor() on negative means must agree across engines (div-vs-floor trap)."""
    import duckdb

    from scrape_spark.operators.lmquality import (
        classifier_score,
        classifier_score_sql,
    )

    docs_rows = [(1, "a a b"), (2, "b c"), (3, "a c c")]
    w_rows = [("a", -7), ("c", 5)]
    docs = _docs(spark, docs_rows)
    weights = spark.createDataFrame(w_rows, "token string, weight long")
    got = sorted(
        map(tuple, classifier_score(docs, weights).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs_rows)
        + ") t(doc_id, text)"
    )
    con.execute(
        "CREATE TABLE w AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}', {v})" for t, v in w_rows)
        + ") t(token, weight)"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                classifier_score_sql(
                    "SELECT doc_id, text FROM d", "SELECT * FROM w"
                )
            ).fetchall(),
        )
    )
    assert got == want


# -- badword ratio -------------------------------------------------------------


def test_badword_stats(spark):
    from scrape_spark.operators.corpus import badword_stats

    docs = _docs(
        spark,
        [(1, "clean text only here"), (2, "BAD bad ok"), (3, "bad")],
    )
    words = spark.createDataFrame([("Bad",)], "word string")
    got = {r["doc_id"]: r for r in badword_stats(docs, words).collect()}
    assert got[1]["n_flagged"] == 0 and not got[1]["is_flagged"]
    # case-insensitive on both sides: 2/3 tokens flagged
    assert got[2]["n_flagged"] == 2
    assert got[2]["badword_ratio_q4"] == 10000 * 2 // 3
    assert got[2]["is_flagged"]
    assert got[3]["badword_ratio_q4"] == 10000 and got[3]["is_flagged"]


def test_classifier_mixed_case_vocab_matches(spark):
    """Model tokens are case-folded to the tokenizer's casing (review fix)."""
    from scrape_spark.operators.lmquality import classifier_score

    docs = _docs(spark, [(1, "The NASA probe")])
    weights = spark.createDataFrame(
        [("The", 10), ("NASA", 20)], "token string, weight long"
    )
    r = classifier_score(docs, weights).head()
    assert r["raw_score"] == 30
