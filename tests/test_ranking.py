"""BM25 lexical retrieval: scoring semantics + postings-path equivalence."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from scrape_spark.operators.ranking import (
    bm25_over_postings,
    bm25_topk,
    bm25_topk_sql,
    term_postings,
)

DOCS = [
    (1, "spark runs fast and spark scales"),
    (2, "window functions over sorted frames"),
    (3, "merge small files then merge again and merge once more"),
    (4, "nothing relevant here at all"),
    (5, ""),
    (6, "SPARK Window MERGE"),  # tokenization lowercases
    (7, "spark spark spark spark spark spark spark spark"),  # tf saturation
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _duck_topk(terms, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for r in DOCS:
        con.execute("INSERT INTO documents VALUES (?, ?)", list(r))
    sql = bm25_topk_sql("SELECT doc_id, text FROM documents", terms, k=k)
    return sorted(con.sql(sql).fetchall())


def test_bm25_matches_duckdb_and_drops_nonmatching_docs(spark):
    got = sorted(
        tuple(r)
        for r in bm25_topk(_docs(spark), ["spark", "window", "merge"], k=10)
        .select("doc_id", "score", "rank")
        .collect()
    )
    assert got == _duck_topk(["spark", "window", "merge"], 10)
    ids = {r[0] for r in got}
    assert 4 not in ids and 5 not in ids  # score-0 docs dropped
    assert 6 in ids  # query and text both lowercased


def test_tf_saturation_caps_the_spam_doc(spark):
    """Doc 7 (8x 'spark') must not score 8x doc 1 (2x 'spark')."""
    rows = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_docs(spark), ["spark"], k=10).collect()
    }
    assert rows[7] < 4 * rows[1]


def test_rare_term_outscores_common_term_at_equal_tf(spark):
    """idf ordering: a term in 1 doc beats a term in 3 docs."""
    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(1, 4)]
        + [(4, "common rareword")],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, ["common", "rareword"], k=10).collect()
    }
    # doc 4 has both terms; its rareword part alone must beat any
    # common-only doc (same doclen, same tf).
    assert scores[4] > 2 * max(scores[i] for i in (1, 2, 3))


def test_postings_path_equals_literal_path(spark):
    docs = _docs(spark)
    terms = ["spark", "window", "merge"]
    lit = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_topk(docs, terms, k=10).collect()
    }
    post = term_postings(docs)
    n = docs.count()
    sumlen = docs.select(
        F.sum(F.size(F.split(F.lower("text"), " "))).alias("s")
    ).collect()[0]["s"]
    idx = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_over_postings(post, terms, n, int(sumlen), k=10).collect()
    }
    # bit-identical, not approx: the postings path folds its partials in
    # query-term order, matching the literal path's IEEE sum exactly
    assert idx == lit


def test_postings_build_tf_and_doclen(spark):
    rows = {
        (r["term"], r["doc_id"]): (r["tf"], r["doclen"])
        for r in term_postings(_docs(spark)).collect()
    }
    assert rows[("spark", 1)] == (2, 6)
    assert rows[("merge", 3)] == (3, 10)
    assert ("", 5) not in rows  # empty tokens never indexed
    assert ("spark", 6) in rows  # lowercased at build time


def test_quote_in_term_is_escaped(spark):
    docs = spark.createDataFrame(
        [(1, "it's fine"), (2, "its fine")], "doc_id long, text string"
    )
    got = bm25_topk(docs, ["it's"], k=5).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_scores_reproduce_the_textbook_formula(spark):
    """One hand-computed score: doc 2, query 'window' over DOCS."""
    n, sumlen = len(DOCS), sum(len(t.split(" ")) for _, t in DOCS)
    df = 2  # docs 2 and 6
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    tf, doclen = 1.0, 5.0
    tfp = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * doclen / (sumlen / n)))
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_docs(spark), ["window"], k=5).collect()
    }
    # r5: idf rides the integer lnq table (3e-5-nat accuracy; libm left
    # the kernel so scores are environment-proof) — textbook agreement to
    # the table bound, and BIT-exact agreement with the table spec.
    assert got[2] == pytest.approx(idf * tfp, rel=1e-4)
    from scrape_spark.functions.textstats import _LNQ_Q, _lnq_tables

    t, ln2q = _lnq_tables()

    def lnq(m):
        k = m.bit_length() - 1
        p = 1 << k
        i = (m * 128) // p - 128
        f16 = ((m * 128) % p) * 65536 // p
        return k * ln2q + t[i] + (t[i + 1] - t[i]) * f16 // 65536

    idf_q = (lnq(2 * n + 2) - lnq(2 * df + 1)) / float(_LNQ_Q)
    assert got[2] == idf_q * tfp


def test_postings_delta_matches_full_rebuild(spark):
    """apply(build(old), delta(old->new)) == build(new), all statuses."""
    from scrape_spark.operators.ranking import (
        apply_postings_delta,
        postings_delta,
    )

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma gamma delta"), (3, "kept the same")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "gamma replaced"), (3, "kept the same"), (4, "fresh words")],
        "doc_id long, text string",
    )
    diff = spark.createDataFrame(
        [(1, "removed"), (2, "changed"), (3, "unchanged"), (4, "added")],
        "doc_id long, status string",
    )
    adds, dels = postings_delta(diff, new)
    got = sorted(
        tuple(r)
        for r in apply_postings_delta(
            term_postings(old), adds, dels
        ).collect()
    )
    want = sorted(tuple(r) for r in term_postings(new).collect())
    assert got == want
    # unchanged docs were never re-tokenized: no doc-3 rows in the delta
    assert not [r for r in adds.collect() if r["doc_id"] == 3]
    assert sorted(r["doc_id"] for r in dels.collect()) == [1, 2]


def test_snippet_window_edges_and_no_hit(spark):
    from scrape_spark.operators.ranking import with_snippet

    docs = spark.createDataFrame(
        [
            (1, "spark at the very start of this line"),
            (2, "this line ends with the word spark"),
            (3, "mid one two spark three four tail"),
            (4, "no match anywhere"),
            (5, ""),
            (6, "MERGE uppercase hit"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["snippet"]
        for r in with_snippet(docs, ["spark", "merge"], width=2).collect()
    }
    assert got[1] == "spark at the"  # window clamps at the left edge
    assert got[2] == "the word spark"  # clamps at the right edge
    assert got[3] == "one two spark three four"
    assert got[4] == "" and got[5] == ""
    assert got[6] == "merge uppercase hit"  # lowercased tokens


def test_snippet_picks_first_hit_of_any_term(spark):
    from scrape_spark.operators.ranking import with_snippet

    docs = spark.createDataFrame(
        [(1, "a merge b c d spark e")], "doc_id long, text string"
    )
    got = with_snippet(docs, ["spark", "merge"], width=1).collect()[0]
    assert got["snippet"] == "a merge b"


def test_pmi_sign_separates_attractors_from_repellers(spark):
    """Terms co-occurring above/below chance get positive/negative PMI."""
    import math

    from scrape_spark.operators.ranking import term_cooccurrence

    # seed in docs 1-4; 'buddy' rides along in all of them (pmi > 0),
    # 'loner' only ever appears without the seed... but min support needs
    # n_both >= 1, so give it one overlap out of four occurrences.
    docs = spark.createDataFrame(
        [
            (1, "seed buddy"),
            (2, "seed buddy"),
            (3, "seed buddy"),
            (4, "seed buddy loner"),
            (5, "loner filler"),
            (6, "loner filler"),
            (7, "loner filler"),
            (8, "filler alone"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["term"]: r
        for r in term_cooccurrence(docs, "seed", min_docs=1).collect()
    }
    n = 8
    n_seed = 4
    assert got["buddy"]["n_both"] == 4 and got["buddy"]["n_term"] == 4
    # r5: pmi rides the integer lnq table (environment-proof); abs
    # tolerance covers the 4-lookup error budget (4 × 3e-5 nats).
    assert got["buddy"]["pmi"] == pytest.approx(
        math.log((4 * n) / (4 * n_seed)), abs=1.5e-4
    )
    assert got["buddy"]["pmi"] > 0
    assert got["loner"]["pmi"] < 0  # 1 of 4 with seed vs 4/8 base rate
    assert "seed" not in got  # seed itself excluded


def test_duplicate_and_mixed_case_terms_score_once(spark):
    """['Spark','spark','merge'] must equal ['spark','merge'] exactly, on
    both paths (the duplicate would otherwise double its score part)."""
    docs = _docs(spark)
    base = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_topk(docs, ["spark", "merge"], k=10).collect()
    }
    dup = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_topk(docs, ["Spark", "spark", "merge"], k=10).collect()
    }
    assert dup == base
    assert _duck_topk(["Spark", "spark", "merge"], 10) == _duck_topk(
        ["spark", "merge"], 10
    )
    post = term_postings(docs)
    n = docs.count()
    sumlen = docs.select(
        F.sum(F.size(F.split(F.lower("text"), " "))).alias("s")
    ).collect()[0]["s"]
    idx = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_over_postings(
            post, ["Spark", "spark", "merge"], n, int(sumlen), k=10
        ).collect()
    }
    assert idx == base


def test_empty_terms_rejected_everywhere(spark):
    from scrape_spark.operators.ranking import (
        bm25_over_postings,
        snippet_sql,
        with_snippet,
    )
    from scrape_spark.functions import textstats as tstats
    from scrape_spark.operators.webrank import topic_url_priority_expr

    docs = _docs(spark)
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk_sql("SELECT 1", [])
    with pytest.raises(ValueError):
        bm25_over_postings(term_postings(docs), [], 1, 1)
    with pytest.raises(ValueError):
        snippet_sql("text", [], tstats.DUCK_DIALECT)
    with pytest.raises(ValueError):
        with_snippet(docs, [])
    with pytest.raises(ValueError):
        topic_url_priority_expr([])


# ---------------------------------------------------------------------------
# PostingsIndex: standing index lifecycle (build / update / compact / query)
# ---------------------------------------------------------------------------


def _live_topk(spark, corpus_rows, terms, k=10):
    docs = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_topk(docs, terms, k=k).collect()
    }


def test_postings_index_lifecycle_tracks_live_corpus(spark, tmp_path):
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.operators.ranking import PostingsIndex

    store = SnapshotStore(spark, str(tmp_path / "idx"))
    idx = PostingsIndex(store)
    terms = ["spark", "merge"]

    v1 = [(1, "spark runs"), (2, "merge files"), (3, ""), (4, "plain words")]
    idx.build(spark.createDataFrame(v1, "doc_id long, text string"))
    # stats follow the bm25_topk convention: the empty doc counts (doclen 1)
    assert idx.stats() == {"n_docs": 4, "sumlen": 2 + 2 + 1 + 2}
    assert {
        r["doc_id"]: (r["score"], r["rank"]) for r in idx.query(terms).collect()
    } == _live_topk(spark, v1, terms)

    # update 1: change 1, remove 2, add 5 (empty!) and 6
    v2 = [(1, "spark spark merge"), (3, ""), (4, "plain words"),
          (5, ""), (6, "merge me")]
    diff = spark.createDataFrame(
        [(1, "changed"), (2, "removed"), (3, "unchanged"),
         (4, "unchanged"), (5, "added"), (6, "added")],
        "doc_id long, status string",
    )
    idx.update(diff, spark.createDataFrame(v2, "doc_id long, text string"))
    assert idx.stats() == {"n_docs": 5, "sumlen": 3 + 1 + 2 + 1 + 2}
    assert {
        r["doc_id"]: (r["score"], r["rank"]) for r in idx.query(terms).collect()
    } == _live_topk(spark, v2, terms)

    # compact, then another update on top of the compacted base
    idx.compact()
    assert idx.stats() == {"n_docs": 5, "sumlen": 9}
    assert {
        r["doc_id"]: (r["score"], r["rank"]) for r in idx.query(terms).collect()
    } == _live_topk(spark, v2, terms)

    v3 = [(1, "spark spark merge"), (3, "now has spark text"),
          (4, "plain words"), (6, "merge me")]
    diff2 = spark.createDataFrame(
        [(1, "unchanged"), (3, "changed"), (4, "unchanged"),
         (5, "removed"), (6, "unchanged")],
        "doc_id long, status string",
    )
    idx.update(diff2, spark.createDataFrame(v3, "doc_id long, text string"))
    assert idx.stats() == {"n_docs": 4, "sumlen": 3 + 4 + 2 + 2}
    assert {
        r["doc_id"]: (r["score"], r["rank"]) for r in idx.query(terms).collect()
    } == _live_topk(spark, v3, terms)

    # the fold equals a from-scratch rebuild, markers included
    rebuilt = PostingsIndex(SnapshotStore(spark, str(tmp_path / "idx2")))
    rebuilt.build(spark.createDataFrame(v3, "doc_id long, text string"))
    assert sorted(
        tuple(r) for r in idx.postings().collect()
    ) == sorted(tuple(r) for r in rebuilt.postings().collect())
    assert rebuilt.stats() == idx.stats()


def test_postings_index_query_before_build_raises(spark, tmp_path):
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.operators.ranking import PostingsIndex

    idx = PostingsIndex(SnapshotStore(spark, str(tmp_path / "idx")))
    with pytest.raises(KeyError):
        idx.stats()
    with pytest.raises(KeyError):
        idx.postings()


# ---------------------------------------------------------------------------
# positional postings + phrase queries
# ---------------------------------------------------------------------------
_PHRASE_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown   fox and the quick brown fox again"),
    (2, "brown quick fox wrong order"),
    (3, "the cat the hat the cat the"),
    (4, "QUICK BROWN FOX uppercase fold"),
    (5, ""),
]


def _phrase_docs_sql() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in _PHRASE_DOCS)
    return f"SELECT * FROM (VALUES {vals}) t(doc_id, text)"


def _pm(spark, phrase):
    from scrape_spark.operators.ranking import phrase_match, positional_postings

    df = spark.createDataFrame(_PHRASE_DOCS, "doc_id long, text string")
    return sorted(
        map(tuple, phrase_match(positional_postings(df), phrase).collect())
    )


def test_positional_postings_shape(spark):
    from scrape_spark.operators.ranking import positional_postings

    df = spark.createDataFrame(_PHRASE_DOCS, "doc_id long, text string")
    idx = {
        (r["term"], r["doc_id"]): (list(r["positions"]), r["tf"], r["doclen"])
        for r in positional_postings(df).collect()
    }
    # positions are 1-based over the EMPTY-FILTERED token stream
    assert idx[("fox", 1)] == ([3, 8], 2, 9)  # double space collapsed
    assert idx[("the", 3)] == ([1, 3, 5, 7], 4, 7)
    assert ("", 5) not in idx  # empty doc contributes nothing


def test_phrase_match_semantics_and_duckdb(spark):
    import duckdb

    from scrape_spark.operators.ranking import phrase_scan_sql

    for phrase in (
        ["quick", "brown", "fox"],
        ["the", "cat", "the"],   # repeated term
        ["fox"],                  # single term
        ["lazy", "dog"],
        ["dog", "lazy"],          # order matters: no hit
        ["absent", "fox"],        # missing term: no hit
    ):
        got = _pm(spark, phrase)
        want = sorted(
            map(
                tuple,
                duckdb.sql(phrase_scan_sql(_phrase_docs_sql(), phrase)).fetchall(),
            )
        )
        assert got == want, phrase
    # pinned values: doc1 has two 'quick brown fox' occurrences, case-folded
    assert _pm(spark, ["quick", "brown", "fox"]) == [
        (0, 1, 2), (1, 2, 1), (4, 1, 1)
    ]


def test_phrase_match_rejects_empty(spark):
    import pytest as _pt

    from scrape_spark.operators.ranking import phrase_match, positional_postings

    df = spark.createDataFrame(_PHRASE_DOCS, "doc_id long, text string")
    idx = positional_postings(df)
    with _pt.raises(ValueError):
        phrase_match(idx, [])
    with _pt.raises(ValueError):
        phrase_match(idx, ["ok", ""])
