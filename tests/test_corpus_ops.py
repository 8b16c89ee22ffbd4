"""Corpus-level operators: repetition stats, quality rules, vocab, components."""

from pyspark.sql import functions as F

from scrape_spark.operators.corpus import (
    connected_components,
    gopher_rules,
    shingle_dup_stats,
    vocab_topk,
)


def _cc_dict(spark, edges, **kw):
    pairs = spark.createDataFrame(edges, "id_1 long, id_2 long")
    return {
        r["id"]: r["component_id"]
        for r in connected_components(pairs, **kw).collect()
    }


def test_connected_components_basic(spark):
    got = _cc_dict(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_path_graph(spark):
    # worst-case diameter: a 12-node path; pointer jumping must converge
    # well inside max_rounds (O(log d) rounds, not d)
    edges = [(i, i + 1) for i in range(1, 12)]
    got = _cc_dict(spark, edges, max_rounds=6)
    assert got == {i: 1 for i in range(1, 13)}


def test_connected_components_bridges_merge(spark):
    # two clusters joined by a late bridge edge collapse to one component
    got = _cc_dict(spark, [(1, 2), (3, 4), (2, 3)])
    assert set(got.values()) == {1}


def test_gopher_rules_flags(spark):
    # 62 words incl. two stopword hits ('the', 'of')
    long_ok = "the of " + " ".join(f"word{i}" for i in range(60))
    short = "tiny doc the end"  # 4 words < 50
    no_stop = " ".join(f"w{i}" for i in range(60))  # no en stopwords
    docs = spark.createDataFrame(
        [(1, long_ok), (2, short), (3, no_stop)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[1]["rule_words"] and rows[1]["rule_stopwords"]
    assert rows[1]["passes"]
    assert not rows[2]["rule_words"] and not rows[2]["passes"]
    assert not rows[3]["rule_stopwords"] and not rows[3]["passes"]
    assert rows[1]["n_words"] == 62 and rows[2]["n_words"] == 4


def test_vocab_topk_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "b a c a b z"), (2, "c b q")], "doc_id long, text string"
    )
    rows = vocab_topk(docs, k=3).collect()
    # counts: a=2 b=3 c=2 z=1 q=1 → top3 = b(3), a(2), c(2) — ties token-asc
    assert [(r["token"], r["n"]) for r in rows] == [("b", 3), ("a", 2), ("c", 2)]


def test_shingle_dup_stats(spark):
    shared = "alpha beta gamma delta epsilon"  # identical docs → all shared
    unique = "zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, shared), (2, shared), (3, unique)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in shingle_dup_stats(docs).collect()}
    # 5 words → 3 word-3-gram shingles per doc
    assert rows[1]["n_shingles"] == 3 and rows[1]["n_shared"] == 3
    assert rows[1]["shared_ratio_q4"] == 10000
    assert rows[2]["n_shared"] == 3
    assert rows[3]["n_shared"] == 0 and rows[3]["shared_ratio_q4"] == 0


def test_shingle_dup_short_docs_drop(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in shingle_dup_stats(docs).collect()}
    assert 1 not in rows  # < 3 words → no shingles → no row
    assert rows[2]["n_shingles"] == 2


def test_stratified_sample_deterministic_topk(spark):
    from pyspark.sql import functions as F

    from scrape_spark.operators.corpus import stratified_sample

    rows = [(i, "en" if i % 3 else "ja") for i in range(1, 61)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    key = (F.col("doc_id") * 1103515245 + 12345) % 2147483647
    got = stratified_sample(df, ["lang"], 4, key, tiebreak_cols=["doc_id"]).collect()
    # exactly k per stratum, ranks contiguous from 1
    by_lang: dict = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append((r["sample_rank"], r["doc_id"]))
    assert {l: len(v) for l, v in by_lang.items()} == {"en": 4, "ja": 4}
    # matches the plain python argsort of the same key — and reruns agree
    for lang, members in by_lang.items():
        pool = [i for i, l in rows if l == lang]
        expect = sorted(pool, key=lambda i: ((i * 1103515245 + 12345) % 2147483647, i))[:4]
        assert [d for _, d in sorted(members)] == expect
    again = stratified_sample(df, ["lang"], 4, key, tiebreak_cols=["doc_id"]).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))


def test_stratified_sample_multi_strata_and_small_groups(spark):
    from pyspark.sql import functions as F

    from scrape_spark.operators.corpus import stratified_sample

    df = spark.createDataFrame(
        [(1, "en", "a.com"), (2, "en", "a.com"), (3, "en", "b.com"), (4, "ja", "a.com")],
        "doc_id long, lang string, host string",
    )
    key = (F.col("doc_id") * 7 + 3) % 101
    got = stratified_sample(df, ["lang", "host"], 5, key).collect()
    # groups smaller than k are returned whole; helper columns dropped
    assert len(got) == 4
    assert set(got[0].asDict()) == {"doc_id", "lang", "host", "sample_rank"}


def test_blocklist_suffix_semantics(spark):
    from scrape_spark.operators.corpus import blocklist_filter

    rows = [
        ("http://bad.test/", "bad.test"),          # exact hit
        ("http://sub.bad.test/", "sub.bad.test"),  # subdomain hit
        ("http://notabad.test/", "notabad.test"),  # substring, NOT a hit
        ("http://good.test/", "good.test"),        # clean
        ("http://a.b.tracker.x.test/", "a.b.tracker.x.test"),  # deep suffix
    ]
    df = spark.createDataFrame(rows, "url string, host string")
    blocked = ["bad.test", "tracker.x.test"]
    got = {
        r["host"]: r["is_blocked"]
        for r in blocklist_filter(df, blocked).collect()
    }
    assert got == {
        "bad.test": True,
        "sub.bad.test": True,
        "notabad.test": False,
        "good.test": False,
        "a.b.tracker.x.test": True,
    }
    # DataFrame blocklist branch (exploded broadcast equi-join) agrees
    bl = spark.createDataFrame([(d,) for d in blocked], "domain string")
    got_df = {
        r["host"]: r["is_blocked"]
        for r in blocklist_filter(df, bl).collect()
    }
    assert got_df == got


def test_contamination_eval_self_and_disjoint(spark):
    from scrape_spark.operators.corpus import contamination_check

    eval_text = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, eval_text),                      # the eval doc itself: 100%
            (2, "one two three four five six"),  # disjoint: 0%
            (3, "alpha beta gamma delta qq rr"), # partial overlap
            (4, "xy zz"),                        # < SHINGLE_K words: drops out
        ],
        "doc_id long, text string",
    )
    out = contamination_check(
        docs, docs.where("doc_id = 1"), threshold_q4=2000
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["overlap_q4"] == 10000 and rows[1]["contaminated"]
    assert rows[2]["n_eval_hits"] == 0 and not rows[2]["contaminated"]
    assert 0 < rows[3]["n_eval_hits"] < rows[3]["n_shingles"]
    assert rows[3]["contaminated"]  # 2/4 shingles shared = 5000 >= 2000


def test_pack_sequences_offset_invariants(spark):
    from scrape_spark.operators.corpus import pack_sequences

    # 10 docs of 3 tokens each, one shard, budget 7:
    # start offsets 0,3,6,9,... -> bins 0,0,0,1,1,2,2,3,3,3
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget=7, n_shards=1).orderBy("doc_id")
    rows = out.collect()
    assert [r["bin_id"] for r in rows] == [0, 0, 0, 1, 1, 2, 2, 3, 3, 3]
    assert all(r["shard_id"] == 0 and r["n_tokens"] == 3 for r in rows)
    # sharded: bin ids are per-shard streams, monotone in doc order
    out2 = pack_sequences(docs, budget=6, n_shards=2).collect()
    by_shard = {}
    for r in sorted(out2, key=lambda r: r["doc_id"]):
        by_shard.setdefault(r["shard_id"], []).append(r["bin_id"])
    assert set(by_shard) == {0, 1}
    for bins in by_shard.values():
        assert bins == sorted(bins)  # monotone
        assert bins[0] == 0
    # 5 docs x 3 tokens per shard, budget 6 -> start offsets 0,3,6,9,12
    assert by_shard[0] == [0, 0, 1, 1, 2]


def test_dedup_retain_keeps_representatives(spark):
    from scrape_spark.operators.corpus import dedup_retain

    docs = spark.createDataFrame(
        [(i, "x") for i in range(1, 8)], "doc_id long, lang string"
    )
    # clusters {1,2,3} and {5,6}; 4 and 7 unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_1 long, id_2 long"
    )
    kept = sorted(r["doc_id"] for r in dedup_retain(docs, pairs).collect())
    assert kept == [1, 4, 5, 7]


def test_doc_repetition_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),  # 3 lines, 1 duplicate
            (2, "p q p q p q"),  # bigrams: pq qp pq qp pq -> top 3 of 5
            (3, "solo"),  # no bigrams, one line
        ],
        "doc_id long, text string",
    )
    from scrape_spark.operators.corpus import doc_repetition

    rows = {r["doc_id"]: r for r in doc_repetition(docs).collect()}
    assert rows[1]["dup_line_frac_q4"] == 3333  # floor(1e4 * 1/3)
    assert rows[2]["dup_line_frac_q4"] == 0
    assert rows[2]["top_bigram_cover_q4"] == 6000  # floor(1e4 * 3/5)
    assert rows[3]["dup_line_frac_q4"] == 0
    assert rows[3]["top_bigram_cover_q4"] == 0  # under two words


def test_line_dedup_drops_corpus_dup_lines(spark):
    docs = spark.createDataFrame(
        [(1, "x y\nz w\nx y"), (2, "z w\nq r")], "doc_id long, text string"
    )
    from scrape_spark.operators.corpus import line_dedup

    rows = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    # doc 1: 'x y' twice within-doc, 'z w' shared with doc 2 -> all dropped
    assert rows[1]["n_lines"] == 3 and rows[1]["n_dropped"] == 3
    assert rows[1]["kept_text"] == ""
    # doc 2: 'z w' dropped (df=2 across corpus), 'q r' survives
    assert rows[2]["n_lines"] == 2 and rows[2]["n_dropped"] == 1
    assert rows[2]["kept_text"] == "q r"


def test_line_dedup_preserves_order(spark):
    docs = spark.createDataFrame(
        [(1, "k1\ndup\nk2\ndup\nk3")], "doc_id long, text string"
    )
    from scrape_spark.operators.corpus import line_dedup

    row = line_dedup(docs).collect()[0]
    assert row["kept_text"] == "k1\nk2\nk3"  # original order, dups removed
    assert row["n_dropped"] == 2


def test_pii_redact_counts_and_masking(spark):
    text = (
        "mail a@b.co and c.d@e-f.org ip 10.0.0.1 and 999.1.2.3 "
        "call +15550100 end"
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from scrape_spark.operators.corpus import pii_redact

    row = pii_redact(docs).collect()[0]
    assert row["n_email"] == 2
    assert row["n_ipv4"] == 2  # the naive matcher takes 999.1.2.3 too
    assert row["n_phone"] == 1
    assert row["redacted"] == (
        "mail <EMAIL> and <EMAIL> ip <IP> and <IP> call <PHONE> end"
    )


def test_line_dedup_plan_evaluates_hash_once(spark):
    """The rolling line hash must appear only in projections, never inside a
    pushed-down isnotnull Filter (lambdas don't codegen, so a filter copy
    would re-evaluate the O(len) fold per line)."""
    from scrape_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [(1, "a b\nc d"), (2, "c d\ne f")], "doc_id long, text string"
    )
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    offenders = [
        ln
        for ln in plan.split("\n")
        if "Filter" in ln and "aggregate(transform" in ln
    ]
    assert not offenders, offenders


def test_split_assign_deterministic_and_weighted(spark):
    from scrape_spark.operators.corpus import split_assign

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = split_assign(docs, {"train": 8, "valid": 1, "test": 1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]
    # roughly 80/10/10 over 2000 uniform-hashed ids
    assert abs(counts["train"] - 1600) < 160
    # pure function of the id: a re-run assigns identically
    again = {r["doc_id"]: r["split"] for r in
             split_assign(docs, {"train": 8, "valid": 1, "test": 1}).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_split_assign_small_contiguous_range_reaches_tail_buckets(spark):
    """Regression: a pure affine bucket is a lattice over consecutive ids —
    100 contiguous ids landed 0 rows in the 2% tail splits. The quadratic
    mixing round must give small ranges tail coverage."""
    from scrape_spark.operators.corpus import split_assign

    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    out = split_assign(docs)  # default 98/1/1
    n_tail = out.where(F.col("split") != "train").count()
    assert n_tail > 0


def test_map_only_ops_have_no_exchange(spark):
    """doc_repetition, pii_redact, and split_assign are per-row kernels: any
    Exchange in their plans is a regression (at 100 TB a map-only pass must
    stay a free column on the scan)."""
    from scrape_spark.operators.corpus import (
        doc_repetition,
        pii_redact,
        split_assign,
    )

    docs = spark.createDataFrame(
        [(1, "a b\nc d"), (2, "e f\ng h")], "doc_id long, text string"
    )
    for op in (doc_repetition, pii_redact, split_assign):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (op.__name__, plan)


def test_split_assign_survives_huge_and_negative_and_int32_ids(spark):
    """Regression: id * A overflowed int64 from id ~ 8.4e9 (silent wrap on
    Spark, overflow error on the DuckDB oracle). The id is reduced mod P
    before the multiply; negative ids (hash-derived) map non-negatively,
    and int32 id columns are widened before the first multiply."""
    import duckdb

    from scrape_spark.operators.corpus import split_assign, split_assign_sql

    ids = [0, 1, 9_999_999_999, 2**62, -5, -(2**61)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["split_bucket"], r["split"])
        for r in split_assign(docs, {"train": 8, "valid": 1, "test": 1}).collect()
    }
    assert all(0 <= b < 10 for b, _ in got.values())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    for i in ids:
        con.execute("INSERT INTO t VALUES (?)", [i])
    sql = split_assign_sql({"train": 8, "valid": 1, "test": 1})
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.sql(f"SELECT doc_id, {sql} FROM t").fetchall()
    }
    assert got == oracle
    # int32 column: identical assignment after widening
    small = spark.createDataFrame([(7,)], "doc_id int")
    w = split_assign(small, {"train": 8, "valid": 1, "test": 1}).collect()[0]
    big = split_assign(
        spark.createDataFrame([(7,)], "doc_id long"),
        {"train": 8, "valid": 1, "test": 1},
    ).collect()[0]
    assert (w["split_bucket"], w["split"]) == (big["split_bucket"], big["split"])


def test_line_dedup_keeps_null_text_docs(spark):
    """A null-text doc must surface (as an empty doc) instead of vanishing
    from the output — and from every pipeline composed on top."""
    from scrape_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [(1, "a b\nc d"), (2, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["kept_text"] == "" and rows[2]["n_dropped"] == 0


def test_host_boilerplate_ratio_semantics(spark):
    """Nav line in 3/3 docs of a host is dropped at the 60% threshold; a
    promo line in 1/3 is kept; another host's docs are never affected by
    the first host's chrome."""
    from scrape_spark.operators.corpus import host_boilerplate

    rows = [
        (0, "a.test", "NAV\nalpha one\nfooter"),
        (1, "a.test", "NAV\nbeta two\nfooter"),
        (2, "a.test", "NAV\ngamma three"),
        (3, "b.test", "NAV\ndelta four"),  # NAV on b.test: 1/1 but min_docs=2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in host_boilerplate(docs, min_ratio_pct=60, min_docs=2).collect()
    }
    # a.test: NAV (3/3) and footer (2/3 = 66%) dropped, bodies kept in order
    assert out[0]["kept_text"] == "alpha one"
    assert out[0]["n_lines"] == 3 and out[0]["n_boiler"] == 2
    assert out[1]["kept_text"] == "beta two"
    assert out[2]["kept_text"] == "gamma three" and out[2]["n_boiler"] == 1
    # b.test has a single doc: min_docs=2 protects it entirely
    assert out[3]["kept_text"] == "NAV\ndelta four" and out[3]["n_boiler"] == 0


def test_host_boilerplate_all_boiler_and_null_text(spark):
    from scrape_spark.operators.corpus import host_boilerplate

    rows = [
        (0, "h", "SAME"),
        (1, "h", "SAME"),
        (2, "h", None),  # null-text doc must survive as an empty doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in host_boilerplate(docs, min_ratio_pct=60, min_docs=2).collect()
    }
    assert len(out) == 3
    assert out[0]["kept_text"] == "" and out[0]["n_boiler"] == 1
    assert out[2]["n_lines"] == 1  # the empty line of the null doc


def test_host_boilerplate_keeps_cross_host_quotes(spark):
    """A quote recurring across UNRELATED hosts (each below its host's
    ratio) is kept — the exact case corpus-wide line_dedup over-drops."""
    from scrape_spark.operators.corpus import host_boilerplate

    quote = "to be or not to be"
    rows = []
    for h in range(4):
        rows.append((h * 10, f"h{h}", f"{quote}\nunique body {h}"))
        rows.append((h * 10 + 1, f"h{h}", f"other {h}\nmore {h}"))
        rows.append((h * 10 + 2, f"h{h}", f"third {h}"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = host_boilerplate(docs, min_ratio_pct=60, min_docs=2)
    kept = {r["doc_id"]: r["kept_text"] for r in out.collect()}
    for h in range(4):
        assert quote in kept[h * 10]  # 1/3 of each host — kept everywhere


def test_c4_rules_line_and_page_verdicts(spark):
    from scrape_spark.operators.corpus import c4_rules

    docs = spark.createDataFrame(
        [
            # 3 clean retained lines -> kept page
            (1, 'One fine sentence with plenty of words here.\n'
                'Another fine sentence with plenty of words too!\n'
                'A third fine sentence closes out the page?'),
            # only 2 retained (middle line: 4 words) -> dropped page
            (2, 'One fine sentence with plenty of words here.\n'
                'Too few words here.\n'
                'A third fine sentence closes out the page?'),
            # javascript line dropped -> 2 retained -> dropped page
            (3, 'One fine sentence with plenty of words here.\n'
                'You must enable javascript to see this content.\n'
                'A third fine sentence closes out the page?'),
            # lorem ipsum anywhere kills the page even with 3 good lines
            (4, 'One fine sentence with plenty of words here.\n'
                'Another fine sentence with plenty of words too!\n'
                'A third fine sentence mentions lorem ipsum sadly.'),
            # curly brace kills the page
            (5, 'One fine sentence with plenty of words here.\n'
                'Another fine sentence with plenty of words too!\n'
                'if (x) { return; } but this line also ends fine.'),
            # no terminal punctuation on any line
            (6, 'no punctuation at the end of this line\n'
                'and none here either so nothing is retained'),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in c4_rules(docs).collect()}
    assert got[1].keep_doc and got[1].n_kept_lines == 3
    assert not got[2].keep_doc and got[2].n_kept_lines == 2
    assert not got[3].keep_doc and got[3].n_kept_lines == 2
    assert not got[4].keep_doc and got[4].has_lorem
    assert not got[5].keep_doc and got[5].has_brace
    assert got[6].n_kept_lines == 0 and not got[6].keep_doc
    # kept_text joins only the surviving lines, in document order
    assert got[2].kept_text.split("\n") == [
        "One fine sentence with plenty of words here.",
        "A third fine sentence closes out the page?",
    ]


def test_c4_rules_quote_terminal_and_case_insensitive_js(spark):
    from scrape_spark.operators.corpus import c4_rules

    docs = spark.createDataFrame(
        [(1, 'He said the whole thing was "finished."\n'
             'A quoted ending counts as terminal punctuation she said."\n'
             'But JAVASCRIPT in upper case is still caught here.')],
        "doc_id long, text string",
    )
    row = c4_rules(docs).collect()[0]
    assert row.n_kept_lines == 2  # js line dropped despite terminal '.'


def test_registered_domain_psl_semantics(spark):
    from scrape_spark.operators.corpus import registered_domain

    cases = {
        "a.b.example.co.uk": "example.co.uk",   # multi-label suffix
        "www.example.com": "example.com",
        "user.github.io": "user.github.io",     # private-registry suffix
        "deep.sub.user.github.io": "user.github.io",
        "example.unknowntld": "example.unknowntld",  # PSL default rule
        "x.y.example.unknowntld": "example.unknowntld",
        "co.uk": "co.uk",                        # host IS a suffix
        "single": "single",                      # one unlisted label
        "io": "io",                              # bare listed TLD
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {r.host: r.registered_domain for r in registered_domain(df).collect()}
    assert got == cases


def test_registered_domain_dataframe_psl_and_passthrough(spark):
    from scrape_spark.operators.corpus import registered_domain

    df = spark.createDataFrame(
        [("a.example.custom", 1), ("b.other.com", 2)],
        "host string, payload long",
    )
    psl = spark.createDataFrame([("custom",), ("com",)], "suffix string")
    got = {r.host: r for r in registered_domain(df, psl=psl).collect()}
    assert got["a.example.custom"].registered_domain == "example.custom"
    assert got["b.other.com"].registered_domain == "other.com"
    assert got["a.example.custom"].payload == 1  # payload columns survive


# ---------------------------------------------------------------------------
# soft-404
# ---------------------------------------------------------------------------
def test_soft404_classifier(spark):
    from scrape_spark.operators.corpus import soft404_flags

    rows = [
        (0, "Error 404 - the page you requested could not be found."),
        (1, "Oops! Page Not Found."),  # case-folded match
        (2, "A perfectly fine article about crawling. " * 8),
        # long article QUOTING an error phrase: must not flag
        (3, ("This essay about dead links notes that page not found is "
             "common. ") * 12),
        # stub-sized but benign: no phrase, no flag
        (4, "short page"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_404_phrases"], r["is_soft404"])
        for r in soft404_flags(df).collect()
    }
    assert got[0][0] >= 2 and got[0][1] is True
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3][0] >= 1 and got[3][1] is False  # phrase but too long
    assert got[4] == (0, False)


def test_soft404_matches_duckdb(spark):
    import duckdb

    from scrape_spark.functions.textstats import DUCK_DIALECT
    from scrape_spark.operators.corpus import (
        soft404_flags,
        soft404_signals_sql,
    )

    rows = [(i, t) for i, t in enumerate([
        "page not found", "404 not found here and error 404 there",
        "nothing wrong", "x " * 100 + "does not exist", "",
    ])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in soft404_flags(df)
        .select("doc_id", "n_404_phrases", "n_tokens", "is_soft404")
        .collect()
    )
    sig = soft404_signals_sql("text", DUCK_DIALECT)
    cols = ", ".join(f"{e} AS {n}" for n, e in sig.items())
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                f"SELECT doc_id, {cols} FROM (VALUES {vals}) t(doc_id, text)"
            ).fetchall(),
        )
    )
    assert got == want


# -- Gopher n-gram repetition panel -------------------------------------------


def test_ngram_repetition_hand_computed(spark):
    from scrape_spark.operators.corpus import ngram_repetition

    docs = spark.createDataFrame(
        [
            # 6 tokens; bigrams: ab,ba,ab,bc,cd -> top "a b" 2/5
            (1, "a b a b c d"),
            # all identical -> every gram duplicated, top covers all
            (2, "x x x x x x x x"),
            (3, "one two"),  # under n for n>=3
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_repetition(docs).collect()}
    assert got[1]["top_2gram_cover_q4"] == 10000 * 2 // 5
    # d1 5-grams: ababc, babcd — all singleton -> dup frac 0
    assert got[1]["dup_5gram_frac_q4"] == 0
    assert got[2]["top_2gram_cover_q4"] == 10000
    assert got[2]["dup_5gram_frac_q4"] == 10000  # 4 positions, one gram
    assert got[3]["top_3gram_cover_q4"] == 0  # under 3 words
    assert got[4]["dup_10gram_frac_q4"] == 0
    # d2 has 8 tokens: exactly one 8-gram (singleton), no 9/10-grams
    assert got[2]["dup_8gram_frac_q4"] == 0
    assert got[2]["dup_9gram_frac_q4"] == 0


def test_top_bigram_matches_general_kernel(spark):
    """The named bigram kernel is the n=2 instance (regression pin)."""
    from scrape_spark.functions import textstats as ts

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "q r s")], "i long, s string"
    )
    rows = df.selectExpr(
        f"{ts.top_bigram_cover_q4_sql('s', ts.SPARK_DIALECT)} AS a",
        f"{ts.top_ngram_cover_q4_sql('s', ts.SPARK_DIALECT, 2)} AS b",
    ).collect()
    assert all(r["a"] == r["b"] for r in rows)


# -- composed quality funnel ----------------------------------------------------


def test_quality_funnel_gates_and_dedup(spark):
    from scrape_spark.operators.corpus import quality_funnel

    fill = ["of", "in", "on", "at", "by", "for"]
    good = " ".join(
        w
        for i in range(12)
        for w in ("the", f"cat{i}", "is", f"dog{i}", fill[i % 6])
    )  # 60 words, English stopwords, no repeated n-grams
    rows = [
        (1, good),
        (2, good),  # exact duplicate -> not canonical
        (3, "Ã©tÃ© " + good),  # mojibake -> gated
        (4, "tiny doc"),  # under the Gopher word floor
        (5, " ".join(["spam spam"] * 40)),  # repetition-gated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = spark.createDataFrame([("the", 1)], "token string, weight long")
    got = {r["doc_id"]: r for r in quality_funnel(docs, w).collect()}
    assert got[1]["kept"] and got[1]["is_canonical"]
    assert not got[2]["kept"] and not got[2]["is_canonical"]
    assert not got[3]["gate_mojibake"] and not got[3]["kept"]
    assert not got[4]["gate_gopher"]
    assert not got[5]["gate_repetition"]
    assert all(r["split"] in ("train", "valid", "test") for r in got.values())


def test_quality_funnel_lang_gate(spark):
    from scrape_spark.operators.corpus import quality_funnel

    docs = spark.createDataFrame(
        [(1, "the cat and the dog of a is")], "doc_id long, text string"
    )
    w = spark.createDataFrame([("the", 1)], "token string, weight long")
    r_off = quality_funnel(docs, w).head()
    r_on = quality_funnel(docs, w, target_lang="de").head()
    assert r_off["gate_lang"] and r_off["lang"] == "en"
    assert not r_on["gate_lang"]


# -- training-context chunking ---------------------------------------------------


def test_chunk_documents_tiling_and_overlap(spark):
    from scrape_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    # non-overlapping window 4: doc1 -> 3 chunks (4, 4, 2 tokens)
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_start"], r["n_chunk_tokens"],
         r["chunk_text"])
        for r in chunk_documents(docs, window=4).collect()
    )
    d1 = [g for g in got if g[0] == 1]
    assert [(g[1], g[2], g[3]) for g in d1] == [(0, 0, 4), (1, 4, 4), (2, 8, 2)]
    assert d1[0][4] == "t0 t1 t2 t3" and d1[2][4] == "t8 t9"
    assert [g[3] for g in got if g[0] == 2] == [2]
    # the empty doc is one empty-token chunk (split('') -> [''])
    d3 = [g for g in got if g[0] == 3]
    assert len(d3) == 1 and d3[0][4] == ""
    # overlap: stride 2, window 4 over 10 tokens -> starts 0,2,4,6,8
    ov = chunk_documents(docs.where("doc_id = 1"), window=4, stride=2)
    assert [r["chunk_start"] for r in
            sorted(ov.collect(), key=lambda r: r["chunk_idx"])] == [0, 2, 4, 6, 8]


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from scrape_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, window=0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=0)


def test_dedup_retain_best_elects_by_score(spark):
    from pyspark.sql import functions as F

    from scrape_spark.operators.corpus import dedup_retain, dedup_retain_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 5), (4, 7), (5, 7)],
        "doc_id long, score long",
    )
    # cluster {1,2,3}: best score is doc 2 (min-id variant keeps 1)
    # cluster {4,5}: score tie -> min id 4
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_1 long, id_2 long"
    )
    best = sorted(
        r["doc_id"]
        for r in dedup_retain_best(docs, pairs, score_col="score").collect()
    )
    assert best == [2, 4]
    minid = sorted(
        r["doc_id"] for r in dedup_retain(docs, pairs).collect()
    )
    assert minid == [1, 4]
