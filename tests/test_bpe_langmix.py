"""BPE trainer parity vs a pure-Python reference; temperature sampling."""

from collections import Counter

from scrape_spark.operators.corpus import (
    bpe_pair_counts,
    bpe_pair_counts_sql,
    bpe_train,
    lang_temperature_sample,
    lang_temperature_sample_sql,
)

_TEXTS = [
    "low low low low low lower lower newest newest",
    "newest newest newest newest widest widest widest",
    "low lower newest widest a",
]


def _py_bpe(texts, n_merges):
    """Sennrich reference trainer: greedy left-to-right merge application,
    (count desc, pair asc) selection."""
    words = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, n in words.items():
            sym = vocab[w]
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in vocab:
            sym, out = vocab[w], []
            for x in sym:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def _docs(spark, texts=_TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pair_counts_values(spark):
    rows = bpe_pair_counts(_docs(spark), k=3).collect()
    # 'lo' in low(6)+lower(3)=9; 'es' and 'st' in newest(7)+widest(4)=11 each;
    # 'ne'/'ew' in newest(7) and 'we' in newest+lower+widest...
    got = [(r["pair"], r["n"]) for r in rows]
    assert got[0][1] >= got[1][1] >= got[2][1]
    assert ("es", 11) in got and ("st", 11) in got


def test_pair_counts_duckdb_parity(spark):
    import duckdb

    got = sorted(
        (r["pair"], r["n"]) for r in bpe_pair_counts(_docs(spark), k=100).collect()
    )
    docs_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in enumerate(_TEXTS)
    )
    want = sorted(
        tuple(r) for r in duckdb.sql(bpe_pair_counts_sql(docs_sql, k=100)).fetchall()
    )
    assert got == want


def test_bpe_train_matches_python_reference(spark):
    got = bpe_train(_docs(spark), n_merges=6)
    want = _py_bpe(_TEXTS, 6)
    assert got == want


def test_bpe_train_overlapping_runs(spark):
    # 'aaaa' x5 + 'aaa' x2: first merge (a,a); greedy left-to-right then
    # pairs aaaa -> (aa)(aa), aaa -> (aa)a.
    texts = ["aaaa aaaa aaaa aaaa aaaa aaa aaa"]
    got = bpe_train(_docs(spark, texts), n_merges=2)
    assert got == _py_bpe(texts, 2)
    assert got[0] == ("a", "a") and got[1] == ("aa", "aa")


def test_bpe_train_exhausts(spark):
    # single repeated 2-char word: only one merge possible, then no pairs
    got = bpe_train(_docs(spark, ["ab ab ab"]), n_merges=5)
    assert got == [("a", "b")]


def test_lang_temperature_plan(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i < 90 else "sw") for i in range(100)],
        "doc_id long, lang string",
    )
    rows = {r["lang"]: r for r in lang_temperature_sample(docs, budget=50).collect()}
    en, sw = rows["en"], rows["sw"]
    # temperature flattens: sw share rises from 10% to sqrt(.1)/(sqrt(.9)+sqrt(.1)) ~ 25%
    assert 0.20 < sw["weight_ppm"] / 1e6 < 0.30
    assert en["weight_ppm"] + sw["weight_ppm"] <= 1_000_000
    assert en["expected_docs"] + sw["expected_docs"] <= 50
    # rate = expected/n, capped at 1
    assert sw["rate_ppm"] == min(1_000_000, 1_000_000 * sw["expected_docs"] // 10)


def test_lang_temperature_duckdb_parity(spark):
    import duckdb

    docs = spark.createDataFrame(
        [(i, ["en", "de", "sw", "yo"][i % 4] if i % 7 else "en") for i in range(200)],
        "doc_id long, lang string",
    )
    got = sorted(tuple(r) for r in lang_temperature_sample(docs, budget=77).collect())
    docs_sql = (
        "SELECT i AS doc_id, CASE WHEN i % 7 = 0 THEN 'en' ELSE "
        "['en','de','sw','yo'][(i % 4) + 1] END AS lang "
        "FROM (SELECT unnest(range(200)) AS i)"
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(lang_temperature_sample_sql(docs_sql, budget=77)).fetchall()
    )
    assert got == want


def test_host_language_profile(spark):
    from scrape_spark.operators.corpus import host_language_profile

    docs = spark.createDataFrame(
        [("h1", "en")] * 3 + [("h1", "de")] + [("h2", "sw"), ("h2", "en")],
        "host string, lang string",
    )
    rows = {r["host"]: r for r in host_language_profile(docs).collect()}
    assert rows["h1"]["top_lang"] == "en"
    assert rows["h1"]["n_docs"] == 4
    assert rows["h1"]["top_share_ppm"] == 750000
    # tie on h2 breaks lexicographically
    assert rows["h2"]["top_lang"] == "en"
    assert rows["h2"]["top_share_ppm"] == 500000


def _py_encode(text, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    out = []
    for w in text.split(" "):
        if not w:
            continue
        sym = list(w)
        while len(sym) > 1:
            cand = [
                (ranks[(sym[i], sym[i + 1])], i)
                for i in range(len(sym) - 1)
                if (sym[i], sym[i + 1]) in ranks
            ]
            if not cand:
                break
            r, _ = min(cand)
            a, b = merges[r]
            nxt, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(sym[i])
                    i += 1
            sym = nxt
        out.extend(sym)
    return out


def test_bpe_encode_roundtrip(spark):
    from scrape_spark.operators.corpus import bpe_encode, bpe_train

    merges = bpe_train(_docs(spark), n_merges=8)
    enc = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(_docs(spark), merges).collect()
    }
    for i, t in enumerate(_TEXTS):
        assert enc[i] == _py_encode(t, merges), t
    # concatenating tokens reconstructs the text without spaces
    assert "".join(enc[0]) == _TEXTS[0].replace(" ", "")


def test_bpe_encode_rank_order_not_greedy_scan(spark):
    from scrape_spark.operators.corpus import bpe_encode

    # merges: ('b','c') rank 0, ('a','b') rank 1 — on 'abc' the RANKED
    # algorithm merges (b,c) first even though (a,b) appears earlier
    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    merges = [("b", "c"), ("a", "b")]
    toks = bpe_encode(docs, merges).first()["tokens"]
    assert toks == ["a", "bc"]


def test_bpe_train_random_corpora_match_reference(spark):
    import random

    rng = random.Random(123)
    alphabet = "abcde"
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(4)
        ]
        got = bpe_train(_docs(spark, texts), n_merges=4)
        assert got == _py_bpe(texts, 4), texts


def test_bpe_train_batched_exact_matches_sequential(spark):
    """Exact batched mode must produce the IDENTICAL merge list — the
    disjointness + dominance-gap + collision guards are order-equivalence
    proofs, and this randomized sweep is their executable check."""
    import random

    from scrape_spark.operators.corpus import bpe_train_batched

    rng = random.Random(321)
    alphabet = "abcd"
    for trial in range(4):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(3, 14))
            )
            for _ in range(4)
        ]
        want = _py_bpe(texts, 6)
        for bs in (2, 8):
            got = bpe_train_batched(
                _docs(spark, texts), n_merges=6, batch_size=bs
            )
            assert got == want, (texts, bs)


def test_bpe_train_batched_exact_on_fixture(spark):
    from scrape_spark.operators.corpus import bpe_train_batched

    got, stats = bpe_train_batched(
        _docs(spark), n_merges=8, batch_size=8, return_stats=True
    )
    assert got == _py_bpe(_TEXTS, 8)
    assert stats["iterations"] <= 8 and sum(stats["batches"]) == 8


def test_bpe_train_batched_approximate_is_fast_and_valid(spark):
    """exact=False (parallel-BPE approximation): batches are wide — a
    disjoint-prefix of the count snapshot applies per round — so the
    iteration count collapses; every merge must still be a genuinely
    adjacent pair (validity), though order may diverge from sequential."""
    import string

    from scrape_spark.operators.corpus import bpe_train_batched

    # spread corpus: 24 SYMBOL-DISJOINT frequent pairs (the regime a real
    # Zipf tail provides in bulk) — all must merge in one round
    letters = string.ascii_letters
    words = [letters[2 * i] + letters[2 * i + 1] for i in range(24)]
    texts = [" ".join(words) for _ in range(3)]
    merges, stats = bpe_train_batched(
        _docs(spark, texts),
        n_merges=24,
        batch_size=32,
        exact=False,
        return_stats=True,
    )
    assert len(merges) == 24
    assert stats["iterations"] <= 2, stats
    assert sorted(merges) == sorted((w[0], w[1]) for w in words)


def test_bpe_train_batched_deep_merge_list_bounded_lineage(spark):
    """Many iterations of batch-1 merges (worst case: every top pair shares
    symbols) must not accrete plan lineage — the pre-localCheckpoint
    implementation OOM'd the driver rendering the plan string at ~24
    chained fold expressions."""
    from scrape_spark.operators.corpus import bpe_train_batched

    words = [a + b for a in "abcd" for b in "wxyz"]  # shared-symbol pairs
    texts = [" ".join(words)] * 2
    merges, stats = bpe_train_batched(
        _docs(spark, texts), n_merges=16, batch_size=32, exact=False,
        return_stats=True,
    )
    assert len(merges) == 16
    assert stats["iterations"] >= 8  # genuinely deep, not one wide batch


def test_bpe_train_batched_collision_guard(spark):
    """A merge whose concatenation equals an existing symbol must end its
    batch (old-pair counts can be boosted) — the 'ab' token created by
    merging (a,b) collides with nothing here, but merging single chars in
    a corpus containing the literal two-char word exercises the path."""
    from scrape_spark.operators.corpus import bpe_train_batched

    texts = ["ab ab ab a b a b a b c d c d"]
    # chars: 'ab' appears as a word (symbols a,b) — merging (a,b) creates
    # tokens equal to existing adjacencies; exact mode must still match
    assert bpe_train_batched(
        _docs(spark, texts), n_merges=3, batch_size=8
    ) == _py_bpe(texts, 3)
