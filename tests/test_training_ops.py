"""Tests for training-data pipeline operators: dedup, similarity, textstats,
multimodal plumbing. Pure-Python reference implementations of the hash
kernels serve as oracles (the DuckDB cross-engine check lives in
tools/check_oracle.py / the driver gate)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrape_spark.functions import textstats as ts

P = ts.HASH_P


# ---------------------------------------------------------------------------
# pure-Python oracles for the dialect-templated kernels
# ---------------------------------------------------------------------------
def py_char_fold(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def py_fingerprint(text: str) -> int:
    return py_char_fold(text[:64]) if text else 0


def py_word_hashes(text: str, cap: int = ts.SHINGLE_WORDS) -> list[int]:
    return [py_char_fold(w) for w in text.split(" ")[:cap]]


def py_shingles(text: str) -> list[int]:
    wh = py_word_hashes(text)
    if len(wh) < ts.SHINGLE_K:
        return []
    return [
        ((wh[i] * 1000003 + wh[i + 1]) % P * 1000003 + wh[i + 2]) % P
        for i in range(len(wh) - 2)
    ]


def py_minhash(text: str) -> list[int]:
    sh = py_shingles(text)
    out = []
    for a, b in zip(ts.MINHASH_A, ts.MINHASH_B):
        vals = [(a * s + b) % P for s in sh]
        out.append(min(vals) if vals else -1)
    return out


def py_simhash(text: str, bits: int = ts.SIMHASH_BITS) -> int:
    wh = py_word_hashes(text, ts.SIMHASH_WORDS)
    acc = 0
    for b in range(bits):
        votes = sum(((h >> b) & 1) * 2 - 1 for h in wh)
        if votes > 0:
            acc |= 1 << b
    return acc


SAMPLES = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "a b c",
    "single",
    "",
    "unicode wörds añd ţext with Ünïcode characters spread across tokens here",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in enumerate(SAMPLES)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fingerprint_matches_python(docs):
    got = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", ts.fingerprint("text").alias("fp")).collect()}
    for i, t in enumerate(SAMPLES):
        assert got[i] == py_fingerprint(t), t


def test_minhash_matches_python(docs):
    got = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select("doc_id", ts.minhash_signature("text").alias("sig")).collect()
    }
    for i, t in enumerate(SAMPLES):
        assert got[i] == py_minhash(t), t


def test_simhash_matches_python(docs):
    got = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", ts.simhash("text").alias("sh")).collect()}
    for i, t in enumerate(SAMPLES):
        assert got[i] == py_simhash(t), t


def test_token_count(docs):
    got = {r["doc_id"]: r["n"] for r in docs.select("doc_id", ts.token_count("text").alias("n")).collect()}
    for i, t in enumerate(SAMPLES):
        assert got[i] == len(t.split(" ")), t


# ---------------------------------------------------------------------------
# dedup operators
# ---------------------------------------------------------------------------
def test_exact_dedup(spark):
    from scrape_spark.operators.dedup import exact_dedup

    rows = [(0, "same text"), (1, "same text"), (2, "other text"), (3, "same text")]
    out = exact_dedup(spark.createDataFrame(rows, "doc_id long, text string")).collect()
    by_sha = {r["content_sha"]: r for r in out}
    same_sha = hashlib.sha256(b"same text").hexdigest()
    assert by_sha[same_sha]["keep_id"] == 0
    assert by_sha[same_sha]["n_dups"] == 3
    assert len(out) == 2


def test_minhash_neardup_finds_near_duplicates(spark):
    from scrape_spark.operators.dedup import minhash_neardup_pairs

    base = "spark engine shuffles data across partitions while the optimizer prunes columns and pushes filters down to the scan layer every time"
    near = base.replace("every time", "all day")  # tail edit: most shingles shared
    far = "completely different words about cooking pasta with garlic butter and fresh basil leaves tonight"
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    pairs = {(r["id_1"], r["id_2"]) for r in minhash_neardup_pairs(df).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_ngram_jaccard_bounds(spark):
    from scrape_spark.operators.dedup import ngram_jaccard_pairs

    a = "one two three four five six seven eight nine ten"
    rows = [(0, 1, a, a), (2, 3, a, "alpha beta gamma delta epsilon zeta eta theta")]
    pairs = spark.createDataFrame(
        rows, "id_1 long, id_2 long, text_1 string, text_2 string"
    )
    got = {(r["id_1"], r["id_2"]): r["jaccard"] for r in ngram_jaccard_pairs(pairs).collect()}
    assert got[(0, 1)] == 1.0
    assert got[(2, 3)] == 0.0


def test_simhash_buckets_group_identical(spark):
    from scrape_spark.operators.dedup import simhash_buckets

    t = "repeatable content with enough words to vote on simhash bits properly"
    df = spark.createDataFrame(
        [(0, t), (1, t), (2, "other thing entirely with distinct vocabulary")],
        "doc_id long, text string",
    )
    out = simhash_buckets(df).collect()
    counts = sorted(r["n_docs"] for r in out)
    assert counts == [1, 2]


# ---------------------------------------------------------------------------
# similarity operators
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 16).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]], int(i % 4)) for i in range(40)]
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ),
        vecs,
    )


def test_cosine_topk_matches_numpy(emb):
    from scrape_spark.operators.similarity import cosine_topk

    df, vecs = emb
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(df, queries, k=5).collect()
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for qid in range(3):
        expect = [
            int(j)
            for j in sorted(
                (j for j in range(40) if j != qid),
                key=lambda j: (-sims[qid, j], j),
            )[:5]
        ]
        mine = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == qid]
        assert mine == expect, qid


def test_lsh_topk_recall(emb):
    from scrape_spark.operators.similarity import cosine_topk, lsh_topk

    df, _ = emb
    queries = df.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(df, queries, k=5).collect()
    approx = lsh_topk(df, queries, k=5, n_bits=2).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, recall  # 2-bit buckets on random data: partial recall


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------
def test_multimodal_features_deterministic(spark):
    from scrape_spark.functions.multimodal import (
        extract_features,
        media_from_documents,
        resize_plan,
    )

    df = spark.createDataFrame(
        [(0, "payload one", "en", "s0"), (1, "payload two", "de", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    media = media_from_documents(df)
    feats = {r["media_id"]: r for r in resize_plan(extract_features(media)).collect()}
    assert feats[0]["n_bytes"] == len(b"payload one")
    assert feats[0]["content_sha"] == hashlib.sha256(b"payload one").hexdigest()
    assert 64 <= feats[0]["width"] <= 255 and 64 <= feats[0]["height"] <= 255
    assert 0 < feats[0]["resize_scale"] <= 1.0
    # determinism: same payload -> same fake decode
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert again[0]["width"] == feats[0]["width"]


def test_decode_real_is_stubbed():
    from scrape_spark.functions.multimodal import decode_media_real

    with pytest.raises(NotImplementedError):
        decode_media_real(b"x", "image")


def test_semantic_dedup_retain(spark):
    """SemDeDup composition: clusters -> cosine pairs -> min-id survivors."""
    from scrape_spark.operators.corpus import semantic_dedup_retain

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # cluster A representative
        (1, [0.99, 0.1, 0.0, 0.0]),      # near-dup of 0
        (2, [0.98, 0.15, 0.0, 0.0]),     # near-dup of 0/1 (same component)
        (3, [0.0, 1.0, 0.0, 0.0]),       # cluster B representative
        (4, [0.0, 0.99, 0.1, 0.0]),      # near-dup of 3
        (5, [0.0, 0.0, 1.0, 0.0]),       # orthogonal singleton, kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_retain(emb, min_cosine=0.9, centroid_stride=3)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 3, 5]
    # columns pass through untouched
    assert out.columns == ["vec_id", "embedding"]


def test_frame_sample_uniform(spark):
    from scrape_spark.functions.multimodal import (
        _fake_decode,
        frame_sample,
        media_from_documents,
    )

    df = spark.createDataFrame(
        [(0, "clip zero", "en", "s0"), (1, "clip one", "de", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    k = 4
    frames = frame_sample(media_from_documents(df, media_type="video"), k=k)
    rows = frames.collect()
    assert len(rows) == 2 * k  # exactly k frames per video
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, payload in ((0, b"clip zero"), (1, b"clip one")):
        got = sorted(by_media[mid], key=lambda r: r["frame_idx"])
        _, _, dur = _fake_decode(payload, "video")
        assert [r["frame_idx"] for r in got] == list(range(k))
        # uniform integer timestamps over the decoded duration
        assert [r["ts_ms"] for r in got] == [(i * dur) // k for i in range(k)]
        assert got[0]["ts_ms"] == 0 and got[-1]["ts_ms"] < dur
        # frame hash is the documented stub formula over (payload, idx)
        assert got[2]["frame_sha"] == hashlib.sha256(payload + b"#2").hexdigest()
    # non-video rows are dropped, not decoded
    images = media_from_documents(df, media_type="image")
    assert frame_sample(images, k=k).count() == 0


def test_lsh_recall_monotone_in_n_tables(emb):
    """VERDICT r1 item 8: recall@k grows with independent hash tables."""
    from scrape_spark.operators.similarity import cosine_topk, lsh_topk

    df, _ = emb
    queries = df.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(df, queries, k=5).collect()
    }

    def recall(n_tables):
        got = {
            (r["query_id"], r["vec_id"])
            for r in lsh_topk(
                df, queries, k=5, n_bits=3, n_tables=n_tables
            ).collect()
        }
        return len(exact & got) / len(exact)

    r1, r2, r6 = recall(1), recall(2), recall(6)
    assert r1 <= r2 <= r6, (r1, r2, r6)
    assert r6 > r1, (r1, r6)  # repetitions genuinely add recall
    # random 16-d data, 3-bit tables: 6 repetitions should recover most
    # true neighbors (expected ≈ 1 - (1 - (1-θ/π)^3)^6)
    assert r6 >= 0.7, r6


def test_ivf_recall_monotone_in_nprobe(emb):
    """IVF scale path: recall@k grows with probed inverted lists; at
    nprobe == n_centroids it equals the exact result."""
    from scrape_spark.operators.similarity import cosine_topk, ivf_topk

    df, _ = emb
    queries = df.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(df, queries, k=5).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                df, queries, k=5, centroid_stride=8, nprobe=nprobe
            ).collect()  # 40 vecs / stride 8 → 5 centroids
        }
        return len(exact & got) / len(exact)

    r1, r2, r5 = recall(1), recall(2), recall(5)
    assert r1 <= r2 <= r5, (r1, r2, r5)
    assert r5 == 1.0  # probing every list == brute force
    assert r1 > 0.2


def test_ivf_plan_never_hash_shuffles_corpus(emb):
    """The IVF plan's ONLY hash exchange is the final per-query top-k window
    over candidates; assignment is a broadcast fold (no groupBy) and the
    candidate join broadcasts the probe table. The one allowed
    Exchange SinglePartition moves the tiny centroid array."""
    import contextlib
    import io

    from scrape_spark.operators.similarity import ivf_topk

    df, _ = emb
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(df, queries, k=5, centroid_stride=8, nprobe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    import re

    # every hash exchange partitions on query_id (probe window + final
    # top-k window — both over query-proportional row sets), never on a
    # corpus column (vec_id / centroid_id / embedding)
    keys = re.findall(r"hashpartitioning\((\w+)", plan)
    assert keys and all(k == "query_id" for k in keys), (keys, plan)
    # assignment is the broadcast fold: no HashAggregate/groupBy touches the
    # corpus between its scan and the candidate join
    assert "max_by" not in plan, plan


def test_ivf_empty_centroids_raises(emb):
    from scrape_spark.operators.similarity import ivf_topk

    df, _ = emb
    queries = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    shifted = df.withColumn("vec_id", F.col("vec_id") + 1)  # ids 1..40
    with pytest.raises(ValueError, match="centroid_stride"):
        ivf_topk(shifted, queries, k=5, centroid_stride=97, nprobe=2)


def test_ivf_derived_stride_is_sqrt_n(emb):
    """centroid_stride=None derives isqrt(n) (40 → 6): centroids 0,6,..,36;
    nprobe covering all 7 lists reproduces the exact result."""
    from scrape_spark.operators.similarity import cosine_topk, ivf_topk

    df, _ = emb
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(df, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(
            df, queries, k=5, centroid_stride=None, nprobe=7
        ).collect()
    }
    assert got == exact


def test_ivf_index_reuse_matches_inline(emb):
    """ivf_topk(index=ivf_assign(...)) — the production build-once path —
    returns the same result as the inline-index plan, including from a
    materialized (written + re-read) index."""
    from scrape_spark.operators.similarity import ivf_assign, ivf_topk

    df, _ = emb
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inline = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(df, queries, k=5, centroid_stride=8, nprobe=2).collect()
    }
    index = ivf_assign(df, centroid_stride=8)
    reused = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(df, queries, k=5, nprobe=2, index=index).collect()
    }
    assert reused == inline


def test_lang_id_widened_markers(spark):
    """Widened marker table: each language's own stopwords win; CJK markers
    count as raw substrings (no word-boundary padding); all-zero → 'und'."""
    samples = [
        (0, "the cat and the dog of a house is here", "en"),
        (1, "der hund und die katze das haus nicht", "de"),
        (2, "le chat et les chiens une maison est", "fr"),
        (3, "el gato que los perros una casa para", "es"),
        (4, "il gatto che per gli amici sono qui", "it"),
        (5, "o gato que uma casa para não aqui aqui", "pt"),
        (6, "de kat het huis een hond niet aan", "nl"),
        (7, "这是的一个在和测试的文本了", "zh"),
        (8, "xyzzy plugh qwerty", "und"),
        (9, "что это было ы э ъ здесь", "ru"),
        (10, "що це і ї є тут", "uk"),
        (11, "هذا في من على البيت", "ar"),
        (12, "است پ گ چ ژ اینجا", "fa"),
        (13, "これは の を です した", "ja"),
        (14, "이 는 을 의 하 다", "ko"),
        (15, "के है की में का घर", "hi"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in samples], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["pred"]
        for r in df.select("doc_id", ts.lang_pred("text").alias("pred")).collect()
    }
    for i, _, want in samples:
        assert got[i] == want, (i, got[i], want)


def test_lang_id_spark_duckdb_parity(spark):
    """The generated CASE chain renders identically in both engines."""
    import duckdb

    texts = [
        "the cat and the dog",
        "der hund und die katze",
        "o gato que uma casa não",
        "这是的一个在和文本",
        "no markers here xyzzy",
        "",
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_pred = [
        r["pred"]
        for r in sdf.select(ts.lang_pred("text").alias("pred")).collect()
    ]
    con = duckdb.connect()
    duck_pred = [
        con.execute(
            f"SELECT {ts.lang_pred_sql('?', ts.DUCK_DIALECT)}".replace(
                "?", "$$" + t + "$$"
            )
        ).fetchone()[0]
        for t in texts
    ]
    assert spark_pred == duck_pred, (spark_pred, duck_pred)


def test_latest_capture_newest_wins_and_ts_ties_break_on_text_hash(spark):
    from scrape_spark.operators.dedup import latest_capture

    rows = [
        ("u1", 10, "old", "en"),
        ("u1", 20, "new", "en"),
        ("u2", 5, "only", "de"),
        ("u3", 7, "aa", "en"),  # exact-ts tie:
        ("u3", 7, "zz", "en"),  # rolling hash('zz')=3904 > hash('aa')=3104
    ]
    caps = spark.createDataFrame(
        rows, "url string, warc_ts long, text string, lang string"
    )
    out = {r["url"]: r for r in latest_capture(caps).collect()}
    assert len(out) == 3
    assert out["u1"]["warc_ts"] == 20 and out["u1"]["text"] == "new"
    assert out["u2"]["text"] == "only"
    assert out["u3"]["text"] == "zz"  # deterministic tie winner
    again = {r["url"]: r["text"] for r in latest_capture(caps).collect()}
    assert again == {u: r["text"] for u, r in out.items()}


def test_latest_capture_keeps_all_null_ts_groups(spark):
    """A url whose captures ALL lack warc_ts must not vanish: the null-safe
    join keeps the group and the tie-break picks one capture. Mixed groups
    still prefer the timestamped capture (max ignores NULLs)."""
    from scrape_spark.operators.dedup import latest_capture

    rows = [
        ("nul", None, "aa", "en"),
        ("nul", None, "zz", "en"),
        ("mix", None, "untimed", "en"),
        ("mix", 9, "timed", "en"),
    ]
    caps = spark.createDataFrame(
        rows, "url string, warc_ts long, text string, lang string"
    )
    out = {r["url"]: r for r in latest_capture(caps).collect()}
    assert set(out) == {"nul", "mix"}
    assert out["nul"]["text"] == "zz"  # deterministic tie winner survives
    assert out["mix"]["text"] == "timed" and out["mix"]["warc_ts"] == 9


def test_latest_capture_rejects_unknown_tiebreak_col(spark):
    """A typo'd tiebreak_col must raise, not silently degrade to an
    arbitrary (nondeterministic) tie winner; explicit None opts in."""
    import pytest

    from scrape_spark.operators.dedup import latest_capture

    caps = spark.createDataFrame(
        [("u", 1, "a")], "url string, warc_ts long, text string"
    )
    with pytest.raises(ValueError, match="tiebreak_col"):
        latest_capture(caps, tiebreak_col="body")
    # the group key / ts column are not valid tie-breaks either
    with pytest.raises(ValueError, match="tiebreak_col"):
        latest_capture(caps, tiebreak_col="url")
    assert latest_capture(caps, tiebreak_col=None).count() == 1


def test_canonical_extraction_variants(spark):
    from scrape_spark.functions.canonical import canonical_col

    pages = [
        # attribute orders, case, self-closing, single vs double spacing
        ('<link rel="canonical" href="http://a.test/x"/>', "http://a.test/x"),
        ('<link href="http://a.test/y" rel="canonical">', "http://a.test/y"),
        ('<LINK REL="canonical" HREF="http://a.test/z">', "http://a.test/z"),
        ('<link rel="stylesheet" href="http://a.test/css">', None),
        ("<head><title>no link at all</title></head>", None),
        ('<link rel="canonical" href="">', None),  # empty declaration
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(pages)], "i long, html string"
    )
    got = {r.i: r.c for r in df.select("i", canonical_col().alias("c")).collect()}
    for i, (_, want) in enumerate(pages):
        assert got[i] == want, (i, pages[i])


def test_canonical_dedup_representative_rules(spark):
    from scrape_spark.operators.dedup import canonical_dedup

    rows = [
        # cluster with its canonical page captured -> that page is rep
        ("http://s.test/a", '<link rel="canonical" href="http://s.test/a">'),
        ("http://s.test/a?p=2", '<link rel="canonical" href="http://s.test/a">'),
        # cluster whose canonical target was never captured -> min url is rep
        ("http://s.test/m2", '<link rel="canonical" href="http://s.test/m">'),
        ("http://s.test/m1", '<link rel="canonical" href="http://s.test/m">'),
        # undeclared -> self-cluster of one
        ("http://s.test/solo", "<html>plain</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r.url: r for r in canonical_dedup(df).collect()}
    assert got["http://s.test/a"].is_rep and got["http://s.test/a"].cluster_size == 2
    assert not got["http://s.test/a?p=2"].is_rep
    assert got["http://s.test/m1"].is_rep  # min url wins when target absent
    assert not got["http://s.test/m2"].is_rep
    assert got["http://s.test/m2"].cluster_size == 2
    assert got["http://s.test/solo"].is_rep
    assert got["http://s.test/solo"].cluster_size == 1
    # exactly one rep per cluster
    reps = [r for r in got.values() if r.is_rep]
    assert len(reps) == len({r.canonical_url for r in got.values()})


def test_charset_sniff_variants_and_precedence(spark):
    from scrape_spark.functions.canonical import charset_col

    pages = [
        ('<meta charset="UTF-8">', "utf-8"),           # lowercased
        ("<meta charset=utf-8>", "utf-8"),              # unquoted
        ('<meta http-equiv="Content-Type" '
         'content="text/html; charset=ISO-8859-1">', "iso-8859-1"),
        ('<?xml version="1.0" encoding="Shift_JIS"?>', "shift_jis"),
        # meta beats a later xml decl
        ('<meta charset="UTF-8"><?xml encoding="KOI8-R"?>', "utf-8"),
        ("<head><title>none</title></head>", None),
        # spec-legal whitespace around '='
        ("<meta charset = utf-8>", "utf-8"),
        # a charset MENTION in an unrelated meta is NOT a declaration...
        ('<meta name="description" content="set charset=big5 in PHP">'
         '<meta charset="utf-8">', "utf-8"),
        # ...even when no real declaration follows
        ('<meta name="description" content="charset=big5 tips">', None),
        # reversed http-equiv attribute order
        ('<meta content="text/html; charset=Shift_JIS" '
         'http-equiv="Content-Type">', "shift_jis"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(pages)], "i long, html string"
    )
    got = {r.i: r.c for r in df.select("i", charset_col().alias("c")).collect()}
    for i, (_, want) in enumerate(pages):
        assert got[i] == want, (i, pages[i])


# ---------------------------------------------------------------------------
# exact-substring span dedup
# ---------------------------------------------------------------------------
_SPAN_DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa unique0 t0"),
    (1, "alpha beta gamma delta epsilon zeta eta theta different middle x y"),
    (2, "totally fresh words nothing shared with anything else here at all z"),
    (3, "short doc"),
    (4, ""),
]


def _span_docs_sql() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in _SPAN_DOCS)
    return f"SELECT * FROM (VALUES {vals}) t(doc_id, text)"


def test_dup_span_stats_semantics(spark):
    from scrape_spark.operators.dedup import dup_span_stats

    df = spark.createDataFrame(_SPAN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_dup_windows"], r["dup_tokens"], r["dup_frac_q4"]
        )
        for r in dup_span_stats(df).collect()
    }
    # docs 0 and 1 share exactly their first 8 tokens: one dup window each
    assert got[0] == (12, 1, 8, 6666)
    assert got[1] == (12, 1, 8, 6666)
    assert got[2] == (12, 0, 0, 0)
    assert got[3] == (2, 0, 0, 0)
    assert got[4] == (1, 0, 0, 0)  # '' splits to [''] — token-count convention


def test_strip_dup_spans_semantics_and_duckdb(spark):
    import duckdb

    from scrape_spark.operators.dedup import (
        dup_span_stats,
        dup_span_stats_sql,
        strip_dup_spans,
        strip_dup_spans_sql,
    )

    df = spark.createDataFrame(_SPAN_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["kept_text"] for r in strip_dup_spans(df).collect()}
    assert got[0] == "iota kappa unique0 t0"
    assert got[1] == "different middle x y"
    assert got[2] == _SPAN_DOCS[2][1]  # untouched doc is byte-identical
    assert got[3] == "short doc"
    # both frames match DuckDB bit-for-bit
    want_strip = dict(duckdb.sql(strip_dup_spans_sql(_span_docs_sql())).fetchall())
    assert got == want_strip
    got_stats = sorted(map(tuple, dup_span_stats(df).collect()))
    want_stats = sorted(
        map(tuple, duckdb.sql(dup_span_stats_sql(_span_docs_sql())).fetchall())
    )
    assert got_stats == want_stats


def test_dup_span_min_count_and_overlap(spark):
    from scrape_spark.operators.dedup import dup_span_stats

    # the same 8-gram in THREE docs survives min_count=3; a pair does not
    tri = "one two three four five six seven eight"
    rows = [
        (0, tri + " tail0 a"),
        (1, tri + " tail1 b"),
        (2, tri + " tail2 c"),
        (3, "pair x1 x2 x3 x4 x5 x6 x7 pairtail"),
        (4, "pair x1 x2 x3 x4 x5 x6 x7 othertail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_dup_windows"]
        for r in dup_span_stats(df, min_count=3).collect()
    }
    assert got[0] == 1 and got[1] == 1 and got[2] == 1
    assert got[3] == 0 and got[4] == 0


def test_dup_span_overlapping_windows_union_coverage(spark):
    from scrape_spark.operators.dedup import dup_span_stats

    # 9 shared leading tokens -> windows at pos 1 and 2; union covers 9
    nine = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows = [(0, nine + " ta tb"), (1, nine + " tc td")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x["doc_id"]: x for x in dup_span_stats(df).collect()}
    assert r[0]["n_dup_windows"] == 2 and r[0]["dup_tokens"] == 9


# ---------------------------------------------------------------------------
# SimHash Hamming-<=k near-dup search (Manku block-pigeonhole)
# ---------------------------------------------------------------------------
_NEARDUP_BASE = (
    "web crawl corpus document about distributed systems and polite "
    "scheduling of fetch requests across many hosts and partitions"
).split(" ")


def _neardup_texts() -> list[str]:
    """Clusters of slightly-perturbed copies + unrelated documents."""
    texts = []
    for c in range(6):
        base = list(_NEARDUP_BASE)
        base[0] = f"cluster{c}"
        texts.append(" ".join(base))
        for v in range(4):
            mut = list(base)
            # perturb v+1 words: near variants for small v, far for large
            for j in range(v + 1):
                mut[2 + 3 * j] = f"variant{c}x{v}w{j}"
            texts.append(" ".join(mut))
    for i in range(20):
        texts.append(" ".join(f"unrelated{i}token{j}" for j in range(14)))
    return texts


def test_simhash_neardup_matches_bruteforce(spark):
    from scrape_spark.operators.dedup import simhash_neardup_pairs

    texts = _neardup_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bits, k = 28, 3
    sh = [py_simhash(t, bits) for t in texts]
    expected = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if bin(sh[a] ^ sh[b]).count("1") <= k
    }
    assert expected, "fixture must contain near-dup pairs"
    got = {
        (r["id_1"], r["id_2"], r["hamming"])
        for r in simhash_neardup_pairs(df, bits=bits, max_hamming=k).collect()
    }
    # pigeonhole candidate generation is EXACT: set equality, not recall<1
    assert got == expected


def test_simhash_neardup_plan_never_all_pairs(spark):
    import contextlib
    import io

    from scrape_spark.operators.dedup import simhash_neardup_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_neardup_texts())],
        "doc_id long, text string",
    )
    out = simhash_neardup_pairs(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the candidate join keys on the exploded block buckets
    assert "block_val" in plan, plan


def test_simhash_neardup_bits_must_split_into_blocks(spark):
    from scrape_spark.operators.dedup import simhash_neardup_pairs

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        simhash_neardup_pairs(df, bits=30, max_hamming=3)


def py_simhash_wide(text: str, bits: int = 56) -> int:
    half = bits // 2
    wh = py_word_hashes(text, ts.SIMHASH_WORDS)
    acc = 0
    for b in range(half):
        votes = sum(((h >> b) & 1) * 2 - 1 for h in wh)
        if votes > 0:
            acc |= 1 << b
    for b in range(half):
        votes = sum(
            ((((ts.SIMHASH2_A * h + ts.SIMHASH2_B) % P) >> b) & 1) * 2 - 1
            for h in wh
        )
        if votes > 0:
            acc |= 1 << (half + b)
    return acc


def test_simhash_wide_matches_python(docs):
    got = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", ts.simhash_wide("text").alias("sh")).collect()
    }
    for i, t in enumerate(SAMPLES):
        assert got[i] == py_simhash_wide(t), t


def test_simhash_wide_halves_are_independent(spark):
    # the two mixes must not mirror each other: for a varied corpus the hi
    # half is not a function of the lo half
    texts = _neardup_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(ts.simhash_wide("text", 56).alias("sh")).collect()
    lo_to_hi = {}
    mismatch = False
    for r in rows:
        lo, hi = r["sh"] & ((1 << 28) - 1), r["sh"] >> 28
        if lo in lo_to_hi and lo_to_hi[lo] != hi:
            mismatch = True
        lo_to_hi[lo] = hi
    assert len({r["sh"] for r in rows}) > 1
    assert len(lo_to_hi) > 1 or mismatch


def test_simhash_neardup_wide_matches_bruteforce(spark):
    from scrape_spark.operators.dedup import simhash_neardup_pairs

    texts = _neardup_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bits, k = 56, 3
    sh = [py_simhash_wide(t, bits) for t in texts]
    expected = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if bin(sh[a] ^ sh[b]).count("1") <= k
    }
    got = {
        (r["id_1"], r["id_2"], r["hamming"])
        for r in simhash_neardup_pairs(df, bits=bits, max_hamming=k).collect()
    }
    assert got == expected


# -- text semantic near-dup (hash embedding + LSH bucket + cosine) -------------


def test_text_semantic_pairs_planted(spark):
    from scrape_spark.operators.dedup import text_semantic_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"unrelated document number {i} with words w{i} x{i*7} y{i*13}")
            for i in range(20)]
    # planted near-identical pair (one word changed) + an exact duplicate
    rows += [(100, base), (101, base.replace("lazy", "sleepy")), (102, base)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_1, r.id_2): r.cosine
        for r in text_semantic_pairs(docs, min_cosine=0.8).collect()
    }
    assert (100, 102) in pairs and abs(pairs[(100, 102)] - 1.0) < 1e-12
    assert (100, 101) in pairs and pairs[(100, 101)] >= 0.8
    # ordering contract
    assert all(a < b for a, b in pairs)


def test_text_semantic_pairs_no_cartesian_and_empty_ok(spark):
    from scrape_spark.operators.dedup import text_semantic_pairs

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "a b c")], "doc_id long, text string"
    )
    out = text_semantic_pairs(docs, min_cosine=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = out.collect()
    ids = {i for r in got for i in (r.id_1, r.id_2)}
    assert (1, 3) == (got[0].id_1, got[0].id_2) if got else True
    assert 2 not in ids  # zero-vector doc drops at the NULL-cosine threshold


def test_text_semantic_recall_monotone_in_tables(spark):
    from scrape_spark.operators.dedup import text_semantic_pairs

    rows = [(i, f"doc {i} tok{i} tok{i*3} tok{i*5} shared common words here")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sizes = [
        text_semantic_pairs(docs, n_tables=nt, min_cosine=0.5).count()
        for nt in (1, 2, 4)
    ]
    assert sizes[0] <= sizes[1] <= sizes[2]


# ---------------------------------------------------------------------------
# Efraimidis–Spirakis weighted sampling
# ---------------------------------------------------------------------------

def test_weighted_sample_parity_and_proportionality(spark):
    import duckdb

    from scrape_spark.operators.corpus import weighted_sample, weighted_sample_sql

    docs = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "CASE WHEN id < 500 THEN 9 ELSE 1 END AS w"
    )
    got = [tuple(r) for r in weighted_sample(docs, 100, "w").collect()]
    want = duckdb.connect().execute(
        weighted_sample_sql(
            "SELECT range AS doc_id, CASE WHEN range < 500 THEN 9 ELSE 1 END"
            " AS w FROM range(0,1000)",
            100,
            "w",
        )
    ).fetchall()
    # priorities are 2^-24 fixed-point BIGINTs (ADVICE r3) — the whole
    # row, priority included, must now match exactly across engines
    gs, ws = sorted(got), sorted(want)
    assert gs == ws
    assert all(isinstance(p, int) for _, _, p in gs)
    heavy = sum(1 for r in got if r[0] < 500)
    # weights 9:1 over equal halves → heavy share of a 100-sample ≈ 90
    assert 75 <= heavy <= 99


def test_weighted_sample_stratified_and_edge_cases(spark):
    import duckdb

    from scrape_spark.operators.corpus import weighted_sample, weighted_sample_sql

    docs = spark.range(0, 90).selectExpr(
        "id AS doc_id", "1 AS w", "CAST(id % 3 AS STRING) AS s"
    )
    got = [
        (r["doc_id"], r["s"]) for r in
        weighted_sample(docs, 5, "w", strata_col="s").collect()
    ]
    from collections import Counter

    assert Counter(s for _, s in got) == {"0": 5, "1": 5, "2": 5}
    want = duckdb.connect().execute(
        weighted_sample_sql(
            "SELECT range AS doc_id, 1 AS w, CAST(range % 3 AS VARCHAR) AS s"
            " FROM range(0,90)",
            5,
            "w",
            strata_col="s",
        )
    ).fetchall()
    assert sorted(got) == sorted((r[0], r[1]) for r in want)
    # zero/negative/NULL weights excluded; n >= eligible rows → all eligible
    docs2 = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 2)], "doc_id long, w int"
    )
    ids = {r["doc_id"] for r in weighted_sample(docs2, 10, "w").collect()}
    assert ids == {1, 5}


def test_weighted_sample_fractional_weights_and_int32_ids(spark):
    """Fractional weights (novelty/DSIR are in [0,1]) must carry real
    mass — a long cast truncated 0.7 to zero and dropped the doc — and
    int32 id columns must not overflow the digest multiply."""
    import duckdb

    from scrape_spark.operators.corpus import weighted_sample, weighted_sample_sql

    docs = spark.createDataFrame(
        [(1, 0.7), (2, 0.9), (3, 1.9), (4, 3.0)], "doc_id int, w double"
    )
    got = {(r["doc_id"], r["weight"]) for r in weighted_sample(docs, 10, "w").collect()}
    assert got == {(1, 0.7), (2, 0.9), (3, 1.9), (4, 3.0)}
    want = duckdb.connect().execute(
        weighted_sample_sql(
            "SELECT * FROM (VALUES (1, 0.7),(2, 0.9),(3, 1.9),(4, 3.0))"
            " t(doc_id, w)",
            10,
            "w",
        )
    ).fetchall()
    assert got == {(r[0], r[1]) for r in want}
