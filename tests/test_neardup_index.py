"""NearDupIndex — standing incremental LSH index, LSM discipline.

Every maintained state is pinned bit-identical to a from-scratch build on
the live corpus, and probe results to a brute-force banded check computed
in plain Python from collected signatures.
"""

import pytest
from pyspark.sql import functions as F

from scrape_spark.functions import textstats as ts
from scrape_spark.operators.dedup import NearDupIndex, minhash_signatures
from scrape_spark.plans.statestore import SnapshotStore

N_BANDS = 4
MIN_J = 0.25


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus_v1():
    # planted near-dup families: i and i+100 share most words
    rows = []
    for i in range(40):
        base = " ".join(f"w{i}g{j}" for j in range(10))
        rows.append((i, base))
        rows.append((i + 100, base + " extra tail"))
    rows.append((900, ""))  # empty doc
    return rows


def _band_set(df):
    return {
        (r["band_idx"], r["band_val"], r["doc_id"], tuple(r["sig"]))
        for r in df.collect()
    }


def _brute_probe(spark, batch_rows, corpus_rows):
    """Banded-LSH probe spec in plain Python over collected signatures."""
    sig = {
        r["doc_id"]: tuple(r["sig"])
        for r in minhash_signatures(
            _docs(spark, batch_rows + corpus_rows)
        ).collect()
    }
    out = {}
    for bid, _ in batch_rows:
        for cid, _ in corpus_rows:
            if bid == cid:
                continue
            if not any(sig[bid][b] == sig[cid][b] for b in range(N_BANDS)):
                continue
            n = sum(a == b for a, b in zip(sig[bid], sig[cid]))
            if n >= MIN_J * ts.N_MINHASH:
                out[(bid, cid)] = n
    return out


def _probe_dict(df):
    return {
        (r["probe_id"], r["index_id"]): r["n_sig_match"] for r in df.collect()
    }


def _idx(spark, tmp_path, name="ndx"):
    return NearDupIndex(
        SnapshotStore(spark, str(tmp_path / name)),
        n_bands=N_BANDS,
        min_est_jaccard=MIN_J,
    )


def test_build_rows_match_map_side_band_rows(spark, tmp_path):
    idx = _idx(spark, tmp_path)
    corpus = _docs(spark, _corpus_v1())
    idx.build(corpus)
    assert _band_set(idx.rows()) == _band_set(idx._band_rows(corpus))
    # n_bands rows per doc
    assert idx.rows().count() == len(_corpus_v1()) * N_BANDS


def test_probe_matches_brute_force(spark, tmp_path):
    corpus = _corpus_v1()
    batch = [(5000 + i, " ".join(f"w{i}g{j}" for j in range(10)) + " suffix")
             for i in range(8)]
    batch.append((5100, "completely unrelated zz yy xx"))
    idx = _idx(spark, tmp_path)
    idx.build(_docs(spark, corpus))
    got = _probe_dict(idx.probe(_docs(spark, batch)))
    assert got == _brute_probe(spark, batch, corpus)
    assert got  # the planted families must actually collide


def test_update_pinned_to_full_rebuild(spark, tmp_path):
    v1 = _corpus_v1()
    idx = _idx(spark, tmp_path)
    idx.build(_docs(spark, v1))

    # v2: doc 0 changed, doc 1 removed, doc 7777 added
    v2 = {i: t for i, t in v1}
    v2[0] = "entirely new words here now"
    del v2[1]
    v2[7777] = " ".join(f"w3g{j}" for j in range(10))
    v2_rows = sorted(v2.items())
    diff = spark.createDataFrame(
        [(0, "changed"), (1, "removed"), (7777, "added")]
        + [(i, "unchanged") for i in v2 if i not in (0, 7777)],
        "doc_id long, status string",
    )
    idx.update(diff, _docs(spark, v2_rows))

    fresh = _idx(spark, tmp_path, "fresh")
    fresh.build(_docs(spark, v2_rows))
    assert _band_set(idx.rows()) == _band_set(fresh.rows())

    # probe parity on the maintained index
    batch = [(8888, " ".join(f"w3g{j}" for j in range(10)))]
    assert _probe_dict(idx.probe(_docs(spark, batch))) == _brute_probe(
        spark, batch, v2_rows
    )


def test_compact_preserves_state(spark, tmp_path):
    v1 = _corpus_v1()
    idx = _idx(spark, tmp_path)
    idx.build(_docs(spark, v1))
    diff = spark.createDataFrame([(1, "removed")], "doc_id long, status string")
    idx.update(diff, _docs(spark, [r for r in v1 if r[0] != 1]))
    before = _band_set(idx.rows())
    assert idx.store.chain_length(idx.TABLE) == 1  # deltas since base
    idx.compact()
    assert idx.store.chain_length(idx.TABLE) == 0
    assert _band_set(idx.rows()) == before


def test_n_bands_mismatch_raises(spark, tmp_path):
    idx = _idx(spark, tmp_path)
    idx.build(_docs(spark, _corpus_v1()[:4]))
    other = NearDupIndex(idx.store, n_bands=2)
    with pytest.raises(ValueError, match="n_bands"):
        other.rows()


def test_unbuilt_index_raises(spark, tmp_path):
    with pytest.raises(KeyError, match="not built"):
        _idx(spark, tmp_path).rows()


def test_changed_doc_old_signature_gone(spark, tmp_path):
    """A changed doc's OLD band rows must not produce probe candidates."""
    v1 = [(1, "alpha beta gamma delta"), (2, "unrelated text body")]
    idx = _idx(spark, tmp_path)
    idx.build(_docs(spark, v1))
    v2 = [(1, "zz qq rr ss"), (2, "unrelated text body")]
    diff = spark.createDataFrame(
        [(1, "changed"), (2, "unchanged")], "doc_id long, status string"
    )
    idx.update(diff, _docs(spark, v2))
    # a probe identical to doc 1's OLD text must not match doc 1 anymore
    got = _probe_dict(idx.probe(_docs(spark, [(99, "alpha beta gamma delta")])))
    assert got == _brute_probe(spark, [(99, "alpha beta gamma delta")], v2)
    assert (99, 1) not in got


# ---------------------------------------------------------------------------
# winnowing fingerprints (SWA03) — selection guarantee + cross-engine parity
# ---------------------------------------------------------------------------

def _winnow_duck(sql):
    import duckdb

    return duckdb.connect().execute(sql).fetchall()


def test_winnow_guarantee_on_planted_passage(spark):
    """Any shared run of >= g + window - 1 tokens must yield >= 1 shared
    fingerprint (SWA03 theorem); unrelated docs must not pair."""
    from scrape_spark.operators.dedup import winnowed_dup_candidates

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam"
    rows = [
        (1, f"intro words here {passage} closing remarks"),
        (2, f"different opening {passage} and another tail entirely"),
        (3, "totally unrelated text about fish and chips today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_1"], r["id_2"]) for r in winnowed_dup_candidates(docs).collect()}
    assert got == {(1, 2)}


def test_winnow_density_reduction(spark):
    """Winnowing must select far fewer fingerprints than raw gram hashes
    (expected density 2/(window+1)) while never selecting zero on a
    non-empty doc."""
    from pyspark.sql import functions as F

    from scrape_spark.functions import textstats as ts
    from scrape_spark.operators.dedup import (
        window_hashes_sql,
        winnow_fingerprints_sql,
    )

    words = " ".join(f"w{i % 97}x{i % 89}" for i in range(400))
    df = spark.createDataFrame(
        [(words,), ("six tokens just under one window",), ("",)], "text string"
    )
    d = ts.SPARK_DIALECT
    r = df.select(
        F.expr(f"size({winnow_fingerprints_sql('text', d)})").alias("n_fp"),
        F.expr(f"size({window_hashes_sql('text', d, 4)})").alias("n_gram"),
    ).collect()
    long_doc = r[0]
    assert 0 < long_doc["n_fp"] < long_doc["n_gram"] // 2
    assert r[1]["n_fp"] == 1  # grams exist but < window: global min kept
    assert r[2]["n_fp"] == 0  # empty doc: no fingerprints


def test_winnow_candidates_match_duckdb(spark):
    from scrape_spark.operators.dedup import (
        winnowed_dup_candidates,
        winnowed_dup_candidates_sql,
    )

    # overlapping shingled corpus: doc i shares a sliding window of tokens
    # with its neighbors
    rows = [
        (i, " ".join(f"tok{j}" for j in range(i, i + 30))) for i in range(25)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in winnowed_dup_candidates(docs, min_shared=2).collect()
    )
    vals = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows
    )
    want = sorted(_winnow_duck(winnowed_dup_candidates_sql(vals, min_shared=2)))
    assert got == want and len(got) > 0


def test_winnow_stop_fingerprint_screen(spark):
    """A fingerprint present in every doc (shared boilerplate) must be
    dropped by the max_df screen instead of pairing all docs."""
    from scrape_spark.operators.dedup import winnowed_dup_candidates

    boiler = " ".join(f"b{i}" for i in range(12))
    rows = [(i, f"{boiler} unique{i} distinct{i} words{i} here{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # boilerplate hits all 10 docs; max_df=5 screens it out entirely
    got = winnowed_dup_candidates(docs, max_df=5).collect()
    assert got == []


def test_winnow_novelty_scores(spark):
    """Corpus copies score 0, fresh docs 10^6, gram-less docs NULL; parity
    with the DuckDB twin."""
    from scrape_spark.operators.dedup import winnow_novelty, winnow_novelty_sql

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    new_rows = [
        (1, shared),
        (2, "fresh words entirely novel content nothing shared here at all"),
        (3, "xy"),
        (4, f"{shared} plus a genuinely new second half of tokens here now"),
    ]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    corpus = spark.createDataFrame([(10, shared)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_fp"], r["n_novel"], r["novelty_ppm"])
        for r in winnow_novelty(new, corpus).collect()
    }
    assert got[1] == (1, 0, 0)
    assert got[2][2] == 1_000_000
    assert got[3] == (0, 0, None)
    assert 0 < got[4][2] < 1_000_000  # partial copy: strictly between
    vals_new = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in new_rows
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in _winnow_duck(
            winnow_novelty_sql(
                vals_new, f"SELECT 10 AS doc_id, '{shared}' AS text"
            )
        )
    }
    assert got == want


def test_winnow_guarantee_randomized_corpora(spark):
    """Property: for random docs with a planted shared run of length
    >= g + window - 1 tokens, the pair is ALWAYS found; docs with no
    shared run of >= g tokens never pair. One batched DataFrame."""
    import random

    from scrape_spark.operators.dedup import (
        WINNOW_G,
        WINNOW_W,
        winnowed_dup_candidates,
    )

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    expected = set()
    doc_id = 0
    for case in range(12):
        run_len = WINNOW_G + WINNOW_W - 1 + rng.randint(0, 6)
        # unique-token passage (disjoint from vocab) guarantees no
        # accidental cross-case collisions
        passage = " ".join(f"p{case}x{j}" for j in range(run_len))
        a_pad = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        b_pad = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        rows.append((doc_id, f"{a_pad} {passage}".strip()))
        rows.append((doc_id + 1, f"{passage} {b_pad}".strip()))
        expected.add((doc_id, doc_id + 1))
        doc_id += 2
    # distractors built from tokens never shared >= g in a row: each doc
    # uses its own disjoint token namespace
    for case in range(6):
        rows.append(
            (doc_id, " ".join(f"d{case}q{j}" for j in range(25)))
        )
        doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_1"], r["id_2"])
        for r in winnowed_dup_candidates(docs, max_df=4).collect()
    }
    assert expected <= got  # the SWA03 guarantee, every planted pair
    planted_ids = {i for p in expected for i in p}
    for a, b in got - expected:
        # any extra pair must come from vocab padding overlap between
        # planted docs, never from the distractor namespace
        assert a in planted_ids and b in planted_ids, (a, b)
