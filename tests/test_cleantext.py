"""Punctuation-normalization + mojibake kernels: hand-computed semantics."""

from scrape_spark.functions.cleantext import (
    MOJIBAKE_MARKERS,
    mojibake_count,
    normalize_punct,
)


def test_normalize_punct_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "don’t — “quoted” … end"),
            (2, "a b c"),  # exotic spaces -> plain spaces
            (3, "zero​width‌﻿gone"),
            (4, "plain ascii stays"),
        ],
        "i long, s string",
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_punct("s").alias("n")).collect()
    }
    assert got[1] == "don't - \"quoted\" ... end"
    assert got[2] == "a b c"
    assert got[3] == "zerowidthgone"
    assert got[4] == "plain ascii stays"


def test_mojibake_count_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "Ã©tÃ© already"),  # two Ã© hits
            (2, "fineé text ü"),  # real accents, no artifacts
            (3, "â€™ and Â« pair Â»"),
        ],
        "i long, s string",
    )
    got = {
        r["i"]: r["m"]
        for r in df.select("i", mojibake_count("s").alias("m")).collect()
    }
    assert got[1] == 2 and got[2] == 0 and got[3] == 3


def test_markers_are_printable_and_quote_free():
    for m in MOJIBAKE_MARKERS:
        assert "'" not in m and all(ch.isprintable() for ch in m)


def test_char_entropy_values_and_parity(spark):
    import duckdb

    from scrape_spark.functions import textstats as ts

    texts = [
        "aaaa", "ab", "abab", "", "abcd",
        "the quick brown fox jumps over the lazy dog",
        "aAbB  \n\tmixed Whitespace and CASE!",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["e"]
        for r in df.select(
            "i",
            F.expr(ts.char_entropy_q4_sql("t", ts.SPARK_DIALECT)).alias("e"),
        ).collect()
    }
    assert got[0] == 0 and got[3] == 0          # uniform + empty
    assert got[1] == got[2] == 6931             # ln 2
    assert got[4] == 13862                      # ln 4
    assert 29000 < got[5] < 32000               # prose ~3.0 nats
    for i, t in enumerate(texts):
        q = (
            f"SELECT {ts.char_entropy_q4_sql('t', ts.DUCK_DIALECT)} "
            f"FROM (SELECT '{t.replace(chr(39), chr(39) * 2)}' AS t)"
        )
        assert duckdb.sql(q).fetchall()[0][0] == got[i], t
