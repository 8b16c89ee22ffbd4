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
