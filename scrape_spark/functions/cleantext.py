"""Text normalization + encoding-damage kernels (dialect-shared).

Web-extracted text arrives with typographic punctuation (curly quotes,
em-dashes, non-breaking/zero-width spaces) and, worse, mojibake — UTF-8
bytes decoded as Latin-1/Windows-1252 somewhere upstream ("été" → "Ã©tÃ©",
"'" → "â€™"). A training-data pipeline normalizes the first and flags the
second before tokenization (the reference crawler stores raw text verbatim,
fetch_and_store_robots.py:37 — these are engine extensions).

Both kernels are single map-side string expressions that compile verbatim
on Spark and DuckDB (`translate`/`replace`/`length` have identical
semantics), so the oracle replay is the same string — no dialect table
needed. Zero Python, zero shuffle, O(len) per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from scrape_spark.functions.textstats import occurrences_sql, sql_str_literal

#: typographic → ASCII map (1:1 positions); the tail beyond ``NORM_TO``'s
#: length is DELETED by translate (zero-width chars: ZWSP/ZWNJ/ZWJ/BOM) —
#: the length difference is the documented deletion feature of translate
#: in both engines, not an accident.
NORM_FROM = (
    "\u2019\u2018\u201c\u201d\u2014\u2013\u2212"  # curly quotes + dashes
    "\u00a0\u2009\u200a"  # nbsp, thin space, hair space
    "\u200b\u200c\u200d\ufeff"  # zero-width (deleted)
)
NORM_TO = "''\"\"---   "

#: common UTF-8-as-Windows-1252 double-decode artifacts. Printable-only by
#: construction (SQL literals must not need backslash escapes): the Latin-1
#: reading of the UTF-8 bytes of é è á ó ú ñ ü ö ä ç, and of the smart
#: punctuation ' " – — « » °.
MOJIBAKE_MARKERS = [
    "Ã©",  # é
    "Ã¨",  # è
    "Ã¡",  # á
    "Ã³",  # ó
    "Ãº",  # ú
    "Ã±",  # ñ
    "Ã¼",  # ü
    "Ã¶",  # ö
    "Ã¤",  # ä
    "Ã§",  # ç
    "â€™",  # ' (â€™)
    "â€œ",  # " (â€œ)
    "â€“",  # – (â€“)
    "â€”",  # — (â€")
    "Â«",  # «
    "Â»",  # »
    "Â°",  # °
]


def normalize_punct_sql(text: str, d: dict | None = None) -> str:
    """Typographic-punctuation normalization: curly quotes → ASCII quotes,
    en/em/minus dashes → '-', exotic spaces → ' ', zero-width chars deleted,
    ellipsis → '...'. The ``d`` parameter is accepted for fuzz-harness
    uniformity; the expression is dialect-invariant."""
    t = (
        f"translate({text}, {sql_str_literal(NORM_FROM)}, "
        f"{sql_str_literal(NORM_TO)})"
    )
    return f"replace({t}, {sql_str_literal(chr(0x2026))}, '...')"


def mojibake_count_sql(text: str, d: dict | None = None) -> str:
    """Total occurrences of the double-decode artifact markers (exact int —
    each occurrence term is length arithmetic; characters, not bytes)."""
    terms = [occurrences_sql(text, m) for m in MOJIBAKE_MARKERS]
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def normalize_punct(text_col: str) -> Column:
    return F.expr(normalize_punct_sql(text_col))


def mojibake_count(text_col: str) -> Column:
    return F.expr(mojibake_count_sql(text_col))
