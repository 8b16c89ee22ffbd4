"""Vectorized pandas/Arrow UDFs — the engine's only Python execution path.

One fused UDF parses each page ONCE and emits everything downstream operators
need (the reference parses up to three times per page: title scraper.py:88,
links scraper.py:154-158, text fetch_and_store_robots.py:35-37; Catalyst does
not common-subexpression-eliminate Python UDFs, so fusion is done here by
hand — SURVEY.md §2.9, §4.2).

No per-row Python anywhere else (BASELINE.json input_hint): sha256 is Spark's
builtin ``sha2`` (identical hex output to the reference's hashlib usage,
scraper.py:23-25), URL hashing is ``xxhash64``, host/path parsing is
``parse_url``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from scrape_spark.functions.htmlparse import parse_page

LINK_TYPE = StructType(
    [
        StructField("url", StringType()),
        StructField("anchor_text", StringType()),
        StructField("link_pos", IntegerType()),
    ]
)

PARSED_TYPE = StructType(
    [
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("links", ArrayType(LINK_TYPE)),
    ]
)


def _decode(html) -> str:
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", errors="replace")
    return str(html)


@F.pandas_udf(PARSED_TYPE)
def _parse_page_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    texts, titles, links_col = [], [], []
    for h, u in zip(html, url):
        text, title, links = parse_page(_decode(h), u if u else None)
        texts.append(text)
        titles.append(title)
        links_col.append(links)
    return pd.DataFrame({"text": texts, "title": titles, "links": links_col})


def parse_page_expr(html: Column | str, url: Column | str) -> Column:
    """struct(text, title, links) — one Arrow-batched parse per page.

    ``links`` is array<struct<url, anchor_text, link_pos>> already filtered by
    is_under_base against the page's own URL and normalized
    (link_extractor.py:14-45); explode with ``posexplode``-preserving
    ``link_pos`` for deterministic ordering (SURVEY.md §7.4).
    """
    html = F.col(html) if isinstance(html, str) else html
    url = F.col(url) if isinstance(url, str) else url
    return _parse_page_udf(html, url)


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Standalone text extraction (byte-identical invariant path)."""
    return html.map(lambda h: parse_page(_decode(h))[0])


@F.pandas_udf(StringType())
def extract_title_udf(html: pd.Series) -> pd.Series:
    """Standalone title extraction (reference link_extractor.py:48-63)."""
    return html.map(lambda h: parse_page(_decode(h))[1])


def content_hash(text: Column | str) -> Column:
    """SHA-256 hex of page text — builtin, JVM-side (reference scraper.py:23-25).

    The reference hashes the *decoded str* content; Spark's sha2 over the
    UTF-8 re-encoding produces the same hex for valid-UTF-8 content.
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.lower(F.sha2(text, 256))


def title_with_fallback(parsed_title: Column, url: Column) -> Column:
    """``extract_title(content) or urlparse(url).netloc`` (scraper.py:88).

    Empty-string titles (whitespace-only <title>) are falsy in the reference
    and fall back to the host as well.
    """
    return F.when(
        parsed_title.isNotNull() & (parsed_title != F.lit("")), parsed_title
    ).otherwise(F.try_parse_url(url, F.lit("HOST")))
