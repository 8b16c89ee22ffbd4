"""Structured page metadata kernels: OpenGraph, meta description, JSON-LD.

A training-data lake keeps more of a page than its text: publishers declare
the page's title/description/image via OpenGraph ``<meta property="og:*">``
tags, a plain ``<meta name="description">``, and schema.org JSON-LD script
blocks. Curation pipelines use these as document-level features (title
quality, article-vs-product typing, declared publish date for temporal
splits) and multimodal pipelines read ``og:image`` as the page's
representative image without parsing the body.

The reference's parser stops at anchors/title/text (link_extractor.py:14-63)
— metadata extraction is lake-side curation, so these live beside the
canonical/charset kernels (functions/canonical.py) under the same
discipline: dialect-shared anchored regexps (``[^"]*`` value classes, no
backslashes, both attribute orders, case-insensitive), map-side JVM
expressions, no Python worker, no shuffle.

JSON-LD is the one dialect split in this module: the block is lifted with a
shared regexp, but field extraction uses each engine's JSON path function
(Spark ``get_json_object`` — NULL on invalid JSON; DuckDB
``json_extract_string`` guarded by ``json_valid`` so invalid JSON degrades
to NULL identically). Only the FIRST ld+json block is read — the common
publisher layout puts the Article object first; multi-object graphs
(``@graph`` arrays) keep their raw block in ``jsonld_raw`` for a caller
with a real JSON parser stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: OpenGraph property tag, both attribute orders — splice a property name
#: (letters/underscores only, caller-controlled) into {prop}.
OG_PROP_FIRST = '(?i)<meta[^>]*property="og:{prop}"[^>]*content="([^"]*)"'
OG_CONTENT_FIRST = '(?i)<meta[^>]*content="([^"]*)"[^>]*property="og:{prop}"'

#: Named meta tag (description, robots, …), both attribute orders.
META_NAME_FIRST = '(?i)<meta[^>]*name="{name}"[^>]*content="([^"]*)"'
META_CONTENT_FIRST = '(?i)<meta[^>]*content="([^"]*)"[^>]*name="{name}"'

#: First JSON-LD script block (schema.org structured data). ``[+]`` is a
#: character class, not an escape — keeps the pattern backslash-free.
JSONLD_BLOCK_RE = (
    '(?is)<script[^>]*type="application/ld[+]json"[^>]*>(.*?)</script>'
)

#: JSON-LD fields surfaced as first-class columns. ``@``-prefixed keys
#: need per-dialect path quoting (``$['@type']`` vs ``$."@type"``).
_JSONLD_FIELDS = (
    ("jsonld_type", "@type"),
    ("jsonld_headline", "headline"),
    ("jsonld_date_published", "datePublished"),
)


def _first_match_sql(html: str, patterns: list[str]) -> str:
    """NULL-or-value over ordered regexps (first non-empty match wins) —
    dialect-shared (regexp_extract semantics verified byte-identical)."""
    exprs = [f"regexp_extract({html}, '{p}', 1)" for p in patterns]
    whens = " ".join(f"WHEN {e} <> '' THEN {e}" for e in exprs)
    return f"CASE {whens} ELSE NULL END"


def og_sql(html: str, prop: str) -> str:
    """NULL-or-value of the ``og:<prop>`` declaration (both orders)."""
    return _first_match_sql(
        html,
        [OG_PROP_FIRST.format(prop=prop), OG_CONTENT_FIRST.format(prop=prop)],
    )


def meta_name_sql(html: str, name: str) -> str:
    """NULL-or-value of ``<meta name="<name>" content="...">``."""
    return _first_match_sql(
        html,
        [META_NAME_FIRST.format(name=name), META_CONTENT_FIRST.format(name=name)],
    )


def jsonld_raw_sql(html: str) -> str:
    """NULL-or-raw-text of the first ld+json block (dialect-shared)."""
    e = f"regexp_extract({html}, '{JSONLD_BLOCK_RE}', 1)"
    return f"nullif(trim({e}), '')"


def jsonld_field_sql(json_expr: str, field: str, spark: bool) -> str:
    """Extract a top-level string field from a JSON expression.

    The one per-dialect split: Spark's ``get_json_object`` already yields
    NULL on invalid JSON; DuckDB's ``json_extract_string`` raises, so it is
    guarded by ``json_valid`` — invalid blocks degrade to NULL on BOTH
    engines (asserted by the parity tests and the oracle fixture's broken-
    JSON rows).
    """
    path = f"$.{field}"  # unquoted @-keys parse on BOTH engines (verified)
    if spark:
        return f"get_json_object({json_expr}, '{path}')"
    return (
        f"CASE WHEN json_valid({json_expr}) "
        f"THEN json_extract_string({json_expr}, '{path}') END"
    )


#: The metadata projection: (output column, og property / meta name).
_OG_PROPS = ("title", "description", "image", "type")


def page_metadata(
    pages: DataFrame, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, og_title, og_description, og_image, og_type,
    meta_description, jsonld_raw, jsonld_type, jsonld_headline,
    jsonld_date_published) — one map-side pass, every column NULL when the
    page declares nothing."""
    cols: list[Column] = [F.col(url_col).alias("url")]
    for prop in _OG_PROPS:
        cols.append(F.expr(og_sql(html_col, prop)).alias(f"og_{prop}"))
    cols.append(
        F.expr(meta_name_sql(html_col, "description")).alias("meta_description")
    )
    raw = jsonld_raw_sql(html_col)
    cols.append(F.expr(raw).alias("jsonld_raw"))
    for out, field in _JSONLD_FIELDS:
        cols.append(F.expr(jsonld_field_sql(raw, field, spark=True)).alias(out))
    return pages.select(*cols)


def page_metadata_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`page_metadata` over ``(url, html_str)`` rows —
    spliced from the SAME regex constants; only the JSON path call differs
    (see :func:`jsonld_field_sql`)."""
    parts = ["url"]
    for prop in _OG_PROPS:
        parts.append(f"{og_sql('html_str', prop)} AS og_{prop}")
    parts.append(
        f"{meta_name_sql('html_str', 'description')} AS meta_description"
    )
    raw = jsonld_raw_sql("html_str")
    parts.append(f"{raw} AS jsonld_raw")
    for out, field in _JSONLD_FIELDS:
        parts.append(f"{jsonld_field_sql(raw, field, spark=False)} AS {out}")
    sel = ",\n  ".join(parts)
    return f"SELECT {sel}\nFROM ({pages_sql})"
