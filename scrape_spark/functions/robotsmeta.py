"""Page-level robots directives: ``<meta name="robots">`` and rel=nofollow.

robots.txt (operators/robots.py) gates FETCHING; the robots meta tag gates
what a crawler may do with a page it already fetched: ``noindex`` (don't
surface/store the document), ``nofollow`` (don't expand its links), and
``none`` (shorthand for both, per the Robots Exclusion Protocol's HTML
extension). Anchor-level ``rel="nofollow"`` marks individual edges the
publisher disavows — production webgraphs (and PageRank over them) drop
those edges, which is also the classic anti-link-spam measure alongside
TrustRank (operators/webrank.py).

The reference fetches and parses but never reads these directives (no
meta handling anywhere in scraper.py / link_extractor.py) — honoring them
is lake-side curation and graph hygiene, so the kernels live here under
the house discipline: dialect-shared anchored regexps, map-side, no
Python worker. Directive matching is the REP token grammar: the content
value is a comma-separated list, case-insensitive, whitespace around
tokens ignored — matched by normalizing to ``,tok1,tok2,`` and testing
``contains`` for ``,tok,`` (substring false-positives like
``nofollowme`` are impossible because of the comma fencing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scrape_spark.functions.metadata import (
    META_CONTENT_FIRST,
    META_NAME_FIRST,
)

#: Anchor tags, for the rel=nofollow edge pass. href/rel in either order.
#: The character after ``<a`` is a REAL whitespace class (space/tab/CR/LF
#: spliced literally — both engines accept them inside string literals,
#: and literal characters keep the pattern backslash-free), so anchors
#: whose first attribute sits on its own line still match.
A_TAG_RE = "(?is)<a[ \t\r\n][^>]*>"
HREF_RE = '(?i)href="([^"]*)"'
REL_RE = '(?i)rel="([^"]*)"'


def _all_robots_content_sql(html: str, spark: bool) -> str:
    """Comma-joined content values of EVERY ``<meta name="robots">`` tag —
    REP semantics combine multiple robots metas (real pages split
    directives across tags), so first-match extraction is not enough. The
    one dialect split is the list join (array_join vs array_to_string)."""
    pats = [
        META_NAME_FIRST.format(name="robots"),
        META_CONTENT_FIRST.format(name="robots"),
    ]
    lists = [f"regexp_extract_all({html}, '{p}', 1)" for p in pats]
    if spark:
        joined = " || ',' || ".join(f"array_join({l}, ',')" for l in lists)
    else:
        # DuckDB's array_to_string returns NULL (not '') for an empty list
        joined = " || ',' || ".join(
            f"coalesce(array_to_string({l}, ','), '')" for l in lists
        )
    return f"({joined})"


def _meta_token_sql(html: str, token: str, spark: bool) -> str:
    """True iff any robots meta declares ``token`` (or ``none`` for the
    index/follow pair) — NULL-free: no tags means no restriction."""
    content = _all_robots_content_sql(html, spark)
    fenced = f"',' || replace(lower({content}), ' ', '') || ','"
    test = f"contains({fenced}, ',{token},')"
    if token in ("noindex", "nofollow"):
        return f"({test} OR contains({fenced}, ',none,'))"
    return test


def robots_noindex_sql(html: str, spark: bool = True) -> str:
    """True iff the page declares noindex (or none)."""
    return _meta_token_sql(html, "noindex", spark)


def robots_nofollow_sql(html: str, spark: bool = True) -> str:
    """True iff the page declares nofollow (or none) — ALL its links are
    disavowed, regardless of per-anchor rel attributes."""
    return _meta_token_sql(html, "nofollow", spark)


def robots_meta_flags(
    pages: DataFrame, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, noindex, nofollow) — one map-side pass."""
    return pages.select(
        F.col(url_col).alias("url"),
        F.expr(robots_noindex_sql(html_col)).alias("noindex"),
        F.expr(robots_nofollow_sql(html_col)).alias("nofollow"),
    )


def robots_meta_flags_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`robots_meta_flags` (same spliced kernels)."""
    return f"""SELECT url,
  {robots_noindex_sql('html_str', spark=False)} AS noindex,
  {robots_nofollow_sql('html_str', spark=False)} AS nofollow
FROM ({pages_sql})"""


def nofollow_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, href) DISTINCT anchor targets the page disavows via
    ``rel="nofollow"`` (including multi-token rels like
    ``rel="external nofollow"`` — rel is a space-separated token list).

    hrefs are returned as written; the caller joining against a webgraph
    resolves/normalizes them with the same kernel that built the edges,
    so the keys agree by construction.
    """
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.expr(f"regexp_extract_all({html_col}, '{A_TAG_RE}', 0)")
        ).alias("tag"),
    )
    rel = f"' ' || lower(regexp_extract(tag, '{REL_RE}', 1)) || ' '"
    return (
        tags.where(F.expr(f"contains({rel}, ' nofollow ')"))
        .select(
            "url",
            F.expr(f"regexp_extract(tag, '{HREF_RE}', 1)").alias("href"),
        )
        .where(F.col("href") != "")
        .distinct()
    )


def nofollow_edges_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`nofollow_edges`."""
    rel = f"' ' || lower(regexp_extract(tag, '{REL_RE}', 1)) || ' '"
    return f"""WITH T AS (SELECT url,
    unnest(regexp_extract_all(html_str, '{A_TAG_RE}', 0)) AS tag
  FROM ({pages_sql}))
SELECT DISTINCT url, regexp_extract(tag, '{HREF_RE}', 1) AS href
FROM T
WHERE contains({rel}, ' nofollow ')
  AND regexp_extract(tag, '{HREF_RE}', 1) <> ''"""


def apply_link_policy(
    edges: DataFrame,
    pages: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    url_col: str = "url",
    html_col: str = "html_str",
    resolve_hrefs: bool = True,
) -> DataFrame:
    """Drop webgraph edges the publisher disavows, before ranking.

    Removes (a) every out-edge of a page declaring meta nofollow and
    (b) each anchor-level rel=nofollow edge. Both prune sides are tiny
    projections of the pages scan ((url) and (url, href)); the meta set
    is typically small enough to broadcast — Spark's join planner sees
    its size after the scan prune and picks the strategy, and AQE
    converts to broadcast at runtime when the estimate was wrong. The
    html column never enters an exchange.

    With ``resolve_hrefs`` (default), nofollow hrefs are resolved against
    the page URL with the shared src-resolution kernel
    (functions/imgtext.py), matching webgraphs whose ``dst`` keys are
    resolved absolute URLs — without it, a relative ``href="/spam"``
    could never equal an absolute dst and the anchor prune would silently
    no-op. Pass False only when the edge table's dst keys are the raw
    href strings.
    """
    from scrape_spark.functions.imgtext import resolve_src_sql

    meta_nf = robots_meta_flags(pages, url_col, html_col).where(
        F.col("nofollow")
    ).select(F.col("url").alias(src_col))
    anchor_nf = nofollow_edges(pages, url_col, html_col)
    href = (
        F.expr(resolve_src_sql("href", "url"))
        if resolve_hrefs
        else F.col("href")
    )
    anchor_nf = anchor_nf.select(
        F.col("url").alias(src_col), href.alias(dst_col)
    )
    return edges.join(meta_nf, [src_col], "left_anti").join(
        anchor_nf, [src_col, dst_col], "left_anti"
    )
