"""Head-metadata extraction kernels: ``rel=canonical`` and charset.

Web pages declare their preferred URL via ``<link rel="canonical"
href="...">``; at lake scale the declared canonical collapses print views,
tracking-parameter variants and mirrored paths that CONTENT hashing also
catches, plus paginated/parametrized variants it does not (different bytes,
same logical page). Common Crawl's curation pipelines honor it as a
dedup signal alongside content hashes.

The reference's parser extracts anchors/title/text only (link_extractor.py
:14-63) — canonical handling is lake-side curation, so it lives here as a
dialect-templated regexp kernel (same discipline as sources/sitemap.py:
anchored, non-backtracking, shared verbatim with the DuckDB oracle) rather
than inside the crawl's fused parse UDF, whose schema mirrors the
reference. A regexp (not the HTML state machine) is deliberate: the lake
pass wants one attribute from ``<head>``, not a full parse — map-side,
no Python worker, no shuffle.

Both attribute orders are handled (``rel`` before or after ``href``);
matching is case-insensitive; a missing or empty declaration yields NULL.
Values are taken as written (absolute URLs in the fixtures/tests);
resolving relative canonicals against the page URL belongs to the caller,
who has the base URL and functions/udfs.py's urljoin kernel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: rel then href / href then rel — spliced verbatim into BOTH dialects
#: (no backslashes, so SQL-literal escaping is a non-issue).
CANON_RE_REL_FIRST = '(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"'
CANON_RE_HREF_FIRST = '(?i)<link[^>]*href="([^"]*)"[^>]*rel="canonical"'


def canonical_sql(html: str, d: dict) -> str:
    """NULL-or-URL canonical declaration of HTML column ``html``.

    ``d`` is accepted for signature symmetry with the other dialect kernels
    but unused: ``regexp_extract`` and its ''-on-no-match contract are
    byte-identical in Spark and DuckDB (same verification as
    sources/sitemap.py), so one text serves both.
    """
    del d
    e1 = f"regexp_extract({html}, '{CANON_RE_REL_FIRST}', 1)"
    e2 = f"regexp_extract({html}, '{CANON_RE_HREF_FIRST}', 1)"
    return (
        f"CASE WHEN {e1} <> '' THEN {e1} "
        f"WHEN {e2} <> '' THEN {e2} ELSE NULL END"
    )


def canonical_col(html_col: str = "html") -> Column:
    """The Spark-side canonical-URL column (JVM regexp, map-only)."""
    from scrape_spark.functions.textstats import SPARK_DIALECT

    return F.expr(canonical_sql(html_col, SPARK_DIALECT))


#: Declared-charset patterns (WHATWG sniffing, the declared subset).
#: Three meta forms, each anchored so a charset MENTION inside an
#: unrelated attribute (a description meta saying "set charset=big5")
#: cannot masquerade as a declaration:
#: - HTML5: charset as the first attribute of the tag;
#: - legacy: http-equiv=content-type with the charset parameter in the
#:   SAME tag's content value, both attribute orders;
#: - XML declaration for XHTML feeds.
#: Whitespace around '=' is spec-legal; spaces are accepted everywhere
#: (tabs would need a backslash escape, which the dialect-shared-verbatim
#: rule forbids — out of scope, like single-quoted attribute values).
#: ``<[?]xml`` — a character class, not an escape — keeps the patterns
#: backslash-free so one text serves both engines.
CHARSET_HTML5_RE = '(?i)<meta[ ]+charset *= *["]?([a-zA-Z0-9_-]+)'
CHARSET_EQUIV_RE = (
    '(?i)<meta[^>]*http-equiv *= *["]?content-type[^>]*'
    'charset *= *["]?([a-zA-Z0-9_-]+)'
)
CHARSET_EQUIV_REV_RE = (
    '(?i)<meta[^>]*charset *= *["]?([a-zA-Z0-9_-]+)[^>]*'
    'http-equiv *= *["]?content-type'
)
CHARSET_XML_RE = '(?i)<[?]xml[^>]*encoding *= *["]?([a-zA-Z0-9_-]+)'


def charset_sql(html: str, d: dict) -> str:
    """NULL-or-lowercase declared charset of HTML column ``html``.

    Precedence: HTML5 meta, http-equiv meta (either attribute order), XML
    declaration — byte-content sniffing (BOMs, chardet-style statistics)
    is a decode-stage concern (functions/multimodal.py's territory), not a
    metadata kernel. Dialect-shared like ``canonical_sql``.
    """
    del d
    order = [
        CHARSET_HTML5_RE,
        CHARSET_EQUIV_RE,
        CHARSET_EQUIV_REV_RE,
        CHARSET_XML_RE,
    ]
    exprs = [f"regexp_extract({html}, '{pat}', 1)" for pat in order]
    whens = " ".join(f"WHEN {e} <> '' THEN {e}" for e in exprs)
    return f"lower(CASE {whens} ELSE NULL END)"


def charset_col(html_col: str = "html") -> Column:
    """The Spark-side declared-charset column (JVM regexp, map-only)."""
    from scrape_spark.functions.textstats import SPARK_DIALECT

    return F.expr(charset_sql(html_col, SPARK_DIALECT))
