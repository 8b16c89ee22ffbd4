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


#: Declared-charset patterns (WHATWG sniffing, the declared subset):
#: a ``charset=`` attribute inside any <meta> tag covers BOTH the HTML5
#: form (<meta charset=utf-8>) and the legacy http-equiv form
#: (content="text/html; charset=utf-8"); the XML declaration covers XHTML
#: feeds. Double-quoted and unquoted values supported (single-quoted
#: attributes would force quote-escaping into both SQL dialects; out of
#: scope, documented). ``<[?]xml`` — a character class, not an escape —
#: keeps the pattern backslash-free so one text serves both engines.
CHARSET_META_RE = '(?i)<meta[^>]*charset=["]?([a-zA-Z0-9_-]+)'
CHARSET_XML_RE = '(?i)<[?]xml[^>]*encoding=["]?([a-zA-Z0-9_-]+)'


def charset_sql(html: str, d: dict) -> str:
    """NULL-or-lowercase declared charset of HTML column ``html``.

    Precedence: meta declaration (HTML5 or http-equiv) first, XML
    declaration second — byte-content sniffing (BOMs, chardet-style
    statistics) is a decode-stage concern (functions/multimodal.py's
    territory), not a metadata kernel. Dialect-shared like
    ``canonical_sql``.
    """
    del d
    e1 = f"regexp_extract({html}, '{CHARSET_META_RE}', 1)"
    e2 = f"regexp_extract({html}, '{CHARSET_XML_RE}', 1)"
    return (
        f"lower(CASE WHEN {e1} <> '' THEN {e1} "
        f"WHEN {e2} <> '' THEN {e2} ELSE NULL END)"
    )


def charset_col(html_col: str = "html") -> Column:
    """The Spark-side declared-charset column (JVM regexp, map-only)."""
    from scrape_spark.functions.textstats import SPARK_DIALECT

    return F.expr(charset_sql(html_col, SPARK_DIALECT))
