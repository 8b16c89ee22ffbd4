"""URL expression builders — JVM-side (Catalyst) canonical URL handling.

These cover the *scheduler* path, where URLs are already canonical strings and
everything must stay inside whole-stage codegen: host/path parsing
(reference robots_handler.py:57,90 — ``urlparse(url).netloc`` / ``.path or
"/"``), canonical-URL hashing for the seen-set (reference dedup key is the
``url(255)`` unique key, schema/scraped_pages.sql:14), and normalization
(reference link_extractor.py:42-45).

The *extraction* path (urljoin + normalize on raw hrefs) stays inside the
pandas UDF (``scrape_spark.functions.udfs``) so urllib semantics are
byte-exact; the expressions here are used where inputs are known-canonical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_host(url: Column | str) -> Column:
    """netloc of a URL — ``urlparse(url).netloc`` equivalent for canonical URLs.

    ``try_parse_url``, not ``parse_url``: under Spark 4 ANSI mode the strict
    form THROWS on a malformed URL, and one hostile href in a trillion-row
    crawl batch must degrade to NULL, not kill the stage (urllib tolerates
    anything; parity on the well-formed domain is pinned by
    tests/test_url_expr_parity.py).
    """
    url = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(url, F.lit("HOST"))


def _strip_path_params(path: Column) -> Column:
    """Drop ``;params`` from the LAST path segment — ``urlparse`` semantics.

    The reference parses with ``urlparse`` (not ``urlsplit``), whose ``.path``
    excludes the params component ('/semi;colon' -> path '/semi', params
    'colon', split at the first ';' AFTER the last '/'). java.net.URI keeps
    it in the path, so the JVM side must strip it for urllib parity
    (counterexample found by tests/test_url_expr_parity.py).
    """
    last = F.substring_index(path, "/", -1)
    head = F.substr(path, F.lit(1), F.length(path) - F.length(last))
    return F.concat(head, F.substring_index(last, ";", 1))


def url_path(url: Column | str) -> Column:
    """path with the reference's ``or "/"`` default (robots_handler.py:90)."""
    url = F.col(url) if isinstance(url, str) else url
    path = _strip_path_params(F.try_parse_url(url, F.lit("PATH")))
    return F.coalesce(F.nullif(path, F.lit("")), F.lit("/"))


def normalize_url_expr(url: Column | str) -> Column:
    """scheme://host/path with query+fragment dropped (link_extractor.py:42-45).

    Catalyst-side normalization for already-wellformed absolute URLs; raw
    hrefs go through the python kernel inside the parse UDF instead.
    """
    url = F.col(url) if isinstance(url, str) else url
    return F.concat(
        F.coalesce(F.try_parse_url(url, F.lit("PROTOCOL")), F.lit("")),
        F.lit("://"),
        F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit("")),
        F.coalesce(
            _strip_path_params(F.try_parse_url(url, F.lit("PATH"))), F.lit("")
        ),
    )


def use_playwright_expr(url: Column | str, patterns: list[str]) -> Column:
    """Dynamic-render routing decision — S4's pattern match, JVM-side.

    The reference routes a URL to Playwright when ANY configured pattern is a
    SUBSTRING of it: ``any(pat in url for pat in USE_PLAYWRIGHT_PATTERNS)``
    (scraper.py:46, config.py USE_PLAYWRIGHT_PATTERNS). Plain containment —
    not glob, not regex — so the expression is an OR of ``contains``; an
    empty pattern list routes nothing (reference ``any([])`` is False).

    The rendering itself stays out of scope in this graft (pages are
    pre-rendered; SURVEY §2.1 S4) — this is the ROUTE column a live-fetch
    deployment partitions its fetch stage on (requests-pool vs
    browser-pool), so it belongs to the scheduler plan, not the fetcher.
    """
    url = F.col(url) if isinstance(url, str) else url
    out = F.lit(False)
    for pat in patterns:
        out = out | F.contains(url, F.lit(pat))
    return out


def url_hash(url: Column | str) -> Column:
    """64-bit seen-set key: xxhash64 over the canonical URL string.

    Replaces the reference's ``uniq_url (url(255))`` MySQL unique key
    (schema/scraped_pages.sql:14) — full-URL hashing, no 255-char truncation
    (divergence documented in SURVEY.md §7.4). JVM-side, codegen-friendly.
    """
    url = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(url)
