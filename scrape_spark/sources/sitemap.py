"""Sitemap (sitemaps.org XML) parsing — the crawl's bulk seed source.

The reference discovers URLs only by following page links (scraper.py's
recursive loop); production crawls bootstrap and refresh their frontiers
from sitemaps — at CC scale the sitemap set is itself millions of XML
documents, so the parse must be a distributed map-side pass, not a
driver-side loop. These operators are pure JVM regexp expressions (no UDF,
no shuffle): ``regexp_extract_all`` splits a sitemap into its ``<url>``
blocks, ``regexp_extract`` pulls ``<loc>``/``<lastmod>`` per block. Both
functions have byte-identical semantics in DuckDB (verified: no-match
returns ``''`` on both engines, ``(?s)`` lazy groups agree), so the parse
is dialect-shared and oracle-checkable like the textstats kernels.

``<lastmod>`` feeds straight into the freshness scheduler
(operators/recrawl.py): a sitemap-declared modification time newer than
the stored capture is the cheapest possible change signal — no fetch
needed. ``sitemap_index_refs`` handles nested ``<sitemapindex>`` files;
recursion is driven by the caller (fetch children, re-apply), matching the
crawl loop's round structure rather than hiding an iterative fetch here.

Regexp parsing is deliberate (not an XML library): sitemaps in the wild
are full of namespace prefixes, stray bytes, and truncation; production
parsers (and CC's own tooling) treat them as line noise with anchors. The
``[^<]*`` value pattern cannot backtrack catastrophically and never
crosses a tag boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Shared regexes — splice into BOTH dialects verbatim.
URL_BLOCK_RE = "(?s)<url>(.*?)</url>"
SITEMAP_BLOCK_RE = "(?s)<sitemap>(.*?)</sitemap>"
LOC_RE = "<loc>([^<]*)</loc>"
LASTMOD_RE = "<lastmod>([^<]*)</lastmod>"
PRIORITY_RE = "<priority>([^<]*)</priority>"
CHANGEFREQ_RE = "<changefreq>([^<]*)</changefreq>"

#: sitemaps.org <changefreq> → revisit seconds for the freshness scheduler
#: ('always' → 0 = every round; 'never' → NULL = change-estimate only).
CHANGEFREQ_SECONDS = {
    "always": 0,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,
    "yearly": 31_536_000,
}


def changefreq_seconds_sql(freq: str) -> str:
    """CASE mapping a (lowercased) changefreq value to seconds — shared
    verbatim by both engines; unknown/'never'/absent values yield NULL."""
    whens = " ".join(
        f"WHEN '{k}' THEN CAST({v} AS BIGINT)"
        for k, v in CHANGEFREQ_SECONDS.items()
    )
    return f"CASE lower({freq}) {whens} END"


def sitemap_entries(
    sitemaps: DataFrame,
    url_col: str = "sitemap_url",
    xml_col: str = "xml",
) -> DataFrame:
    """(sitemap_url, entry_pos, loc, lastmod, priority_q4, changefreq,
    changefreq_s) per ``<url>`` entry.

    ``entry_pos`` is the 1-based document-order position (sitemaps are
    ordered by convention — position feeds the frontier's FIFO seq like
    link document order does). ``lastmod`` is NULL when absent. Entries
    with an empty ``<loc>`` are dropped (nothing to enqueue).

    Scheduler columns: ``priority_q4`` = floor(1e4 · <priority>) with the
    spec's 0.5 default when absent/unparseable (try_cast — a malformed
    value degrades to the default instead of failing the scan under ANSI
    mode); ``changefreq`` is the declared token (lowercased, NULL when
    absent) and ``changefreq_s`` its revisit interval in seconds
    (CHANGEFREQ_SECONDS; 'never'/unknown → NULL so the change-estimate
    scheduler owns those URLs).
    """
    blocks = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        F.posexplode(
            F.expr(f"regexp_extract_all({xml_col}, '{URL_BLOCK_RE}', 1)")
        ).alias("pos", "block"),
    )
    loc = F.expr(f"regexp_extract(block, '{LOC_RE}', 1)")
    lastmod = F.expr(f"nullif(regexp_extract(block, '{LASTMOD_RE}', 1), '')")
    prio_raw = f"nullif(regexp_extract(block, '{PRIORITY_RE}', 1), '')"
    priority = F.expr(
        f"coalesce(CAST(floor(10000 * try_cast({prio_raw} AS DOUBLE)) "
        f"AS BIGINT), 5000)"
    )
    freq = F.expr(
        f"lower(nullif(regexp_extract(block, '{CHANGEFREQ_RE}', 1), ''))"
    )
    return (
        blocks.select(
            "sitemap_url",
            (F.col("pos") + 1).cast("long").alias("entry_pos"),
            loc.alias("loc"),
            lastmod.alias("lastmod"),
            priority.alias("priority_q4"),
            freq.alias("changefreq"),
        )
        .withColumn(
            "changefreq_s", F.expr(changefreq_seconds_sql("changefreq"))
        )
        .where(F.col("loc") != "")
    )


def sitemap_index_refs(
    sitemaps: DataFrame,
    url_col: str = "sitemap_url",
    xml_col: str = "xml",
) -> DataFrame:
    """(sitemap_url, ref_pos, child_loc) per ``<sitemap>`` entry of a
    ``<sitemapindex>`` file — the caller fetches the children and re-applies
    :func:`sitemap_entries` (one crawl round per nesting level; the spec
    caps nesting, so the recursion is bounded and driver-visible)."""
    blocks = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        F.posexplode(
            F.expr(f"regexp_extract_all({xml_col}, '{SITEMAP_BLOCK_RE}', 1)")
        ).alias("pos", "block"),
    )
    loc = F.expr(f"regexp_extract(block, '{LOC_RE}', 1)")
    return (
        blocks.select(
            "sitemap_url",
            (F.col("pos") + 1).cast("long").alias("ref_pos"),
            loc.alias("child_loc"),
        )
        .where(F.col("child_loc") != "")
    )


#: ``Sitemap:`` directive of robots.txt — case-insensitive key, one per
#: line, host-wide (the spec places it outside user-agent groups). The
#: value stops at whitespace (trailing ``\\r`` never leaks in) AND at
#: ``#`` — robots.txt comments run to end of line, stripped BEFORE value
#: parsing (stdlib robotparser does ``line.split('#')[0]``), so a
#: fully-commented directive yields nothing and a mid-value ``#``
#: truncates. RAW regex (python-string form): Spark SQL string literals
#: unescape backslashes, DuckDB's do not, so each side escapes it for its
#: own literal syntax (`_sql_regex_literal` below for Spark; verbatim for
#: DuckDB oracles).
ROBOTS_SITEMAP_RE = r"(?im)^[ \t]*sitemap:[ \t]*([^#\s]+)"


def _sql_regex_literal(pattern: str) -> str:
    """Escape a raw regex for a Spark SQL single-quoted string literal."""
    return pattern.replace("\\", "\\\\").replace("'", "\\'")


def robots_sitemap_refs(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, ref_pos, sitemap_url) per ``Sitemap:`` directive.

    The discovery half of sitemap bootstrap: robots.txt is fetched anyway
    for the politeness gate (operators/robots.py), and its ``Sitemap:``
    lines are how a crawl finds the sitemap set without guessing
    ``/sitemap.xml``. Map-side regexp over the already-fetched bodies —
    no extra fetch, no shuffle; feed the refs to the fetch stage, then
    ``sitemap_entries`` → ``CrawlJob.seed_frame``.

    The stdlib ``RobotFileParser`` used by the rules kernel
    (operators/robots.py parse_robots_body) exposes ``site_maps()`` with
    the same line semantics (key match, indentation, ``#`` comments) —
    this expression is the distributed twin so discovery needs no Python
    worker; parity is pinned in tests. Two documented divergences: the
    stdlib percent-DECODES values (urllib.parse.unquote) — this kernel
    returns them verbatim, since fetch keys should stay as-published —
    and the stdlib surfaces a valueless directive ('Sitemap: #x') as an
    empty-string entry, which this kernel drops (unfetchable).
    """
    pat = _sql_regex_literal(ROBOTS_SITEMAP_RE)
    refs = F.expr(f"regexp_extract_all({body_col}, '{pat}', 1)")
    return robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(refs).alias("pos", "sitemap_url"),
    ).select(
        "host",
        (F.col("pos") + 1).cast("long").alias("ref_pos"),
        "sitemap_url",
    )
