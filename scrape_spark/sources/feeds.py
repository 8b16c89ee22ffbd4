"""RSS 2.0 / Atom feed parsing — the crawl's freshness-biased seed source.

Sitemaps (sources/sitemap.py) enumerate a site; feeds announce what just
changed. Production crawls poll feeds between sitemap refreshes because a
feed entry is the cheapest "new URL worth fetching now" signal on the web —
newer than any sitemap ``<lastmod>`` and far cheaper than a conditional
refetch. The reference has no discovery source besides page links
(scraper.py's recursive loop); at CC scale the feed set is millions of XML
documents, so — exactly like the sitemap parser — this must be a map-side
distributed pass, never a driver loop.

Same discipline as sources/sitemap.py: pure JVM regexp expressions
(``regexp_extract_all`` for blocks, ``regexp_extract`` per field), shared
VERBATIM with the DuckDB oracle so parity is structural; anchored
``[^<]*`` / ``[^"]*`` value patterns that cannot backtrack or cross a tag
boundary. Regexp over stdlib-XML is deliberate for the same reason: wild
feeds are full of undeclared namespaces, CDATA, truncation and stray bytes;
anchor-based extraction is what production feed fetchers actually do.

Two formats, one pass:

- **RSS 2.0**: ``<item>`` blocks; ``<link>`` is element TEXT,
  ``<pubDate>`` is RFC-822. The first ``<link>`` inside an item is the
  entry link (channel-level ``<link>`` sits outside ``<item>`` so the
  block split already scopes it).
- **Atom**: ``<entry>`` blocks; ``<link>`` is an ATTRIBUTE
  (``href="..."``), ``<updated>`` is ISO-8601. Atom entries may carry
  several ``<link>`` tags (alternate/self/edit); the first ``href`` is
  taken, matching the common publisher layout where ``rel="alternate"``
  leads. ``<id>`` doubles as the guid.

Timestamps stay RAW (``published_raw``): RFC-822 month names and zone
abbreviations parse differently across engines, and the freshness
scheduler (operators/recrawl.py) only needs ordering for same-feed
entries, which document order already gives. Atom's ISO form additionally
orders lexicographically if a caller wants it.

Discovery: ``feed_autodiscovery_refs`` extracts the HTML-head
``<link rel="alternate" type="application/(rss|atom)+xml" href="...">``
declarations from already-fetched pages (the standard autodiscovery
protocol) — no extra fetch, map-side, same shape as
``robots_sitemap_refs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Shared regexes — splice into BOTH dialects verbatim (no backslashes, so
#: Spark/DuckDB string-literal escaping agrees byte-for-byte).
ITEM_BLOCK_RE = "(?s)<item>(.*?)</item>"
ENTRY_BLOCK_RE = "(?s)<entry>(.*?)</entry>"
RSS_LINK_RE = "<link>([^<]*)</link>"
ATOM_LINK_HREF_RE = "(?s)<link[^>]*href=\"([^\"]*)\""
TITLE_RE = "(?s)<title>([^<]*)</title>"
PUBDATE_RE = "<pubDate>([^<]*)</pubDate>"
UPDATED_RE = "<updated>([^<]*)</updated>"
GUID_RE = "(?s)<guid[^>]*>([^<]*)</guid>"
ATOM_ID_RE = "<id>([^<]*)</id>"

#: A document is Atom iff its ``<feed`` root opens before any ``<rss``
#: marker — FIRST-occurrence order, not mere presence, so an RSS item whose
#: CONTENT mentions "<feed" (a CDATA description quoting markup) cannot
#: flip the whole feed's dispatch and silently drop every entry. ``instr``
#: (1-based, 0 = absent) is byte-identical in both engines.
ATOM_MARKER = "<feed"
RSS_MARKER = "<rss"


def _is_atom_sql(xml: str) -> str:
    return (
        f"(instr({xml}, '{ATOM_MARKER}') > 0 AND "
        f"(instr({xml}, '{RSS_MARKER}') = 0 OR "
        f"instr({xml}, '{ATOM_MARKER}') < instr({xml}, '{RSS_MARKER}')))"
    )

#: HTML-head feed autodiscovery links. One regex per attribute order is
#: hopeless for <link> (three attributes, any order), so the kernel splits
#: the head into individual ``<link ...>`` tags first and filters/extracts
#: per tag — same two-stage shape as the sitemap block split.
LINK_TAG_RE = "(?i)<link[^>]*>"
FEED_TYPE_RE = "(?i)type=\"application/(rss|atom)[+]xml\""
HREF_RE = "(?i)href=\"([^\"]*)\""


def feed_entries(
    feeds: DataFrame,
    url_col: str = "feed_url",
    xml_col: str = "xml",
) -> DataFrame:
    """(feed_url, kind, entry_pos, link, title, published_raw, guid) per
    feed entry, both formats in one map-side pass.

    ``kind`` is ``'atom'`` or ``'rss'`` (first-root-marker sniff — the
    marker that OPENS the document decides, so markup quoted inside item
    content cannot flip the dispatch). ``entry_pos`` is the 1-based document
    -order position: feeds are newest-first by convention, so position 1
    is the freshest URL and feeds the frontier's priority directly.
    Entries with an empty link are dropped (nothing to enqueue); title /
    published / guid are NULL when absent.
    """
    is_atom = F.expr(_is_atom_sql(xml_col))
    blocks_expr = (
        f"CASE WHEN {_is_atom_sql(xml_col)} "
        f"THEN regexp_extract_all({xml_col}, '{ENTRY_BLOCK_RE}', 1) "
        f"ELSE regexp_extract_all({xml_col}, '{ITEM_BLOCK_RE}', 1) END"
    )
    blocks = feeds.select(
        F.col(url_col).alias("feed_url"),
        F.when(is_atom, F.lit("atom")).otherwise(F.lit("rss")).alias("kind"),
        F.posexplode(F.expr(blocks_expr)).alias("pos", "block"),
    )
    link = F.expr(
        f"CASE WHEN kind = 'atom' "
        f"THEN regexp_extract(block, '{ATOM_LINK_HREF_RE}', 1) "
        f"ELSE regexp_extract(block, '{RSS_LINK_RE}', 1) END"
    )
    published = F.expr(
        f"CASE WHEN kind = 'atom' "
        f"THEN nullif(regexp_extract(block, '{UPDATED_RE}', 1), '') "
        f"ELSE nullif(regexp_extract(block, '{PUBDATE_RE}', 1), '') END"
    )
    guid = F.expr(
        f"CASE WHEN kind = 'atom' "
        f"THEN nullif(regexp_extract(block, '{ATOM_ID_RE}', 1), '') "
        f"ELSE nullif(regexp_extract(block, '{GUID_RE}', 1), '') END"
    )
    title = F.expr(f"nullif(regexp_extract(block, '{TITLE_RE}', 1), '')")
    return (
        blocks.select(
            "feed_url",
            "kind",
            (F.col("pos") + 1).cast("long").alias("entry_pos"),
            link.alias("link"),
            title.alias("title"),
            published.alias("published_raw"),
            guid.alias("guid"),
        )
        .where(F.col("link") != "")
    )


def feed_entries_sql(feeds_sql: str) -> str:
    """DuckDB twin of :func:`feed_entries` over ``(feed_url, xml)`` rows.

    Spliced from the SAME regex constants; the only dialect split is the
    block unnest (DuckDB: unnest + generate_subscripts vs Spark
    posexplode). Used by the `feed_entries` oracle and shareable by any
    composed oracle downstream.
    """
    blocks = (
        f"CASE WHEN {_is_atom_sql('xml')} "
        f"THEN regexp_extract_all(xml, '{ENTRY_BLOCK_RE}', 1) "
        f"ELSE regexp_extract_all(xml, '{ITEM_BLOCK_RE}', 1) END"
    )
    return f"""WITH F AS ({feeds_sql}),
B AS (SELECT feed_url,
        CASE WHEN {_is_atom_sql('xml')} THEN 'atom' ELSE 'rss' END
          AS kind,
        unnest({blocks}) AS block,
        generate_subscripts({blocks}, 1) AS pos
      FROM F),
R AS (SELECT feed_url, kind, CAST(pos AS BIGINT) AS entry_pos,
        CASE WHEN kind = 'atom'
          THEN regexp_extract(block, '{ATOM_LINK_HREF_RE}', 1)
          ELSE regexp_extract(block, '{RSS_LINK_RE}', 1) END AS link,
        nullif(regexp_extract(block, '{TITLE_RE}', 1), '') AS title,
        CASE WHEN kind = 'atom'
          THEN nullif(regexp_extract(block, '{UPDATED_RE}', 1), '')
          ELSE nullif(regexp_extract(block, '{PUBDATE_RE}', 1), '') END
          AS published_raw,
        CASE WHEN kind = 'atom'
          THEN nullif(regexp_extract(block, '{ATOM_ID_RE}', 1), '')
          ELSE nullif(regexp_extract(block, '{GUID_RE}', 1), '') END AS guid
      FROM B)
SELECT * FROM R WHERE link <> ''"""


def feed_autodiscovery_refs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_str",
) -> DataFrame:
    """(url, ref_pos, feed_url, feed_kind) per autodiscovery ``<link>``.

    Two-stage: split out every ``<link ...>`` tag, keep those whose
    ``type`` declares an RSS/Atom MIME type, extract ``href``. Attribute
    order is free (type-before-href or after); matching is
    case-insensitive; tags without an href (malformed) are dropped.
    ``ref_pos`` is the 1-based position among the page's KEPT feed links
    (head order — publishers list the preferred feed first).
    """
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.expr(f"regexp_extract_all({html_col}, '{LINK_TAG_RE}', 0)")
        ).alias("tag_pos", "tag"),
    ).where(F.expr(f"regexp_extract(tag, '{FEED_TYPE_RE}', 1) <> ''"))
    kept = tags.select(
        "url",
        "tag_pos",
        F.expr(f"lower(regexp_extract(tag, '{FEED_TYPE_RE}', 1))").alias(
            "feed_kind"
        ),
        F.expr(f"regexp_extract(tag, '{HREF_RE}', 1)").alias("feed_url"),
    ).where(F.col("feed_url") != "")
    w = (
        F.row_number()
        .over(Window.partitionBy("url").orderBy("tag_pos"))
        .cast("long")
    )
    return kept.select(
        "url", w.alias("ref_pos"), "feed_url", "feed_kind"
    )


def feed_schedule(
    entries: DataFrame, base_priority: int = 1_000_000
) -> DataFrame:
    """Collapse parsed feed entries into frontier enqueue candidates:
    (url, priority, n_feeds) — the glue between :func:`feed_entries` and
    the frontier's priority dequeue (operators/politeness.py
    ``priority_expr``), mirroring how sitemap ``<priority>``/
    ``<changefreq>`` feed the revisit scheduler.

    Feeds are newest-first by convention, so an entry's 1-based position
    is its freshness rank: ``priority = base div entry_pos`` (exact
    integer, dialect-shared — timestamp formats vary per format/publisher
    and are NOT parsed here; document order is the portable signal). A URL
    announced by several feeds takes its best position's priority, and
    ``n_feeds`` (distinct announcing feeds) is a secondary hotness signal
    the caller may fold in. One hash agg on the entry sliver.
    """
    return (
        entries.groupBy(F.col("link").alias("url"))
        .agg(
            F.max(
                F.expr(f"CAST({base_priority} AS BIGINT) div entry_pos")
            ).alias("priority"),
            F.countDistinct("feed_url").cast("long").alias("n_feeds"),
        )
    )


def feed_schedule_sql(entries_sql: str, base_priority: int = 1_000_000) -> str:
    """DuckDB twin of :func:`feed_schedule` over feed_entries rows."""
    return f"""SELECT link AS url,
  CAST(max({base_priority} // entry_pos) AS BIGINT) AS priority,
  CAST(count(DISTINCT feed_url) AS BIGINT) AS n_feeds
FROM ({entries_sql}) GROUP BY link"""


def feed_autodiscovery_refs_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`feed_autodiscovery_refs` (same spliced
    regexes; the dialect splits are the tag unnest and window syntax)."""
    return f"""WITH T AS (
  SELECT url,
    CAST(generate_subscripts(
      regexp_extract_all(html_str, '{LINK_TAG_RE}', 0), 1) AS BIGINT)
      AS tag_pos,
    unnest(regexp_extract_all(html_str, '{LINK_TAG_RE}', 0)) AS tag
  FROM ({pages_sql})),
K AS (SELECT url, tag_pos,
        lower(regexp_extract(tag, '{FEED_TYPE_RE}', 1)) AS feed_kind,
        regexp_extract(tag, '{HREF_RE}', 1) AS feed_url
      FROM T
      WHERE regexp_extract(tag, '{FEED_TYPE_RE}', 1) <> ''
        AND regexp_extract(tag, '{HREF_RE}', 1) <> '')
SELECT url,
  CAST(row_number() OVER (PARTITION BY url ORDER BY tag_pos) AS BIGINT)
    AS ref_pos,
  feed_url, feed_kind
FROM K"""
