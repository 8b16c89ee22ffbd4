"""hreflang alternate-link mining: language-edition clusters + bitext seeds.

Publishers that maintain multiple language editions declare them with
``<link rel="alternate" hreflang="xx" href="...">`` head tags (Google's
multilingual-site protocol). For a training-data lake these annotations are
gold: each page enumerates its own translations, so the tag set yields
DOCUMENT-ALIGNED cross-lingual pairs — exactly the seeds parallel-corpus
pipelines (ParaCrawl-style) start from, far cheaper and cleaner than
embedding-mined alignment (operators/similarity.bitext_mine picks up where
these annotations run out, and the pairs here are its evaluation anchor).

Same discipline as the sibling kernels (functions/metadata.py,
functions/imgtext.py): dialect-shared backslash-free regexps over the raw
html, map-side, html never enters a shuffle — the pair self-join carries
only (url, lang, href) slivers. The reference's parser reads anchors only
(link_extractor.py:14-63); hreflang is lake-side curation with no
reference counterpart.

``x-default`` rows are kept in the link table (they route users, and
crawlers, to the fallback edition) but excluded from bitext pairs — the
value names a routing policy, not a language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scrape_spark.functions.imgtext import resolve_src_sql

#: Shared regexes — spliced into BOTH dialects verbatim (backslash-free;
#: literal single quotes appear SQL-escaped as '' so the same constant text
#: parses identically inside a '…' literal on both engines).
LINK_TAG_RE = "(?i)<link[^>]*>"


def _attr_val_sql(tag: str, attr: str) -> str:
    """First ``attr=…`` value in a tag — double-quoted, single-quoted, or
    unquoted (``href='/fr'`` and ``rel=alternate`` are common in real HTML;
    the BeautifulSoup-based extractors the reference builds on accept all
    three, so only accepting double quotes silently lost recall). Quote
    styles are tried in that order and coalesced; an unquoted value runs to
    the first space/``>``/quote, the HTML5 delimiter set minus backslash
    classes (tab/newline-delimited unquoted values are vanishingly rare and
    degrade identically on both engines). Every pattern requires a
    preceding attribute BOUNDARY (ADVICE r4: an unanchored ``attr=``
    matched substrings inside another attribute's value —
    ``href="/p?rel=alternate"`` set is_alt, and a ``?hreflang=de`` query
    param injected a bogus hreflang). The boundary class is the HTML5
    inter-attribute whitespace set (space/tab/LF/CR as LITERAL characters
    inside the SQL literal — still backslash-free on both dialects; the
    r5 review caught the space-only anchor dropping tab/newline-indented
    attributes) plus both quotes (parsers accept ``..."attr=`` with no
    whitespace after a quoted value). Residual decoy: a quote character
    immediately before ``attr=`` INSIDE an oppositely-quoted value — an
    order of magnitude rarer than the query-param decoys this anchors
    out."""
    cls = "[ \t\n\r\"'']"
    dq = (
        f"nullif(regexp_extract({tag}, '(?i){cls}{attr}=\"([^\"]*)\"', 1),"
        " '')"
    )
    sq = (
        f"nullif(regexp_extract({tag}, '(?i){cls}{attr}=''([^'']*)''', 1),"
        " '')"
    )
    uq = (
        f"nullif(regexp_extract({tag}, '(?i){cls}{attr}=([^ >\"'']+)', 1),"
        " '')"
    )
    return f"coalesce({dq}, {sq}, {uq})"


def _tag_cols_sql(tag: str) -> dict[str, str]:
    """Per-tag extraction formulas — identical text on both engines."""
    return {
        "hreflang": f"lower({_attr_val_sql(tag, 'hreflang')})",
        "raw_href": _attr_val_sql(tag, "href"),
        # rel may carry several space-separated tokens ("alternate nofollow")
        "is_alt": (
            f"(lower(coalesce({_attr_val_sql(tag, 'rel')}, ''))"
            " LIKE '%alternate%')"
        ),
    }


def hreflang_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, link_pos, hreflang, href) per alternate declaration.

    All ``<link>`` tags in document order (``link_pos`` 1-based over the
    page's link tags), kept when rel contains ``alternate`` and both
    hreflang and href are present; hreflang lowercased (BCP 47 is
    case-insensitive), href resolved against the page URL with the shared
    resolver. Map-side except the explode; html is pruned before any
    exchange.
    """
    c = _tag_cols_sql("tag")
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(
                F.expr(f"regexp_extract_all({html_col}, '{LINK_TAG_RE}', 0)")
            ).alias("pos", "tag"),
        )
        .select(
            "url",
            (F.col("pos") + 1).cast("long").alias("link_pos"),
            F.expr(c["hreflang"]).alias("hreflang"),
            F.expr(c["raw_href"]).alias("raw_href"),
            F.expr(c["is_alt"]).alias("_alt"),
        )
        .where(
            F.col("_alt")
            & F.col("hreflang").isNotNull()
            & F.col("raw_href").isNotNull()
        )
        .select(
            "url",
            "link_pos",
            "hreflang",
            F.expr(resolve_src_sql("raw_href", "url")).alias("href"),
        )
    )


def hreflang_links_sql(pages_sql: str) -> str:
    """DuckDB twin over ``(url, html_str)`` rows — same regex constants."""
    c = _tag_cols_sql("tag")
    return f"""WITH P AS ({pages_sql}),
T AS (SELECT url,
        CAST(generate_subscripts(
          regexp_extract_all(html_str, '{LINK_TAG_RE}', 0), 1) AS BIGINT)
          AS link_pos,
        unnest(regexp_extract_all(html_str, '{LINK_TAG_RE}', 0)) AS tag
      FROM P),
L AS (SELECT url, link_pos,
        {c['hreflang']} AS hreflang,
        {c['raw_href']} AS raw_href,
        {c['is_alt']} AS is_alt
      FROM T)
SELECT url, link_pos, hreflang,
       {resolve_src_sql('raw_href', 'url')} AS href
FROM L
WHERE is_alt AND hreflang IS NOT NULL AND raw_href IS NOT NULL"""


def hreflang_doc_pairs(
    pages: DataFrame, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, lang_a, href_a, lang_b, href_b): aligned bitext candidates.

    Each annotating page's own alternate set, paired pos_a < pos_b with
    distinct languages and ``x-default`` excluded — one row per unordered
    language pair per page. The self-join keys on the page URL and both
    sides are (url, link_pos, lang, href) slivers, so the exchange is a
    few bytes per declaration however big the pages are.
    """
    links = hreflang_links(pages, url_col, html_col).where(
        F.col("hreflang") != "x-default"
    )
    a = links.select(
        "url",
        F.col("link_pos").alias("_pa"),
        F.col("hreflang").alias("lang_a"),
        F.col("href").alias("href_a"),
    )
    b = links.select(
        "url",
        F.col("link_pos").alias("_pb"),
        F.col("hreflang").alias("lang_b"),
        F.col("href").alias("href_b"),
    )
    return (
        a.join(b, "url")
        .where((F.col("_pa") < F.col("_pb")) & (F.col("lang_a") != F.col("lang_b")))
        .select("url", "lang_a", "href_a", "lang_b", "href_b")
    )


def hreflang_doc_pairs_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`hreflang_doc_pairs`."""
    links = hreflang_links_sql(pages_sql)
    return f"""WITH LNK AS ({links})
SELECT a.url, a.hreflang AS lang_a, a.href AS href_a,
       b.hreflang AS lang_b, b.href AS href_b
FROM LNK a JOIN LNK b ON a.url = b.url
WHERE a.link_pos < b.link_pos AND a.hreflang <> b.hreflang
  AND a.hreflang <> 'x-default' AND b.hreflang <> 'x-default'"""


def hreflang_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(member, cluster_id): language-edition clusters.

    Connected components over the (annotating page ↔ declared alternate)
    edge set — editions that annotate each other (or share any annotator)
    collapse into one cluster keyed by its lexicographically smallest URL.
    Reuses the min-label/pointer-jumping components operator, so the scale
    shape is its: one (node, label) shuffle per round, O(log d) rounds.
    """
    from scrape_spark.operators.corpus import connected_components

    links = hreflang_links(pages, url_col, html_col)
    edges = links.select(F.col("url").alias("id_1"), F.col("href").alias("id_2"))
    return connected_components(edges).select(
        F.col("id").alias("member"), F.col("component_id").alias("cluster_id")
    )
