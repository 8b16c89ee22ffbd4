"""Image-text pair mining: (image URL, alt/caption text) from page HTML.

The feedstock of image-text training sets (CLIP/LAION-style) is exactly
this projection: every ``<img>`` tag's resolved ``src`` paired with its
best available natural-language description — the ``alt`` attribute, or
the ``<figcaption>`` when the image sits inside a ``<figure>`` block
(captions are usually richer than alts, so they win). At lake scale this
runs over every fetched page, so the kernels follow the house discipline
(functions/canonical.py, sources/feeds.py): anchored dialect-shared
regexps, map-side, no Python worker; html bytes never enter a shuffle —
the one join in :func:`image_text_pairs` carries only (url, src, text)
slivers.

The reference's parser reads img tags only for anchor text enrichment
(link_extractor.py:25-31 — first img[alt]/img[title] inside an ``<a>``);
standalone image-text extraction is lake-side curation with no reference
counterpart.

Quality gate: LAION-style alt filtering drops pairs whose text is missing,
shorter than ``min_text_chars``, or a generic placeholder ("image",
"logo", …) — at web scale most alts are noise and the gate is what makes
the output trainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Shared regexes — splice into BOTH dialects verbatim (backslash-free).
IMG_TAG_RE = "(?i)<img[^>]*>"
SRC_RE = '(?i)src="([^"]*)"'
ALT_RE = '(?i)alt="([^"]*)"'
FIGURE_BLOCK_RE = "(?is)<figure[^>]*>(.*?)</figure>"
FIGCAPTION_RE = "(?is)<figcaption[^>]*>(.*?)</figcaption>"
ANY_TAG_RE = "<[^>]*>"

#: Placeholder alts dropped by the quality gate (lowercased exact match).
GENERIC_TEXTS = (
    "image", "photo", "picture", "logo", "icon", "img", "thumbnail",
    "banner", "spacer",
)


def strip_tags_sql(expr: str, spark: bool) -> str:
    """Remove every tag from an HTML fragment. The one per-dialect split in
    this module: DuckDB's ``regexp_replace`` replaces the FIRST match
    unless given the ``'g'`` flag; Spark's replaces all by default."""
    if spark:
        return f"regexp_replace({expr}, '{ANY_TAG_RE}', '')"
    return f"regexp_replace({expr}, '{ANY_TAG_RE}', '', 'g')"


def resolve_src_sql(src: str, base_url: str) -> str:
    """Resolve an img ``src`` (or any href) against the page URL —
    dialect-shared.

    Absolute (``://``) and other scheme URIs (``data:``, ``mailto:`` — a
    ``:`` before any ``/``) pass through unchanged; protocol-relative
    ``//host/x`` takes the PAGE's scheme (an https page must not emit
    http image URLs); root-relative ``/x`` joins scheme://host; anything
    else joins the page's directory — computed over the PATH part only,
    so a slash-less page URL (``http://h.test``) degrades to ``/`` at the
    host rather than matching the scheme's ``//``. Deliberately simpler
    than RFC 3986 dot-segment handling — the fetch normalizer
    (functions/urls.py) owns that; this kernel only needs the join,
    map-side on both engines.
    """
    scheme = f"left({base_url}, instr({base_url}, '://') - 1)"
    after = f"substr({base_url}, instr({base_url}, '://') + 3)"
    scheme_host = f"{scheme} || '://' || split_part({after}, '/', 1)"
    path = f"substr({after}, length(split_part({after}, '/', 1)) + 1)"
    dir_of_path = (
        f"coalesce(nullif(regexp_extract({path}, '(.*/)[^/]*$', 1), ''), '/')"
    )
    is_scheme_uri = (
        f"(instr({src}, ':') > 0 AND (instr({src}, '/') = 0 "
        f"OR instr({src}, ':') < instr({src}, '/')))"
    )
    return (
        f"CASE WHEN contains({src}, '://') THEN {src} "
        f"WHEN {is_scheme_uri} THEN {src} "
        # a scheme-less base URL cannot anchor a join — src passes through
        # (also dodges left(x, -1), whose negative-length semantics differ
        # between engines)
        f"WHEN instr({base_url}, '://') = 0 THEN {src} "
        f"WHEN {src} LIKE '//%' THEN {scheme} || ':' || {src} "
        f"WHEN {src} LIKE '/%' THEN {scheme_host} || {src} "
        f"ELSE {scheme_host} || {dir_of_path} || {src} END"
    )


def _fetchable_src_sql(src: str) -> str:
    """False for non-fetchable scheme URIs (``data:`` lazy-load
    placeholders, ``javascript:`` handlers) — LAION-style mining drops
    them; real network URLs (with ``://``) stay."""
    return (
        f"(NOT (instr({src}, ':') > 0 AND (instr({src}, '/') = 0 "
        f"OR instr({src}, ':') < instr({src}, '/')) "
        f"AND NOT contains({src}, '://')))"
    )


def _gate_sql(text: str, min_text_chars: int) -> str:
    generics = ", ".join(f"'{t}'" for t in GENERIC_TEXTS)
    return (
        f"({text} IS NOT NULL AND length({text}) >= {min_text_chars} "
        f"AND lower({text}) NOT IN ({generics}))"
    )


def image_text_pairs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_str",
    min_text_chars: int = 5,
) -> DataFrame:
    """(url, img_pos, img_src, alt, caption, pair_text) per kept image.

    Two map-side passes over the SAME pages scan — all ``<img>`` tags in
    document order (``img_pos`` 1-based), and ``<figure>`` blocks yielding
    (first img src → tag-stripped figcaption) — joined on (url, src) to
    attach captions. The join's both sides are projected slivers (url +
    src + short text); the html column is pruned before the exchange, so
    at 100 TB the shuffle is a few percent of the scan. ``pair_text`` =
    caption else alt, gated (non-null, ≥ min_text_chars, not a
    placeholder); imgs with no src are dropped.
    """
    imgs = (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(
                F.expr(f"regexp_extract_all({html_col}, '{IMG_TAG_RE}', 0)")
            ).alias("pos", "tag"),
        )
        .select(
            "url",
            (F.col("pos") + 1).cast("long").alias("img_pos"),
            F.expr(f"regexp_extract(tag, '{SRC_RE}', 1)").alias("raw_src"),
            F.expr(
                f"nullif(trim(regexp_extract(tag, '{ALT_RE}', 1)), '')"
            ).alias("alt"),
        )
        .where(
            (F.col("raw_src") != "")
            & F.expr(_fetchable_src_sql("raw_src"))
        )
    )
    figs = (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(
                F.expr(
                    f"regexp_extract_all({html_col}, '{FIGURE_BLOCK_RE}', 1)"
                )
            ).alias("block"),
        )
        .select(
            "url",
            F.expr(f"regexp_extract(block, '{SRC_RE}', 1)").alias("raw_src"),
            F.expr(
                "nullif(trim("
                + strip_tags_sql(
                    f"regexp_extract(block, '{FIGCAPTION_RE}', 1)", spark=True
                )
                + "), '')"
            ).alias("caption"),
        )
        .where((F.col("raw_src") != "") & F.col("caption").isNotNull())
        .groupBy("url", "raw_src")
        .agg(F.min("caption").alias("caption"))
    )
    joined = imgs.join(figs, ["url", "raw_src"], "left")
    pair_text = F.coalesce(F.col("caption"), F.col("alt"))
    return (
        joined.select(
            "url",
            "img_pos",
            F.expr(resolve_src_sql("raw_src", "url")).alias("img_src"),
            "alt",
            "caption",
            pair_text.alias("pair_text"),
        )
        .where(F.expr(_gate_sql("pair_text", min_text_chars)))
    )


def image_text_pairs_sql(pages_sql: str, min_text_chars: int = 5) -> str:
    """DuckDB twin of :func:`image_text_pairs` over ``(url, html_str)``
    rows — spliced from the SAME regex constants; dialect splits are the
    block unnest and the global-flag regexp_replace."""
    cap = strip_tags_sql(
        f"regexp_extract(block, '{FIGCAPTION_RE}', 1)", spark=False
    )
    return f"""WITH P AS ({pages_sql}),
I AS (SELECT url,
        CAST(generate_subscripts(
          regexp_extract_all(html_str, '{IMG_TAG_RE}', 0), 1) AS BIGINT)
          AS img_pos,
        unnest(regexp_extract_all(html_str, '{IMG_TAG_RE}', 0)) AS tag
      FROM P),
IM AS (SELECT url, img_pos, raw_src,
         nullif(trim(regexp_extract(tag, '{ALT_RE}', 1)), '') AS alt
       FROM (SELECT url, img_pos,
               regexp_extract(tag, '{SRC_RE}', 1) AS raw_src, tag
             FROM I)
       WHERE raw_src <> '' AND {_fetchable_src_sql('raw_src')}),
FB AS (SELECT url,
         unnest(regexp_extract_all(html_str, '{FIGURE_BLOCK_RE}', 1)) AS block
       FROM P),
FG AS (SELECT url, raw_src, min(caption) AS caption
       FROM (SELECT url,
               regexp_extract(block, '{SRC_RE}', 1) AS raw_src,
               nullif(trim({cap}), '') AS caption
             FROM FB)
       WHERE raw_src <> '' AND caption IS NOT NULL
       GROUP BY url, raw_src),
J AS (SELECT IM.url, IM.img_pos, IM.raw_src, IM.alt, FG.caption,
        coalesce(FG.caption, IM.alt) AS pair_text
      FROM IM LEFT JOIN FG ON IM.url = FG.url AND IM.raw_src = FG.raw_src)
SELECT url, img_pos, {resolve_src_sql('raw_src', 'url')} AS img_src,
  alt, caption, pair_text
FROM J WHERE {_gate_sql('pair_text', min_text_chars)}"""


def og_image_pairs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_str",
    min_text_chars: int = 5,
) -> DataFrame:
    """(url, img_src, pair_text) from OpenGraph card declarations — the
    second image-text pair source besides inline ``<img>`` mining: one
    representative image per page (``og:image``) paired with the
    publisher-written card text (``og:description``, else ``og:title``).
    Card text is editorial rather than accessibility markup, so it is
    usually richer than alt text; dedup across both sources on (url,
    img_src) belongs to the caller. Map-side only — same gate and src
    resolution as :func:`image_text_pairs`.
    """
    from scrape_spark.functions.metadata import og_sql

    raw = pages.select(
        F.col(url_col).alias("url"),
        F.expr(og_sql(html_col, "image")).alias("raw_src"),
        F.expr(
            f"coalesce({og_sql(html_col, 'description')}, "
            f"{og_sql(html_col, 'title')})"
        ).alias("pair_text"),
    ).where(
        F.col("raw_src").isNotNull()
        & F.expr(_fetchable_src_sql("raw_src"))
    )
    return raw.select(
        "url",
        F.expr(resolve_src_sql("raw_src", "url")).alias("img_src"),
        "pair_text",
    ).where(F.expr(_gate_sql("pair_text", min_text_chars)))


def og_image_pairs_sql(pages_sql: str, min_text_chars: int = 5) -> str:
    """DuckDB twin of :func:`og_image_pairs` (same spliced kernels)."""
    from scrape_spark.functions.metadata import og_sql

    return f"""WITH R AS (
  SELECT url, {og_sql('html_str', 'image')} AS raw_src,
    coalesce({og_sql('html_str', 'description')},
             {og_sql('html_str', 'title')}) AS pair_text
  FROM ({pages_sql}))
SELECT url, {resolve_src_sql('raw_src', 'url')} AS img_src, pair_text
FROM R WHERE raw_src IS NOT NULL AND {_fetchable_src_sql('raw_src')}
  AND {_gate_sql('pair_text', min_text_chars)}"""
