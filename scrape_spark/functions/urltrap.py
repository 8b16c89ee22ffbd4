"""Crawl-trap detection kernels — dialect-templated URL anomaly signals.

Real web-scale frontiers drown in traps: calendar pages, session-id loops,
and mirror trees generate unbounded URL spaces that a polite crawler can
spend its whole budget on. The reference has no defense (it crawls within
``BASE_URL`` only, scraper.py:158); at 10^10 URLs the frontier needs a
map-side trap score BEFORE enqueue, in the same filter pass as the
base-containment check.

Same design rule as functions/textstats.py: every signal is a pure SQL
expression templated over the shared dialect tables, so the identical
formula runs JVM-side in Spark (whole-stage codegen, no UDF) and verbatim
in the DuckDB oracle. All signals are per-row map expressions — zero
shuffle at any scale.

Signals (classic crawler heuristics):
- ``depth``       — number of non-empty path segments;
- ``max_seg_rep`` — occurrences of the most-repeated path segment
  (``/a/b/a/b/a`` scores 3): the loop-trap fingerprint;
- ``n_params``    — query-parameter count (session-id / faceted-search
  explosion);
- ``url_len``     — total URL length;
- ``is_trap``     — any signal past its threshold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from scrape_spark.functions.textstats import (
    DUCK_DIALECT,
    SPARK_DIALECT,
    _bind,
)

# Default thresholds — tuned to the conventional values used by production
# crawlers (path depth and repetition limits; param and length caps).
MAX_DEPTH = 12
MAX_SEG_REP = 4  # >= this many copies of one segment → loop trap
MAX_PARAMS = 8
MAX_URL_LEN = 512


def trap_signals_sql(url: str, d: dict) -> dict[str, str]:
    """Named signal expressions over URL column ``url`` in dialect ``d``.

    Every output is CAST to BIGINT (booleans excepted) so the two engines
    agree on schema as well as value.
    """
    qpos = f"position('?' IN {url})"
    base = (
        f"CASE WHEN {qpos} > 0 THEN substring({url}, 1, {qpos} - 1) "
        f"ELSE {url} END"
    )
    # split the scheme://host/path on '/': [scheme:, '', host, seg1, ...]
    allseg = d["splitc"].format(s=base, sep="'/'")
    n_all = d["size"].format(arr=allseg)
    # path segments are elements 4..n (empty when the URL has no path);
    # seq() is guarded — an unguarded descending sequence(4, 3) is the
    # Spark footgun documented in the build notes
    idx = (
        f"CASE WHEN {n_all} >= 4 THEN "
        + d["seq"].format(a="CAST(4 AS BIGINT)", b=f"CAST({n_all} AS BIGINT)")
        + f" ELSE {d['empty_bigint_array']} END"
    )
    segs = d["transform"].format(
        arr=idx, lam="_ti -> " + d["at"].format(arr=allseg, i="CAST(_ti AS INT)")
    )
    nonempty = d["filter"].format(arr=segs, lam="_ts -> _ts <> ''")
    depth = f"CAST({d['size'].format(arr=nonempty)} AS BIGINT)"
    # occurrences of the most-repeated segment: for each distinct segment,
    # count its copies; max over those (0 for an empty path)
    per_seg = d["transform"].format(
        arr=d["adistinct"].format(arr=nonempty),
        lam=(
            "_td -> CAST("
            + d["size"].format(
                arr=d["filter"].format(arr=nonempty, lam="_tx -> _tx = _td")
            )
            + " AS BIGINT)"
        ),
    )
    max_rep = f"COALESCE({d['amax'].format(arr=per_seg)}, CAST(0 AS BIGINT))"
    q = f"CASE WHEN {qpos} > 0 THEN substring({url}, {qpos} + 1) ELSE '' END"
    n_params = (
        f"CAST(CASE WHEN length({q}) > 0 THEN "
        f"length({q}) - length(replace({q}, '&', '')) + 1 ELSE 0 END AS BIGINT)"
    )
    url_len = f"CAST(length({url}) AS BIGINT)"
    return {
        "depth": depth,
        "max_seg_rep": max_rep,
        "n_params": n_params,
        "url_len": url_len,
        "is_trap": (
            f"({depth} > {MAX_DEPTH} OR {max_rep} >= {MAX_SEG_REP} "
            f"OR {n_params} > {MAX_PARAMS} OR {url_len} > {MAX_URL_LEN})"
        ),
    }


def trap_signal_cols(url_col: str = "url") -> list[Column]:
    """The Spark-side signal columns, ready for ``df.select(url, *cols)``."""
    sig = trap_signals_sql(url_col, SPARK_DIALECT)
    return [F.expr(expr).alias(name) for name, expr in sig.items()]


def trap_signals_duck_sql(url: str = "url") -> dict[str, str]:
    """The DuckDB-dialect twin, for oracle SQL assembly."""
    return trap_signals_sql(url, DUCK_DIALECT)


# ---------------------------------------------------------------------------
# URL extension routing — skip assets before they ever reach the frontier
# ---------------------------------------------------------------------------
#: extension -> class. Everything a text crawler should NOT fetch is routed
#: away at enqueue time (the cheapest possible filter: pure URL string math).
URL_CLASSES = {
    "page": ["html", "htm", "xhtml", "php", "asp", "aspx", "jsp", "shtml"],
    "image": ["jpg", "jpeg", "png", "gif", "webp", "avif", "bmp", "ico", "svg"],
    "media": ["mp4", "mp3", "avi", "mov", "webm", "mkv", "wav", "flv", "ogg"],
    "asset": ["css", "js", "mjs", "woff", "woff2", "ttf", "eot", "map"],
    "archive": ["zip", "gz", "tgz", "tar", "rar", "7z", "bz2", "xz"],
    "doc": ["pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx", "rtf",
            "txt", "csv", "xml", "json", "rss", "atom"],
}
#: classes the frontier should enqueue (no extension counts as a page)
CRAWLABLE_CLASSES = ("page", "doc")


def url_ext_sql(url: str, d: dict) -> str:
    """Lowercased file extension of the last path segment ('' when none).

    Query/fragment-free parsing on the dialect string kernels: last
    '/'-segment of the pre-'?' URL, last '.'-piece of that segment. A
    leading-dot-only segment ('.hidden') and extensions longer than 5
    chars (version tags, trailing junk) yield '' — the conventional
    routing rule, matching what real crawlers treat as "no extension".
    """
    qpos = f"position('?' IN {url})"
    base = (
        f"CASE WHEN {qpos} > 0 THEN substring({url}, 1, {qpos} - 1) "
        f"ELSE {url} END"
    )
    segs = d["splitc"].format(s=f"({base})", sep="'/'")
    nseg = d["size"].format(arr=f"({segs})")
    last = d["at"].format(arr=f"({segs})", i=f"CAST({nseg} AS INT)")
    parts = d["splitc"].format(s=f"({last})", sep=d["dot"])
    np = d["size"].format(arr="(__ue)")
    cand = d["at"].format(arr="(__ue)", i=f"CAST({np} AS INT)")
    first = d["at"].format(arr="(__ue)", i="1")
    expr = (
        f"CASE WHEN {np} >= 2"
        f" AND NOT ({np} = 2 AND {first} = '')"
        f" AND length({cand}) BETWEEN 1 AND 5"
        f" THEN lower({cand}) ELSE '' END"
    )
    from scrape_spark.functions.textstats import _bind

    return _bind(expr, "__ue", parts, d)


def url_class_sql(url: str, d: dict) -> str:
    """Routing class of a URL: page/image/media/asset/archive/doc/other —
    extension-less URLs are pages (the common case for canonical URLs)."""
    branches = " ".join(
        f"WHEN __uc IN ({', '.join(repr(e) for e in exts)}) THEN '{cls}'"
        for cls, exts in URL_CLASSES.items()
    )
    expr = f"CASE WHEN __uc = '' THEN 'page' {branches} ELSE 'other' END"
    from scrape_spark.functions.textstats import _bind

    return _bind(expr, "__uc", url_ext_sql(url, d), d)


def crawlable_expr(url_col: str = "url") -> Column:
    """True when the URL's class is worth fetching — the enqueue-time
    asset filter (plug into the frontier's new-link gate)."""
    cls = url_class_sql(url_col, SPARK_DIALECT)
    in_list = ", ".join(f"'{c}'" for c in CRAWLABLE_CLASSES)
    return F.expr(f"({cls}) IN ({in_list})")


# ---------------------------------------------------------------------------
# URL language hints (routing signal before any content is fetched)
# ---------------------------------------------------------------------------

#: ISO-639-1 codes the hint recognizes — the lang-ID marker languages plus
#: the most common European/CJK web codes. Whitelisting is load-bearing:
#: most 2-letter path segments ("js", "v2", "us") are NOT languages.
URL_LANG_CODES = [
    "en", "de", "fr", "es", "it", "pt", "nl", "ru", "uk", "ar", "fa",
    "ja", "ko", "hi", "zh", "sv", "pl", "tr", "cs", "da", "fi", "no",
    "el", "he", "id", "th", "vi",
]

#: capture regexes — shared verbatim (no backslashes: character classes and
#: non-capturing groups only, identical in Java regex and RE2)
_PATH_LANG_RE = "://[^/]+/([a-zA-Z][a-zA-Z])([/?#]|$)"
_SUB_LANG_RE = "^[a-z]+://([a-zA-Z][a-zA-Z])[.]"
_QUERY_LANG_RE = "[?&](?:lang|hl|locale)=([a-zA-Z][a-zA-Z])"


def url_lang_hint_sql(url: str, d: dict) -> str:
    """Declared-language hint from URL structure alone: the routing signal
    a crawler has BEFORE fetching (content lang-ID needs the body; this
    needs only the frontier row). Precedence: first path segment
    (``/en/…``) > language subdomain (``en.site…``) > explicit query param
    (``?lang=en``/``hl``/``locale``). Values are lowercased and validated
    against ``URL_LANG_CODES`` — an unlisted 2-letter token is noise, not
    a hint. NULL when nothing matches. Map-only, dialect-shared."""
    codes = ", ".join(f"'{c}'" for c in URL_LANG_CODES)
    arr = f"[{codes}]" if d is DUCK_DIALECT else f"array({codes})"

    def hint(pattern: str) -> str:
        v = f"lower(nullif(regexp_extract({url}, '{pattern}', 1), ''))"
        contains = d["acontains"].format(arr=arr, x="__h")
        # bind the extracted value once (regex runs once per candidate)
        inner = f"CASE WHEN __h IS NOT NULL AND {contains} THEN __h END"
        return _bind(inner, "__h", v, d)

    return (
        f"coalesce({hint(_PATH_LANG_RE)}, {hint(_SUB_LANG_RE)}, "
        f"{hint(_QUERY_LANG_RE)})"
    )


def url_lang_hint(url_col: str = "url") -> Column:
    return F.expr(url_lang_hint_sql(url_col, SPARK_DIALECT))
