"""SURT canonicalization — Sort-friendly URI Reordering Transform kernels.

Common Crawl's CDX index (and the Internet Archive's wayback machine, where
the transform originates) keys every capture by its SURT form so that all
captures of one host — and one registered domain — are LEXICALLY ADJACENT:

    https://USER@WWW.Example.COM:8443/a/b?z=1&a=2#frag
        -> com,example:8443)/a/b?a=2&z=1

i.e. host labels reversed and comma-joined, lowercased, ``www.`` and the
scheme-default port dropped, a ``)`` closing the authority, query parameters
sorted, fragment dropped. Sorting by this key is what turns "all captures
under ``com,example)/products``" from a full scan into a contiguous range —
the whole point of the CDX layout at Common-Crawl scale.

The reference has no index at all (its dedup key is the raw ``url(255)``
MySQL unique key, schema/scraped_pages.sql:14); this module is the scale
path a 10^10-capture lake needs. Same design rule as functions/urltrap.py:
the key is ONE pure SQL expression templated over the shared dialect tables,
so the identical formula runs JVM-side in Spark (no UDF, zero shuffle) and
verbatim in the DuckDB oracle.

Expression-size note: the transform is a ~16-step pipeline where most steps
read several earlier steps. Naive substitution duplicates each step's text
into every reader — measured 215 KB of SQL for this kernel, which stalls
analysis/codegen. ``_let`` below is a true let-binding built from portable
primitives — ``transform(array(value), var -> body)[1]`` — so every step is
NAMED ONCE and both the SQL text and the expression tree stay linear
(~3 KB). Same lambda-scoping trick as ``lines_sql``'s inner indices; nested
lambdas close over outer variables in both engines.

Scope note: this is the classic SURT subset for well-formed absolute
http(s) URLs — userinfo stripped, IDN/punycode left as-is, IPv6 literals
and ``%``-escaping normalization out of scope (the crawl path stores
canonical URLs; see functions/urls.py for the canonicalization kernel).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from scrape_spark.functions.textstats import DUCK_DIALECT, SPARK_DIALECT


def _let(d: dict, var: str, value: str, body: str) -> str:
    """``let var = value in body`` via a 1-element higher-order transform."""
    arr = d["transform"].format(
        arr=d["mkarr"].format(x=f"({value})"), lam=f"{var} -> ({body})"
    )
    return d["at"].format(arr=f"({arr})", i="1")


def surt_sql(url: str, d: dict) -> str:
    """The SURT key of URL expression ``url`` in dialect ``d`` (one string).

    A chain of let-bound steps: strip fragment, carve scheme / authority /
    path+query, drop userinfo, lowercase, split host:port, elide the
    scheme-default port, strip ``www.``, reverse host labels, sort query
    params, reassemble.
    """
    labels = d["splitc"].format(s="__nw", sep=d["dot"])
    revhost = d["ajoin"].format(arr=d["areverse"].format(arr=labels), sep="','")
    params = d["splitc"].format(s="__qry", sep="'&'")
    sortedq = d["ajoin"].format(arr=d["asort"].format(arr=params), sep="'&'")

    steps: list[tuple[str, str]] = [
        # fragment dropped
        ("__hp0", f"position('#' IN {url})"),
        (
            "__nf",
            f"CASE WHEN __hp0 > 0 THEN substring({url}, 1, __hp0 - 1) "
            f"ELSE {url} END",
        ),
        # scheme (kept only to elide its default port) and the remainder
        ("__sp", "position('://' IN __nf)"),
        (
            "__sch",
            "CASE WHEN __sp > 0 THEN lower(substring(__nf, 1, __sp - 1)) "
            "ELSE '' END",
        ),
        ("__rst", "CASE WHEN __sp > 0 THEN substring(__nf, __sp + 3) ELSE __nf END"),
        # authority ends at '/' OR '?' (RFC 3986 — a query can follow the
        # host with no path: 'https://example.com?a=1'); the fragment case
        # is already stripped. The cut is the smaller positive position.
        ("__sl0", "position('/' IN __rst)"),
        ("__qm0", "position('?' IN __rst)"),
        (
            "__slp",
            "CASE WHEN __sl0 > 0 AND (__qm0 = 0 OR __sl0 < __qm0) THEN __sl0 "
            "WHEN __qm0 > 0 THEN __qm0 ELSE 0 END",
        ),
        (
            "__ath",
            "CASE WHEN __slp > 0 THEN substring(__rst, 1, __slp - 1) "
            "ELSE __rst END",
        ),
        ("__pq", "CASE WHEN __slp > 0 THEN substring(__rst, __slp) ELSE '' END"),
        # userinfo dropped, lowercased, host:port split
        ("__atp", "position('@' IN __ath)"),
        (
            "__hp",
            "lower(CASE WHEN __atp > 0 THEN substring(__ath, __atp + 1) "
            "ELSE __ath END)",
        ),
        ("__cp", "position(':' IN __hp)"),
        ("__hst", "CASE WHEN __cp > 0 THEN substring(__hp, 1, __cp - 1) ELSE __hp END"),
        ("__prt", "CASE WHEN __cp > 0 THEN substring(__hp, __cp + 1) ELSE '' END"),
        (
            "__psf",
            "CASE WHEN __prt = '' THEN '' "
            "WHEN __sch = 'http' AND __prt = '80' THEN '' "
            "WHEN __sch = 'https' AND __prt = '443' THEN '' "
            "ELSE ':' || __prt END",
        ),
        # www. stripped, labels reversed
        (
            "__nw",
            "CASE WHEN substring(__hst, 1, 4) = 'www.' THEN substring(__hst, 5) "
            "ELSE __hst END",
        ),
        ("__rvh", revhost),
        # path defaults to '/', query params sorted ('&' is regex-safe, so
        # one splitc serves both dialects)
        ("__qp", "position('?' IN __pq)"),
        ("__pth", "CASE WHEN __qp > 0 THEN substring(__pq, 1, __qp - 1) ELSE __pq END"),
        ("__qry", "CASE WHEN __qp > 0 THEN substring(__pq, __qp + 1) ELSE '' END"),
    ]
    body = (
        "__rvh || __psf || ')' "
        "|| (CASE WHEN __pth = '' THEN '/' ELSE __pth END) "
        f"|| (CASE WHEN __qry = '' THEN '' ELSE '?' || ({sortedq}) END)"
    )
    for var, value in reversed(steps):
        body = _let(d, var, value, body)
    return body


def surt_key_col(url_col: str = "url") -> Column:
    """The Spark-side SURT key column (JVM expression, map-only)."""
    return F.expr(surt_sql(url_col, SPARK_DIALECT))


def surt_duck_sql(url: str = "url") -> str:
    """The DuckDB-dialect twin, for oracle SQL assembly."""
    return surt_sql(url, DUCK_DIALECT)
