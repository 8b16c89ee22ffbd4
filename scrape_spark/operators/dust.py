"""DUST — mining and applying "Different URLs, Similar Text" rewrite rules.

Crawl frontiers drown in URL aliases: session ids, tracking params and
sort keys multiply one page into thousands of URLs. The reference dedups
on the EXACT url string only (its ``url(255)`` unique key,
schema/scraped_pages.sql:14), so every alias is fetched again. Following
Bar-Yossef/Keidar/Schonfeld ("Do not crawl in the DUST", WWW'07), this
module LEARNS parameter-strip rules from evidence already in the lake —
URL pairs whose content hash is identical when one query token is
removed — and applies the confident rules to canonicalize URLs *before*
the seen-set check, collapsing alias families to one fetch.

Both stages are dialect-templated (functions/textstats.py discipline):
the same formula strings compile to Spark SQL (engine) and DuckDB SQL
(oracle), all-JVM on the hot path, no Python UDFs.

Scale shape:

- mining: the token explode is bounded by params-per-URL (crawlers cap
  this at ~8, ``functions/urltrap.py``); the evidence join is ONE
  url-keyed equi-join (same key the seen-set shuffles on); the rule fold
  is a (host, param) groupBy with map-side combine. Rules out ≈ hosts ×
  distinct params — tiny next to the URL set.
- application: rules are broadcast (a confident rule table is
  O(hosts × params), and per-host it is a handful of rows); the rewrite
  itself is a map-only array expression. Zero shuffle on the URL side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scrape_spark.functions.textstats import DUCK_DIALECT, SPARK_DIALECT

#: a rule must be witnessed by >= this many same-content pairs by default
MIN_SUPPORT = 2
#: ... and hold on >= this % of the URLs it was tried on
MIN_CONFIDENCE_PCT = 100


def _url_parts(url: str, d: dict) -> dict[str, str]:
    """Shared formula fragments over URL column ``url`` in dialect ``d``.

    ``base`` = everything before the first '?' (the engine's canonical
    URLs carry no fragment — normalize_url_expr drops it); ``params`` =
    the '&'-split query tokens ([] when there is no query); ``host`` =
    element 3 of the '/'-split base (scheme://host/...).
    """
    qpos = f"position('?' IN {url})"
    base = (
        f"CASE WHEN {qpos} > 0 THEN substring({url}, 1, {qpos} - 1) "
        f"ELSE {url} END"
    )
    query = f"CASE WHEN {qpos} > 0 THEN substring({url}, {qpos} + 1) ELSE '' END"
    params = (
        f"CASE WHEN length({query}) = 0 THEN {d['empty_str_array']} "
        f"ELSE " + d["splitc"].format(s=query, sep="'&'") + " END"
    )
    host = d["at"].format(arr=d["splitc"].format(s=base, sep="'/'"), i="3")
    return {"base": base, "params": params, "host": host}


def param_name_sql(token: str) -> str:
    """key of a ``k=v`` query token (the whole token when it has no '=').

    Portable as-is: CASE/position/substring evaluate identically on Spark
    and DuckDB.
    """
    epos = f"position('=' IN {token})"
    return (
        f"CASE WHEN {epos} > 0 THEN substring({token}, 1, {epos} - 1) "
        f"ELSE {token} END"
    )


def strip_token_sql(url: str, token: str, d: dict) -> str:
    """``url`` with every query token equal to ``token`` removed.

    '?' disappears when the query empties — the candidate must hit the
    canonical param-less URL exactly.
    """
    p = _url_parts(url, d)
    kept = d["filter"].format(arr=p["params"], lam=f"_dk -> _dk <> {token}")
    # DuckDB's array_to_string([]) is NULL where Spark's array_join is ''
    newq = "COALESCE(" + d["ajoin"].format(arr=kept, sep="'&'") + ", '')"
    return (
        f"{p['base']} || CASE WHEN length({newq}) = 0 THEN '' "
        f"ELSE '?' || {newq} END"
    )


def strip_params_sql(url: str, names_arr: str, d: dict) -> str:
    """``url`` with every query token whose KEY is in ``names_arr`` removed
    (the rule-application rewrite; ``names_arr`` is a string-array column).
    """
    p = _url_parts(url, d)
    contains = (
        f"{d['size'].format(arr=d['filter'].format(arr=names_arr, lam='_dn -> _dn = ' + param_name_sql('_dt')))} > 0"
    )
    kept = d["filter"].format(arr=p["params"], lam=f"_dt -> NOT ({contains})")
    # same empty-join NULL divergence as strip_token_sql
    newq = "COALESCE(" + d["ajoin"].format(arr=kept, sep="'&'") + ", '')"
    return (
        f"CASE WHEN {names_arr} IS NULL THEN {url} ELSE "
        f"{p['base']} || CASE WHEN length({newq}) = 0 THEN '' "
        f"ELSE '?' || {newq} END END"
    )


def dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_sha",
    min_support: int = MIN_SUPPORT,
) -> DataFrame:
    """Mine (host, param) strip rules from a url-unique page snapshot.

    ``pages`` must hold ONE row per url (run the latest-capture snapshot
    dedup first — a url with several historical hashes would make the
    evidence ambiguous). For every query token of every URL, the
    candidate URL with that token stripped is probed against the snapshot
    itself; the probe *supports* the rule when the candidate exists with
    the SAME content hash.

    Returns (host, param, n_tried, support, confidence_pct) for rules
    with ``support >= min_support`` — confidence is floor(100 * support /
    n_tried), so callers gate on both (the classic DUST precision knob;
    :data:`MIN_CONFIDENCE_PCT` demands the rule never failed).
    """
    d = SPARK_DIALECT
    snap = pages.select(
        F.col(url_col).alias("_du_url"), F.col(hash_col).alias("_du_sha")
    )
    p = _url_parts("_du_url", d)
    tok = snap.select(
        "_du_url",
        "_du_sha",
        F.expr(p["host"]).alias("host"),
        F.explode(F.expr(p["params"])).alias("_du_tok"),
    )
    cand = tok.select(
        "host",
        F.expr(param_name_sql("_du_tok")).alias("param"),
        F.expr(strip_token_sql("_du_url", "_du_tok", d)).alias("_du_cand"),
        "_du_sha",
    )
    probe = snap.select(
        F.col("_du_url").alias("_du_cand"), F.col("_du_sha").alias("_du_csha")
    )
    # url-keyed equi-join against the snapshot (the seen-set's own key)
    hits = cand.join(probe, "_du_cand", "left")
    ok = (F.col("_du_csha").isNotNull() & (F.col("_du_csha") == F.col("_du_sha"))).cast("long")
    return (
        hits.groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tried"),
            F.sum(ok).cast("long").alias("support"),
        )
        .withColumn(
            # exact integer div, matching the oracle's `//` — the old
            # floor-over-double form was provably equal only for
            # n_tried < 2^45 (r5 double-audit: quotient-to-integer
            # distance >= 1/b beats the ulp there); integer is exact
            # unconditionally and reads as what it is
            "confidence_pct",
            F.expr("CAST((100 * support) div n_tried AS BIGINT)"),
        )
        .where(F.col("support") >= F.lit(int(min_support)))
    )


def dust_rules_sql(
    pages_sql: str,
    min_support: int = MIN_SUPPORT,
) -> str:
    """The SAME mining pass for the DuckDB oracle.

    ``pages_sql`` yields (url VARCHAR, content_sha VARCHAR), url-unique.
    """
    d = DUCK_DIALECT
    p = _url_parts("url", d)
    return f"""\
WITH _du_s AS (SELECT url, content_sha FROM ({pages_sql})),
_du_t AS (SELECT url, content_sha,
            {p['host']} AS host,
            unnest({p['params']}) AS _du_tok
          FROM _du_s),
_du_c AS (SELECT host,
            {param_name_sql('_du_tok')} AS param,
            {strip_token_sql('url', '_du_tok', d)} AS _du_cand,
            content_sha
          FROM _du_t),
_du_h AS (SELECT c.host, c.param,
            CASE WHEN s.content_sha IS NOT NULL
                  AND s.content_sha = c.content_sha
                 THEN 1 ELSE 0 END AS ok
          FROM _du_c c LEFT JOIN _du_s s ON s.url = c._du_cand)
SELECT host, param,
       CAST(COUNT(*) AS BIGINT) AS n_tried,
       CAST(SUM(ok) AS BIGINT) AS support,
       CAST((100 * SUM(ok)) // COUNT(*) AS BIGINT) AS confidence_pct
FROM _du_h
GROUP BY host, param
HAVING SUM(ok) >= {int(min_support)}"""


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    min_confidence_pct: int = MIN_CONFIDENCE_PCT,
    out_col: str = "canonical_url",
) -> DataFrame:
    """Rewrite ``url_col`` by stripping every rule-matched param — the
    alias-collapse step that runs BEFORE the seen-set anti-join.

    Rules are filtered to ``confidence_pct >= min_confidence_pct``,
    folded to one string-array per host, and broadcast; the rewrite is a
    single map-side array expression per URL (no shuffle on the URL side).
    URLs on hosts with no rules pass through unchanged.
    """
    d = SPARK_DIALECT
    p = _url_parts(url_col, d)
    per_host = (
        rules.where(F.col("confidence_pct") >= F.lit(int(min_confidence_pct)))
        .groupBy("host")
        .agg(F.array_sort(F.collect_set("param")).alias("_du_strip"))
    )
    joined = urls.withColumn("_du_host", F.expr(p["host"])).join(
        F.broadcast(per_host).withColumnRenamed("host", "_du_host"),
        "_du_host",
        "left",
    )
    return joined.withColumn(
        out_col, F.expr(strip_params_sql(url_col, "_du_strip", d))
    ).drop("_du_host", "_du_strip")


def apply_dust_rules_sql(
    urls_sql: str,
    rules_sql: str,
    min_confidence_pct: int = MIN_CONFIDENCE_PCT,
) -> str:
    """The SAME rewrite for the DuckDB oracle: ``urls_sql`` yields (url),
    ``rules_sql`` yields (host, param, n_tried, support, confidence_pct);
    output (url, canonical_url)."""
    d = DUCK_DIALECT
    p = _url_parts("url", d)
    return f"""\
WITH _da_u AS (SELECT url, {p['host']} AS _du_host FROM ({urls_sql})),
_da_r AS (SELECT host AS _du_host,
            list_sort(list_distinct(list(param))) AS _du_strip
          FROM ({rules_sql})
          WHERE confidence_pct >= {int(min_confidence_pct)}
          GROUP BY host)
SELECT u.url,
       {strip_params_sql('u.url', '_du_strip', d)} AS canonical_url
FROM _da_u u LEFT JOIN _da_r r USING (_du_host)"""
