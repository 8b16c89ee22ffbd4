"""robots.txt rules dim table + allow/deny predicate + TTL refresh.

The reference caches per-domain rules in MySQL with a 24 h TTL
(robots_handler.py:24-25, schema/robots_rules.sql) and probes them one row at
a time per URL (robots_handler.py:60-69). The engine keeps the same logical
table — ``(host, user_agent, disallow, allow, crawl_delay, fetched_at,
expires_at)`` with newline-joined path-prefix patterns — as a small dim
DataFrame that BROADCAST-joins onto the frontier batch.

Predicate parity (robots_handler.py:90-104, deny checked BEFORE allow):

- any non-empty disallow pattern that path-prefix-matches → denied, delay 0
- else → allowed with delay = crawl_delay or 0  (the allow list only matters
  in the reference to short-circuit to the same allowed result, so the
  engine's boolean is simply NOT deny; allow patterns are kept for parity
  and future per-path precedence modes)
- no rules row (or expired) → allowed, delay 0 (robots_handler.py:83-84)

Refresh: expired/missing hosts are a distinct host list; fetching is
simulated by joining a robots_txt source table (per graft spec the "network"
is pre-materialized) and parsing with the stdlib RobotFileParser inside
``applyInPandas`` over the tiny distinct-host set.
"""

from __future__ import annotations

import datetime as _dt
from io import StringIO

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TTL_HOURS = 24  # robots_handler.py:25

ROBOTS_SCHEMA = (
    "host string, user_agent string, disallow string, allow string, "
    "crawl_delay int, fetched_at timestamp, expires_at timestamp"
)


def valid_rules(robots: DataFrame, now: Column | None = None) -> DataFrame:
    """TTL predicate: rules usable iff expires_at > now (robots_handler.py:64)."""
    now = now if now is not None else F.current_timestamp()
    return robots.where(F.col("expires_at") > now)


def robots_denied_expr(
    path: Column, disallow: Column, allow: Column | None = None
) -> Column:
    """True iff any non-empty disallow pattern prefix-matches the path.

    Deny-before-allow precedence (robots_handler.py:92-96): a disallow match
    wins regardless of allow patterns; with no disallow match the request is
    allowed either way, so allow patterns don't change the boolean.
    NULL disallow (no rules / no patterns) → not denied.
    """
    return F.coalesce(
        F.exists(
            F.split(disallow, "\n"),
            lambda p: (p != F.lit("")) & path.startswith(p),
        ),
        F.lit(False),
    )


def join_robots(
    frontier: DataFrame,
    robots: DataFrame,
    user_agent: str = "MyScraperBot",
    host_col: str = "host",
    path_col: str = "path",
    now: Column | None = None,
) -> DataFrame:
    """Broadcast-join valid rules onto the batch and evaluate the predicate.

    Adds ``robots_denied`` boolean and ``crawl_delay`` int (0 when absent —
    robots_handler.py:102-104 ``or 0``). The dim side is deduped per host and
    broadcast: replaces the reference's per-URL MySQL point lookup D2.
    """
    dim = (
        valid_rules(robots, now)
        .where(F.col("user_agent") == user_agent)
        .select(
            F.col("host").alias(host_col),
            F.col("disallow").alias("_r_disallow"),
            F.col("allow").alias("_r_allow"),
            F.col("crawl_delay").alias("_r_delay"),
        )
        .dropDuplicates([host_col])
    )
    joined = frontier.join(F.broadcast(dim), on=host_col, how="left")
    denied = robots_denied_expr(
        F.col(path_col), F.col("_r_disallow"), F.col("_r_allow")
    )
    return (
        joined.withColumn("robots_denied", denied)
        .withColumn(
            "crawl_delay",
            F.when(F.col("robots_denied"), F.lit(0)).otherwise(
                F.coalesce(F.col("_r_delay"), F.lit(0))
            ),
        )
        .drop("_r_disallow", "_r_allow", "_r_delay")
    )


# -- refresh path -------------------------------------------------------------


def parse_robots_body(body: str | None, agent: str) -> tuple[str, str, int | None]:
    """Pure kernel: robots.txt body → (disallow, allow, crawl_delay).

    Stdlib RobotFileParser, shared by the Spark refresh path and the
    in-memory reference oracle (tests). Mirrors the reference's storage
    decision (robots_handler.py:20-22): blanket '*' when
    disallow_all/allow_all, plus crawl_delay; the engine additionally
    persists the per-path prefixes for the configured agent (superset — the
    reference's own check_robots_rules expects path prefixes in these
    columns, robots_handler.py:93-101). Patterns newline-joined.
    """
    from urllib.robotparser import RobotFileParser

    disallow_pats: list[str] = []
    allow_pats: list[str] = []
    delay = None
    if body:
        rp = RobotFileParser()
        rp.parse(StringIO(body).read().splitlines())
        if getattr(rp, "disallow_all", False):
            disallow_pats = ["*"]
        if getattr(rp, "allow_all", False):
            allow_pats = ["*"]
        try:
            delay = rp.crawl_delay(agent)
        except Exception:
            delay = None
        # Request-rate: n/m (n requests per m seconds) folds into the
        # effective per-request delay as ceil(m/n); when both directives
        # appear the STRICTER one wins (max). The reference ignores the
        # directive entirely; honoring it is the same superset policy as
        # the per-path prefixes below.
        try:
            rate = rp.request_rate(agent)
        except Exception:
            rate = None
        if rate is not None and getattr(rate, "requests", 0):
            per_req = -(-int(rate.seconds) // int(rate.requests))  # ceil
            delay = per_req if delay is None else max(int(delay), per_req)
        entry = getattr(rp, "default_entry", None) or getattr(
            rp, "_default_entry", None
        )
        for e in getattr(rp, "entries", []):
            if e.applies_to(agent):
                entry = e
                break
        if entry is not None:
            for line in entry.rulelines:
                pat = line.path
                if pat in ("", "*"):
                    continue
                (allow_pats if line.allowance else disallow_pats).append(pat)
    return (
        "\n".join(disallow_pats),
        "\n".join(allow_pats),
        int(delay) if delay is not None else None,
    )


def check_rules(
    path: str, disallow: str | None, allow: str | None, crawl_delay: int | None
) -> tuple[bool, int]:
    """Pure predicate: (allowed, delay) — reference robots_handler.py:90-104.

    Disallow checked BEFORE allow; any non-empty prefix match denies with
    delay 0; otherwise allowed with crawl_delay or 0. Used by the oracle;
    the Spark path evaluates the same logic as a Catalyst expression
    (``robots_denied_expr``).
    """
    if disallow:
        for pattern in disallow.split("\n"):
            if pattern and path.startswith(pattern):
                return False, 0
    if allow:
        for pattern in allow.split("\n"):
            if pattern and path.startswith(pattern):
                return True, crawl_delay or 0
    return True, crawl_delay or 0


def _make_parse_robots_pdf(now: _dt.datetime):
    """Parse-kernel factory with a DRIVER-fixed fetch timestamp.

    Stamping ``datetime.now`` inside the UDF would let a task retry /
    speculative re-execution produce rows differing only in fetched_at /
    expires_at — the timestamp must be decided once, on the driver, per
    refresh (the rest of the engine already runs on a virtual clock).
    """

    def _parse(pdf: pd.DataFrame) -> pd.DataFrame:
        return _parse_robots_pdf(pdf, now)

    return _parse


def _parse_robots_pdf(pdf: pd.DataFrame, now: _dt.datetime | None = None) -> pd.DataFrame:
    out = []
    if now is None:
        now = _dt.datetime.now(_dt.UTC).replace(tzinfo=None)
    expires = now + _dt.timedelta(hours=TTL_HOURS)
    for host, agent, body in zip(pdf["host"], pdf["user_agent"], pdf["robots_txt"]):
        if not isinstance(body, str):
            body = None  # NaN from a negative-cache left join
        disallow, allow, delay = parse_robots_body(body, agent)
        out.append((host, agent, disallow, allow, delay, now, expires))
    return pd.DataFrame(
        out,
        columns=[
            "host",
            "user_agent",
            "disallow",
            "allow",
            "crawl_delay",
            "fetched_at",
            "expires_at",
        ],
    )


def stale_hosts(
    robots: DataFrame,
    needed_hosts: DataFrame,
    user_agent: str = "MyScraperBot",
    now: Column | None = None,
) -> DataFrame:
    """Hosts from ``needed_hosts`` with no valid (unexpired) rules row."""
    return (
        needed_hosts.select("host")
        .distinct()
        .join(
            valid_rules(robots, now).where(F.col("user_agent") == user_agent),
            on="host",
            how="left_anti",
        )
    )


def refresh_robots(
    robots: DataFrame,
    needed_hosts: DataFrame,
    robots_txt_source: DataFrame,
    user_agent: str = "MyScraperBot",
    now: Column | None = None,
    now_dt: _dt.datetime | None = None,
    negative_cache: bool = False,
) -> DataFrame:
    """Refresh rules for hosts that are missing or expired → new dim table.

    ``needed_hosts``: one column ``host`` (the batch's distinct hosts).
    ``robots_txt_source``: (host, robots_txt string) — the simulated network.
    By default, hosts absent from the source keep no row (reference: fetch
    failure stores nothing, fetch_and_store_robots skips DB on URLError,
    robots_handler.py:42-44 → default allow downstream). With
    ``negative_cache=True`` a failed fetch stores an EMPTY-rules row with the
    normal TTL — the allow/deny/delay outcome is identical (no patterns →
    allowed, delay 0), but the host is not re-fetched on every single page
    until the TTL lapses (the reference re-fetches dead hosts' robots.txt per
    page — wasted work the engine declines to reproduce at 10^10 scale).

    Upsert = anti-join old rows out, union parsed new rows (Iceberg MERGE in
    production, keyed (host, user_agent) — robots_handler.py:27-39).
    """
    stale = stale_hosts(robots, needed_hosts, user_agent, now)
    fetched = stale.join(
        robots_txt_source, on="host", how="left" if negative_cache else "inner"
    ).withColumn("user_agent", F.lit(user_agent))
    if now_dt is None:
        now_dt = _dt.datetime.now(_dt.UTC).replace(tzinfo=None)
    parsed = fetched.groupBy("host").applyInPandas(
        _make_parse_robots_pdf(now_dt), schema=ROBOTS_SCHEMA
    )
    keep = robots.join(
        parsed.select("host", "user_agent"), on=["host", "user_agent"], how="left_anti"
    )
    return keep.unionByName(parsed)


# ---------------------------------------------------------------------------
# RFC 9309 wildcard rules (Googlebot semantics) — the modern-REP extension
# ---------------------------------------------------------------------------
# The reference (and the engine's parity path above) uses stdlib
# RobotFileParser: plain path-prefix matching, deny-before-allow. Modern
# crawlers implement RFC 9309: '*' matches any char run, a trailing '$'
# anchors at URL end, and precedence is LONGEST-MATCHING-RULE with allow
# winning length ties. This section adds that mode as a rule-table
# operator: patterns are DATA (rows), so the pattern->regex translation is
# itself a SQL expression, dialect-templated like every kernel in the repo.
# Percent-encoding normalization is the caller's (canonicalizer's) job.

#: regex metachars escaped during translation ('*' and '$' handled apart;
#: backslash is escaped first and parameterized per dialect — Spark SQL
#: string literals unescape backslashes, DuckDB's do not)
_REP_META = [".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$"]


def _rep_backslash_lit(d: dict) -> str:
    """SQL literal yielding ONE backslash character in dialect ``d``."""
    from scrape_spark.functions import textstats as ts

    return "'\\\\'" if d is ts.SPARK_DIALECT else "'\\'"


def rep_regex_sql(pattern: str, d: dict) -> str:
    """Regex-string expression translating robots pattern column
    ``pattern``: anchored at start, '*' -> '.*', trailing '$' -> '$',
    every other metachar backslash-escaped (mid-pattern '$' is literal,
    the Googlebot behavior)."""
    bs = _rep_backslash_lit(d)
    body = (
        f"CASE WHEN substr({pattern}, length({pattern}), 1) = '$' "
        f"THEN substr({pattern}, 1, length({pattern}) - 1) "
        f"ELSE {pattern} END"
    )
    esc = f"replace({body}, {bs}, {bs} || {bs})"
    for ch in _REP_META:
        lit = "''''" if ch == "'" else f"'{ch}'"
        esc = f"replace({esc}, {lit}, {bs} || {lit})"
    esc = f"replace({esc}, '*', '.*')"
    anchor = (
        f"CASE WHEN substr({pattern}, length({pattern}), 1) = '$' "
        f"THEN '$' ELSE '' END"
    )
    return f"'^' || {esc} || {anchor}"


def rep_match_sql(path: str, pattern: str, d: dict) -> str:
    """True iff ``path`` matches robots ``pattern`` under RFC 9309."""
    from scrape_spark.functions import textstats as ts

    rx = rep_regex_sql(pattern, d)
    if d is ts.SPARK_DIALECT:
        return f"({path} rlike ({rx}))"
    return f"regexp_matches({path}, ({rx}))"


def rep_allowed(
    urls: DataFrame,
    rules: DataFrame,
    path_col: str = "path",
    host_col: str = "host",
) -> DataFrame:
    """RFC 9309 verdict per URL row: (…urls cols…, allowed, rule_type,
    rule_pattern).

    ``rules``: (host, rule_type 'allow'|'disallow', pattern). Empty
    patterns are no-ops per the RFC (an empty Disallow allows everything)
    and are dropped. Precedence: longest matching pattern wins; a length
    tie goes to allow; no matching rule (or no rules for the host) means
    allowed.

    Scale shape: the rule table is robots-sized (tiny next to a frontier
    batch) and BROADCASTs; matching is a map-side regex per (url, rule)
    candidate pair on the same host; the verdict fold is one url-keyed
    window over ≤ rules-per-host rows. The translated regexes are
    start-anchored literals + '.*' runs — linear-time in either engine's
    matcher.
    """
    from pyspark.sql import Window
    from scrape_spark.functions import textstats as ts

    r = rules.where(
        F.col("pattern").isNotNull() & (F.col("pattern") != "")
    ).select(
        F.col("host").alias("_rep_host"),
        F.col("rule_type").alias("_rep_type"),
        F.col("pattern").alias("_rep_pat"),
    )
    cand = urls.join(
        F.broadcast(r),
        urls[host_col] == F.col("_rep_host"),
        "left",
    ).withColumn(
        "_rep_hit",
        F.expr(rep_match_sql(path_col, "_rep_pat", ts.SPARK_DIALECT)),
    )
    w = Window.partitionBy(*[urls[c] for c in urls.columns]).orderBy(
        F.when(F.col("_rep_hit"), F.length("_rep_pat")).otherwise(-1).desc(),
        F.when(F.col("_rep_type") == "allow", 1).otherwise(0).desc(),
        F.col("_rep_pat").desc(),
    )
    ranked = cand.withColumn("_rep_rn", F.row_number().over(w)).where(
        F.col("_rep_rn") == 1
    )
    win = F.col("_rep_hit") & F.col("_rep_hit").isNotNull()
    return ranked.select(
        *urls.columns,
        F.when(win & (F.col("_rep_type") == "disallow"), F.lit(False))
        .otherwise(F.lit(True))
        .alias("allowed"),
        F.when(win, F.col("_rep_type")).alias("rule_type"),
        F.when(win, F.col("_rep_pat")).alias("rule_pattern"),
    )


def rep_allowed_sql(urls_sql: str, rules_sql: str) -> str:
    """The SAME verdict for the DuckDB oracle: ``urls_sql`` yields
    (url, host, path), ``rules_sql`` yields (host, rule_type, pattern)."""
    from scrape_spark.functions import textstats as ts

    d = ts.DUCK_DIALECT
    hit = rep_match_sql("u.path", "r.pattern", d)
    return f"""\
WITH _rep_u AS ({urls_sql}),
_rep_r AS (SELECT host, rule_type, pattern FROM ({rules_sql})
           WHERE pattern IS NOT NULL AND pattern <> ''),
_rep_c AS (SELECT u.url, u.host, u.path, r.rule_type, r.pattern,
             CASE WHEN r.pattern IS NULL THEN FALSE
                  ELSE {hit} END AS hit
           FROM _rep_u u LEFT JOIN _rep_r r USING (host)),
_rep_w AS (SELECT *, ROW_NUMBER() OVER (
             PARTITION BY url, host, path
             ORDER BY CASE WHEN hit THEN length(pattern) ELSE -1 END DESC,
                      CASE WHEN rule_type = 'allow' THEN 1 ELSE 0 END DESC,
                      pattern DESC) AS rn
           FROM _rep_c)
SELECT url, host, path,
       CASE WHEN hit AND rule_type = 'disallow' THEN FALSE
            ELSE TRUE END AS allowed,
       CASE WHEN hit THEN rule_type END AS rule_type,
       CASE WHEN hit THEN pattern END AS rule_pattern
FROM _rep_w WHERE rn = 1"""


def rep_allowed_py(
    path: str, rules: list[tuple[str, str]]
) -> tuple[bool, str | None, str | None]:
    """Pure-Python executable spec: rules = [(rule_type, pattern), ...] for
    ONE host; returns (allowed, rule_type, pattern)."""
    import re

    best: tuple[int, int, str, str] | None = None
    for rule_type, pattern in rules:
        if not pattern:
            continue
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if anchored else "")
        if re.match(rx, path):
            key = (len(pattern), 1 if rule_type == "allow" else 0, pattern)
            if best is None or key > (best[0], best[1], best[3]):
                best = (len(pattern), key[1], rule_type, pattern)
    if best is None:
        return (True, None, None)
    return (best[2] != "disallow", best[2], best[3])
