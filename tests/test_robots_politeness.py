"""Robots predicate/TTL/refresh + politeness quota/slots parity tests."""

import datetime

from pyspark.sql import functions as F

from scrape_spark.operators.politeness import (
    assign_fetch_slots,
    host_quota_expr,
    per_host_take,
)
from scrape_spark.operators.robots import (
    ROBOTS_SCHEMA,
    join_robots,
    refresh_robots,
    valid_rules,
)

NOW = datetime.datetime(2025, 6, 1, 12, 0, 0)
LATER = NOW + datetime.timedelta(hours=1)
EXPIRED = NOW - datetime.timedelta(hours=1)


def _robots(spark, rows):
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def _frontier(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.coalesce(F.nullif(F.parse_url("url", F.lit("PATH")), F.lit("")), F.lit("/")).alias("path"),
    )


def test_robots_deny_before_allow(spark):
    # reference fixture semantics (tests/test_robots_handler.py:70-86 +
    # robots_handler.py:92-104): disallow /private, allow /public, delay 3.
    robots = _robots(
        spark,
        [("h1.test", "MyScraperBot", "/private", "/public", 3, NOW, LATER)],
    )
    frontier = _frontier(
        spark,
        [
            "http://h1.test/public/page",
            "http://h1.test/private/page",
            "http://h1.test/elsewhere",
            "http://h2.test/anything",  # no rules → allow, delay 0
        ],
    )
    out = {
        r["url"]: (r["robots_denied"], r["crawl_delay"])
        for r in join_robots(frontier, robots, now=F.lit(NOW)).collect()
    }
    assert out["http://h1.test/public/page"] == (False, 3)
    assert out["http://h1.test/private/page"] == (True, 0)
    assert out["http://h1.test/elsewhere"] == (False, 3)
    assert out["http://h2.test/anything"] == (False, 0)


def test_robots_ttl_expired_rows_ignored(spark):
    robots = _robots(
        spark, [("h1.test", "MyScraperBot", "/private", None, 5, EXPIRED, EXPIRED)]
    )
    assert valid_rules(robots, F.lit(NOW)).count() == 0
    out = join_robots(
        _frontier(spark, ["http://h1.test/private/x"]), robots, now=F.lit(NOW)
    ).collect()[0]
    assert out["robots_denied"] is False and out["crawl_delay"] == 0


def test_robots_blanket_disallow(spark):
    # reference stores '*' when disallow_all (fetch path robots_handler.py:20)
    # and matches it as a path prefix... '*' never prefix-matches a path, so
    # blanket handling maps '*' to '/' at parse time in the engine; a literal
    # '*' row therefore denies nothing (parity with check_robots_rules, where
    # path.startswith('*') is always False — reference quirk).
    robots = _robots(spark, [("h1.test", "MyScraperBot", "*", None, 0, NOW, LATER)])
    out = join_robots(
        _frontier(spark, ["http://h1.test/x"]), robots, now=F.lit(NOW)
    ).collect()[0]
    assert out["robots_denied"] is False  # documented reference quirk


def test_refresh_robots_parses_and_upserts(spark):
    robots = _robots(
        spark,
        [
            ("stale.test", "MyScraperBot", "/old", None, 9, EXPIRED, EXPIRED),
            ("good.test", "MyScraperBot", "/keep", None, 1, NOW, LATER),
        ],
    )
    needed = spark.createDataFrame(
        [("stale.test",), ("good.test",), ("new.test",), ("nofetch.test",)],
        "host string",
    )
    source = spark.createDataFrame(
        [
            ("stale.test", "User-agent: *\nDisallow: /priv\nCrawl-delay: 4\n"),
            ("new.test", "User-agent: *\nAllow: /pub\nDisallow: /secret\n"),
            # nofetch.test absent → simulated URLError → no row
        ],
        "host string, robots_txt string",
    )
    out = refresh_robots(robots, needed, source, now=F.lit(NOW))
    rows = {r["host"]: r for r in out.collect()}
    assert rows["stale.test"]["disallow"] == "/priv"
    assert rows["stale.test"]["crawl_delay"] == 4
    assert rows["good.test"]["disallow"] == "/keep"  # untouched (valid TTL)
    assert rows["new.test"]["disallow"] == "/secret"
    assert rows["new.test"]["allow"] == "/pub"
    assert "nofetch.test" not in rows
    assert rows["stale.test"]["expires_at"] > rows["stale.test"]["fetched_at"]


def test_host_quota_expr(spark):
    df = spark.createDataFrame([(0,), (2,), (7,), (None,)], "delay int")
    out = df.select(host_quota_expr(F.col("delay"), round_seconds=60).alias("q"))
    assert [r["q"] for r in out.collect()] == [1_000_000, 30, 8, 1_000_000]


def test_host_quota_slow_host_liveness(spark):
    """delay > round_seconds: quota 1 exactly in rounds containing a multiple
    of the delay on the virtual clock (never 0 forever — VERDICT r2 #1)."""
    df = spark.createDataFrame([(120,), (90,), (61,)], "delay int")

    def quotas(r):
        out = df.select(
            "delay",
            host_quota_expr(F.col("delay"), round_seconds=60, round_idx=r).alias("q"),
        )
        return {row["delay"]: row["q"] for row in out.collect()}

    # delay 120: rounds 0,2,4 aligned; 1,3 not
    assert [quotas(r)[120] for r in range(5)] == [1, 0, 1, 0, 1]
    # delay 90: multiples 0,90,180,270 → rounds 0,1,3,4
    assert [quotas(r)[90] for r in range(5)] == [1, 1, 0, 1, 1]
    # delay 61: multiples 0,61,122,... → rounds 0,1,2 then gap at 3? 183→3
    assert [quotas(r)[61] for r in range(5)] == [1, 1, 1, 1, 1]
    # cumulative fetches through round r: exactly the multiples of d in
    # [0, (r+1)·rs) — the delay-rate budget plus the fencepost fetch at t=0
    import math

    for d in (120, 90, 61):
        total = 0
        for r in range(12):
            total += quotas(r)[d]
            assert total == math.ceil((r + 1) * 60 / d), (d, r, total)


def test_fetch_slots_slow_host_pinned_to_delay_grid(spark):
    """delay > round_seconds: slots land on the k·delay grid so consecutive
    fetches are exactly `delay` apart ACROSS rounds, not round_seconds."""
    df = spark.createDataFrame([("h.test", 1, 90)], "host string, host_rank int, crawl_delay int")
    slots = []
    for r in (0, 1, 3, 4):  # the rounds where delay-90 quota is 1
        out = assign_fetch_slots(
            df,
            F.lit(NOW + datetime.timedelta(seconds=r * 60)),
            round_seconds=60,
            round_idx=r,
        ).collect()[0]
        slots.append(out["fetch_slot"])
    offs = [(s - NOW).total_seconds() for s in slots]
    assert offs == [0, 90, 180, 270]  # exactly the multiples of 90


def test_per_host_take_respects_quota_and_order(spark):
    rows = [("big.test", i) for i in range(200)] + [("small.test", i) for i in range(3)]
    df = (
        spark.createDataFrame(rows, "host string, seq long")
        .withColumn("quota", F.when(F.col("host") == "big.test", 10).otherwise(5))
    )
    out = per_host_take(df, "quota", order_cols=["seq"], n_salts=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["host"], []).append((r["host_rank"], r["seq"]))
    assert sorted(got["big.test"]) == [(i + 1, i) for i in range(10)]  # lowest seq first
    assert sorted(got["small.test"]) == [(i + 1, i) for i in range(3)]


def test_fetch_slots_monotone_with_delay_gaps(spark):
    rows = [("h.test", i + 1, 5) for i in range(10)]
    df = spark.createDataFrame(rows, "host string, host_rank int, crawl_delay int")
    out = assign_fetch_slots(df, F.lit(NOW)).orderBy("host_rank").collect()
    slots = [r["fetch_slot"] for r in out]
    assert slots[0] == NOW
    for a, b in zip(slots, slots[1:]):
        assert (b - a).total_seconds() == 5  # exactly crawl_delay apart


# ---------------------------------------------------------------------------
# RFC 9309 wildcard mode
# ---------------------------------------------------------------------------
def test_rep_wildcard_semantics(spark):
    from scrape_spark.operators.robots import rep_allowed

    rules = [
        ("h.test", "disallow", "/private"),
        ("h.test", "allow", "/private/ok"),
        ("h.test", "disallow", "/*.pdf$"),
        ("h.test", "allow", "/a/*/c"),
        ("h.test", "disallow", "/a/"),
        ("h.test", "disallow", ""),
    ]
    urls = [
        ("u1", "h.test", "/private/x"),
        ("u2", "h.test", "/private/ok/page"),
        ("u3", "h.test", "/doc/file.pdf"),
        ("u4", "h.test", "/doc/file.pdfx"),   # '$' really anchors
        ("u5", "h.test", "/a/b/c/d"),          # longest match is the allow
        ("u6", "h.test", "/other"),
        ("u7", "j.test", "/x"),                # ruleless host
    ]
    udf = spark.createDataFrame(urls, "url string, host string, path string")
    rdf = spark.createDataFrame(rules, "host string, rule_type string, pattern string")
    got = {
        r["url"]: (r["allowed"], r["rule_pattern"])
        for r in rep_allowed(udf, rdf).collect()
    }
    assert got == {
        "u1": (False, "/private"),
        "u2": (True, "/private/ok"),
        "u3": (False, "/*.pdf$"),
        "u4": (True, None),
        "u5": (True, "/a/*/c"),
        "u6": (True, None),
        "u7": (True, None),
    }


def test_rep_wildcard_fuzz_three_way(spark):
    import random

    import duckdb

    from scrape_spark.operators.robots import (
        rep_allowed,
        rep_allowed_py,
        rep_allowed_sql,
    )

    rng = random.Random(13)
    segs = ["a", "b", "cc", "d.d", "x+y", "p(q)", "file.pdf", "t.tmp", "[z]"]
    rules = []
    for i in range(25):
        pat = "/" + "/".join(rng.choice(segs) for _ in range(rng.randrange(1, 3)))
        if rng.random() < 0.4:
            pat = pat.replace("/", "/*", 1) if rng.random() < 0.5 else pat + "*"
        if rng.random() < 0.3:
            pat += "$"
        rules.append(("f.test", rng.choice(["allow", "disallow"]), pat))
    urls = [
        (f"u{i}", "f.test", "/" + "/".join(rng.choice(segs) for _ in range(rng.randrange(1, 4))))
        for i in range(60)
    ]
    udf = spark.createDataFrame(urls, "url string, host string, path string")
    rdf = spark.createDataFrame(rules, "host string, rule_type string, pattern string")
    got = {
        r["url"]: (r["allowed"], r["rule_type"], r["rule_pattern"])
        for r in rep_allowed(udf, rdf).collect()
    }
    rl = [(t, p) for _, t, p in rules]
    for u, _, p in urls:
        assert got[u] == rep_allowed_py(p, rl), (u, p)
    uv = ", ".join(f"('{a}','{b}','{c}')" for a, b, c in urls)
    rv = ", ".join(f"('{a}','{b}','{c}')" for a, b, c in rules)
    want = {
        r[0]: (r[3], r[4], r[5])
        for r in duckdb.sql(
            rep_allowed_sql(
                f"SELECT * FROM (VALUES {uv}) t(url, host, path)",
                f"SELECT * FROM (VALUES {rv}) t(host, rule_type, pattern)",
            )
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# host_backoff — error-driven exponential backoff
# ---------------------------------------------------------------------------


def _backoff_fixture():
    # (host, fetch_ts, status): every shape —
    #  a: errors then recovery (streak 0)
    #  b: success then 3 trailing errors (streak 3)
    #  c: never succeeded, incl. a NULL transport failure (streak 3)
    #  d: all ok (streak 0)
    #  e: 9 trailing errors (streak 9 -> mult capped at 2^6)
    rows = [
        ("a", 1, 503), ("a", 2, 500), ("a", 3, 200),
        ("b", 1, 200), ("b", 2, 503), ("b", 3, 429), ("b", 4, None),
        ("c", 1, 503), ("c", 2, None), ("c", 3, 500),
        ("d", 1, 200), ("d", 2, 301),
    ] + [("e", t, 200 if t == 0 else 503) for t in range(10)]
    return rows


def _backoff_py(rows, ok_max=399, max_exp=6):
    want = {}
    hosts = {h for h, _, _ in rows}
    for h in hosts:
        mine = [(t, s) for hh, t, s in rows if hh == h]
        oks = [t for t, s in mine if s is not None and s <= ok_max]
        last_ok = max(oks) if oks else None
        streak = sum(
            1
            for t, s in mine
            if (s is None or s > ok_max) and (last_ok is None or t > last_ok)
        )
        want[h] = (last_ok, streak, 1 << min(streak, max_exp))
    return want


def test_host_backoff_matches_python_spec(spark):
    from scrape_spark.operators.politeness import host_backoff

    rows = _backoff_fixture()
    df = spark.createDataFrame(rows, "host string, fetch_ts long, status int")
    got = {
        r["host"]: (r["last_ok_ts"], r["err_streak"], r["backoff_mult"])
        for r in host_backoff(df).collect()
    }
    assert got == _backoff_py(rows)
    assert got["e"][2] == 64  # capped at 2^6 despite streak 9


def test_host_backoff_duckdb_parity_with_delays(spark):
    import duckdb

    from scrape_spark.operators.politeness import host_backoff, host_backoff_sql

    rows = _backoff_fixture()
    vals = ", ".join(
        f"('{h}', {t}, {'NULL' if s is None else s})" for h, t, s in rows
    )
    outcomes_sql = (
        f"SELECT host, CAST(fetch_ts AS BIGINT) AS fetch_ts,"
        f" CAST(status AS INT) AS status"
        f" FROM (VALUES {vals}) t(host, fetch_ts, status)"
    )
    delays_sql = (
        "SELECT host, CAST(d AS BIGINT) AS crawl_delay FROM (VALUES"
        " ('a', 2), ('b', 5), ('e', 1)) t(host, d)"
    )
    want = {
        r[0]: r[1:]
        for r in duckdb.connect()
        .execute(host_backoff_sql(outcomes_sql, delays_sql))
        .fetchall()
    }
    df = spark.createDataFrame(rows, "host string, fetch_ts long, status int")
    delays = spark.createDataFrame(
        [("a", 2), ("b", 5), ("e", 1)], "host string, crawl_delay long"
    )
    got = {
        r["host"]: (
            r["last_ok_ts"],
            r["err_streak"],
            r["backoff_mult"],
            r["effective_delay"],
        )
        for r in host_backoff(df, delays=delays).collect()
    }
    assert got == want
    assert got["c"][3] == 0  # host without a delay row: delay 0, mult intact
    assert got["b"][3] == 5 * 8  # delay 5 x 2^3


def test_host_backoff_feeds_quota_expr(spark):
    # the integration contract: effective_delay slots into host_quota_expr
    from scrape_spark.operators.politeness import (
        host_backoff,
        host_quota_expr,
    )

    rows = _backoff_fixture()
    df = spark.createDataFrame(rows, "host string, fetch_ts long, status int")
    delays = spark.createDataFrame(
        [("b", 5), ("d", 5)], "host string, crawl_delay long"
    )
    out = host_backoff(df, delays=delays).withColumn(
        "quota", host_quota_expr(F.col("effective_delay"), round_seconds=60)
    )
    q = {r["host"]: r["quota"] for r in out.collect()}
    assert q["d"] == 12  # healthy host: floor(60/5)
    assert q["b"] == 1  # 5s delay backed off 8x -> 40s -> one fetch/round


# -- IP-scope politeness --------------------------------------------------------


def test_ip_politeness_dim_scopes(spark):
    from scrape_spark.operators.politeness import ip_politeness_dim

    hosts = spark.createDataFrame(
        [("a.test", 2), ("b.test", 120), ("c.test", None), ("d.test", 5)],
        "host string, crawl_delay int",
    )
    ips = spark.createDataFrame(
        [
            ("a.test", "10.0.0.1"),
            ("b.test", "10.0.0.1"),  # shares a server with a.test
            ("c.test", "10.0.0.2"),
            ("a.test", "10.0.0.9"),  # duplicate mapping: min ip wins
            # d.test unresolved
        ],
        "host string, ip string",
    )
    got = {r["host"]: r for r in ip_politeness_dim(hosts, ips).collect()}
    assert got["a.test"]["pol_key"] == "10.0.0.1"
    # shared scope takes the most conservative delay
    assert got["a.test"]["eff_delay"] == 120
    assert got["b.test"]["eff_delay"] == 120
    # all-NULL scope stays NULL (unknown -> delay-0 cap downstream)
    assert got["c.test"]["eff_delay"] is None
    # unresolved host degrades to per-host scope
    assert got["d.test"]["pol_key"] == "d.test"
    assert got["d.test"]["eff_delay"] == 5


def test_ip_politeness_dim_no_map_is_identity(spark):
    from scrape_spark.operators.politeness import ip_politeness_dim

    hosts = spark.createDataFrame(
        [("a.test", 3)], "host string, crawl_delay int"
    )
    r = ip_politeness_dim(hosts, None).head()
    assert r["pol_key"] == "a.test" and r["eff_delay"] == 3


def test_request_rate_folds_into_delay():
    from scrape_spark.operators.robots import parse_robots_body

    body = "User-agent: *\nRequest-rate: 1/5\nDisallow: /x\n"
    _, _, delay = parse_robots_body(body, "bot")
    assert delay == 5

    both = "User-agent: *\nCrawl-delay: 2\nRequest-rate: 2/9\n"
    _, _, delay = parse_robots_body(both, "bot")
    assert delay == 5  # ceil(9/2) beats crawl-delay 2

    lax = "User-agent: *\nCrawl-delay: 7\nRequest-rate: 1/3\n"
    _, _, delay = parse_robots_body(lax, "bot")
    assert delay == 7  # crawl-delay stays the stricter bound
