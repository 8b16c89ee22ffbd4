"""recrawl_priority: change-rate × staleness scheduling semantics."""

from pyspark.sql import functions as F

from scrape_spark.operators.recrawl import recrawl_priority

NOW = 2_000_000


def _caps(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts long, text string")


def test_static_page_priority_equals_age(spark):
    caps = _caps(
        spark,
        [("http://s.test/", 1_000_000 + i, "same content") for i in range(4)],
    )
    row = recrawl_priority(caps, now=NOW).collect()[0]
    assert row["n_caps"] == 4 and row["n_versions"] == 1
    assert row["age"] == NOW - 1_000_003
    assert row["priority"] == row["age"]  # boost = (nc-1)+0 over (nc-1) = 1x


def test_always_changing_page_gets_10x_boost(spark):
    caps = _caps(
        spark,
        [("http://c.test/", 1_000_000 + i, f"version {i}") for i in range(4)],
    )
    row = recrawl_priority(caps, now=NOW).collect()[0]
    assert row["n_versions"] == 4
    # boost = ((4-1) + 9*(4-1)) / (4-1) = 10x, exact integer
    assert row["priority"] == row["age"] * 10


def test_single_capture_is_neutral_and_future_ts_clamps(spark):
    caps = _caps(
        spark,
        [("http://one.test/", 1_500_000, "x"),
         ("http://future.test/", NOW + 999, "y")],
    )
    got = {r["url"]: r for r in recrawl_priority(caps, now=NOW).collect()}
    one = got["http://one.test/"]
    assert one["n_caps"] == 1 and one["priority"] == one["age"] == 500_000
    fut = got["http://future.test/"]
    assert fut["age"] == 0 and fut["priority"] == 0


def test_priority_orders_changed_above_static_at_equal_age(spark):
    rows = []
    for i in range(3):
        rows.append(("http://stat.test/", 1_000_000 + i, "fixed"))
        rows.append(("http://chg.test/", 1_000_000 + i, f"v{i}"))
    out = {
        r["url"]: r["priority"]
        for r in recrawl_priority(_caps(spark, rows), now=NOW).collect()
    }
    assert out["http://chg.test/"] > out["http://stat.test/"]


def test_plan_no_python_and_two_phase_distinct(spark):
    caps = _caps(spark, [("http://s.test/", 1, "t")])
    plan = recrawl_priority(caps, now=NOW)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    # the distinct-count's standard expansion: (url, th) partial, then url
    assert plan.count("Exchange") <= 2
    assert "Scan" in plan and plan.count("Join") == 0  # single-pass, no join


def test_capture_diff_statuses(spark):
    from scrape_spark.operators.recrawl import capture_diff

    old = spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u3", 30), ("u3", 30)],  # dup collapses
        "url string, content_hash long",
    )
    new = spark.createDataFrame(
        [("u1", 10), ("u2", 99), ("u4", 40)],
        "url string, content_hash long",
    )
    got = {r.url: r for r in capture_diff(old, new).collect()}
    assert got["u1"].status == "unchanged"
    assert got["u2"].status == "changed" and got["u2"].old_hash == 20
    assert got["u3"].status == "removed" and got["u3"].new_hash is None
    assert got["u4"].status == "added" and got["u4"].old_hash is None
    assert len(got) == 4


def test_capture_diff_null_hashes_are_data_not_absence(spark):
    from scrape_spark.operators.recrawl import capture_diff

    old = spark.createDataFrame(
        [("both-null", None), ("null-to-h", None), ("h-to-null", 7),
         ("gone-null", None)],
        "url string, content_hash long",
    )
    new = spark.createDataFrame(
        [("both-null", None), ("null-to-h", 5), ("h-to-null", None),
         ("new-null", None)],
        "url string, content_hash long",
    )
    got = {r.url: r.status for r in capture_diff(old, new).collect()}
    assert got == {
        "both-null": "unchanged",   # NULL == NULL null-safely
        "null-to-h": "changed",     # not 'added' — URL was present
        "h-to-null": "changed",
        "gone-null": "removed",     # not 'added'
        "new-null": "added",
    }


def test_capture_diff_ts_col_latest_wins(spark):
    from scrape_spark.operators.recrawl import capture_diff

    old = spark.createDataFrame(
        [("u", 1, 10), ("u", 9, 20)], "url string, content_hash long, ts long"
    )
    new = spark.createDataFrame(
        [("u", 9, 30)], "url string, content_hash long, ts long"
    )
    # latest old capture has hash 9 == new -> unchanged (min-hash reduce
    # would wrongly say changed)
    r = capture_diff(old, new, ts_col="ts").collect()[0]
    assert (r.status, r.old_hash) == ("unchanged", 9)


# ---------------------------------------------------------------------------
# change_estimate: order-aware interval estimation
# ---------------------------------------------------------------------------


def test_change_estimate_counts_sequence_not_versions(spark):
    """A,B,A,B is 2 distinct versions but 3 observed changes."""
    from scrape_spark.operators.recrawl import change_estimate

    caps = _caps(
        spark,
        [("http://ab.test/", 1_000_000 + 10 * i, t)
         for i, t in enumerate(["A", "B", "A", "B"])],
    )
    row = change_estimate(caps, now=NOW).collect()[0]
    assert row["n_caps"] == 4 and row["n_changes"] == 3
    assert row["span"] == 30 and row["est_interval"] == 10
    assert row["next_due"] == 1_000_030 + 10
    assert row["overdue"] == NOW - row["next_due"]


def test_change_estimate_never_changed_waits_full_span(spark):
    from scrape_spark.operators.recrawl import change_estimate

    caps = _caps(
        spark,
        [("http://s.test/", 1_000_000 + 100 * i, "same") for i in range(3)],
    )
    row = change_estimate(caps, now=NOW).collect()[0]
    assert row["n_changes"] == 0
    assert row["est_interval"] == row["span"] == 200
    assert row["next_due"] == 1_000_200 + 200


def test_change_estimate_single_capture_due_immediately(spark):
    from scrape_spark.operators.recrawl import change_estimate

    caps = _caps(spark, [("http://one.test/", 1_500_000, "x")])
    row = change_estimate(caps, now=NOW).collect()[0]
    assert row["n_caps"] == 1 and row["span"] == 0
    assert row["est_interval"] == 1  # greatest(span, 1): unknown -> eager
    assert row["next_due"] == 1_500_001


def test_change_estimate_duplicate_ts_orders_by_hash(spark):
    """Two captures at the SAME instant: lag order falls back to the hash,
    so the change count is deterministic regardless of input order."""
    from scrape_spark.operators.recrawl import change_estimate

    rows = [
        ("http://d.test/", 1_000_000, "A"),
        ("http://d.test/", 1_000_000, "B"),
        ("http://d.test/", 1_000_010, "A"),
    ]
    a = change_estimate(_caps(spark, rows), now=NOW).collect()[0]
    b = change_estimate(_caps(spark, rows[::-1]), now=NOW).collect()[0]
    assert tuple(a) == tuple(b)
    assert a["n_changes"] == 2  # X -> Y at t0 (hash order), Y -> A at t1


def test_change_estimate_future_capture_overdue_clamps_to_zero(spark):
    from scrape_spark.operators.recrawl import change_estimate

    caps = _caps(
        spark,
        [("http://f.test/", NOW + 100, "a"), ("http://f.test/", NOW + 200, "b")],
    )
    row = change_estimate(caps, now=NOW).collect()[0]
    assert row["overdue"] == 0


def test_change_estimate_drops_null_timestamp_captures(spark):
    """NULL-ts captures are unorderable (and the engines disagree on NULL
    placement in window order) — both sides exclude them entirely."""
    import duckdb

    from scrape_spark.operators.recrawl import (
        change_estimate,
        change_estimate_sql,
    )

    rows = [
        ("http://n.test/", None, "A"),
        ("http://n.test/", 100, "A"),
        ("http://n.test/", 200, "B"),
    ]
    got = change_estimate(_caps(spark, rows), now=NOW).collect()[0]
    assert got["n_caps"] == 2 and got["n_changes"] == 1
    con = duckdb.connect()
    con.execute("CREATE TABLE c(url VARCHAR, warc_ts BIGINT, text VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO c VALUES (?, ?, ?)", list(r))
    duck = con.sql(
        change_estimate_sql("SELECT * FROM c", NOW)
    ).fetchall()[0]
    assert tuple(got) == duck


# ---------------------------------------------------------------------------
# Cho–Garcia-Molina Poisson estimator
# ---------------------------------------------------------------------------


def _py_cgm_lambda_q(n_obs: int, x: int) -> int:
    """Pure-Python mirror of the integer kernel (same table arithmetic)."""
    from scrape_spark.operators.recrawl import CGM_MAX_N, _cgm_ln_table

    t = _cgm_ln_table()
    n_c = min(n_obs, CGM_MAX_N)
    x_c = 0 if n_obs <= 0 else (x * n_c) // n_obs
    return t[2 * n_c + 1] - t[2 * (n_c - x_c) + 1]


def test_cgm_static_and_always_changing(spark):
    from scrape_spark.operators.recrawl import cgm_change_rate

    caps = _caps(
        spark,
        [("http://s.test/", 1_000_000 + 10 * i, "same") for i in range(5)]
        + [("http://c.test/", 1_000_000 + 10 * i, f"v{i}") for i in range(5)],
    )
    rows = {r["url"]: r for r in cgm_change_rate(caps, now=NOW).collect()}
    s, c = rows["http://s.test/"], rows["http://c.test/"]
    # never changed: lambda and priority exactly 0
    assert s["x_changes"] == 0 and s["cgm_lambda_q"] == 0 and s["priority"] == 0
    # changed every interval (X = n): lambda = T(2n+1) - T(1) = T(9), finite
    assert c["x_changes"] == 4
    assert c["cgm_lambda_q"] == _py_cgm_lambda_q(4, 4) > 0
    # expected misses = lambda * age / mean_interval, exact ints
    assert c["mean_interval"] == 10
    assert c["expected_misses_q"] == (c["cgm_lambda_q"] * c["age"]) // 10
    assert c["priority"] == c["expected_misses_q"]


def test_cgm_corrects_saturation_vs_naive(spark):
    """A page changing faster than the capture cadence: the naive
    changes/interval estimate saturates at 1; CGM's -ln((n-X+.5)/(n+.5))
    grows with X/n — partial observation is corrected upward."""
    half = _py_cgm_lambda_q(10, 5)
    nine = _py_cgm_lambda_q(10, 9)
    full = _py_cgm_lambda_q(10, 10)
    import math

    assert 0 < half < nine < full
    # X = n/2 → -ln((5.5)/(10.5)) ≈ 0.647 — above the naive 0.5
    assert abs(half / (1 << 24) - (-math.log(5.5 / 10.5))) < 1e-6
    # X = n → finite (the +0.5 regularizer), ≈ ln(21/1) = 3.04
    assert abs(full / (1 << 24) - math.log(21.0)) < 1e-6


def test_cgm_single_capture_and_long_history_rescale(spark):
    from scrape_spark.operators.recrawl import CGM_MAX_N, cgm_change_rate

    caps = _caps(
        spark,
        [("http://one.test/", 1_500_000, "x")]
        + [
            ("http://long.test/", 1_000_000 + i, f"v{i % 2 and i or 0}")
            for i in range(300)
        ],
    )
    rows = {r["url"]: r for r in cgm_change_rate(caps, now=NOW).collect()}
    one = rows["http://one.test/"]
    assert one["n_obs"] == 0 and one["cgm_lambda_q"] == 0 and one["priority"] == 0
    lng = rows["http://long.test/"]
    assert lng["n_obs"] == 299 > CGM_MAX_N
    assert lng["cgm_lambda_q"] == _py_cgm_lambda_q(299, lng["x_changes"])


def test_cgm_duckdb_parity(spark):
    import duckdb

    from scrape_spark.operators.recrawl import (
        cgm_change_rate,
        cgm_change_rate_sql,
    )

    rows = []
    for u in range(24):
        for i in range(u % 7 + 1):
            rows.append(
                (
                    f"http://h{u % 5}.test/p{u}",
                    1_000_000 + 13 * i + u,
                    f"content {u} rev {(i * (u % 3)) % 4}",
                )
            )
    caps = _caps(spark, rows)
    got = sorted(tuple(r) for r in cgm_change_rate(caps, now=NOW).collect())
    vals = ", ".join(f"('{u}', {t}, '{x}')" for u, t, x in rows)
    sql = cgm_change_rate_sql(
        f"SELECT * FROM (VALUES {vals}) t(url, warc_ts, text)", NOW
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_cgm_estimator_converges_on_synthetic_poisson(spark):
    """Property: on capture histories sampled from a true Poisson change
    process, the estimated rate converges to the true rate (the naive
    X/(n·I) estimator does NOT at high rates — that is the point of CGM).
    Pure-Python over the same integer kernel; no Spark needed."""
    import math
    import random

    from scrape_spark.operators.recrawl import CGM_MAX_N

    rng = random.Random(20260821)
    interval = 10.0
    for lam_i in (0.25, 0.8, 2.0):  # true changes per capture interval
        p_change = 1.0 - math.exp(-lam_i)
        n = CGM_MAX_N
        ests = []
        for _ in range(60):
            x = sum(1 for _ in range(n) if rng.random() < p_change)
            lam_q = _py_cgm_lambda_q(n, x)
            ests.append(lam_q / (1 << 24) / interval)  # per-second rate
        mean_est = sum(ests) / len(ests)
        true_rate = lam_i / interval
        if lam_i <= 1.0:
            assert abs(mean_est - true_rate) <= 0.15 * true_rate, (
                lam_i,
                mean_est,
            )
        else:
            # X/n saturates near 1: naive estimate would floor at ~0.086/s
            # equivalent; CGM must exceed it substantially and be within
            # ~35% of truth (binomial + clamp noise at n=128)
            naive_cap = 1.0 / interval
            assert mean_est > naive_cap * 1.5
            assert abs(mean_est - true_rate) <= 0.35 * true_rate
