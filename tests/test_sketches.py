"""Count-Min heavy hitters / salt plan + event sessionization."""

import datetime as dt

from pyspark.sql import functions as F

from scrape_spark.operators.events import sessionize, sessionize_sql
from scrape_spark.operators.sketches import (
    cms_heavy_hitters,
    cms_heavy_hitters_sql,
    salt_plan,
)


def _hosts(spark, counts: dict[str, int]):
    rows = [(h,) for h, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "host string")


def test_cms_never_undercounts_and_keeps_all_true_heavies(spark):
    counts = {"mega.test": 400, "big.test": 150}
    counts.update({f"h{i}.test": 5 for i in range(30)})
    df = _hosts(spark, counts)
    # width 8 with 32 keys forces collisions: estimates may exceed truth
    got = {
        r["host"]: r["est"]
        for r in cms_heavy_hitters(df, width=8, threshold_ppm=0).collect()
    }
    assert set(got) == set(counts)
    assert all(got[h] >= counts[h] for h in counts)  # one-sided error
    # 10% screen: both true heavies (400/700, 150/700) must survive
    heavy = {
        r["host"]
        for r in cms_heavy_hitters(df, threshold_ppm=100_000).collect()
    }
    assert {"mega.test", "big.test"} <= heavy
    # with the default width the small hosts' true shares are ~0.7%; the
    # sketch may inflate them past 10% only via collisions, which depth-4
    # min-takes make unlikely — assert the screen is not degenerate
    assert len(heavy) < len(counts)


def test_cms_exact_when_wide(spark):
    counts = {"a.test": 7, "b.test": 3, "c.test": 11}
    got = {
        r["host"]: r["est"]
        for r in cms_heavy_hitters(
            _hosts(spark, counts), width=4096, threshold_ppm=0
        ).collect()
    }
    assert got == counts  # no collisions at this width


def test_salt_plan_ceiling_and_clamps(spark):
    hh = spark.createDataFrame(
        [("a", 1), ("b", 100), ("c", 101), ("d", 100_000_000)],
        "host string, est long",
    )
    got = {
        r["host"]: r["n_salts"]
        for r in salt_plan(hh, target_per_salt=100, max_salts=64).collect()
    }
    assert got == {"a": 1, "b": 1, "c": 2, "d": 64}


def test_cms_salt_plan_matches_duckdb(spark):
    import duckdb

    counts = {"mega.test": 300}
    counts.update({f"h{i}.test": 4 for i in range(25)})
    df = _hosts(spark, counts)
    got = sorted(
        (r["host"], r["est"], r["n_salts"])
        for r in salt_plan(
            cms_heavy_hitters(df, width=64, threshold_ppm=50_000),
            target_per_salt=100,
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(host VARCHAR)")
    for h, n in counts.items():
        for _ in range(n):
            con.execute("INSERT INTO t VALUES (?)", [h])
    want = sorted(
        tuple(r)
        for r in con.execute(
            cms_heavy_hitters_sql(
                "SELECT host FROM t",
                width=64,
                threshold_ppm=50_000,
                target_per_salt=100,
            )
        ).fetchall()
    )
    assert got == want and len(got) >= 1


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")


def _t(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


def test_sessionize_gap_splits_and_exact_gap_does_not(spark):
    rows = [
        (1, 1, _t(0)),
        (1, 2, _t(30)),  # exactly the 30-min gap: same session
        (1, 3, _t(61)),  # 31-min gap: new session
        (2, 4, _t(0)),
    ]
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["span_us"])
        for r in sessionize(_ev(spark, rows)).collect()
    }
    assert got == {
        (1, 1): (2, 30 * 60 * 1_000_000),
        (1, 2): (1, 0),
        (2, 1): (1, 0),
    }


def test_sessionize_ties_break_by_event_id(spark):
    rows = [(1, 2, _t(0)), (1, 1, _t(0)), (1, 3, _t(90))]
    got = sessionize(_ev(spark, rows)).collect()
    by_idx = {r["session_idx"]: r["n_events"] for r in got}
    assert by_idx == {1: 2, 2: 1}


def test_sessionize_matches_duckdb(spark):
    import duckdb

    rows = [
        (u, u * 100 + i, _t(u + i * 17.5)) for u in range(3) for i in range(6)
    ]
    got = sorted(tuple(r) for r in sessionize(_ev(spark, rows)).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE events(user_id BIGINT, event_id BIGINT, ts TIMESTAMP)")
    for u, e, t in rows:
        con.execute("INSERT INTO events VALUES (?, ?, ?)", [u, e, t])
    want = sorted(
        tuple(r)
        for r in con.execute(
            sessionize_sql("SELECT user_id, event_id, ts FROM events")
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# KMV distinct sketch + HyperBall neighborhood counts
# ---------------------------------------------------------------------------

def _duck(sql):
    import duckdb

    return duckdb.connect().execute(sql).fetchall()


def test_kmv_exact_below_k(spark):
    from scrape_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("h1", f"u{i}") for i in range(40)] + [("h2", f"u{i}") for i in range(7)],
        "host string, url string",
    )
    got = {
        r["host"]: (r["n_mins"], r["est_distinct"])
        for r in kmv_distinct(df, k=64).collect()
    }
    assert got == {"h1": (40, 40), "h2": (7, 7)}  # sketch IS the set


def test_kmv_estimate_reasonable_and_duckdb_exact(spark):
    from scrape_spark.operators.sketches import kmv_distinct, kmv_distinct_sql

    df = spark.range(0, 3000).selectExpr(
        "concat('h', CAST(id % 3 AS STRING)) AS host",
        "concat('url-', CAST(id AS STRING)) AS url",
    )
    rows = kmv_distinct(df, k=64).collect()
    got = {r["host"]: (r["n_mins"], r["est_distinct"]) for r in rows}
    want = {
        h: (n, e)
        for h, n, e in _duck(
            kmv_distinct_sql(
                "SELECT 'h' || CAST(range % 3 AS VARCHAR) AS host, "
                "'url-' || CAST(range AS VARCHAR) AS url FROM range(0, 3000)",
                k=64,
            )
        )
    }
    assert got == want  # bit-exact across engines
    for n, est in got.values():  # true distinct 1000, RSE ~ 1/sqrt(62)
        assert n == 64 and 600 <= est <= 1700


def test_kmv_overlap_exact_when_not_full_and_parity(spark):
    from scrape_spark.operators.sketches import kmv_overlap, kmv_overlap_sql

    a = spark.range(0, 30).selectExpr("concat('u', CAST(id AS STRING)) AS url")
    b = spark.range(10, 40).selectExpr("concat('u', CAST(id AS STRING)) AS url")
    r = kmv_overlap(a, b, k=64).collect()[0]
    assert (r["est_a"], r["est_b"], r["est_union"], r["est_intersection"]) == (
        30, 30, 40, 20,
    )
    assert r["jaccard_ppm"] == 20 * 1_000_000 // 40
    # estimate regime, bit-exact vs DuckDB
    a2 = spark.range(0, 500).selectExpr("concat('u', CAST(id AS STRING)) AS url")
    b2 = spark.range(250, 750).selectExpr("concat('u', CAST(id AS STRING)) AS url")
    got = tuple(kmv_overlap(a2, b2, k=64).collect()[0])
    want = _duck(
        kmv_overlap_sql(
            "SELECT 'u' || CAST(range AS VARCHAR) AS url FROM range(0, 500)",
            "SELECT 'u' || CAST(range AS VARCHAR) AS url FROM range(250, 750)",
            k=64,
        )
    )[0]
    assert got == want
    # sanity: true (500, 500, 750, 250, 1/3)
    assert 300 <= got[0] <= 800 and 450 <= got[2] <= 1150


def _bfs_ball(edges, radius):
    adj = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    out = {}
    for v in nodes:
        ball = {v}
        frontier = {v}
        for _ in range(radius):
            frontier = {w for u in frontier for w in adj.get(u, ())} - ball
            ball |= frontier
        out[v] = len(ball)
    return out


def test_hyperball_exact_with_large_k(spark):
    """k ≥ every ball size → n_mins IS the exact BFS ball size."""
    from scrape_spark.operators.sketches import hyperball_counts

    edges = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
        (i, (i * 13 + 5) % 40) for i in range(40)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    for radius in (1, 2, 3):
        got = {
            r["node"]: r["n_mins"]
            for r in hyperball_counts(df, radius=radius, k=512).collect()
        }
        assert got == _bfs_ball(edges, radius)


def test_hyperball_matches_duckdb(spark):
    from scrape_spark.operators.sketches import (
        hyperball_counts,
        hyperball_counts_sql,
    )

    df = spark.range(0, 200).selectExpr(
        "id AS src", "CAST((id * 7 + 3) % 200 AS BIGINT) AS dst"
    )
    got = {
        r["node"]: (r["n_mins"], r["est_ball"])
        for r in hyperball_counts(df, radius=2, k=16).collect()
    }
    want = {
        n: (m, e)
        for n, m, e in _duck(
            hyperball_counts_sql(
                "SELECT range AS src, (range * 7 + 3) % 200 AS dst "
                "FROM range(0, 200)",
                radius=2,
                k=16,
            )
        )
    }
    assert got == want


def test_hyperball_monotone_in_radius(spark):
    """Ball estimates never shrink as radius grows (supersets)."""
    from scrape_spark.operators.sketches import hyperball_counts

    df = spark.range(0, 60).selectExpr(
        "id AS src", "CAST((id * 11 + 1) % 60 AS BIGINT) AS dst"
    )
    prev = None
    for radius in (1, 2, 3):
        cur = {
            r["node"]: r["n_mins"]
            for r in hyperball_counts(df, radius=radius, k=512).collect()
        }
        if prev is not None:
            assert all(cur[n] >= prev[n] for n in cur)
        prev = cur


def test_harmonic_centrality_exact_small_graphs(spark):
    from scrape_spark.operators.sketches import harmonic_centrality

    # star 0 -> 1..9: hub has no in-edges (harmonic 0); each leaf has the
    # hub at in-distance 1 (harmonic 10^6)
    star = spark.range(1, 10).selectExpr("CAST(0 AS BIGINT) AS src", "id AS dst")
    got = {
        r["node"]: r["harmonic_ppm"]
        for r in harmonic_centrality(star, radius=3, k=64).collect()
    }
    assert got[0] == 0
    assert all(got[v] == 1_000_000 for v in range(1, 10))
    # 10-cycle: every node sees one new in-neighbor per step:
    # 10^6 · (1 + 1/2 + 1/3) truncated per term
    cyc = spark.range(0, 10).selectExpr("id AS src", "CAST((id+1)%10 AS BIGINT) AS dst")
    got = {
        r["node"]: r["harmonic_ppm"]
        for r in harmonic_centrality(cyc, radius=3, k=64).collect()
    }
    assert set(got.values()) == {1_000_000 + 500_000 + 333_333}


def test_harmonic_matches_duckdb(spark):
    from scrape_spark.operators.sketches import (
        harmonic_centrality,
        harmonic_centrality_sql,
    )

    edges = spark.range(0, 80).selectExpr(
        "id AS src", "CAST((id * 13 + 5) % 80 AS BIGINT) AS dst"
    )
    got = {
        r["node"]: (r["est_ball"], r["harmonic_ppm"])
        for r in harmonic_centrality(edges, radius=2, k=16).collect()
    }
    want = {
        n: (e, h)
        for n, e, h in _duck(
            harmonic_centrality_sql(
                "SELECT range AS src, (range * 13 + 5) % 80 AS dst "
                "FROM range(0, 80)",
                radius=2,
                k=16,
            )
        )
    }
    assert got == want


def test_neighborhood_function_profile(spark):
    from scrape_spark.operators.sketches import (
        neighborhood_function,
        neighborhood_function_sql,
    )

    edges = spark.range(0, 10).selectExpr(
        "id AS src", "CAST((id + 1) % 10 AS BIGINT) AS dst"
    )
    rows = sorted(
        tuple(r) for r in neighborhood_function(edges, radius=3, k=64).collect()
    )
    # cycle: N(t) = 10·(t+1); first t with ≥90% of N(3)=40 is t=3
    assert rows == [
        (0, 10, 250_000, False),
        (1, 20, 500_000, False),
        (2, 30, 750_000, False),
        (3, 40, 1_000_000, True),
    ]
    assert rows == sorted(
        _duck(
            neighborhood_function_sql(
                "SELECT range AS src, (range+1)%10 AS dst FROM range(0,10)",
                radius=3,
                k=64,
            )
        )
    )
    # exactly one effective-diameter row, reach monotone
    assert sum(1 for r in rows if r[3]) == 1
    assert all(rows[i][1] <= rows[i + 1][1] for i in range(len(rows) - 1))


# -- plan audits: the new sketch ops keep their promised scale shapes --------

def _fmt_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_kmv_global_plan_is_take_ordered(spark):
    """The global k-min must compile to TakeOrderedAndProject (per-partition
    top-k, k-row merge) — never a global Sort of the distinct set."""
    from scrape_spark.operators.sketches import _kmv_global

    df = spark.range(0, 10_000).selectExpr(
        "concat('u', CAST(id AS STRING)) AS url"
    )
    plan = _fmt_plan(_kmv_global(df, "url", 64))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort node


def test_hyperball_moves_registers_not_text(spark):
    """HyperBall over edges derived from pages: no Exchange may carry the
    html/text column — only node ids and k-int64 registers shuffle."""
    from scrape_spark.operators.sketches import hyperball_counts

    pages = spark.range(0, 500).selectExpr(
        "id",
        "CAST((id * 7 + 3) % 500 AS BIGINT) AS dst",
        "repeat('x', 100) AS html",
    )
    out = hyperball_counts(pages.select("id", "dst", "html"), radius=2,
                           k=16, src_col="id", dst_col="dst")
    plan = _fmt_plan(out)
    for section in plan.split("\n\n"):
        if section.lstrip().startswith("(") and "Exchange" in section.splitlines()[0]:
            assert "html#" not in section, section


def test_frac_ppm_no_overflow_and_precision(spark):
    """n_reach·10^6 would overflow int64 past ~9.2e12 — the pre-scaled
    formula must stay exact-enough (≤2 ppm) and identical on DuckDB."""
    import duckdb

    from scrape_spark.functions import textstats as ts
    from scrape_spark.operators.sketches import _frac_ppm_sql

    cases = [
        (9_300_000_000_000, 9_300_000_000_000, 1_000_000),
        (4_650_000_000_000, 9_300_000_000_000, 500_000),
        (3_100_000_000_000_000, 9_300_000_000_000_000, 333_333),
        (1, 9_300_000_000_000, 0),
        (40, 40, 1_000_000),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in cases], "n_reach long, _nr long"
    )
    got = [
        r[0]
        for r in df.select(
            F.expr(_frac_ppm_sql(ts.SPARK_DIALECT)).alias("f")
        ).collect()
    ]
    for (a, b, want), g in zip(cases, got):
        assert abs(g - want) <= 2, (a, b, want, g)
    vals = " UNION ALL ".join(
        f"SELECT CAST({a} AS BIGINT) AS n_reach, CAST({b} AS BIGINT) AS _nr"
        for a, b, _ in cases
    )
    duck = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT {_frac_ppm_sql(ts.DUCK_DIALECT)} AS f FROM ({vals})"
        )
        .fetchall()
    ]
    assert got == duck


def test_kmv_estimator_matches_bigint_reference(spark):
    """The split-division estimator == Python's unbounded (k-1)·U//θ in
    the exact branch, and stays in int64 for huge θ."""
    import duckdb

    from scrape_spark.functions import textstats as ts

    k = 64
    u = ts.KMV_UNIVERSE
    thetas = [64, 1_000, 10**9, 10**12, 7 * 10**16, (1 << 62) // 63 - 1,
              (1 << 62) // 63 + 5, u - 1]
    vals = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS n, CAST({t} AS BIGINT) AS th"
        for t in thetas
    )
    expr = ts.kmv_estimate_sql("n", "th", k, ts.DUCK_DIALECT)
    got = [
        r[0]
        for r in duckdb.connect().execute(
            f"SELECT {expr} AS e FROM ({vals})"
        ).fetchall()
    ]
    for t, g in zip(thetas, got):
        want = (k - 1) * u // t
        if t < (1 << 62) // (k - 1):
            assert g == want, (t, g, want)  # exact branch is EXACT
        else:
            assert abs(g - want) <= max(2, want // 10**10), (t, g, want)
    # Spark side evaluates the identical values
    df = spark.createDataFrame(
        [(k, t) for t in thetas], "n long, th long"
    )
    sgot = [
        r[0]
        for r in df.select(
            F.expr(
                ts.kmv_estimate_sql("n", "th", k, ts.SPARK_DIALECT)
            ).alias("e")
        ).collect()
    ]
    assert sgot == got
