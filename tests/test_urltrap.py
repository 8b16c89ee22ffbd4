"""Crawl-trap kernels: golden signals, Spark/DuckDB parity, map-only plan."""

import duckdb
from pyspark.sql import functions as F

from scrape_spark.functions.urltrap import (
    trap_signal_cols,
    trap_signals_duck_sql,
)

_GOLDEN = [
    "http://h.test/a/b/a/b/a/b",  # loop trap: 'a' repeats 3x, 'b' 3x
    "http://h.test/" + "/".join(f"s{i}" for i in range(15)),  # deep
    "http://h.test/p?" + "&".join(f"k{i}={i}" for i in range(10)),  # params
    "http://h.test/p/" + "x" * 600,  # oversized
    "http://h.test/docs/getting-started",  # clean
    "http://h.test",  # no path at all
    "http://h.test/",  # root with trailing slash
    "http://h.test/p?",  # dangling '?': empty query
    "http://h.test/a?x=1",  # single param
]


def _spark_rows(spark):
    df = spark.createDataFrame([(u,) for u in _GOLDEN], "url string")
    return {
        r["url"]: r for r in df.select("url", *trap_signal_cols()).collect()
    }


def test_golden_signals(spark):
    got = _spark_rows(spark)
    loop = got[_GOLDEN[0]]
    assert loop["max_seg_rep"] == 3 and loop["depth"] == 6
    deep = got[_GOLDEN[1]]
    assert deep["depth"] == 15 and deep["is_trap"]
    params = got[_GOLDEN[2]]
    assert params["n_params"] == 10 and params["is_trap"]
    assert got[_GOLDEN[3]]["is_trap"]  # oversized
    clean = got[_GOLDEN[4]]
    assert not clean["is_trap"] and clean["depth"] == 2
    assert clean["max_seg_rep"] == 1 and clean["n_params"] == 0
    assert got[_GOLDEN[5]]["depth"] == 0 and not got[_GOLDEN[5]]["is_trap"]
    assert got[_GOLDEN[6]]["depth"] == 0
    assert got[_GOLDEN[7]]["n_params"] == 0
    assert got[_GOLDEN[8]]["n_params"] == 1 and not got[_GOLDEN[8]]["is_trap"]


def test_spark_duckdb_parity_on_goldens(spark):
    got = _spark_rows(spark)
    sig = trap_signals_duck_sql("url")
    cols = ", ".join(f"{e} AS {n}" for n, e in sig.items())
    vals = ", ".join("(?)" for _ in _GOLDEN)
    duck = duckdb.connect().execute(
        f"SELECT url, {cols} FROM (VALUES {vals}) t(url)", _GOLDEN
    ).fetchall()
    names = ["url"] + list(sig)
    for row in duck:
        d = dict(zip(names, row))
        s = got[d["url"]]
        for n in sig:
            assert s[n] == d[n], (d["url"], n, s[n], d[n])


def test_trap_plan_is_map_only(spark):
    df = spark.createDataFrame([(u,) for u in _GOLDEN], "url string")
    plan = (
        df.select("url", *trap_signal_cols())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM expression, no UDF


# ---------------------------------------------------------------------------
# URL extension routing
# ---------------------------------------------------------------------------
_EXT_GOLDENS = [
    ("http://h.test/a/b.html", "html", "page", True),
    ("http://h.test/a/pic.JPG?x=1", "jpg", "image", False),
    ("http://h.test/a/b", "", "page", True),
    ("http://h.test/", "", "page", True),
    ("http://h.test/d/.hidden", "", "page", True),
    ("http://h.test/x/archive.tar.gz", "gz", "archive", False),
    ("http://h.test/app.min.js", "js", "asset", False),
    ("http://h.test/v1.2.3-release", "", "page", True),  # >5-char tail
    ("http://h.test/movie.mp4", "mp4", "media", False),
    ("http://h.test/spec.pdf", "pdf", "doc", True),
    ("http://h.test/file.weird", "weird", "other", False),
]


def test_url_ext_and_class_both_engines(spark):
    import duckdb

    from scrape_spark.functions.textstats import DUCK_DIALECT, SPARK_DIALECT
    from scrape_spark.functions.urltrap import (
        crawlable_expr,
        url_class_sql,
        url_ext_sql,
    )

    df = spark.createDataFrame(
        [(u,) for u, *_ in _EXT_GOLDENS], "url string"
    )
    got = {
        r["url"]: (r["ext"], r["cls"], r["crawlable"])
        for r in df.select(
            "url",
            F.expr(url_ext_sql("url", SPARK_DIALECT)).alias("ext"),
            F.expr(url_class_sql("url", SPARK_DIALECT)).alias("cls"),
            crawlable_expr("url").alias("crawlable"),
        ).collect()
    }
    con = duckdb.connect()
    for u, ext, cls, crawlable in _EXT_GOLDENS:
        assert got[u] == (ext, cls, crawlable), u
        de, dc = con.execute(
            "SELECT "
            + url_ext_sql("'" + u + "'", DUCK_DIALECT)
            + ", "
            + url_class_sql("'" + u + "'", DUCK_DIALECT)
        ).fetchone()
        assert (de, dc) == (ext, cls), u


# -- URL language hints -----------------------------------------------------------


def test_url_lang_hint_precedence_and_whitelist(spark):
    from scrape_spark.functions.urltrap import url_lang_hint

    cases = [
        (1, "http://site.test/en/page", "en"),
        (2, "http://en.site.test/page", "en"),
        (3, "http://site.test/page?hl=de", "de"),
        (4, "http://site.test/v2/page", None),  # non-code segment
        (5, "http://js.site.test/", None),  # non-code subdomain
        (6, "http://site.test/EN/page", "en"),  # case-folded
        (7, "http://site.test/?lang=xx", None),  # unlisted code
        # precedence: path wins over conflicting query param
        (8, "http://site.test/fr/page?hl=de", "fr"),
        # subdomain wins over query param when no path hint
        (9, "http://ja.site.test/page?hl=de", "ja"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "i long, url string"
    )
    got = {
        r["i"]: r["h"]
        for r in df.select("i", url_lang_hint("url").alias("h")).collect()
    }
    assert got == {i: want for i, _, want in cases}
