"""SQL-function surface: registration, Catalyst purity, kernel parity."""

from pyspark.sql import functions as F

from scrape_spark.functions.urls import normalize_url_expr, url_host, url_path
from scrape_spark.sqlfuncs import _FUNCS, register

_URLS = [
    "http://ex.test/a/b;params?q=1#f",
    "https://WWW.Ex.test/",
    "http://ex.test",
    "http://ex.test/semi;colon/deep/x;y?z",
    "not a url",
    "ftp://files.test/pub/file.txt",
]


def test_register_all_and_idempotent(spark):
    names = register(spark)
    assert len(names) == len(_FUNCS) and len(set(names)) == len(names)
    assert register(spark) == names  # CREATE OR REPLACE re-runs clean


def test_url_helpers_match_column_builders(spark):
    register(spark)
    df = spark.createDataFrame([(u,) for u in _URLS], "u string").select(
        "u",
        F.expr("ss_host(u)").alias("h_sql"),
        url_host("u").alias("h_col"),
        F.expr("ss_path(u)").alias("p_sql"),
        url_path("u").alias("p_col"),
        F.expr("ss_normalize_url(u)").alias("n_sql"),
        normalize_url_expr("u").alias("n_col"),
    )
    for r in df.collect():
        assert r["h_sql"] == r["h_col"], r
        assert r["p_sql"] == r["p_col"], r
        assert r["n_sql"] == r["n_col"], r


def test_sql_surface_matches_expr_kernels(spark):
    """Calling through the SQL function == splicing the kernel directly."""
    from scrape_spark.functions import textstats as ts

    register(spark)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "le chat est sur la table et il dort",
        "",
        "aaaa aaaa aaaa aaaa",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(
        F.expr("ss_token_count(t)").alias("a"),
        F.expr(ts.token_count_sql("t", ts.SPARK_DIALECT)).alias("b"),
        F.expr("ss_simhash(t)").alias("c"),
        F.expr(ts.simhash_sql("t", ts.SPARK_DIALECT)).alias("d"),
        F.expr("ss_lang_id(t)").alias("e"),
        F.expr(ts.lang_pred_sql("t")).alias("f"),
    ).collect()
    for r in got:
        assert r["a"] == r["b"] and r["c"] == r["d"] and r["e"] == r["f"]


def test_sql_surface_is_pure_catalyst(spark):
    """No Python-worker node may appear — SQL functions inline into the plan."""
    import contextlib
    import io

    register(spark)
    df = spark.range(0, 10).selectExpr(
        "ss_fingerprint(CAST(id AS STRING)) AS fp",
        "ss_lang_id(CAST(id AS STRING)) AS lang",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
