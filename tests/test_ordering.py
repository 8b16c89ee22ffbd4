"""Deterministic sequence assignment + first-discovery dedup."""

from pyspark.sql import functions as F

from scrape_spark.operators.ordering import assign_global_seq, first_discovery


def test_assign_global_seq_matches_global_sort(spark):
    data = [(i % 7, (i * 13) % 11, f"u{i}") for i in range(500)]
    df = spark.createDataFrame(data, "depth int, link_pos int, url string")
    out = assign_global_seq(df, ["depth", "link_pos", "url"], start=100)
    rows = out.orderBy("seq").collect()
    assert [r["seq"] for r in rows] == list(range(100, 600))
    expected = sorted(data)
    got = [(r["depth"], r["link_pos"], r["url"]) for r in rows]
    assert got == expected


def test_assign_global_seq_empty(spark):
    df = spark.createDataFrame([], "depth int, url string")
    assert assign_global_seq(df, ["depth", "url"]).count() == 0


def test_assign_global_seq_dense_across_partitions(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k").repartition(13)
    out = assign_global_seq(df, ["k"])
    seqs = sorted(r["seq"] for r in out.collect())
    assert seqs == list(range(1000))


def test_assign_global_seq_small_path_same_result(spark):
    """The size-adaptive window path must agree with the range path exactly,
    including when the estimate undershoots the true row count."""
    data = [((i * 7) % 17, (i * 13) % 11, f"u{i}") for i in range(400)]
    df = spark.createDataFrame(data, "depth int, link_pos int, url string")
    cols = ["depth", "link_pos", "url"]
    big = assign_global_seq(df, cols, start=50)
    small = assign_global_seq(df, cols, start=50, n_rows_est=10, small_limit=1000)
    assert [tuple(r) for r in big.orderBy("seq").collect()] == [
        tuple(r) for r in small.orderBy("seq").collect()
    ]
    # small path is the plain window plan — no range partitioning, no
    # offsets join machinery
    plan = small._sc._jvm.PythonSQLUtils.explainString(
        small._jdf.queryExecution(), "formatted"
    ).lower()
    assert "rangepartitioning" not in plan
    assert "join" not in plan


def test_first_discovery_min_by(spark):
    rows = [
        ("u1", 5, 0, "refA"),
        ("u1", 2, 3, "refB"),  # smaller parent_seq wins
        ("u1", 2, 1, "refC"),  # same parent_seq, smaller link_pos wins
        ("u2", 9, 9, "refD"),
    ]
    df = spark.createDataFrame(rows, "url string, parent_seq long, link_pos int, referrer string")
    out = first_discovery(df, "url", ["parent_seq", "link_pos"], ["referrer"])
    got = {r["url"]: (r["parent_seq"], r["link_pos"], r["referrer"]) for r in out.collect()}
    assert got == {"u1": (2, 1, "refC"), "u2": (9, 9, "refD")}
