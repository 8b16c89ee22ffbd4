"""host_mirror_pairs — Bharat & Broder mirror-host detection semantics."""

from pyspark.sql import functions as F

from scrape_spark.operators.dedup import host_mirror_pairs


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def _got(df):
    return {
        (r["host_1"], r["host_2"]): r.asDict() for r in df.collect()
    }


def test_exact_mirror_found_with_jaccard_one(spark):
    rows = [("a.test", f"doc {i}") for i in range(4)]
    rows += [("b.test", f"doc {i}") for i in range(4)]
    rows += [("c.test", f"other {i}") for i in range(4)]
    got = _got(host_mirror_pairs(_pages(spark, rows)))
    assert set(got) == {("a.test", "b.test")}
    r = got[("a.test", "b.test")]
    assert (r["n_common"], r["n_1"], r["n_2"], r["jaccard"]) == (4, 4, 4, 1.0)


def test_partial_overlap_thresholded(spark):
    # a/b share 3 of 4 contents: jaccard 3/5 = 0.6 >= 0.5 -> kept
    # a/c share 1 of 4: jaccard 1/7 -> dropped
    rows = [("a.test", f"d{i}") for i in range(4)]
    rows += [("b.test", f"d{i}") for i in range(3)] + [("b.test", "bx")]
    rows += [("c.test", "d0")] + [("c.test", f"cx{i}") for i in range(3)]
    got = _got(host_mirror_pairs(_pages(spark, rows), min_jaccard=0.5))
    assert set(got) == {("a.test", "b.test")}
    assert got[("a.test", "b.test")]["jaccard"] == 0.6


def test_duplicate_pages_within_host_count_once(spark):
    # set semantics: the same body served on many URLs of one host is ONE
    # element of the host's content set
    rows = [("a.test", "same")] * 5 + [("b.test", "same")]
    got = _got(host_mirror_pairs(_pages(spark, rows)))
    r = got[("a.test", "b.test")]
    assert (r["n_common"], r["n_1"], r["n_2"], r["jaccard"]) == (1, 1, 1, 1.0)


def test_viral_content_never_pairs_hosts(spark):
    # a boilerplate body on every host must not connect otherwise-unrelated
    # hosts, and must not count toward set sizes
    hosts = [f"h{i}.test" for i in range(6)]
    rows = [(h, "viral boilerplate") for h in hosts]
    rows += [(h, f"unique {h}") for h in hosts]
    rows += [("h0.test", "shared"), ("h1.test", "shared")]
    got = _got(
        host_mirror_pairs(_pages(spark, rows), min_jaccard=0.4, max_content_hosts=3)
    )
    # only h0/h1 meet via 'shared': sets {unique, shared} -> jaccard 1/3
    assert set(got) == set()
    got2 = _got(
        host_mirror_pairs(_pages(spark, rows), min_jaccard=0.3, max_content_hosts=3)
    )
    assert set(got2) == {("h0.test", "h1.test")}
    r = got2[("h0.test", "h1.test")]
    assert (r["n_common"], r["n_1"], r["n_2"]) == (1, 2, 2)


def test_null_text_ignored(spark):
    df = spark.createDataFrame(
        [("a.test", None), ("b.test", None), ("a.test", "x"), ("b.test", "x")],
        "host string, text string",
    )
    got = _got(host_mirror_pairs(df))
    r = got[("a.test", "b.test")]
    assert (r["n_common"], r["n_1"], r["n_2"]) == (1, 1, 1)


def test_plan_shuffles_on_content_key_not_host_pairs(spark):
    import contextlib
    import io

    rows = [("a.test", f"d{i}") for i in range(4)]
    out = host_mirror_pairs(_pages(spark, rows))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
