"""Robots meta directives + rel=nofollow edge policy semantics."""

from scrape_spark.functions.robotsmeta import (
    apply_link_policy,
    nofollow_edges,
    nofollow_edges_sql,
    robots_meta_flags,
    robots_meta_flags_sql,
)

_PAGES = [
    ("http://a.test/", '<meta name="robots" content="noindex, nofollow">'),
    ("http://b.test/", '<meta name="robots" content="NONE">'),
    ("http://c.test/", '<meta name="robots" content="noarchive">'),
    ("http://d.test/", "<html>no meta at all</html>"),
    (
        "http://e.test/",
        '<a href="http://x.test/1" rel="nofollow">x</a>'
        '<a rel="external NOFOLLOW" href="http://x.test/2">y</a>'
        '<a href="http://x.test/3" rel="sponsored">z</a>'
        '<a href="http://x.test/4">plain</a>',
    ),
]


def _pages(spark):
    return spark.createDataFrame(_PAGES, "url string, html_str string")


def test_meta_flags(spark):
    rows = {r["url"]: r for r in robots_meta_flags(_pages(spark)).collect()}
    assert (rows["http://a.test/"]["noindex"], rows["http://a.test/"]["nofollow"]) == (True, True)
    # 'none' implies both
    assert (rows["http://b.test/"]["noindex"], rows["http://b.test/"]["nofollow"]) == (True, True)
    # unrelated directive and absent tag are unrestricted
    assert (rows["http://c.test/"]["noindex"], rows["http://c.test/"]["nofollow"]) == (False, False)
    assert (rows["http://d.test/"]["noindex"], rows["http://d.test/"]["nofollow"]) == (False, False)


def test_nofollow_edges(spark):
    rows = sorted(
        (r["url"], r["href"]) for r in nofollow_edges(_pages(spark)).collect()
    )
    assert rows == [
        ("http://e.test/", "http://x.test/1"),
        ("http://e.test/", "http://x.test/2"),
    ]


def test_apply_link_policy(spark):
    edges = spark.createDataFrame(
        [
            ("http://a.test/", "http://y.test/"),  # meta-nofollow src → dropped
            ("http://e.test/", "http://x.test/1"),  # anchor nofollow → dropped
            ("http://e.test/", "http://x.test/3"),  # sponsored ≠ nofollow → kept
            ("http://d.test/", "http://y.test/"),  # clean → kept
        ],
        "src string, dst string",
    )
    kept = sorted(
        (r["src"], r["dst"])
        for r in apply_link_policy(edges, _pages(spark)).collect()
    )
    assert kept == [
        ("http://d.test/", "http://y.test/"),
        ("http://e.test/", "http://x.test/3"),
    ]


def test_duckdb_parity(spark):
    import duckdb

    pages_sql = " UNION ALL ".join(
        "SELECT '{u}' AS url, '{h}' AS html_str".format(
            u=u, h=h.replace("'", "''")
        )
        for u, h in _PAGES
    )
    got_meta = sorted(tuple(r) for r in robots_meta_flags(_pages(spark)).collect())
    want_meta = sorted(
        tuple(r) for r in duckdb.sql(robots_meta_flags_sql(pages_sql)).fetchall()
    )
    assert got_meta == want_meta
    got_nf = sorted(tuple(r) for r in nofollow_edges(_pages(spark)).collect())
    want_nf = sorted(
        tuple(r) for r in duckdb.sql(nofollow_edges_sql(pages_sql)).fetchall()
    )
    assert got_nf == want_nf


def test_multiple_robots_metas_combine(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://m.test/",
                '<meta name="robots" content="noarchive">'
                '<meta name="robots" content="nofollow">',
            )
        ],
        "url string, html_str string",
    )
    r = robots_meta_flags(pages).first()
    assert (r["noindex"], r["nofollow"]) == (False, True)


def test_multiline_anchor_matched(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://m.test/",
                '<a\nhref="http://x.test/1" rel="nofollow">x</a>',
            )
        ],
        "url string, html_str string",
    )
    rows = nofollow_edges(pages).collect()
    assert [(r["url"], r["href"]) for r in rows] == [
        ("http://m.test/", "http://x.test/1")
    ]


def test_policy_resolves_relative_hrefs(spark):
    pages = spark.createDataFrame(
        [("http://s.test/a", '<a href="/spam" rel="nofollow">x</a>')],
        "url string, html_str string",
    )
    edges = spark.createDataFrame(
        [("http://s.test/a", "http://s.test/spam"),
         ("http://s.test/a", "http://s.test/ok")],
        "src string, dst string",
    )
    kept = [r["dst"] for r in apply_link_policy(edges, pages).collect()]
    assert kept == ["http://s.test/ok"]
