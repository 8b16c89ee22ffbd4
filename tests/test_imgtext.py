"""Image-text pair mining semantics (src resolution, captions, gate)."""

from scrape_spark.functions.imgtext import image_text_pairs, image_text_pairs_sql

_PAGE = (
    "<html><body>"
    '<img src="/a.png" alt="A red fox jumping">'
    '<IMG SRC="rel/b.jpg" ALT="Close-up of a leaf">'
    '<img src="http://cdn.test/c.gif" alt="logo">'  # generic → dropped
    '<img src="//cdn.test/d.webp" alt="x">'  # too short → dropped
    '<img alt="no source here">'  # no src → dropped
    "<figure>"
    '<img src="/e.png" alt="short alt">'
    "<figcaption>A <b>mountain</b> lake at dawn</figcaption>"
    "</figure>"
    "</body></html>"
)


def _pages(spark, *rows):
    return spark.createDataFrame(
        [(f"http://h.test/dir/page{i}.html", h) for i, h in enumerate(rows)],
        "url string, html_str string",
    )


def test_pairs_resolution_and_gate(spark):
    rows = sorted(
        (r["img_pos"], r["img_src"], r["pair_text"])
        for r in image_text_pairs(_pages(spark, _PAGE)).collect()
    )
    assert rows == [
        (1, "http://h.test/a.png", "A red fox jumping"),
        (2, "http://h.test/dir/rel/b.jpg", "Close-up of a leaf"),
        (6, "http://h.test/e.png", "A mountain lake at dawn"),
    ]


def test_caption_beats_alt(spark):
    r = {
        row["img_pos"]: row
        for row in image_text_pairs(_pages(spark, _PAGE)).collect()
    }[6]
    assert r["alt"] == "short alt"
    assert r["caption"] == "A mountain lake at dawn"
    assert r["pair_text"] == r["caption"]


def test_duckdb_oracle_parity(spark):
    import duckdb

    pages = [
        _PAGE,
        "<html><body>no images at all</body></html>",
        '<figure><img src="f.png"><figcaption>Caption only</figcaption>'
        "</figure>",
    ]
    got = sorted(
        tuple(r) for r in image_text_pairs(_pages(spark, *pages)).collect()
    )
    pages_sql = " UNION ALL ".join(
        "SELECT 'http://h.test/dir/page{i}.html' AS url, '{h}' AS html_str"
        .format(i=i, h=h.replace("'", "''"))
        for i, h in enumerate(pages)
    )
    want = sorted(
        tuple(r) for r in duckdb.sql(image_text_pairs_sql(pages_sql)).fetchall()
    )
    assert got == want


def test_html_never_shuffled(spark):
    plan = (
        image_text_pairs(_pages(spark, _PAGE))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the join exchanges must not carry the html column
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "html_str" not in line


def test_og_image_pairs(spark):
    from scrape_spark.functions.imgtext import og_image_pairs

    pages = _pages(
        spark,
        '<meta property="og:image" content="/card.png">'
        '<meta property="og:title" content="A long headline">',
        '<meta property="og:image" content="http://c.test/i.png">'
        '<meta property="og:description" content="Rich card description">'
        '<meta property="og:title" content="T">',
        '<meta property="og:image" content="/x.png">',  # no text → dropped
    )
    rows = {r["url"]: r for r in og_image_pairs(pages).collect()}
    assert rows["http://h.test/dir/page0.html"]["img_src"] == "http://h.test/card.png"
    assert rows["http://h.test/dir/page0.html"]["pair_text"] == "A long headline"
    # description beats title
    assert rows["http://h.test/dir/page1.html"]["pair_text"] == "Rich card description"
    assert "http://h.test/dir/page2.html" not in rows


def test_og_image_pairs_duckdb_parity(spark):
    import duckdb

    from scrape_spark.functions.imgtext import og_image_pairs, og_image_pairs_sql

    htmls = [
        '<meta property="og:image" content="/a.png">'
        '<meta content="Cross-checked text" property="og:description">',
        "<html>nothing</html>",
    ]
    got = sorted(tuple(r) for r in og_image_pairs(_pages(spark, *htmls)).collect())
    pages_sql = " UNION ALL ".join(
        "SELECT 'http://h.test/dir/page{i}.html' AS url, '{h}' AS html_str"
        .format(i=i, h=h.replace("'", "''"))
        for i, h in enumerate(htmls)
    )
    want = sorted(tuple(r) for r in duckdb.sql(og_image_pairs_sql(pages_sql)).fetchall())
    assert got == want


def test_src_resolution_edge_cases(spark):
    from scrape_spark.functions.imgtext import image_text_pairs

    pages = spark.createDataFrame(
        [
            # slash-less page URL: relative src joins at the host root
            ("http://h.test", '<img src="rel.png" alt="A tiny red fox">'),
            # https page: protocol-relative src keeps https
            (
                "https://s.test/p/",
                '<img src="//cdn.test/i.png" alt="A blue whale photo">',
            ),
            # data URI placeholder: dropped entirely
            (
                "http://d.test/p/",
                '<img src="data:image/gif;base64,AAA" alt="A lazy loader">',
            ),
        ],
        "url string, html_str string",
    )
    rows = {r["url"]: r["img_src"] for r in image_text_pairs(pages).collect()}
    assert rows == {
        "http://h.test": "http://h.test/rel.png",
        "https://s.test/p/": "https://cdn.test/i.png",
    }
