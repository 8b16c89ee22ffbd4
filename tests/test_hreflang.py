"""hreflang alternate mining: links, bitext pairs, edition clusters."""

import duckdb

from scrape_spark.functions.hreflang import (
    hreflang_clusters,
    hreflang_doc_pairs,
    hreflang_doc_pairs_sql,
    hreflang_links,
    hreflang_links_sql,
)

_EN = (
    '<html><head><link rel="alternate" hreflang="EN" href="/en">'
    '<link rel="alternate" hreflang="fr" href="http://s.test/fr">'
    '<link hreflang="de" href="/de" rel="alternate">'
    '<link rel="alternate" hreflang="x-default" href="/">'
    '<link rel="stylesheet" href="/css">'
    '<link rel="alternate" type="application/rss+xml" href="/feed">'
    "</head></html>"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html_str string")


def test_links_attribute_orders_case_and_rel_filtering(spark):
    df = _pages(spark, [("http://s.test/en", _EN)])
    got = {
        (r["link_pos"], r["hreflang"], r["href"])
        for r in hreflang_links(df).collect()
    }
    # stylesheet and feed links dropped (feed has no hreflang); hreflang
    # lowercased; relative hrefs resolved against the page; both attribute
    # orders (tag 3 puts rel last) survive
    assert got == {
        (1, "en", "http://s.test/en"),
        (2, "fr", "http://s.test/fr"),
        (3, "de", "http://s.test/de"),
        (4, "x-default", "http://s.test/"),
    }


def test_pairs_exclude_x_default_and_same_lang(spark):
    df = _pages(spark, [("http://s.test/en", _EN)])
    got = {
        (r["lang_a"], r["href_a"], r["lang_b"], r["href_b"])
        for r in hreflang_doc_pairs(df).collect()
    }
    assert got == {
        ("en", "http://s.test/en", "fr", "http://s.test/fr"),
        ("en", "http://s.test/en", "de", "http://s.test/de"),
        ("fr", "http://s.test/fr", "de", "http://s.test/de"),
    }


def test_duckdb_parity_links_and_pairs(spark):
    rows = [
        ("http://a.test/en", _EN.replace("s.test", "a.test")),
        ("http://a.test/fr", '<link rel="alternate" hreflang="en" href="/en">'),
        ("http://b.test/x", "<html><head>no links</head></html>"),
    ]
    df = _pages(spark, rows)
    vals = ", ".join(
        "('" + u + "', '" + h.replace("'", "''") + "')" for u, h in rows
    )
    src = f"SELECT * FROM (VALUES {vals}) AS t(url, html_str)"
    con = duckdb.connect()
    got = sorted(tuple(r) for r in hreflang_links(df).collect())
    assert got == sorted(con.execute(hreflang_links_sql(src)).fetchall())
    gotp = sorted(tuple(r) for r in hreflang_doc_pairs(df).collect())
    assert gotp == sorted(con.execute(hreflang_doc_pairs_sql(src)).fetchall())


_QUOTES = (
    "<html><head><link rel='alternate' hreflang='fr' href='/fr'>"
    '<link rel=alternate hreflang=de href=/de>'
    '<link rel="alternate nofollow" hreflang=\'PT-br\' href="/pt">'
    "<link rel=stylesheet href='/css'>"
    "</head></html>"
)


def test_links_single_quoted_and_unquoted_attributes(spark):
    """ADVICE r3: href='/fr' and rel=alternate declarations must not be
    silently dropped — all three HTML attribute quote styles count."""
    df = _pages(spark, [("http://q.test/en", _QUOTES)])
    got = {
        (r["link_pos"], r["hreflang"], r["href"])
        for r in hreflang_links(df).collect()
    }
    assert got == {
        (1, "fr", "http://q.test/fr"),
        (2, "de", "http://q.test/de"),
        (3, "pt-br", "http://q.test/pt"),
    }


def test_duckdb_parity_quote_styles(spark):
    rows = [("http://q.test/en", _QUOTES)]
    df = _pages(spark, rows)
    vals = ", ".join(
        "('" + u + "', '" + h.replace("'", "''") + "')" for u, h in rows
    )
    src = f"SELECT * FROM (VALUES {vals}) AS t(url, html_str)"
    con = duckdb.connect()
    got = sorted(tuple(r) for r in hreflang_links(df).collect())
    assert got == sorted(con.execute(hreflang_links_sql(src)).fetchall())


def test_clusters_merge_editions_via_any_annotator(spark):
    # only the en edition annotates; fr/de carry no tags — still one cluster
    rows = [
        ("http://s.test/en", _EN),
        ("http://s.test/fr", "<html></html>"),
        ("http://s.test/de", "<html></html>"),
        ("http://other.test/p", "<html></html>"),  # no edges: not in output
    ]
    got = {
        r["member"]: r["cluster_id"]
        for r in hreflang_clusters(_pages(spark, rows)).collect()
    }
    members = {
        "http://s.test/",
        "http://s.test/en",
        "http://s.test/fr",
        "http://s.test/de",
    }
    assert set(got) == members
    assert set(got.values()) == {"http://s.test/"}


def test_pair_join_prunes_html_before_exchange(spark):
    """The self-join must exchange only (url, pos, lang, href) slivers."""
    import contextlib
    import io

    pages = spark.range(0, 200).selectExpr(
        "concat('http://s', CAST(id AS STRING), '.test/en') AS url",
        "concat(repeat('x', 500), "
        '\'<link rel="alternate" hreflang="en" href="/en">\') AS html_str',
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hreflang_doc_pairs(pages).explain("formatted")
    plan = buf.getvalue()
    for section in plan.split("\n\n"):
        if section.lstrip().startswith("(") and "Exchange" in section.splitlines()[0]:
            assert "html_str#" not in section, section


def test_attr_substring_in_values_does_not_match(spark):
    """ADVICE r4: an unanchored ``attr=`` pattern matched substrings inside
    another attribute's quoted value — a ``?rel=alternate`` query param set
    is_alt, a ``?hreflang=de`` param injected a bogus hreflang. Patterns
    now require the preceding space of a real attribute boundary."""
    html = (
        '<html><head>'
        # rel=alternate ONLY inside the href value -> NOT an alternate link
        '<link href="/p?rel=alternate&hreflang=de">'
        # real alternate with a decoy param in href; hreflang attr is real
        '<link rel="alternate" hreflang="fr" href="/fr?hreflang=zz">'
        "</head></html>"
    )
    df = _pages(spark, [("http://b.test/en", html)])
    got = {
        (r["hreflang"], r["href"]) for r in hreflang_links(df).collect()
    }
    assert got == {("fr", "http://b.test/fr?hreflang=zz")}
    import duckdb

    con = duckdb.connect()
    src = (
        "SELECT 'http://b.test/en' AS url, '"
        + html.replace("'", "''")
        + "' AS html_str"
    )
    parity = sorted(
        tuple(r) for r in con.execute(hreflang_links_sql(src)).fetchall()
    )
    assert parity == sorted(
        tuple(r) for r in hreflang_links(df).collect()
    )


def test_tab_and_newline_indented_attributes_extract(spark):
    """review r5: the space-only boundary anchor dropped attributes
    preceded by tab/LF (pretty-printed heads) and quote-adjacent
    attributes — all legal separators the extractor must accept."""
    html = (
        "<html><head><link rel=\"alternate\"\n\threflang=\"de\""
        ' href="/de"><link rel="alternate"hreflang="fr" href="/fr">'
        "</head></html>"
    )
    df = _pages(spark, [("http://t.test/en", html)])
    got = {(r["hreflang"], r["href"]) for r in hreflang_links(df).collect()}
    assert got == {
        ("de", "http://t.test/de"),
        ("fr", "http://t.test/fr"),
    }
    import duckdb

    con = duckdb.connect()
    src = (
        "SELECT 'http://t.test/en' AS url, '"
        + html.replace("'", "''")
        + "' AS html_str"
    )
    parity = sorted(
        tuple(r) for r in con.execute(hreflang_links_sql(src)).fetchall()
    )
    assert parity == sorted(
        tuple(r) for r in hreflang_links(df).collect()
    )
