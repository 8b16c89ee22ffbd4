"""OpenGraph / meta-description / JSON-LD metadata kernel semantics."""

from scrape_spark.functions.metadata import page_metadata, page_metadata_sql

_FULL = (
    "<html><head>"
    '<meta property="og:title" content="OG Title">'
    '<meta content="OG Desc" property="og:description">'  # reversed order
    '<meta property="og:image" content="http://a.test/i.png">'
    '<META PROPERTY="og:type" CONTENT="article">'  # case-insensitive
    '<meta name="description" content="Plain desc">'
    '<script type="application/ld+json">'
    '{"@type":"Article","headline":"Head","datePublished":"2025-02-03"}'
    "</script>"
    "</head><body></body></html>"
)

_BROKEN_JSON = (
    '<html><head><script type="application/ld+json">{not json at all'
    "</script></head></html>"
)

_BARE = "<html><head><title>t</title></head><body></body></html>"


def _pages(spark, *rows):
    return spark.createDataFrame(
        [(f"http://p{i}.test/", h) for i, h in enumerate(rows)],
        "url string, html_str string",
    )


def test_full_extraction(spark):
    r = page_metadata(_pages(spark, _FULL)).first()
    assert (
        r["og_title"], r["og_description"], r["og_image"], r["og_type"]
    ) == ("OG Title", "OG Desc", "http://a.test/i.png", "article")
    assert r["meta_description"] == "Plain desc"
    assert r["jsonld_type"] == "Article"
    assert r["jsonld_headline"] == "Head"
    assert r["jsonld_date_published"] == "2025-02-03"


def test_absent_and_broken_json_yield_null(spark):
    rows = {
        r["url"]: r
        for r in page_metadata(_pages(spark, _BARE, _BROKEN_JSON)).collect()
    }
    bare = rows["http://p0.test/"]
    assert all(
        bare[c] is None
        for c in (
            "og_title", "og_description", "og_image", "og_type",
            "meta_description", "jsonld_raw", "jsonld_type",
        )
    )
    broken = rows["http://p1.test/"]
    assert broken["jsonld_raw"] == "{not json at all"
    assert broken["jsonld_type"] is None  # invalid JSON degrades to NULL


def test_duckdb_oracle_parity(spark):
    import duckdb

    htmls = [_FULL, _BROKEN_JSON, _BARE]
    got = sorted(tuple(r) for r in page_metadata(_pages(spark, *htmls)).collect())
    pages_sql = " UNION ALL ".join(
        "SELECT 'http://p{i}.test/' AS url, '{h}' AS html_str".format(
            i=i, h=h.replace("'", "''")
        )
        for i, h in enumerate(htmls)
    )
    want = sorted(
        tuple(r) for r in duckdb.sql(page_metadata_sql(pages_sql)).fetchall()
    )
    assert got == want


def test_metadata_is_pure_jvm(spark):
    plan = (
        page_metadata(_pages(spark, _FULL))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_single_quoted_attrs_are_out_of_scope_but_safe(spark):
    # single-quoted attribute values are documented out of scope for the
    # dialect-shared kernels (canonical.py discipline) — they must yield
    # NULL, never crash or mis-extract
    html = "<meta property='og:title' content='T'>"
    r = page_metadata(_pages(spark, html)).first()
    assert r["og_title"] is None


def test_og_title_first_declaration_wins(spark):
    html = (
        '<meta property="og:title" content="First">'
        '<meta property="og:title" content="Second">'
    )
    r = page_metadata(_pages(spark, html)).first()
    assert r["og_title"] == "First"


def test_jsonld_array_type_is_raw_null_field(spark):
    # @graph-style block: top-level is a JSON array — field extraction
    # degrades to NULL, raw block is preserved for a downstream parser
    html = (
        '<script type="application/ld+json">'
        '[{"@type":"Article"},{"@type":"Person"}]</script>'
    )
    r = page_metadata(_pages(spark, html)).first()
    assert r["jsonld_raw"].startswith("[")
    assert r["jsonld_type"] is None
