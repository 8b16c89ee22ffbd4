"""Golden-fixture parity tests for the pure HTML/URL kernels.

Expected values are lifted verbatim from the reference's own unit tests
(FIXTURES.md §5): tests/test_link_extractor.py, test_is_under_base.py,
test_extract_links_img_alt_title.py, test_extract_links_img_title.py,
test_scraper.py:280-286.
"""

import hashlib

import pytest

from scrape_spark.functions.htmlparse import (
    extract_links,
    extract_text,
    extract_title,
    is_under_base,
    normalize_url,
    parse_page,
)


# --- extract_links (reference tests/test_link_extractor.py) -----------------


def test_links_basic():
    html = (
        '<html><body><a href="http://example.com/page1">Page 1</a>'
        '<a href="/page2">Page 2</a></body></html>'
    )
    links = extract_links(html, "http://example.com")
    assert links == [
        ("http://example.com/page1", "Page 1"),
        ("http://example.com/page2", "Page 2"),
    ]


def test_links_img_alt():
    html = '<a href="http://example.com/image"><img src="img.jpg" alt="Alt Text"/></a>'
    links = extract_links(html, "http://example.com")
    assert links == [("http://example.com/image", "Alt Text")]


def test_links_no_href():
    assert extract_links("<a>Broken Link</a>", "http://example.com") == []


def test_links_relative_vs_external():
    html = (
        '<a href="page1.html">Relative</a>'
        '<a href="http://other.com/page2">Absolute</a>'
    )
    links = extract_links(html, "http://example.com")
    assert links == [("http://example.com/page1.html", "Relative")]


def test_links_alt_and_title_concat_order():
    # reference tests/test_extract_links_img_alt_title.py:6-77
    html = """
    <html>
      <body>
        <a href="/page1">
          LinkText
          <img src="image.jpg" alt="AltText" title="TitleText">
        </a>
      </body>
    </html>
    """
    links = extract_links(html, "http://example.com")
    assert len(links) == 1
    url, text = links[0]
    assert url == "http://example.com/page1"
    assert text == "LinkText AltText TitleText"
    assert "  " not in text and "\n" not in text and "\t" not in text
    for ch in "\xa0　​﻿      ":
        assert ch not in text


def test_links_img_title_only():
    # reference tests/test_extract_links_img_title.py:6-37
    html = '<a href="/page1">LinkText<img src="image.jpg" title="ImageTitle"></a>'
    links = extract_links(html, "http://example.com")
    assert links == [("http://example.com/page1", "LinkText ImageTitle")]


def test_links_query_string_normalized_away():
    html = '<a href="/page1?utm=1#frag">Q</a>'
    links = extract_links(html, "http://example.com")
    assert links == [("http://example.com/page1", "Q")]


def test_links_document_order_positions():
    html = '<a href="/a">A</a><a href="/b">B</a><a href="/c">C</a>'
    _, _, links = parse_page(html, "http://example.com")
    assert [(u.rsplit("/", 1)[1], p) for (u, _, p) in links] == [
        ("a", 0),
        ("b", 1),
        ("c", 2),
    ]


def test_links_containment_under_referrer_path():
    # base is the current page's URL → crawl confined under its path
    # (reference scraper.py:158 passes page.url as base).
    html = '<a href="/deep/x">In</a><a href="/other/x">Out</a>'
    links = extract_links(html, "http://example.com/deep")
    assert links == [("http://example.com/deep/x", "In")]


# --- is_under_base (reference tests/test_is_under_base.py) ------------------


@pytest.mark.parametrize(
    "url, base_url, expected",
    [
        ("http://example.com/path/page", "http://example.com/path", True),
        ("http://example.com/path/sub/page", "http://example.com/path", True),
        ("http://example.com/other/page", "http://example.com/path", False),
        ("http://other.com/path/page", "http://example.com/path", False),
        ("http://example.com/anything", "http://example.com/", True),
        ("http://example.com/anything", "http://example.com", True),
        ("http://sub.example.com/path", "http://example.com/path", False),
        ("not a url", "http://example.com", False),
        ("http://example.com", "not a url", False),
        ("not a url", "also not a url", False),
    ],
)
def test_is_under_base(url, base_url, expected):
    assert is_under_base(url, base_url) is expected


# --- normalize_url (reference link_extractor.py:42-45) ----------------------


@pytest.mark.parametrize(
    "url, expected",
    [
        ("http://example.com/p?q=1#f", "http://example.com/p"),
        ("https://h.test/a/b", "https://h.test/a/b"),
        ("http://example.com", "http://example.com"),
        ("not a url", "://not a url"),  # reference quirk: urlparse puts it in .path
    ],
)
def test_normalize_url(url, expected):
    assert normalize_url(url) == expected


# --- extract_title (reference link_extractor.py:48-63) ----------------------


def test_title_basic():
    html = "<html><head><title>Test Page</title></head><body>OK</body></html>"
    assert extract_title(html) == "Test Page"


def test_title_absent():
    assert extract_title("<html><body>x</body></html>") is None


def test_title_empty():
    assert extract_title("<html><head><title></title></head></html>") is None


def test_title_whitespace_only():
    # reference: soup.title.string='  ' is truthy → returns ''.
    assert extract_title("<html><head><title>  </title></head></html>") == ""


def test_title_strips():
    assert extract_title("<title>\n  Hello \n</title>") == "Hello"


def test_title_first_wins():
    assert extract_title("<title>First</title><title>Second</title>") == "First"


# --- extract_text (reference fetch_and_store_robots.py:37) ------------------


def test_text_strip_join_semantics():
    # get_text(strip=True): each text node stripped, empties dropped, "" join.
    html = "<html><body><h1> A </h1>\n<p> B\nC </p>\n</body></html>"
    assert extract_text(html) == "AB\nC"


def test_text_includes_title():
    html = "<html><head><title>T</title></head><body>B</body></html>"
    assert extract_text(html) == "TB"


def test_text_entities_converted():
    assert extract_text("<p>a &amp; b&nbsp;</p>") == "a & b"


def test_text_empty_doc():
    assert extract_text("") == ""
    assert extract_text(None) == ""


# --- sha256 hash (reference scraper.py:23-25 vs hashlib oracle) -------------


def test_get_hash_matches_hashlib():
    text = "<html><title>x</title></html>"
    expected = hashlib.sha256(text.encode("utf-8")).hexdigest()
    # the engine computes this with Spark's builtin sha2(); the python-side
    # equivalence is checked here, the Spark-side one in test_udfs.py.
    assert hashlib.sha256(text.encode("utf-8")).hexdigest() == expected


# --- nesting / malformed HTML tolerance --------------------------------------


def test_unclosed_anchor_collects_rest():
    html = '<a href="/p">start<p>more</p>'
    links = extract_links(html, "http://example.com")
    assert links == [("http://example.com/p", "startmore")]


def test_self_closing_img_variants():
    for img in ('<img alt="A"/>', '<img alt="A">'):
        html = f'<a href="/p">T{img}</a>'
        assert extract_links(html, "http://example.com") == [
            ("http://example.com/p", "T A")
        ]


def test_first_img_with_attr_wins():
    html = '<a href="/p"><img alt="A1"><img alt="A2" title="T2"></a>'
    links = extract_links(html, "http://example.com")
    # first img with alt → A1; first img with title → T2
    assert links == [("http://example.com/p", "A1 T2")]


# -- P8: XML parser routing (reference scraper.py:154-157) --------------------

XHTML = """<?xml version="1.0" encoding="UTF-8"?>
<html xmlns="http://www.w3.org/1999/xhtml"><head><title> XML Title </title></head>
<body><p>hello</p>
<a href="/p/0/1">Child 1</a>
<a href="/p/0/2"><img src="i.jpg" alt="Alt2" title="Title2"/></a>
<A HREF="/p/0/9">NotAnAnchorInXml</A>
<a>NoHref</a>
<a href="http://other.test/x">External</a>
</body></html>"""


def test_xml_routing_extracts_links_case_sensitively():
    from scrape_spark.functions.htmlparse import extract_links

    links = extract_links(XHTML, "http://h.test/p/0")
    # the uppercase <A HREF> is NOT an anchor under the XML parser
    assert links == [
        ("http://h.test/p/0/1", "Child 1"),
        ("http://h.test/p/0/2", "Alt2 Title2"),
    ]


def test_html_parser_would_have_matched_uppercase_anchor():
    from scrape_spark.functions.htmlparse import extract_links

    # same doc WITHOUT the <?xml marker → tolerant HTML parse, case-folded
    html = XHTML.split("?>", 1)[1]
    links = extract_links(html, "http://h.test/p/0")
    assert ("http://h.test/p/0/9", "NotAnAnchorInXml") in links


def test_xml_page_title_and_text_use_html_parser():
    from scrape_spark.functions.htmlparse import parse_page

    text, title, links = parse_page(XHTML, "http://h.test/p/0")
    # reference: extract_title / get_text always run html.parser
    # (scraper.py:85-88, fetch_and_store_robots.py:35-37)
    assert title == "XML Title"
    assert text.startswith("XML Titlehello")
    assert "<?xml" not in text


def test_malformed_xml_falls_back_to_tolerant_html_parse():
    from scrape_spark.functions.htmlparse import extract_links

    bad = '<?xml version="1.0"?><html><body><a href="/p/0/1">C1</a><img src="x">' \
          "</body></html>"  # unclosed <img> → not well-formed XML
    links = extract_links(bad, "http://h.test/p/0")
    assert links == [("http://h.test/p/0/1", "C1")]


def test_xml_namespaced_elements_resolve_by_local_name():
    from scrape_spark.functions.htmlparse import extract_links

    doc = (
        '<?xml version="1.0"?>'
        '<x:root xmlns:x="urn:x" xmlns="http://www.w3.org/1999/xhtml">'
        '<a href="/p/0/3">ns</a></x:root>'
    )
    assert extract_links(doc, "http://h.test/p/0") == [
        ("http://h.test/p/0/3", "ns")
    ]


# -- main-content extraction (block segmentation + link density) ----------------


def test_main_content_strips_chrome_and_link_farms():
    from scrape_spark.functions.maincontent import extract_main_content

    art1 = "This is the first real paragraph of the article body text here."
    art2 = "A second substantial paragraph continues the article with detail."
    html = f"""<html><head><title>T</title>
    <script>var boiler = 'dropped entirely';</script>
    <style>.x {{ color: red }}</style></head><body>
    <nav><ul><li><a href="/a">Home page link</a></li>
    <li><a href="/b">About page link here</a></li></ul></nav>
    <div><p>{art1}</p><p>{art2}</p></div>
    <div><a href="/1">one link</a> <a href="/2">two link</a>
    <a href="/3">three link</a> farm</div>
    <p>short</p>
    <footer>Copyright chrome text that is long enough to pass length</footer>
    </body></html>"""
    main, n_blocks, n_kept = extract_main_content(html)
    assert main == f"{art1}\n{art2}"
    assert n_kept == 2
    assert "boiler" not in main and "Copyright" not in main
    assert n_blocks > n_kept


def test_main_content_link_density_boundary():
    from scrape_spark.functions.maincontent import extract_main_content

    # a block that is exactly 1/3 anchor text is dropped; just under kept
    body = "x" * 40
    anchor = "y" * 20  # 20 * 3 >= 60 * 1 -> dropped
    html = f"<p>{body}<a href='/'>{anchor}</a></p>"
    main, _, kept = extract_main_content(html)
    assert kept == 0
    anchor = "y" * 19  # 19*3 = 57 < 59 -> kept
    html = f"<p>{body}<a href='/'>{anchor}</a></p>"
    main, _, kept = extract_main_content(html)
    assert kept == 1


def test_main_content_edge_inputs():
    from scrape_spark.functions.maincontent import extract_main_content

    assert extract_main_content("") == ("", 0, 0)
    assert extract_main_content("plain text " * 5)[2] == 1
    # unclosed boiler container still suppresses following text
    main, _, kept = extract_main_content(
        "<footer><p>" + "chrome text here that is long enough ok " * 2
    )
    assert kept == 0
    # nested nav inside article: only the nav block drops
    art = "Real article sentence that is long enough to be kept for sure."
    main, _, _ = extract_main_content(
        f"<article><p>{art}</p><nav>menu menu menu menu menu menu</nav></article>"
    )
    assert main == art


def test_main_content_udf(spark):
    from scrape_spark.functions.maincontent import main_content_expr

    art = "Body paragraph long enough to be retained by the extractor rules."
    df = spark.createDataFrame(
        [(1, f"<nav>m m m</nav><p>{art}</p>".encode())], "i long, html binary"
    )
    r = df.select(main_content_expr("html").alias("m")).head()
    assert r["m"]["main_text"] == art and r["m"]["n_kept"] == 1


def test_main_content_review_regressions():
    from scrape_spark.functions.maincontent import extract_main_content

    art = "Real prose paragraph long enough to clear the length floor easily."
    # unclosed <a> must not poison later blocks (browsers auto-close at
    # block boundaries)
    main, _, kept = extract_main_content(
        f"<body><p><a href='/x'>home</p><p>{art}</p></body>"
    )
    assert main == art and kept == 1
    # <title> / head metadata is not article text
    main, _, _ = extract_main_content(
        f"<html><head><title>Breaking News Site: daily headlines here"
        f"</title></head><body><p>{art}</p></body></html>"
    )
    assert main == art
    # unclosed <head> is force-closed by body content
    main, _, _ = extract_main_content(
        f"<html><head><title>T</title><body><p>{art}</p>"
    )
    assert main == art
