"""Pure-Python HTML kernels with the reference's extraction semantics.

These are the *kernels* that run inside the engine's vectorized pandas UDFs
(see ``scrape_spark.functions.udfs``) and double as the standalone oracle
implementation for unit tests. Built on the stdlib ``html.parser`` (the
reference uses BeautifulSoup's ``html.parser`` backend; bs4 is not available
in this environment, so the semantics are re-implemented here and pinned by
golden-fixture tests lifted from the reference's own unit tests).

Reference parity (file:line into the reference repo):

- ``extract_links``   — link_extractor.py:14-39 (href-only anchors in document
  order; urljoin + normalize + is_under_base filter; anchor text =
  ``a.get_text(strip=True)`` + first img[alt] + first img[title], whitespace
  collapsed with ``str.split()``).
- ``extract_title``   — link_extractor.py:48-63 (first <title> string, stripped;
  None on absent/empty).
- ``extract_text``    — fetch_and_store_robots.py:37
  (``soup.get_text(strip=True)``: every text node stripped, empties dropped,
  joined with no separator). This defines the engine's ``text`` column and the
  byte-identical-text invariant (BASELINE.json input_hint).
- ``normalize_url``   — link_extractor.py:42-45 (scheme://netloc/path; query
  string and fragment dropped).
- ``is_under_base``   — link_extractor.py:5-11 (same netloc AND path prefix of
  the *referring page's* path; urllib semantics, invalid URLs → False).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

# HTML5 void elements: they never receive an end tag, so they must not be
# pushed onto the open-element stack.
_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


def normalize_url(url: str) -> str:
    """Canonicalize: keep scheme://netloc/path, drop query + fragment.

    Parity: link_extractor.py:42-45 (including the quirk that an unparseable
    URL yields ``'://<path>'`` because urlparse puts everything in .path).
    """
    parsed = urlparse(url)
    return f"{parsed.scheme}://{parsed.netloc}{parsed.path}"


def is_under_base(url: str, base_url: str) -> bool:
    """True iff url shares netloc with base AND its path starts with base's path.

    Parity: link_extractor.py:5-11. The base is the *current page's* URL, so
    the crawl is confined under each referring page's path; subdomains are
    excluded (netloc equality is exact). Unparseable URLs compare as empty
    strings and thus return False against a real base.
    """
    try:
        parsed_url = urlparse(url)
        parsed_base = urlparse(base_url)
    except ValueError:
        return False
    return parsed_url.netloc == parsed_base.netloc and parsed_url.path.startswith(
        parsed_base.path
    )


class _AnchorRecord:
    __slots__ = ("href", "texts", "img_alt", "img_title", "pos")

    def __init__(self, href: str, pos: int) -> None:
        self.href = href
        self.texts: list[str] = []
        self.img_alt: str | None = None
        self.img_title: str | None = None
        self.pos = pos


class _PageParser(HTMLParser):
    """One pass over the document collecting everything the engine needs.

    Collects, in a single parse (the reference parses each page up to three
    times — title scraper.py:88, links scraper.py:154-158, text
    fetch_and_store_robots.py:35-37 — which the engine fuses into one pass):

    - all text nodes (for ``extract_text``),
    - the first <title> contents (for ``extract_title``),
    - per-anchor records in document order (for ``extract_links``).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.text_chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.saw_title = False
        self._in_title = 0
        self.anchors: list[_AnchorRecord] = []  # document order of start tags
        self._open_anchors: list[_AnchorRecord] = []

    # -- tag handling -----------------------------------------------------
    def _handle_start(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            attrd = dict(attrs)
            if "href" in attrd and attrd["href"] is not None:
                rec = _AnchorRecord(attrd["href"], len(self.anchors))
                self.anchors.append(rec)
                self._open_anchors.append(rec)
            else:
                # href-less anchor: bs4's find_all("a", href=True) skips it
                # (tests/test_link_extractor.py:38-48) but its text still
                # belongs to the document text; we track it with href=None so
                # nesting depth stays correct for the end tag.
                rec = _AnchorRecord("", -1)
                rec.href = None  # type: ignore[assignment]
                self._open_anchors.append(rec)
        elif tag == "img" and self._open_anchors:
            attrd = dict(attrs)
            for rec in self._open_anchors:
                if rec.href is None:
                    continue
                # first descendant img *having* the attribute wins
                # (link_extractor.py:29-34: find("img", attrs={"alt": True}))
                if rec.img_alt is None and "alt" in attrd:
                    rec.img_alt = (attrd.get("alt") or "").strip()
                if rec.img_title is None and "title" in attrd:
                    rec.img_title = (attrd.get("title") or "").strip()
        elif tag == "title":
            # only the FIRST <title> feeds extract_title (soup.title is the
            # first match); later titles still contribute to document text.
            if not self.saw_title:
                self.saw_title = True
                self._in_title += 1

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._handle_start(tag, attrs)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # explicit self-closing form <img .../> — same as a start of a void
        # element; <a/> self-closed contributes an empty-text link.
        self._handle_start(tag, attrs)
        if tag not in _VOID_ELEMENTS:
            self._handle_end(tag)

    def _handle_end(self, tag: str) -> None:
        if tag == "a" and self._open_anchors:
            self._open_anchors.pop()
        elif tag == "title" and self._in_title:
            self._in_title -= 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_ELEMENTS:
            return
        self._handle_end(tag)

    # -- text -------------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if not data:
            return
        self.text_chunks.append(data)
        if self._in_title:
            self.title_chunks.append(data)
        for rec in self._open_anchors:
            if rec.href is not None:
                rec.texts.append(data)


def _xml_localname(tag) -> str:
    """ElementTree qualified tag → local name (bs4 lxml-xml names
    default-namespace elements by their local name)."""
    if isinstance(tag, str) and tag.startswith("{"):
        return tag.rsplit("}", 1)[1]
    return tag if isinstance(tag, str) else ""


def _xml_anchor_records(xml: str) -> list[tuple] | None:
    """P8: anchor records via a real XML parse (reference scraper.py:154-157
    routes ``<?xml`` content to ``BeautifulSoup(…, features="xml")``).

    XML semantics vs the HTML path: tag/attribute matching is CASE-SENSITIVE
    (``<A HREF>`` is NOT an anchor), void-element quirks don't apply, and
    namespace-qualified elements resolve by local name. Returns None when
    the document is not well-formed — the reference's lxml backend recovers
    partial trees there, which stdlib ElementTree cannot reproduce, so the
    caller falls back to the tolerant HTML parse (documented divergence for
    malformed XML only).
    """
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return None
    records: list[tuple] = []
    for el in root.iter():
        if _xml_localname(el.tag) != "a":
            continue
        href = el.attrib.get("href")
        if href is None:
            continue
        chunks = list(el.itertext())
        img_alt = img_title = None
        for sub in el.iter():
            if _xml_localname(sub.tag) != "img":
                continue
            if img_alt is None and "alt" in sub.attrib:
                img_alt = (sub.attrib.get("alt") or "").strip()
            if img_title is None and "title" in sub.attrib:
                img_title = (sub.attrib.get("title") or "").strip()
        records.append((href, chunks, img_alt, img_title))
    return records


def _links_from_records(
    records: list[tuple], base_url: str
) -> list[tuple[str, str, int]]:
    """Shared link pipeline: urljoin → normalize → is_under_base → anchor
    text assembly (link_extractor.py:14-39) — identical for the HTML and XML
    parse paths."""
    links: list[tuple[str, str, int]] = []
    pos = 0
    for href, chunks, img_alt, img_title in records:
        try:
            full_url = normalize_url(urljoin(base_url, href))
        except ValueError:
            # urljoin/urlparse raise on e.g. malformed-IPv6 hrefs
            # ('http://[bad/x'). The reference has NO handler on this path —
            # one such href aborts its whole crawl (link_extractor.py:20,
            # scraper.py:158) — so parity is "crash"; at engine scale a
            # hostile page must cost one skipped link, not a stage, so the
            # anchor is dropped like any other non-crawlable href
            # (documented divergence).
            continue
        if not is_under_base(full_url, base_url):
            continue
        # a.get_text(strip=True): descendant strings each stripped,
        # empties dropped, joined with no separator.
        anchor = "".join(s for s in (c.strip() for c in chunks) if s)
        if img_alt is not None:
            anchor += " " + img_alt
        if img_title is not None:
            anchor += " " + img_title
        # collapse ALL whitespace via str.split() — Unicode-aware
        # (link_extractor.py:35; zero-width chars asserted absent by
        # tests/test_extract_links_img_alt_title.py:34-77).
        anchor = " ".join(anchor.split())
        links.append((full_url.strip(), anchor, pos))
        pos += 1
    return links


def parse_page(html: str, base_url: str | None = None):
    """Single-pass parse → (text, title, links).

    ``links`` is a list of ``(url, anchor_text, link_pos)`` tuples in document
    order (link_pos is the engine's deterministic in-page ordering key,
    SURVEY.md §7.4); the containment/normalization filters are only applied
    when ``base_url`` is given.

    Reference routing parity: ``text`` and ``title`` ALWAYS come from the
    HTML parser (scrape_page/extract_title use html.parser regardless of
    content type — scraper.py:85-88, fetch_and_store_robots.py:35-37); only
    LINK extraction routes ``<?xml``-prefixed content to an XML parse
    (extract_and_save_links, scraper.py:154-157).
    """
    parser = _PageParser()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        # bs4 html.parser is error-tolerant; on a hard parser failure fall
        # back to whatever was collected so far.
        pass

    # get_text(strip=True): each node stripped, empties dropped, joined by "".
    text = "".join(s for s in (c.strip() for c in parser.text_chunks) if s)

    # extract_title (link_extractor.py:48-63): soup.title.string is the raw
    # single string child; falsy raw (absent/empty) → None, else stripped
    # (whitespace-only raw therefore yields "").
    raw_title = "".join(parser.title_chunks) if parser.saw_title else ""
    title = raw_title.strip() if raw_title else None

    links: list[tuple[str, str, int]] = []
    if base_url is not None:
        records = None
        if html and html.lstrip().startswith("<?xml"):
            records = _xml_anchor_records(html)  # P8 XML routing
        if records is None:
            records = [
                (rec.href, rec.texts, rec.img_alt, rec.img_title)
                for rec in parser.anchors
            ]
        links = _links_from_records(records, base_url)
    return text, title, links


def extract_text(html: str) -> str:
    """Full-document text, byte-identical invariant basis (see module doc)."""
    text, _, _ = parse_page(html)
    return text


def extract_title(html: str) -> str | None:
    """First <title> contents, stripped; None if absent/empty."""
    _, title, _ = parse_page(html)
    return title


def extract_links(html: str, base_url: str) -> list[tuple[str, str]]:
    """(url, anchor_text) pairs — reference extract_links signature."""
    _, _, links = parse_page(html, base_url)
    return [(u, t) for (u, t, _) in links]
