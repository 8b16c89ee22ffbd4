"""In-memory sequential reference crawler — the equivalence oracle.

A dict-backed restatement of the reference's crawl loop with MySQL replaced
by ordered dicts and HTTP replaced by a url→html lookup (the same simulated
web the Spark engine crawls). Semantics per reference file:line:

- FIFO dequeue of the oldest unprocessed row (``ORDER BY id ASC LIMIT 1``,
  models.py:117-153) — ``id`` is insertion order, so the loop is BFS in
  discovery order.
- robots check first (scraper.py:175): deny → mark processed with error
  'Blocked by robots.txt', NO fetch, NO links (scraper.py:31-33); allow with
  delay → the virtual clock advances by the delay BEFORE the fetch
  (scraper.py:34-36 time.sleep — globally serialized in the reference).
- fetch (scraper.py:39-109): hit → content/status 200/title-or-netloc/sha256;
  miss → error row (content '', status NULL, error set) still marked
  processed (at-most-once, scraper.py:194-197).
- link extraction (scraper.py:152-162): per extracted (url, anchor) in
  document order, insert iff not already present (``exists_in_db``
  models.py:207-216); the new row stores referrer=page.url and
  title=anchor_text (scraper.py:161).
- empty content → processed, no links (scraper.py:186-193).

The oracle tracks, beyond the reference's own columns, the derived ordering
key (depth, parent_seq, link_pos) so tests can assert the engine's
deterministic order reproduces insertion order (SURVEY.md §7.4).

NOT a copy: the reference's implementation is MySQL/requests-driven
(models.py, scraper.py); this is a ~100-line executable spec of its
semantics used only by the test suite.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from urllib.parse import urlparse

from scrape_spark.functions.htmlparse import parse_page
from scrape_spark.operators.robots import check_rules, parse_robots_body


@dataclass
class OracleRow:
    id: int
    url: str
    referrer: str | None = None
    title: str | None = None
    content: str | None = None
    status_code: int | None = None
    hash: str | None = None
    error_message: str | None = None
    processed: bool = False
    # derived ordering key (engine parity, SURVEY.md §7.4)
    depth: int = 0
    parent_seq: int = -1
    link_pos: int = -1
    text: str | None = None
    page_title: str | None = None  # fetched <title> (title col is never updated)
    method: str = "GET"  # S3: scraper.py:176-183 row.get("method", "GET")
    payload: str | None = None

    @property
    def seq(self) -> int:
        return self.id - 1


@dataclass
class ReferenceCrawler:
    pages: dict[str, str]  # url → html (the simulated GET web)
    robots_txt: dict[str, str]  # host → robots.txt body
    # (url, payload) → html: the simulated POST responses (S3 — a POST page
    # is keyed by its body too, scraper.py:119-149/176-183)
    post_pages: dict[tuple[str, str], str] = field(default_factory=dict)
    user_agent: str = "MyScraperBot"
    table: dict[str, OracleRow] = field(default_factory=dict)  # insertion-ordered
    crawl_order: list[str] = field(default_factory=list)
    clock: float = 0.0
    _rules: dict[str, tuple[str, str, int | None]] = field(default_factory=dict)

    # -- state ---------------------------------------------------------------
    def _insert(self, url: str, referrer: str | None, title: str | None,
                depth: int, parent_seq: int, link_pos: int,
                method: str = "GET", payload: str | None = None) -> None:
        if url in self.table:  # exists_in_db probe (models.py:207-216)
            return
        self.table[url] = OracleRow(
            id=len(self.table) + 1, url=url, referrer=referrer, title=title,
            depth=depth, parent_seq=parent_seq, link_pos=link_pos,
            method=method, payload=payload,
        )

    def seed(self, urls: list) -> None:
        """Seeds: url str, (url, method, payload), or the CLI's
        (url, method, payload, referrer) — scraper.py:249-257."""
        for i, u in enumerate(urls):
            if isinstance(u, str):
                url, method, payload, referrer = u, "GET", None, None
            else:
                url, method, payload = u[0], (u[1] or "GET").upper(), u[2]
                referrer = u[3] if len(u) > 3 else None
            self._insert(url, referrer, None, depth=0, parent_seq=-1,
                         link_pos=i, method=method, payload=payload)

    def _dequeue(self) -> OracleRow | None:
        for row in self.table.values():  # dict preserves insertion (id) order
            if not row.processed:
                return row
        return None

    # -- robots ----------------------------------------------------------------
    def _check_robots(self, url: str) -> tuple[bool, int]:
        host = urlparse(url).netloc
        if host not in self._rules:
            body = self.robots_txt.get(host)
            # fetch failure → no row → default allow (robots_handler.py:42-44,83-84)
            self._rules[host] = (
                parse_robots_body(body, self.user_agent) if body else ("", "", None)
            )
        disallow, allow, delay = self._rules[host]
        path = urlparse(url).path or "/"
        return check_rules(path, disallow, allow, delay)

    # -- the loop ---------------------------------------------------------------
    def run(self, max_steps: int | None = None) -> None:
        steps = 0
        while max_steps is None or steps < max_steps:
            row = self._dequeue()
            if row is None:
                break
            steps += 1
            self._process(row)

    def _process(self, row: OracleRow) -> None:
        url = row.url
        allowed, delay = self._check_robots(url)
        if not allowed:
            row.processed = True
            row.error_message = "Blocked by robots.txt"
            self.crawl_order.append(url)
            return
        if delay and float(delay) > 0:
            self.clock += float(delay)  # time.sleep(delay), scraper.py:34-36

        if row.method == "POST":
            # fetch_post_content (scraper.py:119-149): response depends on the
            # posted body; parse/links/hash identical to GET afterwards
            html = self.post_pages.get((url, row.payload or ""))
        else:
            html = self.pages.get(url)
        if html is None:
            # fetch failure path (scraper.py:100-109): content '', status NULL
            row.content, row.status_code = "", None
            row.error_message = "404 Not Found"
            row.processed = True
            self.crawl_order.append(url)
            return

        text, title, links = parse_page(html, url)
        row.content = html
        row.status_code = 200
        # title is NEVER updated on duplicate key (models.py SQL comment
        # "titleは更新しない"): a pre-inserted frontier row (seed or
        # discovered link) keeps its insert-time title — anchor text for
        # discovered pages, NULL for pre-seeded rows. The freshly fetched
        # <title> is recorded separately for the engine's page_title column.
        row.page_title = title or urlparse(url).netloc
        row.hash = hashlib.sha256(html.encode("utf-8")).hexdigest()
        row.text = text
        if html.strip():
            for link_url, anchor_text, pos in links:
                self._insert(
                    link_url, referrer=url, title=anchor_text,
                    depth=row.depth + 1, parent_seq=row.seq, link_pos=pos,
                )
        row.processed = True
        self.crawl_order.append(url)

    # -- outputs ------------------------------------------------------------------
    def seen_set(self) -> set[str]:
        return set(self.table)

    def rows(self) -> list[OracleRow]:
        return list(self.table.values())
