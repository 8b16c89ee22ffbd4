"""Deterministic synthetic web graph → Common-Crawl-style ``pages`` table.

Generates the exact input shape mandated by BASELINE.json input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)`` —
from a closed-form topology (FIXTURES.md §4) so expected crawl results are
computable by the in-memory reference oracle:

- each host is a k-ary tree in heap order under ``/p/0``; every URL has
  exactly ONE linking parent (its tree parent), so crawl ordering and
  referrer attribution are schedule-independent (SURVEY.md §7.4),
- each page also carries: one cross-host link (dropped by is_under_base),
  one up-path link (dropped), one query-string duplicate of child 1
  (collapsed by normalize_url + first-discovery dedup), one self-link
  (hits the cross-round seen-set anti-join), and one href-less anchor
  (skipped by extraction) — exercising D1/P2/F1/F5 on every single page,
- one configurable mega-host holds ``mega_factor``× the pages of a normal
  host (skew fixture for the politeness quota + salted top-k),
- ``text`` is generated WITH the engine's extraction kernel so the
  byte-identical-text invariant is checkable end-to-end (the kernel itself
  is pinned to the reference by the golden tests in tests/test_html_kernels.py).

Generation is distributed (``spark.range`` → ``mapInPandas``) — the bench
fixture at millions of pages is produced by the cluster, not the driver.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from scrape_spark.functions.htmlparse import extract_text

WARC_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)
LANGS = ["en", "ja", "de"]

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def node_path(node_id: int, k: int) -> str:
    """Heap-order node id → URL path: 0 → /p/0, child j of m → path(m)/j."""
    parts: list[str] = []
    m = node_id
    while m > 0:
        parts.append(str((m - 1) % k + 1))
        m = (m - 1) // k
    return "/p/0" + ("/" + "/".join(reversed(parts)) if parts else "")


def page_html(
    host: str, node_id: int, k: int, n_nodes: int, filler_repeat: int = 1
) -> tuple[str, str]:
    """(url, html) for one page — the single source of truth for topology."""
    path = node_path(node_id, k)
    url = f"http://{host}{path}"
    leaf = path.rsplit("/", 1)[1]
    children = [k * node_id + j for j in range(1, k + 1) if k * node_id + j < n_nodes]

    anchors: list[str] = []
    for idx, child in enumerate(children):
        j = (child - 1) % k + 1
        child_path = node_path(child, k)
        if idx == 0:
            # relative href — exercises urljoin resolution (F2)
            anchors.append(f'<a href="{leaf}/{j}">Child {j}</a>')
        elif idx == 1:
            # img alt+title anchor text (F5 concat order: "" + Alt + Title);
            # self-closed so the XHTML page variant stays well-formed XML
            anchors.append(
                f'<a href="{child_path}">'
                f'<img src="i.jpg" alt="Alt{j}" title="Title{j}"/></a>'
            )
        else:
            anchors.append(f'<a href="{child_path}">Child {j}</a>')
    if children:
        j1 = (children[0] - 1) % k + 1
        anchors.append(f'<a href="{leaf}/{j1}?utm=1">QueryDup</a>')
    anchors.append(f'<a href="{leaf}">Self</a>')  # cross-round anti-join dup
    anchors.append('<a href="http://external-other.test/x">External</a>')
    anchors.append('<a href="/other/x">UpPath</a>')
    anchors.append("<a>NoHref</a>")

    # deterministic filler (content-hash variety + realistic page size)
    filler = " ".join(
        f"w{(node_id * 2654435761 + i * 40503) % 99991}"
        for i in range(8 * filler_repeat)
    )
    body = (
        f"<h1>H {path}</h1><p>body {filler}</p>\n" + "\n".join(anchors) + "\n"
    )
    if node_id % 7 == 2:
        # P8 routing fixture: every 7th-ish page is served as well-formed
        # XHTML with an XML declaration — link extraction must route through
        # the XML parser (reference scraper.py:154-157) and still produce
        # the same link set; text/title stay on the HTML parser either way
        html = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head><title>Page {host} {path}</title></head><body>"
            + body
            + "</body></html>"
        )
    else:
        html = (
            f"<html><head><title>Page {host} {path}</title></head><body>"
            + body
            + "</body></html>"
        )
    return url, html


def host_name(idx: int) -> str:
    return f"host{idx}.test"


def host_sizes(
    n_hosts: int, pages_per_host: int, mega_host: int | None, mega_factor: int
) -> list[int]:
    sizes = [pages_per_host] * n_hosts
    if mega_host is not None and n_hosts > mega_host:
        sizes[mega_host] = pages_per_host * mega_factor
    return sizes


def generate_pages(
    spark: SparkSession,
    n_hosts: int = 5,
    pages_per_host: int = 40,
    k: int = 3,
    mega_host: int | None = 1,
    mega_factor: int = 4,
    filler_repeat: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed pages-table generation (input_hint schema)."""
    sizes = host_sizes(n_hosts, pages_per_host, mega_host, mega_factor)
    offsets = np.cumsum([0] + sizes)  # global id → host via searchsorted
    total = int(offsets[-1])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            gids = pdf["id"].to_numpy()
            hosts_idx = np.searchsorted(offsets, gids, side="right") - 1
            rows = []
            for gid, hi in zip(gids, hosts_idx):
                node = int(gid - offsets[hi])
                host = host_name(int(hi))
                url, html = page_html(host, node, k, sizes[hi], filler_repeat)
                rows.append(
                    (
                        url,
                        WARC_EPOCH + _dt.timedelta(seconds=int(gid)),
                        html.encode("utf-8"),
                        extract_text(html),
                        LANGS[int(gid) % len(LANGS)],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    n_part = num_partitions or max(2, total // 5000)
    return (
        spark.range(0, total, numPartitions=n_part)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def robots_txt_fixture(n_hosts: int = 5, mega_host: int | None = 1) -> list[tuple[str, str]]:
    """(host, robots.txt body) rows — the simulated network for S5.

    host1 disallows the child-1 subtree with crawl_delay 2 (exercises T4
    blocked routing + T3 spacing); the mega-host gets delay 1 (quota bites);
    the LAST host is absent (simulated fetch failure → default allow,
    robots_handler.py:42-44 + 83-84); others allow everything, no delay.
    """
    rows: list[tuple[str, str]] = []
    for i in range(n_hosts):
        host = host_name(i)
        if i == n_hosts - 1 and n_hosts > 2:
            continue  # simulated URLError: no robots.txt row for this host
        if i == 1:
            rows.append(
                (host, "User-agent: *\nDisallow: /p/0/1\nCrawl-delay: 2\n")
            )
        elif mega_host is not None and i == mega_host:
            # note: mega_host defaults to 1 → combined rule below wins
            rows.append((host, "User-agent: *\nCrawl-delay: 1\n"))
        else:
            rows.append((host, "User-agent: *\nAllow: /\n"))
    # de-dup on host, first entry wins (host1 rule above)
    seen: set[str] = set()
    out = []
    for h, b in rows:
        if h not in seen:
            seen.add(h)
            out.append((h, b))
    return out


def robots_source_df(spark: SparkSession, n_hosts: int = 5, mega_host: int | None = 1) -> DataFrame:
    from scrape_spark.session import local_df

    return local_df(
        spark, robots_txt_fixture(n_hosts, mega_host), "host string, robots_txt string"
    )


def seed_urls(n_hosts: int = 5) -> list[str]:
    """All host roots (FIXTURES.md §6 small/bench seed list)."""
    return [f"http://{host_name(i)}/p/0" for i in range(n_hosts)]
