"""Derive a Common-Crawl-style ``pages`` table from the driver's documents table.

The graft's input_hint mandates pages ``(url, warc_ts, html binary, text,
lang)``; the sandbox testdata has no such table, so the flagship entry point
synthesizes one *deterministically from documents.parquet*: every document
becomes one page, hosts are ``doc_id % n_hosts``, and each host's documents
form a k-ary tree in heap order (same topology rules as
``scrape_spark.sources.webgraph`` — one linking parent per URL, so crawl
ordering is schedule-independent).

Each page's HTML embeds the document's text and carries the same operator-
coverage links as the webgraph fixture: a relative child href (urljoin), a
query-string duplicate (normalize_url collapse), a self link (seen-set
anti-join), an external link and an up-path link (is_under_base drop), and a
bare anchor (no-href skip). ``text`` is produced by the engine's extraction
kernel so the byte-identical invariant is end-to-end checkable.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from scrape_spark.functions.htmlparse import extract_text
from scrape_spark.sources.webgraph import PAGES_SCHEMA, node_path

WARC_EPOCH = _dt.datetime(2025, 3, 1, 0, 0, 0)


def doc_host(doc_id: int, n_hosts: int) -> str:
    return f"docs{doc_id % n_hosts}.test"


def doc_url(doc_id: int, n_hosts: int, k: int) -> str:
    return f"http://{doc_host(doc_id, n_hosts)}{node_path(doc_id // n_hosts, k)}"


def doc_page_html(
    doc_id: int, text: str, n_docs: int, n_hosts: int, k: int
) -> tuple[str, str]:
    """(url, html) for one document-page; single source of truth for topology."""
    host = doc_host(doc_id, n_hosts)
    local = doc_id // n_hosts
    path = node_path(local, k)
    url = f"http://{host}{path}"
    leaf = path.rsplit("/", 1)[1]

    anchors: list[str] = []
    for j in range(1, k + 1):
        child_local = k * local + j
        child_doc = child_local * n_hosts + (doc_id % n_hosts)
        if child_doc >= n_docs:
            continue
        if j == 1:
            anchors.append(f'<a href="{leaf}/{j}">Doc {child_doc}</a>')  # relative
        else:
            anchors.append(f'<a href="{path}/{j}">Doc {child_doc}</a>')
    if anchors:
        anchors.append(f'<a href="{leaf}/1?utm=x">DupChild</a>')  # F1 collapse
    anchors.append(f'<a href="{leaf}">Self</a>')  # D1 cross-round dup
    anchors.append('<a href="http://elsewhere.test/x">Ext</a>')  # P2 drop
    anchors.append('<a href="/top">Up</a>')  # P2 drop
    anchors.append("<a>NoHref</a>")  # no-href skip

    html = (
        f"<html><head><title>Doc {doc_id} {host}</title></head><body>"
        f"<h1>D{doc_id}</h1><p>{text}</p>\n" + "\n".join(anchors) + "\n</body></html>"
    )
    return url, html


def pages_from_documents(
    spark: SparkSession,
    docs: DataFrame,
    n_hosts: int = 8,
    k: int = 3,
) -> DataFrame:
    """documents(doc_id, text, lang, ...) → pages in input_hint schema."""
    n_docs = docs.count()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                url, html = doc_page_html(int(doc_id), text, n_docs, n_hosts, k)
                rows.append(
                    (
                        url,
                        WARC_EPOCH + _dt.timedelta(seconds=int(doc_id)),
                        html.encode("utf-8"),
                        extract_text(html),
                        lang,
                    )
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return docs.select("doc_id", "text", "lang").mapInPandas(gen, schema=PAGES_SCHEMA)


def seed_urls(n_hosts: int = 8, k: int = 3) -> list[str]:
    return [f"http://docs{h}.test{node_path(0, k)}" for h in range(n_hosts)]


def robots_source(
    spark: SparkSession, n_hosts: int = 8
) -> DataFrame:
    """Simulated robots.txt network for the document hosts.

    host0 disallows the /p/0/1 subtree with delay 1; last host missing
    (fetch-failure → default allow); others open.
    """
    rows = []
    for h in range(n_hosts):
        if h == n_hosts - 1 and n_hosts > 1:
            continue
        if h == 0:
            rows.append((f"docs{h}.test", "User-agent: *\nDisallow: /p/0/1\nCrawl-delay: 1\n"))
        else:
            rows.append((f"docs{h}.test", "User-agent: *\nAllow: /\n"))
    from scrape_spark.session import local_df

    return local_df(spark, rows, "host string, robots_txt string")
