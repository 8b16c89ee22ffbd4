"""Differential fuzz: randomized webgraphs through engine AND pyref oracle.

The fixed-topology e2e (test_crawl_equivalence.py) pins the happy paths; this
sweep generates seeded-random page graphs stuffed with the pathologies a real
crawl sees — relative/absolute/query/';params' hrefs, dead links (404 rows),
cross-host and up-tree links (is_under_base filtered), hostile hrefs that
make urljoin raise (the reference CRASHES on these — the engine skips the
anchor, htmlparse._links_from_records), empty-content pages, whitespace
anchors, img alt/title anchor text — and asserts the engine's final state
equals the in-memory reference oracle's on every axis that defines parity:
URL-seen set, status/error routing, titles, discovery tree, and canonical
(insertion) order.

Deterministic: topology is a pure function of the seed, so failures replay.
"""

import random

import pytest
from pyspark.sql import functions as F

from scrape_spark.functions.htmlparse import extract_text
from scrape_spark.oracle.pyref import ReferenceCrawler
from scrape_spark.plans.crawl import CrawlJob, canonical_order
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.session import local_df
from scrape_spark.sources.webgraph import PAGES_SCHEMA, WARC_EPOCH

N_HOSTS = 3
MAX_DEPTH = 3


def _gen_graph(seed: int) -> tuple[dict[str, str], dict[str, str], list[str]]:
    """(pages url->html, robots host->txt, seed urls) for one fuzz case."""
    rng = random.Random(seed)
    hosts = [f"fz{i}.seed{seed}.test" for i in range(N_HOSTS)]
    pages: dict[str, str] = {}

    for host in hosts:
        # random tree of paths under /r
        all_paths = ["/r"]
        depth = {"/r": 0}
        frontier = ["/r"]
        while frontier:
            p = frontier.pop(0)
            if depth[p] >= MAX_DEPTH:
                continue
            for b in range(rng.randint(0, 3)):
                c = f"{p}/{b}"
                depth[c] = depth[p] + 1
                all_paths.append(c)
                frontier.append(c)

        for p in all_paths:
            url = f"http://{host}{p}"
            leaf = p.rsplit("/", 1)[1]
            anchors = []
            children = [
                q
                for q in all_paths
                if q.startswith(p + "/") and depth[q] == depth[p] + 1
            ]
            for c in children:
                cleaf = c.rsplit("/", 1)[1]
                style = rng.randrange(4)
                if style == 0:  # relative href (urljoin from a no-slash base)
                    href = f"{leaf}/{cleaf}"
                elif style == 1:  # absolute path
                    href = c
                elif style == 2:  # absolute URL
                    href = f"http://{host}{c}"
                else:  # query-string duplicate of the absolute URL
                    href = f"http://{host}{c}?utm={rng.randrange(9)}"
                text_style = rng.randrange(4)
                if text_style == 0:
                    anchors.append(f'<a href="{href}">Child {cleaf}</a>')
                elif text_style == 1:  # messy whitespace, collapsed by kernel
                    anchors.append(f'<a href="{href}">  c\n {cleaf}\t x </a>')
                elif text_style == 2:  # img alt+title anchor text
                    anchors.append(
                        f'<a href="{href}"><img src="i.jpg" alt="A{cleaf}" '
                        f'title="T{cleaf}"/></a>'
                    )
                else:  # empty anchor text
                    anchors.append(f'<a href="{href}"></a>')
            # noise links, each with independent probability
            if rng.random() < 0.35:  # dead link under base -> 404 error row
                anchors.append(f'<a href="{p}/dead{rng.randrange(3)}">Dead</a>')
            if rng.random() < 0.3:  # cross-host -> is_under_base filtered
                other = hosts[(hosts.index(host) + 1) % len(hosts)]
                anchors.append(f'<a href="http://{other}/r">X</a>')
            if rng.random() < 0.3:  # up-tree link -> filtered (path prefix)
                anchors.append('<a href="/r">Up</a>')
            if rng.random() < 0.25:  # self link -> seen-set dup
                anchors.append(f'<a href="{p}">Self</a>')
            if rng.random() < 0.2:  # ';params' href: normalize strips params
                anchors.append(f'<a href="{p}/sp;x=1">Semi</a>')
            if rng.random() < 0.15:  # hostile href: urljoin raises ValueError
                anchors.append('<a href="http://[bad/x">Hostile</a>')

            if rng.random() < 0.08:
                html = ""  # empty-content page: done, links never extracted
            else:
                html = (
                    f"<html><head><title> T{p} </title></head><body>"
                    f"<p>body {host}{p} w{rng.randrange(100)}</p>"
                    + "".join(anchors)
                    + "</body></html>"
                )
            pages[url] = html

    robots = {
        # host0: everything allowed, no delay
        hosts[0]: "User-agent: *\nAllow: /\n",
        # host1: one subtree blocked + crawl-delay (politeness interacts)
        hosts[1]: "User-agent: *\nDisallow: /r/0\nCrawl-delay: 2\n",
        # hosts[2]: ABSENT -> simulated robots 404, default allow
    }
    seeds = [f"http://{h}/r" for h in hosts]
    return pages, robots, seeds


@pytest.mark.parametrize("seed", [11, 29])
def test_fuzz_crawl_matches_oracle(spark, tmp_path, seed):
    pages, robots, seeds = _gen_graph(seed)

    oracle = ReferenceCrawler(pages=pages, robots_txt=robots)
    oracle.seed(seeds)
    oracle.run()

    rows = [
        (u, WARC_EPOCH, h.encode("utf-8"), extract_text(h), "en")
        for u, h in pages.items()
    ]
    pages_df = local_df(spark, rows, PAGES_SCHEMA)
    robots_df = local_df(
        spark, list(robots.items()), "host string, robots_txt string"
    )
    store = SnapshotStore(spark, str(tmp_path / f"fuzz{seed}"))
    job = CrawlJob(spark, store, pages_df, robots_df, round_seconds=60,
                   n_buckets=4)
    job.seed(seeds)
    job.run(max_rounds=40)
    frontier = job.frontier().collect()

    assert {r["url"] for r in frontier} == oracle.seen_set(), "seen set"
    assert job.status_counts().get("pending", 0) == 0, "drained"

    engine = {
        r["url"]: (r["status"], r["error_message"], r["title"]) for r in frontier
    }
    for row in oracle.rows():
        if row.error_message == "Blocked by robots.txt":
            exp = ("blocked", row.error_message, row.title)
        elif row.error_message:
            exp = ("error", row.error_message, row.title)
        else:
            exp = ("done", None, row.title)
        assert engine[row.url] == exp, row.url

    tree = {
        r["url"]: (r["referrer"], r["depth"], r["link_pos"]) for r in frontier
    }
    for row in oracle.rows():
        if row.depth:
            assert tree[row.url] == (row.referrer, row.depth, row.link_pos), (
                row.url
            )

    canon = canonical_order(job.frontier())
    engine_order = [r["url"] for r in canon.orderBy("canon_seq").collect()]
    oracle_order = [r.url for r in sorted(oracle.rows(), key=lambda r: r.id)]
    assert engine_order == oracle_order, "canonical order"

    # byte-identical text invariant on every fetched page
    done = job.frontier().where(F.col("status") == "done")
    assert done.where(~F.col("text_match")).count() == 0
