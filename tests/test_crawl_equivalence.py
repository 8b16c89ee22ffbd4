"""End-to-end crawl equivalence: Spark engine vs in-memory reference oracle.

FIXTURES.md §6: same seed list + politeness budget ⇒ identical final URL-seen
set, identical status/error routing, byte-identical extracted text per url,
and the reference's crawl ordering (canonical (depth, parent_seq, link_pos)
order == MySQL insertion order).
"""

import pytest
from pyspark.sql import functions as F

from scrape_spark.oracle.pyref import ReferenceCrawler
from scrape_spark.plans.crawl import CrawlJob, canonical_order
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import (
    generate_pages,
    host_sizes,
    node_path,
    page_html,
    robots_txt_fixture,
    robots_source_df,
    seed_urls,
)

N_HOSTS = 5
PAGES_PER_HOST = 40
K = 3
MEGA = 1
MEGA_FACTOR = 4


def _local_pages() -> dict[str, str]:
    """Driver-side twin of generate_pages (same pure kernels)."""
    out = {}
    for hi, size in enumerate(host_sizes(N_HOSTS, PAGES_PER_HOST, MEGA, MEGA_FACTOR)):
        for node in range(size):
            url, html = page_html(f"host{hi}.test", node, K, size)
            out[url] = html
    return out


@pytest.fixture(scope="module")
def oracle_result():
    crawler = ReferenceCrawler(
        pages=_local_pages(),
        robots_txt=dict(robots_txt_fixture(N_HOSTS, MEGA)),
    )
    crawler.seed(seed_urls(N_HOSTS))
    crawler.run()
    return crawler


@pytest.fixture(scope="module")
def engine_result(spark, tmp_path_factory):
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("crawl") / "state"))
    pages = generate_pages(
        spark, N_HOSTS, PAGES_PER_HOST, K, MEGA, MEGA_FACTOR
    ).persist()
    job = CrawlJob(
        spark,
        store,
        pages,
        robots_source_df(spark, N_HOSTS, MEGA),
        round_seconds=60,  # host1 delay=2 → quota 30/round → deferral DOES bite
        n_buckets=8,
        bucket_capacity=1 << 12,
    )
    job.seed(seed_urls(N_HOSTS))
    metrics = job.run(max_rounds=50)
    return job, metrics


def test_frontier_drains(engine_result):
    job, metrics = engine_result
    assert metrics, "no rounds ran"
    assert job.status_counts().get("pending", 0) == 0


def test_seen_set_matches_oracle(engine_result, oracle_result):
    job, _ = engine_result
    engine_urls = {r["url"] for r in job.frontier().select("url").collect()}
    assert engine_urls == oracle_result.seen_set()


def test_status_and_error_routing_matches(engine_result, oracle_result):
    job, _ = engine_result
    engine = {
        r["url"]: (r["status"], r["error_message"])
        for r in job.frontier().collect()
    }
    for row in oracle_result.rows():
        if row.error_message == "Blocked by robots.txt":
            expected = ("blocked", "Blocked by robots.txt")
        elif row.error_message:
            expected = ("error", row.error_message)
        else:
            expected = ("done", None)
        assert engine[row.url] == expected, row.url


def test_content_hash_matches(engine_result, oracle_result):
    job, _ = engine_result
    engine = {r["url"]: r["content_hash"] for r in job.frontier().collect()}
    for row in oracle_result.rows():
        if row.hash:
            assert engine[row.url] == row.hash, row.url


def test_text_byte_identical_invariant(engine_result):
    """input_hint invariant: engine-extracted text == pages.text, per url."""
    job, _ = engine_result
    done = job.frontier().where(F.col("status") == "done")
    assert done.where(~F.col("text_match")).count() == 0
    assert done.where(F.col("text_match")).count() == done.count()


def test_anchor_title_first_discovery(engine_result, oracle_result):
    """title = discovering link's anchor text, never updated (models.py S6)."""
    job, _ = engine_result
    engine = {r["url"]: r["title"] for r in job.frontier().collect()}
    for row in oracle_result.rows():
        assert engine[row.url] == row.title, (row.url, engine[row.url], row.title)


def test_discovery_tree_matches(engine_result, oracle_result):
    """(referrer, depth, parent link_pos) identical for every discovered url."""
    job, _ = engine_result
    engine = {
        r["url"]: (r["referrer"], r["depth"], r["link_pos"])
        for r in job.frontier().collect()
    }
    for row in oracle_result.rows():
        if row.depth == 0:
            continue
        assert engine[row.url] == (row.referrer, row.depth, row.link_pos), row.url


def test_canonical_order_reproduces_reference_insertion_order(
    engine_result, oracle_result
):
    """Engine canonical order == oracle AUTO_INCREMENT id order (SURVEY §7.4),
    even though politeness deferral makes engine *round* order diverge."""
    job, _ = engine_result
    canon = canonical_order(job.frontier())
    engine_order = [
        r["url"] for r in canon.orderBy("canon_seq").collect()
    ]
    oracle_order = [row.url for row in sorted(oracle_result.rows(), key=lambda r: r.id)]
    assert engine_order == oracle_order


def test_politeness_slots_respect_crawl_delay(engine_result):
    """Per-host fetch slots are monotone with gaps ≥ crawl_delay (host1: 2s)."""
    job, _ = engine_result
    rows = (
        job.frontier()
        .where((F.col("host") == "host1.test") & F.col("fetch_slot").isNotNull())
        .select("fetch_slot", "round")
        .collect()
    )
    by_round: dict[int, list] = {}
    for r in rows:
        by_round.setdefault(r["round"], []).append(r["fetch_slot"])
    assert by_round, "host1 scheduled nothing"
    for rnd, slots in by_round.items():
        slots.sort()
        for a, b in zip(slots, slots[1:]):
            assert (b - a).total_seconds() >= 2, (rnd, a, b)


def test_politeness_quota_defers_mega_host(engine_result):
    """host1 (mega, delay 2, quota 30/round) must need multiple rounds."""
    job, _ = engine_result
    rounds = (
        job.frontier()
        .where((F.col("host") == "host1.test") & (F.col("status") == "done"))
        .select("round")
        .distinct()
        .count()
    )
    assert rounds >= 2


def test_metrics_lineage_recorded(engine_result):
    job, metrics = engine_result
    lineage = job.store.lineage("frontier")
    round_snaps = [s for s in lineage if s["meta"].get("event") == "round"]
    assert len(round_snaps) == len(metrics)
    for snap, m in zip(round_snaps, metrics):
        assert snap["meta"]["scheduled"] == m["scheduled"]
        assert "new_urls" in snap["meta"]


def test_blocked_subtree_never_fetched(engine_result, oracle_result):
    """host1 /p/0/1 subtree: root blocked ⇒ descendants never discovered."""
    job, _ = engine_result
    f = job.frontier()
    blocked_root = f.where(F.col("url") == "http://host1.test/p/0/1").collect()
    assert blocked_root and blocked_root[0]["status"] == "blocked"
    # children of the blocked page must not exist in the frontier at all
    assert (
        f.where(F.col("url").startswith("http://host1.test/p/0/1/")).count() == 0
    )
