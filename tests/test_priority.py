"""Frontier priority-queue dequeue (north-rule: "priority queue").

The reference consumes strictly FIFO (``ORDER BY id ASC LIMIT 1``,
models.py:122-129); the engine's default reproduces that. ``CrawlJob``
additionally accepts a ``priority`` expression ranked ascending ahead of the
FIFO ``seq`` tiebreak — the salted two-stage top-k is order-key-generic, so
the scheduling guarantees (per-host quota, mega-host salting) are unchanged.
"""

import pytest
from pyspark.sql import functions as F

from scrape_spark.operators.politeness import per_host_take
from scrape_spark.plans.crawl import CrawlJob
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import generate_pages, seed_urls

N_HOSTS, PAGES_PER_HOST, K = 2, 12, 4
DELAY = 20  # round_seconds=60 → quota 3 per host per round
ROBOTS_TXT = f"User-agent: *\nCrawl-delay: {DELAY}\n"


def test_per_host_take_ranks_by_priority_then_seq(spark):
    rows = [
        ("h", 1, 5), ("h", 2, 5), ("h", 3, 1), ("h", 4, 9),
        ("g", 10, 2), ("g", 11, 2), ("g", 12, 8),
    ]
    df = spark.createDataFrame(rows, "host string, seq long, prio long").withColumn(
        "quota", F.lit(2)
    )
    got = {
        (r["host"], r["host_rank"]): r["seq"]
        for r in per_host_take(df, "quota", order_cols=["prio", "seq"]).collect()
    }
    # h: prio order is seq3(p1), seq1/seq2(p5, seq tiebreak), seq4(p9)
    assert got == {("h", 1): 3, ("h", 2): 1, ("g", 1): 10, ("g", 2): 11}


@pytest.fixture(scope="module")
def lifo_crawl(spark, tmp_path_factory):
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("prio") / "state"))
    pages = generate_pages(spark, N_HOSTS, PAGES_PER_HOST, K, mega_host=None).persist()
    robots = spark.createDataFrame(
        [(f"host{i}.test", ROBOTS_TXT) for i in range(N_HOSTS)],
        "host string, robots_txt string",
    )
    job = CrawlJob(
        spark,
        store,
        pages,
        robots,
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 10,
        priority=-F.col("seq"),  # reverse-FIFO: newest discovery first
    )
    job.seed(seed_urls(N_HOSTS))
    metrics = job.run(max_rounds=100)
    fr = job.frontier().select("url", "host", "seq", "status", "round").persist()
    fr.count()
    pages.unpersist()
    return fr, metrics


def test_priority_round_batches_take_newest_first(lifo_crawl):
    """Reverse-FIFO invariant, checkable from the final table alone: a row
    scheduled in round r+1 with seq LOWER than everything round r took for
    the same host was necessarily pending during round r (it was discovered
    before those higher seqs existed) — so round r passing it over is only
    correct because every row round r took had higher priority (-seq). The
    converse (round r+1 schedules a HIGHER seq) is fine: that row was
    discovered by round r's fetches. Assert the sharp direction: within a
    host, each round's MINIMUM scheduled seq never increases across
    consecutive scheduling rounds once the host's frontier is nonempty both
    rounds — newest-first drains downward."""
    fr, _ = lifo_crawl
    rows = fr.where(F.col("round").isNotNull()).collect()
    by_host_round: dict = {}
    for r in rows:
        by_host_round.setdefault(r["host"], {}).setdefault(r["round"], []).append(
            r["seq"]
        )
    for host, rounds in by_host_round.items():
        ordered = sorted(rounds)
        for a, b in zip(ordered, ordered[1:]):
            # everything taken later is either newer (> max now: discovered
            # later) or strictly older than the oldest taken now (passed
            # over by priority) — never in between
            gap_lo, gap_hi = min(rounds[a]), max(rounds[a])
            mid = [s for s in rounds[b] if gap_lo < s < gap_hi]
            assert not mid, (
                f"{host} round {b} scheduled {mid} interleaved inside "
                f"round {a}'s [{gap_lo},{gap_hi}] — not priority order"
            )


def test_priority_crawl_still_drains_everything(lifo_crawl):
    fr, metrics = lifo_crawl
    assert fr.where(F.col("status") == "pending").count() == 0
    assert fr.where(F.col("status") == "done").count() == N_HOSTS * PAGES_PER_HOST


def test_priority_order_differs_from_fifo(lifo_crawl):
    """Reverse-FIFO must actually change scheduling: some host round takes a
    seq while a lower seq of the same host stays for a later round."""
    fr, _ = lifo_crawl
    rows = fr.where(F.col("round").isNotNull()).collect()
    by_host_round: dict = {}
    for r in rows:
        by_host_round.setdefault((r["host"], r["round"]), []).append(r["seq"])
    inverted = False
    for (host, rnd), seqs in by_host_round.items():
        later = [
            s
            for (h2, r2), s2 in by_host_round.items()
            if h2 == host and r2 > rnd
            for s in s2
        ]
        if later and min(later) < max(seqs):
            inverted = True
            break
    assert inverted, "priority=-seq produced pure FIFO order"
