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


# ---------------------------------------------------------------------------
# focused crawling: topic-relevance priority (operators/webrank.py)
# ---------------------------------------------------------------------------


def test_topic_priority_expr_ranks_hits_first_then_seq(spark):
    from scrape_spark.operators.webrank import topic_url_priority_expr

    rows = [
        ("h", 1, "http://h.test/other/page"),
        ("h", 2, "http://h.test/spark/intro"),
        ("h", 3, "http://h.test/spark/spark-deep"),  # 2 hits
        ("h", 4, "http://h.test/misc"),
    ]
    df = (
        spark.createDataFrame(rows, "host string, seq long, url string")
        .withColumn("quota", F.lit(4))
        .withColumn("_prio", topic_url_priority_expr(["spark"]))
    )
    got = [
        r["seq"]
        for r in per_host_take(df, "quota", order_cols=["_prio", "seq"])
        .orderBy("host_rank")
        .collect()
    ]
    # most hits first; zero-hit rows fall back to FIFO seq order
    assert got == [3, 2, 1, 4]


def test_focused_crawl_schedules_topic_urls_ahead_of_fifo(
    spark, tmp_path
):
    """With priority on URL token '2', some '2'-path URL must overtake a
    lower-seq sibling without it (the FIFO order is provably broken in the
    topic's favor), and the crawl still drains completely."""
    from scrape_spark.operators.webrank import topic_url_priority_expr

    store = SnapshotStore(spark, str(tmp_path / "state"))
    pages = generate_pages(spark, 1, PAGES_PER_HOST, K, mega_host=None)
    robots = spark.createDataFrame(
        [("host0.test", ROBOTS_TXT)], "host string, robots_txt string"
    )
    job = CrawlJob(
        spark,
        store,
        pages,
        robots,
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 10,
        priority=topic_url_priority_expr(["2"]),
    )
    job.seed(seed_urls(1))
    job.run(max_rounds=100)
    fr = job.frontier().select("url", "seq", "status", "round").collect()
    assert all(r["status"] == "done" for r in fr)
    rounds = {r["url"]: r["round"] for r in fr}
    seqs = {r["url"]: r["seq"] for r in fr}

    def hits(u):
        return sum(1 for t in u.split("/") if t == "2")

    inverted = any(
        hits(u) > 0 and hits(v) == 0
        and seqs[u] > seqs[v] and rounds[u] < rounds[v]
        for u in rounds
        for v in rounds
    )
    assert inverted, "topic priority never overtook FIFO order"
