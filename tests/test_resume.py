"""Checkpoint/resume: kill after round k, resume from snapshots, identical state.

Also covers: 404 fetch-error routing, rollback to an earlier snapshot.
"""

from pyspark.sql import functions as F

from scrape_spark.plans.crawl import CrawlJob
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import generate_pages, robots_source_df, seed_urls

N_HOSTS = 3
PPH = 30
K = 3


def _job(spark, root, pages):
    return CrawlJob(
        spark,
        SnapshotStore(spark, root),
        pages,
        robots_source_df(spark, N_HOSTS, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
    )


def _state(job):
    rows = job.frontier().select(
        "url", "status", "seq", "depth", "content_hash", "error_message"
    ).collect()
    return sorted(tuple(r) for r in rows)


def test_resume_after_partial_crawl(spark, tmp_path):
    pages = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()

    # full run in one process
    full = _job(spark, str(tmp_path / "full"), pages)
    full.seed(seed_urls(N_HOSTS))
    full.run()

    # partial run, then a NEW CrawlJob over the same store (simulated restart)
    root = str(tmp_path / "partial")
    j1 = _job(spark, root, pages)
    j1.seed(seed_urls(N_HOSTS))
    j1.run(max_rounds=2)
    assert j1.status_counts().get("pending", 0) > 0  # genuinely mid-crawl

    j2 = _job(spark, root, pages)  # fresh driver state, same snapshots
    j2.run()
    assert j2.status_counts().get("pending", 0) == 0
    assert _state(j2) == _state(full)
    pages.unpersist()


def test_rollback_replays_rounds(spark, tmp_path):
    pages = generate_pages(spark, N_HOSTS, 12, K, mega_host=None).persist()
    root = str(tmp_path / "rb")
    j = _job(spark, root, pages)
    j.seed(seed_urls(N_HOSTS))
    j.run()
    final = _state(j)

    lineage = j.store.lineage("frontier")
    assert len(lineage) >= 3
    # roll frontier back to after round 1 and replay
    j.store.rollback("frontier", lineage[1]["id"])
    # note: seen-set blooms are a superset after rollback — harmless for
    # correctness (bloom is a prefilter; exact anti-join keys off the seen
    # TABLE, which rolls back with its own snapshot) — but the seen table
    # must be rolled back in lockstep for exactness:
    seen_lineage = j.store.lineage("seen")
    j.store.rollback("seen", seen_lineage[1]["id"])
    j2 = _job(spark, root, pages)
    j2.run()
    assert _state(j2) == final
    pages.unpersist()


def test_missing_pages_produce_404_rows(spark, tmp_path):
    pages = generate_pages(spark, 1, 5, K, mega_host=None).persist()
    j = _job(spark, str(tmp_path / "m404"), pages)
    j.seed(["http://host0.test/p/0", "http://nowhere.test/p/0"])
    j.run()
    rows = {r["url"]: r for r in j.frontier().collect()}
    miss = rows["http://nowhere.test/p/0"]
    # reference fetch-failure path: content '', status NULL, error set,
    # marked processed (scraper.py:100-109, 194-197)
    assert miss["status"] == "error"
    assert miss["error_message"] == "404 Not Found"
    assert miss["status_code"] is None
    assert rows["http://host0.test/p/0"]["status"] == "done"
    pages.unpersist()


def test_crash_between_frontier_commit_and_seen_ref_repairs_on_resume(
    spark, tmp_path
):
    """The round's durable commit is two manifest steps (frontier delta, then
    seen.add_ref). Simulate a crash between them by rolling the seen table
    back ONE snapshot after a round with new URLs, then resume with a fresh
    CrawlJob: _reconcile_seen_refs must re-register the missing ref, so no
    URL is ever enqueued twice (every page self-links, so without the repair
    the dropped round's URLs ARE re-discovered and duplicated)."""
    pages = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    root = str(tmp_path / "crashwin")
    job = _job(spark, root, pages)
    job.seed(seed_urls(N_HOSTS))
    metrics = job.run(max_rounds=2)
    assert metrics and metrics[-1]["new_urls"] > 0

    seen_lineage = job.store.lineage("seen")
    assert len(seen_lineage) >= 2
    job.store.rollback("seen", seen_lineage[-2]["id"])

    resumed = _job(spark, root, pages)
    resumed.run(max_rounds=40)
    frontier = resumed.frontier()
    dups = frontier.groupBy("url").count().where("count > 1").count()
    assert dups == 0, "duplicate frontier rows after resume"
    assert resumed.status_counts().get("pending", 0) == 0

    seen_urls = {r["url"] for r in resumed.seen.read().select("url").collect()}
    frontier_urls = {r["url"] for r in frontier.select("url").collect()}
    assert seen_urls == frontier_urls

    # The decisive check: final state must be IDENTICAL to an uninterrupted
    # control run. Without the repair, the dropped round's URLs are
    # re-discovered and merge-on-read masks them as row UPDATES — same url
    # set, but seq/title/referrer rewritten (first-discovery metadata lost)
    # and the pages silently re-fetched; verified to diverge with the repair
    # disabled.
    control = _job(spark, str(tmp_path / "control"), pages)
    control.seed(seed_urls(N_HOSTS))
    control.run(max_rounds=40)

    def full_state(j):
        rows = j.frontier().select(
            "url", "status", "seq", "depth", "title", "referrer",
            "parent_seq", "link_pos", "error_message",
        ).collect()
        return sorted(tuple(r) for r in rows)

    assert full_state(resumed) == full_state(control)
    pages.unpersist()


def test_crash_between_seed_commit_and_seen_add_repairs_on_resume(
    spark, tmp_path
):
    """seed() is the same two-step pair: frontier seed write, then seen.add.
    Simulate the window by dropping the seen table entirely after seeding;
    resume must replay the add and converge to the uninterrupted state."""
    import shutil

    pages = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    root = str(tmp_path / "seedwin")
    job = _job(spark, root, pages)
    job.seed(seed_urls(N_HOSTS))
    # wipe the seen table from the manifest + disk (as if add never ran)
    manifest = job.store._load()
    seen_tbl = manifest["tables"].pop("seen")
    job.store._save(manifest)
    for s in seen_tbl["snapshots"]:
        if not s["meta"].get("ref"):
            shutil.rmtree(job.store.abspath(s["path"]), ignore_errors=True)

    resumed = _job(spark, root, pages)
    resumed.run(max_rounds=40)
    assert resumed.status_counts().get("pending", 0) == 0
    assert (
        resumed.frontier().groupBy("url").count().where("count > 1").count()
        == 0
    )

    control = _job(spark, str(tmp_path / "seedctl"), pages)
    control.seed(seed_urls(N_HOSTS))
    control.run(max_rounds=40)
    assert _state(resumed) == _state(control)
    pages.unpersist()


def test_truncate_reseed_crash_still_repairs(spark, tmp_path):
    """Markers from BEFORE a truncate must not vouch for the run after it:
    truncate + re-seed restarts round indices at 0, so a stale round-N
    marker from the first run could mask a genuinely crashed commit in the
    second. The marker scan is epoch-bounded at the last truncate."""
    pages = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    root = str(tmp_path / "epoch")
    job = _job(spark, root, pages)
    job.seed(seed_urls(N_HOSTS))
    job.run()  # drain: seen lineage now carries high round markers
    job.truncate()

    job2 = _job(spark, root, pages)
    job2.seed(seed_urls(N_HOSTS))
    m = job2.run_round()
    assert m and m["new_urls"] > 0
    # crash window: drop the round's seen ref (the last seen write)
    lineage = job2.store.lineage("seen")
    job2.store.rollback("seen", lineage[-2]["id"])

    resumed = _job(spark, root, pages)
    resumed.run(max_rounds=40)
    frontier = resumed.frontier()
    assert frontier.groupBy("url").count().where("count > 1").count() == 0
    assert resumed.status_counts().get("pending", 0) == 0

    control = _job(spark, str(tmp_path / "epochctl"), pages)
    control.seed(seed_urls(N_HOSTS))
    control.run(max_rounds=40)
    assert _state(resumed) == _state(control)
    pages.unpersist()


def test_truncate_reseed_crash_between_seed_and_add_repairs(spark, tmp_path):
    """seed() after truncate: the seen table EXISTS (older empty base), so
    an is_empty() completion check would wrongly skip the repair — the
    wall-time evidence must fire it."""
    pages = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    root = str(tmp_path / "epochseed")
    job = _job(spark, root, pages)
    job.seed(seed_urls(N_HOSTS))
    job.run()
    job.truncate()

    job2 = _job(spark, root, pages)
    job2.seed(seed_urls(N_HOSTS))
    # crash window: drop the seed's seen.add (last seen write)
    lineage = job2.store.lineage("seen")
    job2.store.rollback("seen", lineage[-2]["id"])

    resumed = _job(spark, root, pages)
    resumed.run(max_rounds=40)
    assert resumed.status_counts().get("pending", 0) == 0
    assert (
        resumed.frontier().groupBy("url").count().where("count > 1").count()
        == 0
    )
    control = _job(spark, str(tmp_path / "epochseedctl"), pages)
    control.seed(seed_urls(N_HOSTS))
    control.run(max_rounds=40)
    assert _state(resumed) == _state(control)
    pages.unpersist()


def test_admin_op_after_crash_does_not_suppress_repair(spark, tmp_path):
    """A seen-mutating admin op issued AFTER a crash but BEFORE the next
    run must not fake the 'later seen commit' completion evidence: every
    mutating CrawlJob entry point reconciles first (_ensure_reconciled),
    so the crashed round's ref is repaired before the admin write lands."""
    pages = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    root = str(tmp_path / "crashadmin")
    job = _job(spark, root, pages)
    job.seed(seed_urls(N_HOSTS))
    metrics = job.run(max_rounds=2)
    assert metrics and metrics[-1]["new_urls"] > 0

    head = job.store.current_snapshot("frontier")
    crashed_new = {
        r["url"]
        for r in spark.read.parquet(job.store.abspath(head["path"]))
        .where(F.col("status") == "pending")
        .select("url")
        .collect()
    }
    assert crashed_new
    seen_lineage = job.store.lineage("seen")
    job.store.rollback("seen", seen_lineage[-2]["id"])  # crash between steps

    # fresh process; operator deletes an unrelated (already-done) URL first
    resumed = _job(spark, root, pages)
    victim = next(
        r["url"]
        for r in resumed.frontier().where(F.col("status") == "done").collect()
        if r["url"] not in crashed_new
    )
    resumed.delete_by_url([victim])

    seen_urls = {r["url"] for r in resumed.seen.read().select("url").collect()}
    assert crashed_new <= seen_urls, "repair must precede the admin write"
    assert victim not in seen_urls  # the delete itself still took effect

    resumed.run(max_rounds=40)
    dups = resumed.frontier().groupBy("url").count().where("count > 1").count()
    assert dups == 0
    pages.unpersist()


def test_clock_skew_does_not_fake_completion_evidence(spark, tmp_path):
    """Completion evidence orders commits by the store's monotonic
    commit_seq, not wall clocks: simulate an NTP backward step by inflating
    every live seen snapshot's wall_time far past the crashed frontier
    head's — the repair must still run (the old wall-time rule skipped it,
    losing the round's new URLs from the seen set)."""
    pages = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    root = str(tmp_path / "crashclock")
    job = _job(spark, root, pages)
    job.seed(seed_urls(N_HOSTS))
    metrics = job.run(max_rounds=2)
    assert metrics and metrics[-1]["new_urls"] > 0

    seen_lineage = job.store.lineage("seen")
    job.store.rollback("seen", seen_lineage[-2]["id"])
    manifest = job.store._load()
    fhead = job.store.current_snapshot("frontier")
    for s in manifest["tables"]["seen"]["snapshots"]:
        s["wall_time"] = fhead["wall_time"] + 1e6  # clock stepped back
    job.store._save(manifest)

    resumed = _job(spark, root, pages)
    resumed.run(max_rounds=40)
    dups = resumed.frontier().groupBy("url").count().where("count > 1").count()
    assert dups == 0
    assert resumed.status_counts().get("pending", 0) == 0

    control = _job(spark, str(tmp_path / "clockctl"), pages)
    control.seed(seed_urls(N_HOSTS))
    control.run(max_rounds=40)
    assert _state(resumed) == _state(control)
    pages.unpersist()
