"""T6/T7 admin ops — reference models.py bulk-mutation parity.

Covers: mark_page_as_processed, reset_all_processed/mark_all_as_unprocessed,
mark_all_as_processed, update_error_message, clear_error_messages,
update_page_content, delete_page_by_url (incl. seen-set removal +
re-discoverability), clear_all_pages (truncate), and the read surface
(get_page_by_url/id, get_all_urls, processed/unprocessed urls,
get_error_messages). Engine semantics asserted on real state, not SQL mocks.
"""

import hashlib
import itertools
import shutil

import pytest
from pyspark.sql import functions as F

from scrape_spark.plans.crawl import CrawlJob
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import generate_pages, robots_source_df, seed_urls

N_HOSTS = 2
PPH = 12
K = 3

_clone_counter = itertools.count()


@pytest.fixture(scope="module")
def base_state(spark, tmp_path_factory):
    """Crawl ONCE; tests mutate disposable on-disk clones of the store."""
    root = tmp_path_factory.mktemp("admin_base")
    pages = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    job = CrawlJob(
        spark,
        SnapshotStore(spark, str(root / "store")),
        pages,
        robots_source_df(spark, N_HOSTS, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
    )
    job.seed([*seed_urls(N_HOSTS), "http://nowhere.test/p/0"])
    job.run()
    yield root, pages
    pages.unpersist()


@pytest.fixture()
def crawled(spark, base_state, tmp_path):
    root, pages = base_state
    clone = tmp_path / f"clone{next(_clone_counter)}"
    shutil.copytree(root / "store", clone)
    return CrawlJob(
        spark,
        SnapshotStore(spark, str(clone)),
        pages,
        robots_source_df(spark, N_HOSTS, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
    )


def test_reset_processed_all_then_recrawl_restores_state(crawled):
    before = {
        r["url"]: (r["status"], r["content_hash"])
        for r in crawled.frontier().collect()
    }
    crawled.reset_processed()
    counts = crawled.status_counts()
    assert set(counts) == {"pending"}  # every row back to unprocessed
    # content hashes survive the reset (reference UPDATE touches only the flag)
    kept = {r["url"]: r["content_hash"] for r in crawled.frontier().collect()}
    assert kept == {u: h for u, (_, h) in before.items()}
    # the frontier re-drains to the same terminal state
    crawled.run()
    after = {
        r["url"]: (r["status"], r["content_hash"])
        for r in crawled.frontier().collect()
    }
    assert after == before


def test_reset_processed_subset(crawled):
    target = "http://host0.test/p/0"
    crawled.reset_processed([target])
    rows = {r["url"]: r["status"] for r in crawled.frontier().collect()}
    assert rows[target] == "pending"
    assert sum(1 for s in rows.values() if s == "pending") == 1


def test_mark_processed_with_and_without_error(crawled):
    t1, t2 = "http://host0.test/p/0", "http://host1.test/p/0"
    crawled.reset_processed([t1, t2])
    crawled.mark_processed([t1])
    crawled.mark_processed([t2], error_message="manual skip")
    rows = {r["url"]: r for r in crawled.frontier().collect()}
    assert rows[t1]["status"] == "done" and rows[t1]["error_message"] is None
    assert rows[t2]["status"] == "error" and rows[t2]["error_message"] == "manual skip"


def test_mark_all_processed_preserves_error_taxonomy(crawled):
    crawled.reset_processed()
    crawled.mark_all_processed()
    rows = crawled.frontier().collect()
    assert all(r["status"] != "pending" for r in rows)
    for r in rows:
        if r["error_message"]:
            assert r["status"] in ("error", "blocked")
        else:
            assert r["status"] == "done"


def test_update_and_clear_error_messages(crawled):
    url = "http://host0.test/p/0"
    crawled.update_error_message(url, "flagged for review")
    assert (url, "flagged for review") in crawled.error_messages()
    crawled.clear_errors()
    assert crawled.error_messages() == []


def test_update_content_restamps_hash(crawled):
    url = "http://host0.test/p/0"
    crawled.update_content(url, "<html>replaced</html>")
    expected = hashlib.sha256(b"<html>replaced</html>").hexdigest()
    assert crawled.page(url)["content_hash"] == expected


def test_delete_by_url_removes_and_allows_rediscovery(crawled):
    url = "http://host0.test/p/0/1"  # a discovered child page
    assert crawled.page(url) is not None
    n_before = len(crawled.all_urls())
    crawled.delete_by_url([url])
    assert crawled.page(url) is None
    assert len(crawled.all_urls()) == n_before - 1
    # seen-set removal: the url is re-discoverable (exists_in_db now false)
    cand = crawled.spark.createDataFrame([(url,)], "url string")
    assert crawled.seen.filter_new(cand).count() == 1
    # re-crawling the parent re-discovers and re-processes it with a fresh seq
    crawled.reset_processed(["http://host0.test/p/0"])
    crawled.run()
    row = crawled.page(url)
    assert row is not None and row["status"] == "done"
    max_seq = crawled.frontier().agg(F.max("seq")).collect()[0][0]
    assert row["seq"] == max_seq  # new AUTO_INCREMENT-equivalent id


def test_truncate_empties_everything(crawled):
    crawled.truncate()
    assert crawled.all_urls() == []
    assert crawled.statistics()["total"] == 0
    cand = crawled.spark.createDataFrame([("http://host0.test/p/0",)], "url string")
    assert crawled.seen.filter_new(cand).count() == 1
    # a fresh seed + crawl over the same store works
    crawled.seed(seed_urls(1))
    crawled.run()
    assert crawled.status_counts().get("pending", 0) == 0
    assert crawled.statistics()["total"] > 1


def test_read_surface(crawled):
    urls = crawled.all_urls()
    assert len(urls) == len(set(urls)) > 10
    row = crawled.page("http://host0.test/p/0")
    assert row["status"] == "done" and row["seq"] is not None
    assert crawled.page_by_seq(row["seq"])["url"] == row["url"]
    assert crawled.page("http://missing.test/") is None
    processed = set(crawled.processed_urls())
    unprocessed = set(crawled.unprocessed_urls())
    assert processed | unprocessed == set(urls)
    assert not (processed & unprocessed)
    errs = dict(crawled.error_messages())
    assert errs["http://nowhere.test/p/0"] == "404 Not Found"


def _three_rows(spark):
    return spark.range(3).selectExpr("concat('u', id) as url", "'pending' as status")


def test_prune_keeps_externally_referenced_snapshots(spark, tmp_path):
    """prune() must not delete snapshot files another table's ref chain
    still points at (the seen set's zero-copy frontier refs): the entry and
    its files survive until the ref is compacted away."""
    import os

    store = SnapshotStore(spark, str(tmp_path / "store_prune"))
    df = _three_rows(spark)
    store.write("t", df)  # snap 0
    store.write("t", df)  # snap 1  <- referenced by 'seen'
    snap1 = store.lineage("t")[1]
    store.write_ref("seen", snap1["path"], 3, meta={"round": 0})
    store.write("t", df)  # snap 2
    store.write("t", df)  # snap 3 (current)
    store.prune("t", keep_last=1)
    ids = [s["id"] for s in store.lineage("t")]
    assert 1 in ids and 3 in ids, "referenced + current snapshots survive"
    assert 0 not in ids and 2 not in ids, "unreferenced history is pruned"
    assert os.path.exists(store.abspath(snap1["path"]))
    assert store.read("seen").count() == 3  # the ref chain still resolves


def test_orphan_cut_keeps_externally_referenced_snapshots(spark, tmp_path):
    """A write after rollback cuts the orphaned forward chain, but files a
    ref in another table names must survive the cut."""
    import os

    store = SnapshotStore(spark, str(tmp_path / "store_cut"))
    df = _three_rows(spark)
    store.write("t", df)  # snap 0
    store.write("t", df)  # snap 1
    snap1 = store.lineage("t")[1]
    store.write_ref("seen", snap1["path"], 3, meta={"round": 0})
    store.rollback("t", 0)
    store.write("t", df)  # cuts orphan snap 1
    assert [s["id"] for s in store.lineage("t")] == [0, 2]
    assert os.path.exists(store.abspath(snap1["path"]))
    assert store.read("seen").count() == 3


def test_orphan_cut_detached_files_reclaimed_after_ref_release(spark, tmp_path):
    """A cut orphan kept alive only by a ref is parked on the manifest's
    detached list; once the last ref is pruned away, the next prune reclaims
    the directory (no permanent leak)."""
    import os

    store = SnapshotStore(spark, str(tmp_path / "store_gc"))
    df = _three_rows(spark)
    store.write("t", df)  # snap 0
    store.write("t", df)  # snap 1
    snap1 = store.lineage("t")[1]
    store.write_ref("seen", snap1["path"], 3, meta={"round": 0})
    store.rollback("t", 0)
    store.write("t", df)  # cuts orphan snap 1 -> detached (ref still live)
    assert snap1["path"] in store._load().get("detached", [])
    assert os.path.exists(store.abspath(snap1["path"]))
    store.write("seen", df)  # new base supersedes the ref
    store.prune("seen", keep_last=1)  # drops the ref entry
    store.prune("t", keep_last=5)  # gc pass: nothing references snap 1 now
    assert not os.path.exists(store.abspath(snap1["path"]))
    assert store._load().get("detached") == []


def test_resume_repair_does_not_resurrect_removed_urls(spark, tmp_path):
    """seen.remove() writes a marker-less base; the resume repair must not
    mistake it for a crashed round commit and re-register the last round's
    ref (which would silently resurrect the removed URL)."""
    from scrape_spark.session import local_df

    pages = generate_pages(spark, 2, 8, 3, mega_host=None)
    robots = robots_source_df(spark, 2, mega_host=None)
    store_path = str(tmp_path / "store_rm")
    job = CrawlJob(
        spark, SnapshotStore(spark, store_path), pages, robots,
        round_seconds=60, n_buckets=4,
    )
    job.seed(seed_urls(2))
    job.run_round()  # frontier head = the round-1 delta
    f = job.store.current_snapshot("frontier")
    assert f["meta"]["event"] == "round" and f["meta"].get("delta")
    url = (
        spark.read.parquet(job.store.abspath(f["path"]))
        .where("status = 'pending'")
        .limit(1)
        .collect()[0]["url"]
    )
    job.seen.remove([url])
    fresh = CrawlJob(
        spark, SnapshotStore(spark, store_path), pages, robots,
        round_seconds=60, n_buckets=4,
    )
    fresh._reconcile_seen_refs()
    stays_new = fresh.seen.filter_new(
        local_df(spark, [(url,)], "url string")
    )
    assert stays_new.count() == 1, "removed URL must stay re-discoverable"


def test_resume_repair_no_resurrect_after_seen_prune(spark, tmp_path):
    """prune('seen') drops old ref entries — markers and all. The repair
    must still not re-register the last round's ref (wall-time evidence: the
    remove() base is newer than the frontier head, so the pair completed)."""
    from scrape_spark.session import local_df

    pages = generate_pages(spark, 2, 8, 3, mega_host=None)
    robots = robots_source_df(spark, 2, mega_host=None)
    store_path = str(tmp_path / "store_prune_rm")
    job = CrawlJob(
        spark, SnapshotStore(spark, store_path), pages, robots,
        round_seconds=60, n_buckets=4,
    )
    job.seed(seed_urls(2))
    job.run_round()
    f = job.store.current_snapshot("frontier")
    url = (
        spark.read.parquet(job.store.abspath(f["path"]))
        .where("status = 'pending'")
        .limit(1)
        .collect()[0]["url"]
    )
    job.seen.remove([url])
    job.store.prune("seen", keep_last=1)  # erases the round markers
    fresh = CrawlJob(
        spark, SnapshotStore(spark, store_path), pages, robots,
        round_seconds=60, n_buckets=4,
    )
    fresh._reconcile_seen_refs()
    assert (
        fresh.seen.filter_new(local_df(spark, [(url,)], "url string")).count()
        == 1
    ), "removed URL must stay re-discoverable after prune"


def _fresh_job(spark, job, pages):
    """A new CrawlJob over the same on-disk store — the resume process."""
    return CrawlJob(
        spark,
        SnapshotStore(spark, job.store.root),
        pages,
        robots_source_df(spark, N_HOSTS, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
    )


def test_delete_crash_window_repaired_on_resume(spark, base_state, crawled, monkeypatch):
    """delete_by_url is a two-step pair (frontier base rewrite, seen.remove).
    A crash between the steps must be repaired on resume — otherwise the URL
    stays in the seen set and is anti-joined away forever on re-discovery."""
    _, pages = base_state
    url = "http://host0.test/p/0/1"
    assert crawled.page(url) is not None

    def _boom(*a, **k):
        raise RuntimeError("crash between frontier write and seen.remove")

    monkeypatch.setattr(crawled.seen, "remove", _boom)
    with pytest.raises(RuntimeError):
        crawled.delete_by_url([url])
    # crashed state: gone from the frontier, still in the seen set
    assert crawled.page(url) is None
    cand = spark.createDataFrame([(url,)], "url string")
    assert crawled.seen.filter_new(cand).count() == 0

    fresh = _fresh_job(spark, crawled, pages)
    fresh._ensure_reconciled()
    assert fresh.seen.filter_new(cand).count() == 1, (
        "resume repair must replay the seen removal"
    )
    # and the repair is sticky: another resume does not write again
    n_snaps = len(fresh.store.lineage(fresh.seen.name))
    again = _fresh_job(spark, fresh, pages)
    again._ensure_reconciled()
    assert len(again.store.lineage(again.seen.name)) == n_snaps


def test_delete_completed_pair_not_replayed(spark, base_state, crawled):
    """A COMPLETED delete pair must not be replayed on resume (the marker /
    commit-order evidence vouches for it) — no extra seen snapshot."""
    _, pages = base_state
    crawled.delete_by_url(["http://host0.test/p/0/1"])
    n_snaps = len(crawled.store.lineage(crawled.seen.name))
    fresh = _fresh_job(spark, crawled, pages)
    fresh._ensure_reconciled()
    assert len(fresh.store.lineage(fresh.seen.name)) == n_snaps


def test_truncate_crash_window_repaired_on_resume(spark, base_state, crawled, monkeypatch):
    """truncate() is the same two-step pair (empty frontier base, seen
    truncate). Stale seen keys surviving a crashed truncate would suppress
    the entire next crawl after a re-seed."""
    _, pages = base_state
    seed = "http://host0.test/p/0"

    def _boom(*a, **k):
        raise RuntimeError("crash between frontier write and seen.truncate")

    monkeypatch.setattr(crawled.seen, "truncate", _boom)
    with pytest.raises(RuntimeError):
        crawled.truncate()
    cand = spark.createDataFrame([(seed,)], "url string")
    assert crawled.all_urls() == []
    assert crawled.seen.filter_new(cand).count() == 0  # stale seen keys

    fresh = _fresh_job(spark, crawled, pages)
    fresh._ensure_reconciled()
    assert fresh.seen.filter_new(cand).count() == 1, (
        "resume repair must replay the seen truncate"
    )
    # the full post-repair lifecycle works: re-seed and crawl the host again
    fresh.seed(seed_urls(1))
    fresh.run()
    assert fresh.status_counts().get("pending", 0) == 0
    assert fresh.statistics()["total"] > 1


# ---------------------------------------------------------------------------
# reset_due: freshness-driven re-crawl enqueue (change_estimate x frontier)
# ---------------------------------------------------------------------------


def _forge_caps(spark, specs):
    """Capture rows (url, warc_ts, text) from {url: [(ts, text), ...]}."""
    rows = [(u, ts, tx) for u, caps in specs.items() for ts, tx in caps]
    return spark.createDataFrame(rows, "url string, warc_ts long, text string")


def test_reset_due_repends_only_due_and_done(spark, crawled):
    done = sorted(
        r["url"]
        for r in crawled.frontier().where(F.col("status") == "done").collect()
    )
    assert len(done) >= 4
    churner, stable = done[0], done[1]
    now = 1_000_350
    caps = _forge_caps(
        spark,
        {
            # changed every capture, 100 s apart: next_due 1_000_300 -> due
            churner: [(1_000_000 + 100 * i, f"v{i}") for i in range(3)],
            # never changed: doubling backoff puts next_due at 1_000_400
            stable: [(1_000_000 + 100 * i, "same") for i in range(3)],
        },
    )
    n = crawled.reset_due(caps, now=now)
    assert n == 1
    status = {
        r["url"]: r["status"] for r in crawled.frontier().collect()
    }
    assert status[churner] == "pending"
    assert status[stable] == "done"
    # everything else untouched
    assert sum(1 for s in status.values() if s == "pending") == 1


def test_reset_due_ignores_urls_outside_frontier_and_is_rerunnable(
    spark, crawled
):
    now = 1_000_400
    caps = _forge_caps(
        spark,
        {"http://never-crawled.test/x": [(1_000_000, "a"), (1_000_100, "b")]},
    )
    assert crawled.reset_due(caps, now=now) == 0  # no frontier row -> no-op

    done = [
        r["url"]
        for r in crawled.frontier().where(F.col("status") == "done").collect()
    ]
    caps2 = _forge_caps(
        spark, {done[0]: [(1_000_000, "a"), (1_000_100, "b")]}
    )
    assert crawled.reset_due(caps2, now=now) == 1
    # second call: the row is now pending, not done -> not re-pended again
    assert crawled.reset_due(caps2, now=now) == 0


def test_reset_due_then_run_recrawls_and_drains(spark, crawled):
    done = [
        r["url"]
        for r in crawled.frontier().where(F.col("status") == "done").collect()
    ]
    caps = _forge_caps(
        spark, {done[0]: [(1_000_000, "a"), (1_000_100, "b")]}
    )
    assert crawled.reset_due(caps, now=1_000_400) == 1
    crawled.run()
    status = {r["url"]: r["status"] for r in crawled.frontier().collect()}
    assert status[done[0]] == "done"
    assert "pending" not in status.values()
