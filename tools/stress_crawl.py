"""sf1-scale stress for the CRAWL LOOP itself (r5, verdict r4 item 4).

The r4 stress sweep covered the dedup/sketch family at sf0.3/sf1; the crawl
loop (CrawlJob rounds: robots gate, politeness dequeue, bucketed fetch
join, fused parse, seen-set bloom anti-join, delta MERGE) had never run
above the ~200-page equivalence fixture or the 7.2k-page bench. This
harness scales the SAME deterministic webgraph fixture to tens of
thousands of pages, drives the real CrawlJob for the >=20 rounds that the
crawl-delay host forces, and verifies the FINAL STATE hash-exact against
the in-memory reference oracle (scrape_spark.oracle.pyref
ReferenceCrawler — the models.py/scraper.py twin the equivalence suite
pins):

- seen set equality (every discovered URL, no phantoms),
- per-url (status, error_message, content_hash, title, referrer, depth,
  link_pos) equality — one combined dict compare,
- canonical order == oracle insertion (AUTO_INCREMENT) order,
- text_match invariant (byte-identical extracted text) over done rows,
- >=20 committed rounds with no driver/lineage blowup (the r4 trap:
  iterative plans accreting analysis state — the round loop must stay
  O(round) not O(crawl)).

Usage: python tools/stress_crawl.py [--hosts 50] [--pages 1000]
Prints one JSON line per check; exit 0 iff all green.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=50)
    ap.add_argument("--pages", type=int, default=1000)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scrape_spark.oracle.pyref import ReferenceCrawler
    from scrape_spark.plans.crawl import CrawlJob, canonical_order
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.session import get_spark
    from scrape_spark.sources.webgraph import (
        generate_pages,
        host_sizes,
        page_html,
        robots_txt_fixture,
        robots_source_df,
        seed_urls,
    )

    n_hosts, per_host, k = args.hosts, args.pages, args.k
    mega, mega_factor = 1, 4
    sizes = host_sizes(n_hosts, per_host, mega, mega_factor)
    total = sum(sizes)
    failures = 0

    def emit(name: str, ok: bool, **kw) -> None:
        nonlocal failures
        failures += 0 if ok else 1
        print(json.dumps({name: {"ok": ok, **kw}}), flush=True)

    # -- oracle (driver-side, exact) ----------------------------------------
    t0 = time.time()
    local_pages = {}
    for hi, size in enumerate(sizes):
        for node in range(size):
            url, html = page_html(f"host{hi}.test", node, k, size)
            local_pages[url] = html
    crawler = ReferenceCrawler(
        pages=local_pages, robots_txt=dict(robots_txt_fixture(n_hosts, mega))
    )
    crawler.seed(seed_urls(n_hosts))
    crawler.run()
    oracle_sec = time.time() - t0
    orows = crawler.rows()
    emit(
        "oracle_run",
        True,
        pages=total,
        crawled=len(orows),
        sec=round(oracle_sec, 1),
    )

    # -- engine -------------------------------------------------------------
    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    pages = generate_pages(
        spark, n_hosts, per_host, k, mega, mega_factor
    ).persist()
    pages.count()
    gen_sec = time.time() - t0

    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="stress_crawl_"))
    job = CrawlJob(
        spark,
        store,
        pages,
        robots_source_df(spark, n_hosts, mega),
        round_seconds=60,  # delay-2 host → quota 30/round → >=20 rounds
    )
    t0 = time.time()
    job.seed(seed_urls(n_hosts))
    metrics = job.run(max_rounds=500)
    crawl_sec = time.time() - t0
    n_rounds = len(metrics)
    emit(
        "engine_run",
        job.status_counts().get("pending", 0) == 0 and n_rounds >= 20,
        rounds=n_rounds,
        gen_sec=round(gen_sec, 1),
        crawl_sec=round(crawl_sec, 1),
        urls_per_sec=round(len(orows) / crawl_sec, 1),
    )

    # -- hash-exact final state --------------------------------------------
    t0 = time.time()
    eng = {
        r["url"]: (
            r["status"],
            r["error_message"],
            r["content_hash"],
            r["title"],
            r["referrer"],
            r["depth"],
            r["link_pos"],
        )
        for r in job.frontier()
        .select(
            "url", "status", "error_message", "content_hash", "title",
            "referrer", "depth", "link_pos",
        )
        .collect()
    }
    emit(
        "seen_set",
        set(eng) == crawler.seen_set(),
        engine=len(eng),
        oracle=len(crawler.seen_set()),
    )
    bad = 0
    first = None
    for row in orows:
        if row.error_message == "Blocked by robots.txt":
            st, err = "blocked", "Blocked by robots.txt"
        elif row.error_message:
            st, err = "error", row.error_message
        else:
            st, err = "done", None
        want = (
            st, err, row.hash, row.title,
            None if row.depth == 0 else row.referrer,
            row.depth,
            row.link_pos,
        )
        got = eng.get(row.url)
        if got is None or got[:2] != want[:2] or (
            row.hash and got[2] != row.hash
        ) or got[3] != row.title or (
            row.depth > 0 and got[4:] != want[4:]
        ):
            bad += 1
            if first is None:
                first = (row.url, got, want)
    emit(
        "row_state_exact",
        bad == 0,
        rows=len(orows),
        mismatches=bad,
        first=repr(first) if first else None,
        sec=round(time.time() - t0, 1),
    )

    done = job.frontier().where(F.col("status") == "done")
    n_done = done.count()
    n_match = done.where(F.col("text_match")).count()
    emit("text_byte_identical", n_done == n_match, done=n_done, matched=n_match)

    t0 = time.time()
    engine_order = [
        r["url"]
        for r in canonical_order(job.frontier()).orderBy("canon_seq").collect()
    ]
    oracle_order = [r.url for r in sorted(orows, key=lambda r: r.id)]
    emit(
        "canonical_order",
        engine_order == oracle_order,
        n=len(engine_order),
        sec=round(time.time() - t0, 1),
    )

    # -- conditional re-crawl (304 path) at the same scale -------------------
    # every page unchanged → every done row must take the 304 path: no
    # parse, no link re-expansion, validator columns preserved, zero new
    # URLs across the whole re-sweep.
    before = {
        r["url"]: (
            r["status"], r["content_hash"], r["page_title"],
            r["text_sha"], r["text_match"],
        )
        for r in job.frontier()
        .select(
            "url", "status", "content_hash", "page_title", "text_sha",
            "text_match",
        )
        .collect()
    }
    cjob = CrawlJob(
        spark,
        store,
        pages,
        robots_source_df(spark, n_hosts, mega),
        round_seconds=60,
        conditional_fetch=True,
    )
    t0 = time.time()
    cjob.reset_processed()
    cmetrics = cjob.run(max_rounds=500)
    recrawl_sec = time.time() - t0
    after = {
        r["url"]: (
            r["status"], r["status_code"], r["content_hash"],
            r["page_title"], r["text_sha"], r["text_match"],
        )
        for r in cjob.frontier()
        .select(
            "url", "status", "status_code", "content_hash", "page_title",
            "text_sha", "text_match",
        )
        .collect()
    }
    n304 = bad = 0
    for url, b in before.items():
        a = after.get(url)
        if a is None:
            bad += 1
            continue
        if b[0] == "done":
            if a[0] != "done" or a[1] != 304 or a[2:] != b[1:]:
                bad += 1
            else:
                n304 += 1
    new_urls = sum(m.get("new_urls", 0) for m in cmetrics)
    observed_304 = sum(m.get("not_modified", 0) for m in cmetrics)
    emit(
        "conditional_recrawl_304",
        bad == 0
        and set(after) == set(before)
        and new_urls == 0
        and observed_304 == n304,
        n304=n304,
        mismatches=bad,
        new_urls=new_urls,
        rounds=len(cmetrics),
        sec=round(recrawl_sec, 1),
    )
    spark.stop()
    print(f"checks_failed={failures}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
