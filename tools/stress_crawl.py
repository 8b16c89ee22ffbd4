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


def live_phase(args) -> int:
    """Live-HTTP variant (``--live``): the SAME webgraph topology served by
    a threaded local http.server on loopback virtual hosts, crawled by the
    real HttpFetcher (per-host streaming output, live robots.txt probe —
    the r5 live-path machinery) vs the simulated fetch join on the same
    corpus — final frontier state must be byte-identical. This is the e2e
    suite's invariant at ~25× its corpus size, with a crawl-delay +
    disallow robots body served LIVE (no pre-seeded rules)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F  # noqa: F401 (parity imports)

    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.httpfetch import HttpFetcher
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.session import get_spark, local_df
    from scrape_spark.sources.webgraph import host_sizes, page_html

    n_hosts, per_host, k = args.hosts, args.pages, args.k
    sizes = host_sizes(n_hosts, per_host, 1, 4)
    failures = 0

    def emit(name: str, ok: bool, **kw) -> None:
        nonlocal failures
        failures += 0 if ok else 1
        print(json.dumps({name: {"ok": ok, **kw}}), flush=True)

    robots_body = "User-agent: *\nDisallow: /p/0/1\nCrawl-delay: 2"

    class H(BaseHTTPRequestHandler):
        routes: dict[tuple[str, str], bytes] = {}

        def do_GET(self):  # noqa: N802
            if self.path == "/robots.txt":
                body = robots_body.encode()
            else:
                body = H.routes.get(
                    (self.headers.get("Host", ""), self.path)
                )
            if body is None:
                self.send_error(404, "Not Found")
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    srv = ThreadingHTTPServer(("0.0.0.0", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]

    def live_host(i: int) -> str:
        return f"127.0.0.{i + 2}:{port}"

    rows = []
    for hi, size in enumerate(sizes):
        h = live_host(hi)
        for node in range(size):
            url, html = page_html(h, node, k, size)
            path = url.split(h, 1)[1]
            H.routes[(h, path)] = html.encode()
            rows.append((url, html, f"text-of {url}"))
    total = len(rows)
    seeds = [f"http://{live_host(i)}/p/0" for i in range(n_hosts)]

    spark = get_spark(
        master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = local_df(
        spark, rows, "url string, html string, text string"
    ).persist()
    pages.count()

    t0 = time.time()
    live = CrawlJob(
        spark,
        SnapshotStore(spark, tempfile.mkdtemp(prefix="stress_live_")),
        pages,  # parallel-truth capture (src_text for text_match)
        None,  # robots_source=None -> LIVE robots probe
        fetcher=HttpFetcher(timeout=10.0),
        robots_scheme="http",
    )
    live.seed(seeds)
    lmet = live.run(max_rounds=200)
    live_sec = time.time() - t0
    emit(
        "live_run",
        live.status_counts().get("pending", 0) == 0,
        pages=total,
        rounds=len(lmet),
        sec=round(live_sec, 1),
        urls_per_sec=round(total / live_sec, 1),
    )

    t0 = time.time()
    sim_source = local_df(
        spark,
        [(live_host(i).split(":")[0], robots_body) for i in range(n_hosts)],
        "host string, robots_txt string",
    )
    sim = CrawlJob(
        spark,
        SnapshotStore(spark, tempfile.mkdtemp(prefix="stress_sim_")),
        pages,
        sim_source,
    )
    sim.seed(seeds)
    smet = sim.run(max_rounds=200)
    sim_sec = time.time() - t0

    from scrape_spark.plans.crawl import FRONTIER_COLS

    def state(job):
        cols = list(FRONTIER_COLS)
        return {
            r["url"]: tuple(r[c] for c in cols if c != "url")
            for r in job.frontier().select(*cols).collect()
        }

    ls, ss = state(live), state(sim)
    diff = sum(1 for u in set(ls) | set(ss) if ls.get(u) != ss.get(u))
    n_blocked = sum(1 for v in ls.values() if "blocked" in v)
    emit(
        "live_state_byte_identical",
        diff == 0 and set(ls) == set(ss),
        rows=len(ls),
        mismatches=diff,
        blocked_rows=n_blocked,
        sim_rounds=len(smet),
        sim_sec=round(sim_sec, 1),
    )
    spark.stop()
    srv.shutdown()
    print(f"checks_failed={failures}", flush=True)
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=50)
    ap.add_argument("--pages", type=int, default=1000)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--live",
        action="store_true",
        help="live-HTTP phase: real HttpFetcher + live robots vs simulated",
    )
    args = ap.parse_args()
    if args.live:
        return live_phase(args)

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
