"""Profile the bench's crawl_6rounds job: per-round walls + per-phase timers.

Usage: python tools/profile_crawl.py [--hosts 12] [--pph 600] [--rounds 6]

Prints per-round metrics (round_wall_sec from the job) plus a coarse phase
breakdown instrumented by monkeypatching the store write / seen add calls.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=12)
    ap.add_argument("--pph", type=int, default=600)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from bench import _gen_pages, _spark
    from scrape_spark.plans import crawl as crawl_mod
    from scrape_spark.plans import statestore as ss_mod
    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.webgraph import robots_source_df, seed_urls

    spark = _spark(f"local[{args.cpus}]", args.cpus)
    work = tempfile.mkdtemp(prefix="profile_crawl_")

    phase: dict[str, float] = {}
    calls: dict[str, int] = {}

    def timed(obj, name: str, label: str):
        orig = getattr(obj, name)

        def wrap(*a, **k):
            t0 = time.time()
            try:
                return orig(*a, **k)
            finally:
                phase[label] = phase.get(label, 0.0) + (time.time() - t0)
                calls[label] = calls.get(label, 0) + 1

        setattr(obj, name, wrap)

    timed(ss_mod.SnapshotStore, "write", "store.write")
    timed(ss_mod, "_parquet_rows", "footer_count")
    from scrape_spark.operators import seen as seen_mod

    timed(seen_mod.SeenSet, "add", "seen.add")
    timed(seen_mod.SeenSet, "filter_new", "seen.filter_new(lazy)")
    timed(crawl_mod.CrawlJob, "_robots_for_round", "robots_check")
    timed(crawl_mod.CrawlJob, "_round_delta", "round_delta(lazy)")
    from scrape_spark.operators import ordering as ord_mod

    timed(ord_mod, "assign_global_seq", "assign_seq(lazy)")

    try:
        pages = _gen_pages(spark, work, args.hosts, args.pph, filler=4)
        pages.count()  # materialize fixture outside the timed region
        store_dir = tempfile.mkdtemp(prefix="crawl_store_", dir=work)
        job = CrawlJob(
            spark,
            SnapshotStore(spark, store_dir),
            pages,
            robots_source_df(spark, args.hosts),
            round_seconds=3600,
            n_buckets=16,
        )
        t0 = time.time()
        ts = time.time()
        job.seed(seed_urls(args.hosts))
        seed_wall = time.time() - ts
        metrics = job.run(max_rounds=args.rounds)
        wall = time.time() - t0
        print(f"TOTAL {wall:.2f}s  (seed {seed_wall:.2f}s)")
        for m in metrics:
            print(
                f"  round {m['round']}: {m['round_wall_sec']:.2f}s  "
                f"sched={m['scheduled']} new={m['new_urls']} pending={m['pending']}"
            )
        print("\nphase totals (s):")
        for k in sorted(phase, key=lambda k: -phase[k]):
            print(f"  {k:24s} {phase[k]:7.2f}  x{calls[k]}")
        print(json.dumps({"total": round(wall, 2), "seed": round(seed_wall, 2)}))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
