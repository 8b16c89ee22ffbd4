"""spark-submit entrypoint — the north rule's deployment shape.

Usage (two cluster sizes on a real cluster; local[N] here):

    python tools/make_pyfiles.py   # -> /tmp/scrape_spark.zip
    spark-submit --master local[8]  --py-files /tmp/scrape_spark.zip \
        tools/submit_job.py --rounds 4
    spark-submit --master local[32] --py-files /tmp/scrape_spark.zip \
        tools/submit_job.py --rounds 4

The script imports scrape_spark ONLY from the shipped zip (it refuses a repo
sys.path fallback), drives a full crawl, and prints one JSON line with the
final status counts — proving the engine runs under the spark-submit
--py-files contract rather than a driver-local checkout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=6)
    ap.add_argument("--pph", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    # spark-submit puts --py-files archives on sys.path of the driver AND
    # executors; make sure that's where the package comes from.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path = [p for p in sys.path if os.path.abspath(p or ".") != repo]

    import scrape_spark  # noqa: F401  (must resolve from the shipped zip)

    src = getattr(scrape_spark, "__file__", "") or ""
    if not (".zip" in src or "spark" in src.lower() and repo not in src):
        if repo in src:
            raise SystemExit(f"scrape_spark resolved from the repo ({src}), "
                             "not the --py-files archive")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("scrape-spark-submit").getOrCreate()
    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.webgraph import (
        generate_pages,
        robots_source_df,
        seed_urls,
    )

    t0 = time.time()
    pages = generate_pages(spark, args.hosts, args.pph).persist()
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="submit_state_"))
    job = CrawlJob(spark, store, pages, robots_source_df(spark, args.hosts),
                   round_seconds=3600, n_buckets=8)
    job.seed(seed_urls(args.hosts))
    metrics = job.run(max_rounds=args.rounds)
    counts = job.status_counts()
    print(json.dumps({
        "pkg": src,
        "rounds": len(metrics),
        "status_counts": counts,
        "wall_sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
