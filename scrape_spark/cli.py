"""CLI entry point — the reference's ``python scraper.py`` surface (S10).

Mirrors scraper.py:210-267 argument-for-argument
(``--url --referrer --method --payload --user-agent --reset``) on top of the
distributed engine: ``--url`` seeds one (url, method, payload) row (with
``--reset`` first re-pending every record, models.py:195-204), then the drive
loop crawls the store's frontier to drain; before/after counts print in the
reference's format. ``spark-submit --py-files scrape_spark.zip -m``-style
launch or ``python -m scrape_spark.cli``.

Engine-specific arguments (no reference equivalent): ``--store`` (SnapshotStore
root — the MySQL database stand-in), ``--pages`` (parquet path of the page
lake), ``--robots`` (parquet path of the (host, robots_txt) fixture; optional).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Web scraping tool with robots.txt compliance "
        "(PySpark engine; reference scraper.py CLI parity)"
    )
    p.add_argument(
        "--user-agent",
        default="MyScraperBot",
        help="User agent string to use for requests",
    )
    p.add_argument("--url", help="Target URL to scrape")
    p.add_argument("--referrer", help="Referrer URL")
    p.add_argument(
        "--method", choices=["GET", "POST"], default="GET", help="HTTP method to use"
    )
    p.add_argument("--payload", type=str, help="POST payload as JSON string")
    p.add_argument(
        "--reset",
        action="store_true",
        help="reset every record to unprocessed before running "
        "(reference reset_all_processed)",
    )
    p.add_argument("--store", required=True, help="SnapshotStore root directory")
    p.add_argument("--pages", required=True, help="pages table parquet path")
    p.add_argument("--robots", help="(host, robots_txt) parquet path")
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--master", default=None, help="Spark master override")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    """Parse args and run; ``spark`` may be injected (tests) — an injected
    session is left running, an own session is stopped on exit."""
    args = build_parser().parse_args(argv)

    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.session import empty_df, get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark("scrape-spark-cli", master=args.master)
    pages = spark.read.parquet(args.pages)
    robots_source = (
        spark.read.parquet(args.robots)
        if args.robots
        else empty_df(spark, "host string, robots_txt string")
    )
    job = CrawlJob(
        spark,
        SnapshotStore(spark, args.store),
        pages,
        robots_source,
        user_agent=args.user_agent,
    )
    print(f"Starting scraper with User-Agent: {args.user_agent}")

    if args.reset:
        if job.store.exists("frontier"):
            job.reset_processed()
        print("reset: all records marked unprocessed")

    counts = job.status_counts() if job.store.exists("frontier") else {}
    pending = counts.get("pending", 0)
    processed_before = sum(v for k, v in counts.items() if k != "pending")
    print(f"unprocessed: {pending}, processed: {processed_before}")

    if args.url:
        # seed the explicit row (idempotent if already present: the seen set
        # anti-joins it away on an existing store)
        if not job.store.exists("frontier"):
            job.seed([(args.url, args.method, args.payload, args.referrer)])
        else:
            from scrape_spark.session import local_df

            # repair any crash-split two-step commit BEFORE the seen check:
            # a prior run that died between its frontier write and seen
            # registration would otherwise fail filter_new here and append
            # the same URL a second time
            job._reconcile_seen_refs()
            job._seen_reconciled = True

            extra = job.seen.filter_new(
                local_df(spark, [(args.url,)], "url string")
            )
            if extra.count():
                # append as a pending delta row with the next seq
                from pyspark.sql import functions as F

                from scrape_spark.plans.crawl import FRONTIER_COLS
                from scrape_spark.operators.ordering import assign_global_seq

                meta = job._meta()
                next_seq = job._next_seq(meta)
                row = local_df(
                    spark,
                    [(args.url, args.method.upper(), args.payload, args.referrer)],
                    "url string, method string, payload string, referrer string",
                )
                from scrape_spark.functions.urls import url_hash, url_host, url_path

                new = row.select(
                    "url",
                    url_hash("url").alias("url_hash"),
                    url_host("url").alias("host"),
                    url_path("url").alias("path"),
                    "referrer",
                    F.lit(None).cast("string").alias("title"),
                    F.lit(0).alias("depth"),
                    F.lit(-1).cast("long").alias("parent_seq"),
                    F.lit(0).alias("link_pos"),
                    F.lit(next_seq).cast("long").alias("seq"),
                    "method",
                    "payload",
                    F.lit("pending").alias("status"),
                    F.lit(None).cast("string").alias("error_message"),
                    F.lit(None).cast("int").alias("status_code"),
                    F.lit(None).cast("string").alias("content_hash"),
                    F.lit(None).cast("string").alias("page_title"),
                    F.lit(None).cast("string").alias("text_sha"),
                    F.lit(None).cast("boolean").alias("text_match"),
                    F.lit(None).cast("timestamp").alias("fetch_slot"),
                    F.lit(None).cast("int").alias("round"),
                )
                m = dict(job._carry_meta("cli_seed"))
                m["next_seq"] = next_seq + 1
                sid = job.store.write(
                    "frontier", new.select(*FRONTIER_COLS), meta=m
                )
                # second half of the two-step commit: register the row's url
                # as a seen key via a zero-copy ref to the delta just written
                # (its single row is pending, so _read_part picks it up).
                # src_snap ties the seen delta to the frontier snapshot so a
                # crash between the two steps is repairable on resume
                # (_reconcile_seen_refs), like the seed()/round pairs.
                snap = job.store.current_snapshot("frontier")
                job.seen.add_ref(
                    snap["path"],
                    n_rows=1,
                    meta={"round": -1, "src_snap": sid},
                )

    job.run(max_rounds=args.max_rounds)

    counts = job.status_counts()
    pending_after = counts.get("pending", 0)
    processed_after = sum(v for k, v in counts.items() if k != "pending")
    print(f"processed this run: {processed_after - processed_before}")
    print(f"unprocessed: {pending_after}, processed: {processed_after}")
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
