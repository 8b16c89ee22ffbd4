"""Benchmark harness — headline queries + crawl throughput + scaling evidence.

Default mode (driver contract): runs the headline operator queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` plus the frontier-expansion throughput job, and
prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "throughput_urls_per_sec": ...}

``--scaling`` mode (BASELINE.md evidence protocol): runs the identical
fetch+extract job at local[8] and local[32] on the same input and reports
throughput at both plus scaling efficiency = (T_8 / T_32) / 4 — the sandbox
stand-in for the north_rule's N→4N-executor criterion (no real cluster here).
Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "frontier_topk_dequeue",
    "politeness_slots",
    "robots_gate",
    "seen_antijoin",
    "first_discovery_dedup",
    "crawl_order_seq",
    "dedup_exact",
    "minhash_neardup_pairs",
    "simhash_buckets",
    "token_stats",
    "ann_cosine_topk",
    "events_hourly",
]

METRIC = (
    "frontier URLs scheduled + pages extracted per second "
    "(CC-style pages, simulated fetch; headline operator queries timed in sec)"
)


def _spark(master: str, cpus: int):
    from scrape_spark.session import get_spark

    return get_spark(
        "scrape-spark-bench",
        master=master,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _gen_pages(spark, out_dir: str, n_hosts: int, pages_per_host: int, filler: int):
    """Materialize the synthetic CC-style pages table once (untimed setup)."""
    from scrape_spark.sources.webgraph import generate_pages

    path = os.path.join(out_dir, f"pages_{n_hosts}x{pages_per_host}_f{filler}")
    if not os.path.exists(path):
        generate_pages(
            spark,
            n_hosts=n_hosts,
            pages_per_host=pages_per_host,
            mega_host=1,
            mega_factor=4,
            filler_repeat=filler,
        ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def expand_round_bench(spark, pages, n_hosts: int) -> tuple[float, int]:
    """One full frontier-expansion pass over EVERY page (the scaling job).

    frontier = all URLs → robots gate → per-host top-k + fetch slots →
    fetch-join pages → fused parse UDF → link explode → first-discovery dedup
    → count. Returns (wall_sec, urls_processed = scheduled + links_extracted).
    """
    from pyspark.sql import functions as F

    from scrape_spark.functions.udfs import parse_page_expr
    from scrape_spark.functions.urls import url_host, url_path
    from scrape_spark.operators.ordering import first_discovery
    from scrape_spark.operators.politeness import (
        assign_fetch_slots,
        host_quota_expr,
        per_host_take,
    )
    from scrape_spark.operators.robots import join_robots, refresh_robots
    from scrape_spark.sources.webgraph import robots_source_df

    t0 = time.time()
    frontier = pages.select(
        "url",
        url_host("url").alias("host"),
        url_path("url").alias("path"),
        F.xxhash64("url").alias("seq"),
    )
    from scrape_spark.operators.robots import ROBOTS_SCHEMA

    empty_robots = pages.sparkSession.createDataFrame([], ROBOTS_SCHEMA)
    robots = refresh_robots(
        empty_robots,
        frontier.select("host"),
        robots_source_df(pages.sparkSession, n_hosts),
        "MyScraperBot",
    )
    gated = join_robots(frontier, robots, "MyScraperBot")
    allowed = gated.where(~F.col("robots_denied")).withColumn(
        "quota", host_quota_expr(F.col("crawl_delay"), 60, 10_000_000)
    )
    batch = per_host_take(allowed, "quota", order_cols=["seq"])
    batch = assign_fetch_slots(batch, F.timestamp_seconds(F.lit(1_748_736_000)))
    fetched = pages.join(batch.select("url", "fetch_slot"), on="url", how="inner")
    parsed = fetched.withColumn("parsed", parse_page_expr("html", "url"))
    edges = parsed.select(
        F.col("url").alias("referrer"),
        F.sha2("html", 256).alias("content_hash"),
        F.explode("parsed.links").alias("link"),
    ).select(
        F.col("link.url").alias("url"),
        F.col("link.link_pos").alias("link_pos"),
        "referrer",
    )
    fresh = first_discovery(edges, "url", ["referrer", "link_pos"], [])
    n_sched, n_links = batch.count(), fresh.count()
    wall = time.time() - t0
    return wall, n_sched + n_links


def crawl_bench(spark, work_dir: str, n_hosts: int, pages_per_host: int, rounds: int):
    """Iterative multi-round crawl from seeds (checkpointed state)."""
    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.webgraph import robots_source_df, seed_urls

    pages = _gen_pages(spark, work_dir, n_hosts, pages_per_host, filler=4)
    store_dir = tempfile.mkdtemp(prefix="bench_crawl_", dir=work_dir)
    job = CrawlJob(
        spark,
        SnapshotStore(spark, store_dir),
        pages,
        robots_source_df(spark, n_hosts),
        round_seconds=3600,
        n_buckets=16,
    )
    t0 = time.time()
    job.seed(seed_urls(n_hosts))
    metrics = job.run(max_rounds=rounds)
    wall = time.time() - t0
    processed = sum(m["scheduled"] for m in metrics)
    extracted = sum(m["fetched"] for m in metrics)
    shutil.rmtree(store_dir, ignore_errors=True)
    return wall, processed + extracted, metrics


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def default_bench() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = _spark(f"local[{cpus}]", cpus)
    work_dir = tempfile.mkdtemp(prefix="scrape_spark_bench_")
    try:
        queries = run_headline(spark, sf_dir)
        pages = _gen_pages(spark, work_dir, n_hosts=24, pages_per_host=1200, filler=6)
        expand_wall, expand_urls = expand_round_bench(spark, pages, 24)
        crawl_wall, crawl_urls, _ = crawl_bench(
            spark, work_dir, n_hosts=12, pages_per_host=600, rounds=6
        )
        queries["expand_round"] = round(expand_wall, 3)
        queries["crawl_6rounds"] = round(crawl_wall, 3)
        total = round(sum(queries.values()), 3)
        return {
            "metric": METRIC,
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "throughput_urls_per_sec": round(expand_urls / expand_wall, 1),
            "crawl_urls_per_sec": round(crawl_urls / crawl_wall, 1),
            "cpus": cpus,
        }
    finally:
        spark.stop()
        shutil.rmtree(work_dir, ignore_errors=True)


def scaling_bench(n_hosts: int = 24, pages_per_host: int = 2400, filler: int = 8):
    """Identical job at local[8] and local[32]; efficiency = (T8/T32)/4."""
    work_dir = tempfile.mkdtemp(prefix="scrape_spark_scale_")
    results = {}
    try:
        for cores in (8, 32):
            spark = _spark(f"local[{cores}]", cores)
            try:
                pages = _gen_pages(spark, work_dir, n_hosts, pages_per_host, filler)
                # warm-up pass (JIT, Arrow worker spin-up) at reduced size
                small = pages.limit(2000)
                expand_round_bench(spark, small, n_hosts)
                wall, urls = expand_round_bench(spark, pages, n_hosts)
                results[cores] = {
                    "wall_sec": round(wall, 2),
                    "urls": urls,
                    "urls_per_sec": round(urls / wall, 1),
                }
            finally:
                spark.stop()
        t8, t32 = results[8]["wall_sec"], results[32]["wall_sec"]
        eff = (t8 / t32) / 4
        results["scaling_efficiency_8_to_32"] = round(eff, 3)
        return results
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)


def write_scaling_md(results: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    r8, r32 = results[8], results[32]
    eff = results["scaling_efficiency_8_to_32"]
    md = f"""# BENCH/BASELINE.md — scaling evidence (sandbox protocol)

North rule criterion: fetch+extract throughput scaling efficiency >= 0.8 from
N to 4N executors. No real cluster exists in this sandbox, so per the driver
protocol the SAME job (full frontier-expansion pass: robots gate -> per-host
top-k + politeness slots -> fetch join -> fused parse UDF -> link explode ->
first-discovery dedup) runs at two parallelism levels on identical input.

| parallelism | wall (s) | URLs scheduled+extracted | throughput (URLs/s) |
|---|---|---|---|
| local[8]  | {r8['wall_sec']} | {r8['urls']} | {r8['urls_per_sec']} |
| local[32] | {r32['wall_sec']} | {r32['urls']} | {r32['urls_per_sec']} |

**Scaling efficiency (8 -> 32 cores) = (T_8 / T_32) / 4 = {eff}**
(criterion: >= 0.8 {'— MET' if eff >= 0.8 else '— NOT met'})

Input: synthetic CC-style pages table (webgraph fixture), one mega-host at
4x skew, politeness quotas active. Fetch is the simulated Iceberg-join per
the graft spec; parse is the fused Arrow-batched pandas UDF.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="run local[8] vs local[32] evidence protocol")
    args = ap.parse_args()
    if args.scaling:
        results = scaling_bench()
        write_scaling_md(results)
        print(json.dumps(results))
    else:
        print(json.dumps(default_bench()))


if __name__ == "__main__":
    main()
