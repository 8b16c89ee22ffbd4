"""Split the scaling job into components and measure each at N cores.

Variants:
  scan   — pages scan + fetch join + count (no Python)
  parse  — scan + fused parse UDF + explode + count (Python hot path)
  full   — the protocol job (adds robots gate, top-k, first-discovery)

Comparing component walls at 8 vs 32 cores shows WHICH part fails to scale
on this host (JVM shuffle vs Python-worker concurrency vs scan).

Usage: taskset -c 0-7 python tools/diag_scaling.py --cpus 8 --workdir /root/scale_diag
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--hosts", type=int, default=96)
    ap.add_argument("--pph", type=int, default=7200)
    ap.add_argument("--filler", type=int, default=48)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from pyspark.sql import functions as F

    from bench import SCALING_SHUFFLE_PARTITIONS, _gen_pages_bucketed, _warm_page_cache, _spark, expand_round_bench
    from scrape_spark.functions.udfs import parse_page_expr

    spark = _spark(f"local[{args.cpus}]", SCALING_SHUFFLE_PARTITIONS)
    os.makedirs(args.workdir, exist_ok=True)
    pages = _gen_pages_bucketed(spark, args.workdir, args.hosts, args.pph, args.filler)
    _warm_page_cache(args.workdir)

    probe = pages.select("url").hint("merge")

    def scan_job():
        return pages.join(probe, on="url", how="inner").select(
            F.sum(F.octet_length("html")).alias("b")
        ).collect()[0]["b"]

    def parse_job():
        j = pages.join(probe, on="url", how="inner")
        return (
            j.withColumn("p", parse_page_expr("html", "url"))
            .select(F.explode("p.links").alias("l"))
            .count()
        )

    out = {"cpus": args.cpus}
    for name, fn in (("scan", scan_job), ("parse", parse_job)):
        fn()  # warm-up
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 2)
    expand_round_bench(spark, pages, args.hosts, broadcast_probe=False)
    t0 = time.time()
    expand_round_bench(spark, pages, args.hosts, broadcast_probe=False)
    out["full"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    with open(os.path.join(args.workdir, "diag.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
