"""Instrumented parse-stage scaling experiment.

Runs the fused-parse component (the non-scaling piece per diag_scaling.py:
parse 54.7 s @ 8 cores vs 40.6 s @ 32) while sampling /proc/stat and
/proc/vmstat, so the 8-vs-32-core comparison shows WHERE the extra
core-seconds go: user CPU (job genuinely does more work / is CPU-bound),
sys CPU (fault path / socket copies), idle (workers blocked), or steal.

Usage:
  taskset -c 0-7 python tools/exp_parse_scaling.py --cpus 8 --workdir /root/scale_r3f
  python tools/exp_parse_scaling.py --cpus 32 --workdir /root/scale_r3f

Env toggles under test (propagate to Python workers, which inherit the
driver env in local mode):
  SPARK_GRAFT_PYMALLOC_THP=1  -> GLIBC_TUNABLES=glibc.malloc.hugetlb=1 +
                                 ARROW_DEFAULT_MEMORY_POOL=system +
                                 high malloc trim/mmap thresholds
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAT_FIELDS = (
    "user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"
)
VMSTAT_KEYS = ("pgfault", "pgmajfault", "thp_fault_alloc")


def read_stat() -> dict:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:9]
    return dict(zip(STAT_FIELDS, (int(x) for x in parts)))


def read_vmstat() -> dict:
    out = {}
    with open("/proc/vmstat") as f:
        for line in f:
            k, v = line.split()
            if k in VMSTAT_KEYS:
                out[k] = int(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--hosts", type=int, default=96)
    ap.add_argument("--pph", type=int, default=7200)
    ap.add_argument("--filler", type=int, default=48)
    ap.add_argument("--tag", default="base")
    args = ap.parse_args()

    if os.environ.get("SPARK_GRAFT_PYMALLOC_THP") == "1":
        os.environ["GLIBC_TUNABLES"] = "glibc.malloc.hugetlb=1"
        os.environ["ARROW_DEFAULT_MEMORY_POOL"] = "system"
        os.environ["MALLOC_TRIM_THRESHOLD_"] = str(128 << 20)
        os.environ["MALLOC_MMAP_THRESHOLD_"] = str(128 << 20)

    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from pyspark.sql import functions as F

    from bench import SCALING_SHUFFLE_PARTITIONS, _gen_pages_bucketed, _warm_page_cache, _spark
    from scrape_spark.functions.udfs import parse_page_expr

    spark = _spark(f"local[{args.cpus}]", SCALING_SHUFFLE_PARTITIONS)
    os.makedirs(args.workdir, exist_ok=True)
    pages = _gen_pages_bucketed(spark, args.workdir, args.hosts, args.pph, args.filler)
    _warm_page_cache(args.workdir)

    probe = pages.select("url").hint("merge")

    def parse_job():
        j = pages.join(probe, on="url", how="inner")
        return (
            j.withColumn("p", parse_page_expr("html", "url"))
            .select(F.explode("p.links").alias("l"))
            .count()
        )

    parse_job()  # warm-up
    s0, v0 = read_stat(), read_vmstat()
    t0 = time.time()
    n = parse_job()
    wall = time.time() - t0
    s1, v1 = read_stat(), read_vmstat()

    hz = os.sysconf("SC_CLK_TCK")
    cpu = {k: round((s1[k] - s0[k]) / hz, 1) for k in STAT_FIELDS}
    vm = {k: v1[k] - v0[k] for k in VMSTAT_KEYS}
    out = {
        "tag": args.tag,
        "cpus": args.cpus,
        "wall": round(wall, 2),
        "rows": n,
        "cpu_core_s": cpu,
        "vm": vm,
    }
    print(json.dumps(out))
    with open(os.path.join(args.workdir, "exp_parse.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
