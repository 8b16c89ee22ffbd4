"""Event-log profile of the bench crawl: where does each round's wall go?

Runs the crawl_6rounds bench shape with the Spark event log enabled, then
parses the log into a per-job timeline — job wall, stage task-time sum, and
the DRIVER GAPS between jobs (plan/commit/manifest time the executors never
see). The gap analysis is what the UI can't show with spark.ui disabled.

Usage: python tools/profile_crawl_events.py [--hosts 12] [--pph 600]
"""

from __future__ import annotations

import argparse
import glob
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

    logdir = tempfile.mkdtemp(prefix="sparkevents_")
    from scrape_spark.session import get_spark

    spark = get_spark(
        "crawl-events",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    work = tempfile.mkdtemp(prefix="profile_crawl_")
    try:
        from bench import _gen_pages
        from scrape_spark.plans.crawl import CrawlJob
        from scrape_spark.plans.statestore import SnapshotStore
        from scrape_spark.sources.webgraph import robots_source_df, seed_urls

        pages = _gen_pages(spark, work, args.hosts, args.pph, filler=4)
        pages.count()
        store_dir = tempfile.mkdtemp(prefix="st_", dir=work)
        job = CrawlJob(
            spark, SnapshotStore(spark, store_dir), pages,
            robots_source_df(spark, args.hosts), round_seconds=3600, n_buckets=16,
        )
        t0 = time.time()
        job.seed(seed_urls(args.hosts))
        t_seed = time.time()
        metrics = job.run(max_rounds=args.rounds)
        wall = time.time() - t0
        print(f"TOTAL {wall:.2f}s (seed {t_seed - t0:.2f}s)")
        for m in metrics:
            print(f"  round {m['round']}: {m['round_wall_sec']:.2f}s "
                  f"sched={m['scheduled']} new={m['new_urls']}")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)

    # -- parse the event log -------------------------------------------------
    jobs = {}
    # Spark 4 event logs may be rolling DIRECTORIES (eventlog_v2_<app>/events_*)
    paths = [
        p
        for pat in ("*", "*/*")
        for p in glob.glob(os.path.join(logdir, pat))
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": (props.get("spark.job.description") or
                                 props.get("callSite.short") or "")[:90],
                        "stages": len(ev.get("Stage IDs", [])),
                        "sids": set(ev.get("Stage IDs", [])),
                    }
                elif k == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif k == "SparkListenerStageSubmitted":
                    si = ev.get("Stage Info") or {}
                    name = (si.get("Stage Name") or "")[:60]
                    sid = si.get("Stage ID")
                    for j in jobs.values():
                        if sid in j.get("sids", ()) and not j["desc"]:
                            j["desc"] = name
    order = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    prev_end = None
    total_job = 0.0
    total_gap = 0.0
    print("\n jobid  wall_s  gap_s  stages  desc")
    for jid, j in order:
        if "end" not in j:
            continue
        wall = (j["end"] - j["start"]) / 1000
        gap = (j["start"] - prev_end) / 1000 if prev_end else 0.0
        total_job += wall
        total_gap += max(0.0, gap)
        print(f"  {jid:4d}  {wall:6.2f}  {gap:5.2f}  {j['stages']:5d}   {j['desc']}")
        prev_end = j["end"]
    print(f"\n sum(job walls) = {total_job:.2f}s   sum(inter-job gaps) = {total_gap:.2f}s")
    shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
