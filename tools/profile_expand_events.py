"""Event-log profile of the scaling job (expand_round_bench) at N cores.

Runs the exact protocol job (bucketed pages, merge-hint fetch join) once
untimed (warm-up) and once timed, with the Spark event log on, then prints
the timed pass's per-job walls, per-stage task-time sums, and inter-job
driver gaps. Comparing the output at 8 vs 32 cores shows which components
don't scale (constant-wall stages and driver gaps are the Amdahl term).

Usage: taskset -c 0-7 python tools/profile_expand_events.py --cpus 8
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
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--hosts", type=int, default=96)
    ap.add_argument("--pph", type=int, default=7200)
    ap.add_argument("--filler", type=int, default=48)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    logdir = tempfile.mkdtemp(prefix="sparkevents_")
    from scrape_spark.session import get_spark

    spark = get_spark(
        "expand-events",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": logdir,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    own = args.workdir is None
    work = args.workdir or tempfile.mkdtemp(prefix="expand_prof_")
    try:
        from bench import _gen_pages_bucketed, _warm_page_cache, expand_round_bench

        pages = _gen_pages_bucketed(spark, work, args.hosts, args.pph, args.filler)
        _warm_page_cache(work)
        expand_round_bench(spark, pages, args.hosts, broadcast_probe=False)
        mark = time.time() * 1000  # timed pass starts here
        wall, urls = expand_round_bench(spark, pages, args.hosts, broadcast_probe=False)
        print(f"TIMED {wall:.2f}s  urls={urls}  cores={args.cpus}")
    finally:
        spark.stop()
        if own:
            shutil.rmtree(work, ignore_errors=True)

    jobs = {}
    stage_task_time = {}
    paths = [
        p
        for p in glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
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
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"],
                        "stages": ev.get("Stage IDs", []),
                    }
                elif k == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
                elif k == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    rt = (si.get("Completion Time", 0) or 0) - (
                        si.get("Submission Time", 0) or 0
                    )
                    stage_task_time[si["Stage ID"]] = {
                        "wall_ms": rt,
                        "tasks": si.get("Number of Tasks", 0),
                        "name": si.get("Stage Name", "")[:60],
                    }
    order = sorted(
        (j for j in jobs.items() if "end" in j[1] and j[1]["start"] >= mark),
        key=lambda kv: kv[1]["start"],
    )
    prev_end = None
    tot_wall = tot_gap = 0.0
    print("\n job   wall_s  gap_s  stages(wall_s x tasks)")
    for jid, j in order:
        wall = (j["end"] - j["start"]) / 1000
        gap = (j["start"] - prev_end) / 1000 if prev_end else 0.0
        tot_wall += wall
        tot_gap += max(0.0, gap)
        st = " ".join(
            f"[{stage_task_time[s]['wall_ms']/1000:.2f}x{stage_task_time[s]['tasks']}"
            f" {stage_task_time[s]['name']}]"
            for s in j["stages"]
            if s in stage_task_time
        )
        print(f"  {jid:3d}  {wall:7.2f}  {gap:5.2f}  {st}")
        prev_end = j["end"]
    print(f"\n sum job walls {tot_wall:.2f}s, sum gaps {tot_gap:.2f}s")
    shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
