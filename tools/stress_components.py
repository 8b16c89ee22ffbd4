"""sf>=1 stress check for the near-dup components/retention family.

The DuckDB recursive-CTE oracle that value-checks ``neardup_components`` /
``dedup_retain`` at fixture scale explodes at sf1 (the recursion
materializes per-iteration frontiers over a dense 258k-edge similarity
graph — observed >46 GB before being killed), so THIS harness verifies the
engine at scale against an exact driver-side union-find over the same edge
list instead: same contract (component id = min member id; retention =
min-id representative per component plus unpaired docs), zero recursion.

Usage: python tools/stress_components.py [--sf-dir /root/repo/.stress/sf1]
Prints one JSON line per check; exit 0 iff all green.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def union_find(edges):
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent.get(r, r)
        while parent.get(x, x) != x:
            parent[x], x = r, parent.get(x, x)
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
    return {n: find(n) for n in nodes}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.stress/sf1")
    args = ap.parse_args()

    from scrape_spark.operators.corpus import connected_components, dedup_retain
    from scrape_spark.operators.dedup import minhash_neardup_pairs
    from scrape_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    failures = 0

    t0 = time.time()
    pairs = minhash_neardup_pairs(docs).select("id_1", "id_2")
    edge_rows = [(r[0], r[1]) for r in pairs.collect()]
    t_pairs = round(time.time() - t0, 2)

    t0 = time.time()
    comps = connected_components(pairs)
    got = {r["id"]: r["component_id"] for r in comps.collect()}
    t_cc = round(time.time() - t0, 2)
    want = union_find(edge_rows)
    ok = got == want
    failures += 0 if ok else 1
    print(json.dumps({
        "neardup_components_sf_stress": {
            "edges": len(edge_rows), "nodes": len(want), "match": ok,
            "pairs_sec": t_pairs, "cc_sec": t_cc,
        }
    }))

    t0 = time.time()
    kept = dedup_retain(docs, pairs)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    t_rt = round(time.time() - t0, 2)
    n_docs = docs.count()
    clustered = set(want)
    reps = {cid for cid in want.values()}
    want_kept_count = n_docs - len(clustered) + len(reps)
    ok = (
        len(kept_ids) == want_kept_count
        and all(cid in kept_ids for cid in reps)
        and not any(n in kept_ids for n in clustered - reps)
    )
    failures += 0 if ok else 1
    print(json.dumps({
        "dedup_retain_sf_stress": {
            "kept": len(kept_ids), "expected": want_kept_count,
            "match": ok, "sec": t_rt,
        }
    }))
    spark.stop()
    print(f"failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
