"""Synthesize sf>=1 stress tables from the driver's sf0.1 fixtures.

The 151-query oracle sweep proves semantics on ~500-row fixtures; this
builds a deterministically scaled corpus to flush the bugs fixtures cannot
see (int64 overflow, skew, ordering instability, quadratic blowups) — the
r3 verdict's item 3. No external data: every row derives from the existing
parquet by pure SQL.

Scaling construction (factor k): replica r in 0..k-1 of each base row.
- documents: ids offset by r*10^7; a replica-specific token is spliced
  after every 3rd word (regexp_replace global), so WITHIN a replica the
  near-dup/shingle structure of the base corpus is preserved EXACTLY
  (both members of a dup pair receive identical edits) while ACROSS
  replicas every 3+-word shingle differs — pair counts scale ~k, not k².
- embeddings: ids offset; the vector is cyclically rotated by r so
  replicas occupy different directions with identical norms.
- events: ids offset by r*10^9, timestamps shifted r seconds, users
  shared (denser sessions — deliberate stress).
- TPC-H dims and facts are copied unscaled (the heavy family under test
  reads documents/embeddings/events).

Usage: python tools/gen_stress.py [--factor 10] [--src /root/testdata/sf0.1]
       [--out /root/repo/.stress/sf1]
"""

from __future__ import annotations

import argparse
import os
import shutil
import time

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]


def main() -> int:
    import duckdb

    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.stress/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    k = args.factor

    t0 = time.time()
    src = os.path.join(args.src, "documents.parquet")
    out = os.path.join(args.out, "documents.parquet")
    con.execute(
        f"""
COPY (
  SELECT CAST(doc_id + r * 10000000 AS BIGINT) AS doc_id,
         CASE WHEN r = 0 THEN text
              ELSE regexp_replace(text, '(\\S+ \\S+ \\S+)',
                     '\\1 zz' || CAST(r AS VARCHAR) || 'q', 'g') END AS text,
         lang, source,
         CAST(length(CASE WHEN r = 0 THEN text
              ELSE regexp_replace(text, '(\\S+ \\S+ \\S+)',
                     '\\1 zz' || CAST(r AS VARCHAR) || 'q', 'g') END)
              AS BIGINT) AS n_chars
  FROM read_parquet('{src}'), (SELECT unnest(range({k})) AS r)
) TO '{out}' (FORMAT PARQUET)
"""
    )
    print(f"documents x{k}: {time.time() - t0:.1f}s")

    t0 = time.time()
    src = os.path.join(args.src, "embeddings.parquet")
    out = os.path.join(args.out, "embeddings.parquet")
    con.execute(
        f"""
COPY (
  SELECT CAST(vec_id + r * 10000000 AS BIGINT) AS vec_id,
         CAST(list_concat(embedding[CAST(r + 1 AS BIGINT):],
                          embedding[:CAST(r AS BIGINT)]) AS FLOAT[])
           AS embedding,
         label
  FROM read_parquet('{src}'), (SELECT unnest(range({k})) AS r)
) TO '{out}' (FORMAT PARQUET)
"""
    )
    print(f"embeddings x{k}: {time.time() - t0:.1f}s")

    t0 = time.time()
    src = os.path.join(args.src, "events.parquet")
    out = os.path.join(args.out, "events.parquet")
    con.execute(
        f"""
COPY (
  SELECT CAST(event_id + r * 1000000000 AS BIGINT) AS event_id,
         ts + to_seconds(CAST(r AS BIGINT)) AS ts,
         user_id, event_type, value, props
  FROM read_parquet('{src}'), (SELECT unnest(range({k})) AS r)
) TO '{out}' (FORMAT PARQUET)
"""
    )
    print(f"events x{k}: {time.time() - t0:.1f}s")

    for t in COPY_TABLES:
        p = os.path.join(args.src, f"{t}.parquet")
        if os.path.exists(p):
            shutil.copyfile(p, os.path.join(args.out, f"{t}.parquet"))
    print(f"done -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
