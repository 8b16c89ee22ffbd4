"""Stand-alone oracle harness: run __spark_entry__.queries() vs oracle_sql().

Mirrors the round driver's correctness gate: for each query, run the Spark
callable and the DuckDB SQL on the same parquet tables, then compare row
count, sorted-by-name schema, and a value hash over column-name-sorted,
row-sorted string renderings. Exit code 0 iff every checked query is green.

Usage:
    python tests/run_oracle_check.py [query ...]      # default: all
    python tests/run_oracle_check.py --sf-dir DIR [query ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01          # table dir (default)

``--sf-dir`` points both engines at another table directory — e.g. the
``tools/gen_stress.py`` sf1 corpus for the scale-stress sweep (r4). Each
result row carries ``sec`` (wall seconds for the Spark run + compare).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _render(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    lines = sorted(",".join(cell(r[i]) for i in order) for r in rows)
    return "\n".join(lines)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from scrape_spark.session import get_spark

    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    wanted = argv
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in qs if not wanted or n in wanted]

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import time

    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            sql = oracles.get(name)
            if sql is None:
                status = {"rows": len(srows), "err": "no_oracle"}
                print(json.dumps({name: status}))
                continue
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            rows_match = len(srows) == len(orows)
            schema_match = sorted(c.lower() for c in scols) == sorted(
                c.lower() for c in ocols
            )
            h_s = hashlib.sha256(
                _render([tuple(r) for r in srows], scols).encode()
            ).hexdigest()
            h_o = hashlib.sha256(_render(orows, ocols).encode()).hexdigest()
            hash_match = h_s == h_o
            ok = rows_match and schema_match and hash_match
            failures += 0 if ok else 1
            print(
                json.dumps(
                    {
                        name: {
                            "rows_match": rows_match,
                            "schema_match": schema_match,
                            "hash_match": hash_match,
                            "spark_rows": len(srows),
                            "oracle_rows": len(orows),
                            "sec": round(time.time() - t0, 2),
                        }
                    }
                )
            )
        except Exception as exc:  # noqa: BLE001 — harness must report, not die
            failures += 1
            print(json.dumps({name: {"err": f"{type(exc).__name__}: {exc}"[:300]}}))
    spark.stop()
    print(f"checked={len(names)} failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
