"""Generate QUERIES.md — the index of every oracle-checked query.

One row per ``__spark_entry__.queries()`` entry: name, the callable's
docstring summary, and whether a DuckDB oracle is registered. Regenerate
after adding queries: ``python tools/gen_queries_md.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    lines = [
        "# QUERIES.md — oracle-checked query index (generated)",
        "",
        f"{len(qs)} queries; {len(oracles)} with DuckDB value-hash oracles "
        "(the round driver's correctness gate). Regenerate with "
        "`python tools/gen_queries_md.py`.",
        "",
        "| # | query | oracle | summary |",
        "|---|---|---|---|",
    ]
    # name-sorted: registry order now rotates per round (driver-sample
    # rotation), and the index should not churn with it
    for i, (name, fn) in enumerate(sorted(qs.items()), 1):
        doc = (fn.__doc__ or "").strip().splitlines()
        # the summary is everything up to the first blank line (then capped)
        head = []
        for line in doc:
            if not line.strip():
                break
            head.append(line.strip())
        summary = " ".join(head)
        if len(summary) > 140:
            summary = summary[:137] + "..."
        summary = summary.replace("|", "\\|")
        has = "yes" if name in oracles else "rows-only"
        lines.append(f"| {i} | `{name}` | {has} | {summary} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(qs)} rows")


if __name__ == "__main__":
    main()
