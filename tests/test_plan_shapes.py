"""Plan-shape gate: no unpartitioned windows / cartesian products creep in.

The r3 verdict audited every ``WindowExec: No Partition Defined`` site and
found them bounded by construction — except the Hamilton seat ranking
(operators/politeness.py), which is now range-partitioned. This gate locks
that audit in: it ``explain``s EVERY registered query at sf0.001 and asserts

- no ``CartesianProduct`` node anywhere (cross joins must broadcast a
  provably-small side — those compile to BroadcastNestedLoopJoin), and
- no unpartitioned ``Window`` node, except the explicitly whitelisted
  queries below, each tied to a code site whose window frame is bounded by
  construction (k rows post-limit, a fixed histogram, a √n sample, the
  size-adaptive small path of the seq/top-k machinery at fixture scale).

A new query (or a plan regression in an old one) that funnels unbounded
rows through one window task fails this test by name.
"""

from __future__ import annotations

import contextlib
import io
import os
import re

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")

#: query → (max allowed unpartitioned-Window nodes, audited bounded reason).
#: Anything not listed is allowed ZERO. Every entry is a site the r3 plan
#: audit verified bounded BY CONSTRUCTION — the window input is k/√n/
#: fixed-bucket-sized, never corpus- or host-proportional.
UNPARTITIONED_WINDOW_OK: dict[str, tuple[int, str]] = {
    "bm25_topk": (1, "ranking.py: rank over k rows post-limit"),
    "pq_ann_topk": (2, "similarity.py: codebook sample is √n training rows"),
    "lm_ppl_buckets": (2, "lmquality.py: 64-bucket histogram CDF"),
    "lang_temperature_plan": (
        2,
        "corpus.py lang_temperature_sample: per-language table (≤ #languages"
        " rows — a bounded dimension, not a data-sized relation)",
    ),
    "graph_neighborhood_function": (
        1,
        "sketches.py: neighborhood function has radius+1 rows",
    ),
}


def _node_sections(plan: str) -> list[tuple[str, str]]:
    """[(node_name, section_text)] from a formatted explain."""
    out = []
    for sec in re.split(r"\n\n+", plan):
        m = re.match(r"\((\d+)\)\s+(\S+)", sec.strip())
        if m:
            out.append((m.group(2), sec))
    return out


def _top_level_groups(args: str) -> list[str]:
    """Top-level ``[...]`` group texts in an Arguments rendering."""
    depth = 0
    groups: list[str] = []
    start = 0
    for i, ch in enumerate(args):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(args[start:i])
    return groups


def _window_is_unpartitioned(args: str) -> bool:
    """True when a formatted Window node has an empty partition spec.

    Rendering shapes: ``[exprs], [partSpec], [orderSpec]`` (partitioned,
    ordered); ``[exprs], [partSpec]`` (partitioned, no order — the spec
    group has no ASC/DESC); ``[exprs], [orderSpec]`` (UNPARTITIONED,
    ordered); ``[exprs]`` (UNPARTITIONED global frame).
    """
    groups = _top_level_groups(args)
    if len(groups) >= 3:
        return False
    if len(groups) <= 1:
        return True
    second = groups[1]
    return " ASC" in second or " DESC" in second


def _scan(plan: str) -> tuple[int, int]:
    """(unpartitioned_window_nodes, cartesian_nodes) in a formatted plan."""
    unpart = 0
    cartesian = 0
    for name, sec in _node_sections(plan):
        if name == "CartesianProduct":
            cartesian += 1
        elif name == "Window":
            m = re.search(r"Arguments: (.*)", sec)
            if m and _window_is_unpartitioned(m.group(1)):
                unpart += 1
    return unpart, cartesian


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_unpartitioned_windows_or_cartesians(spark):
    import __spark_entry__ as entry

    failures: list[str] = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF_DIR)
        except Exception as exc:  # noqa: BLE001 — report per-query
            failures.append(f"{name}: build failed: {exc!r:.200}")
            continue
        unpart, cartesian = _scan(_plan_of(df))
        allowed, _why = UNPARTITIONED_WINDOW_OK.get(name, (0, ""))
        if cartesian:
            failures.append(f"{name}: {cartesian} CartesianProduct node(s)")
        if unpart > allowed:
            failures.append(
                f"{name}: {unpart} unpartitioned Window node(s), "
                f"allowed {allowed}"
            )
    assert not failures, "\n".join(failures)
