"""Link-graph analytics over the crawl's webgraph (referrer → url edges).

The reference materializes the web graph implicitly — every enqueued row
stores its discovering ``referrer`` (scraper.py:161, models.py:8-47) — but
never analyzes it. At 100 TB the graph IS the crawl-scheduling signal:
frontier prioritization by link authority (PageRank) is what separates a
breadth-first crawler from a quality-weighted one, and the engine's
priority dequeue (operators/politeness.py, ``priority_expr``) takes any
numeric column — including the ranks computed here.

``pagerank_int`` is a FIXED-POINT INTEGER kernel, following the repo's
dialect-templating discipline (functions/textstats.py): ranks are int64
scaled by ``scale``, every step is floor division and int64 addition, so
partial-aggregation ORDER cannot perturb the result (int64 sums commute
exactly; float sums do not) and the DuckDB oracle (``pagerank_sql``)
reproduces the value bit-for-bit from the same formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default fixed-point scale: 1.0 of rank mass == 10^12.
SCALE = 10**12


def _base(scale: int, damping_pct: int) -> int:
    """The per-node teleport term floor(scale*(100-d)/100), inlined as a
    literal into BOTH dialects so the formulas are textually identical."""
    return scale * (100 - damping_pct) // 100


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous power steps.

    Semantics (identical to :func:`pagerank_sql`):

    - ``r_0(v) = scale`` for every node (union of srcs and dsts);
    - ``r_{t+1}(v) = base + (damping_pct * S_t(v)) div 100`` where
      ``S_t(v) = Σ_{u→v} (r_t(u) div outdeg(u))`` and
      ``base = (scale*(100-damping_pct)) div 100``;
    - dangling mass (nodes with no out-edges) simply decays — the common
      simplification, and the only one expressible identically in one SQL
      pass per iteration.

    Scale shape: each iteration is ONE shuffle of (dst, contribution)
    int64 pairs for the aggregation plus the rank join against the
    edge table — the edge table is hash-partitioned on ``src`` once and
    reused across all iterations (Pregel's layout), and rank frames are
    node-sized, never edge-sized. Payload columns never enter the loop.

    Overflow guard: the total rank mass is bounded by ``n_nodes * scale``
    (the teleport fixpoint), so ``damping_pct * n_nodes * scale`` must fit
    int64 — asserted below from the real node count. For a 10^10-node
    graph pass ``scale=10**6``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # one partitioning, reused by every iteration's rank join
    ed = e.join(deg, "src").repartition("src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # tiny job; doubles as the overflow guard input
    if damping_pct * n_nodes * scale >= 2**63:
        ed.unpersist()  # the guard path must not pin caches for the session
        nodes.unpersist()
        raise ValueError(
            f"scale={scale} overflows int64 at {n_nodes} nodes; "
            f"use scale <= {2**63 // (damping_pct * max(n_nodes, 1))}"
        )
    base = _base(scale, damping_pct)

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = ed.join(ranks, ed["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.expr("rank div outdeg").alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).cast("long").alias("rank"),
        )
    # materialize through the persisted inputs, then hand back a frame with
    # no live cache entries (same discipline as connected_components)
    out = ranks.localCheckpoint(eager=True)
    ed.unpersist()
    nodes.unpersist()
    return out


def pagerank_sql(
    edges_sql: str,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> str:
    """The SAME kernel as chained CTEs for the DuckDB oracle.

    ``edges_sql`` must yield BIGINT columns (src, dst). ``//`` is DuckDB
    integer division — identical to Spark's ``div`` on the non-negative
    values this kernel produces; DuckDB widens SUM(BIGINT) to HUGEINT, so
    the per-step result is cast back to BIGINT (values fit by the same
    mass bound the Spark side asserts).
    """
    base = _base(scale, damping_pct)
    parts = [
        f"WITH _pr_e AS ({edges_sql})",
        "_pr_deg AS (SELECT src, COUNT(*) AS outdeg FROM _pr_e GROUP BY src)",
        "_pr_nodes AS (SELECT src AS node FROM _pr_e"
        " UNION SELECT dst AS node FROM _pr_e)",
        f"_pr_r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM _pr_nodes)",
    ]
    for t in range(iterations):
        parts.append(
            f"_pr_s{t} AS (SELECT e.dst AS node,"
            f" SUM(r.rank // d.outdeg) AS s"
            f" FROM _pr_e e JOIN _pr_deg d USING (src)"
            f" JOIN _pr_r{t} r ON r.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"_pr_r{t + 1} AS (SELECT n.node, CAST({base}"
            f" + ({damping_pct} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank"
            f" FROM _pr_nodes n LEFT JOIN _pr_s{t} s USING (node))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, rank FROM _pr_r{iterations}"
    )


def pagerank_py(
    edges: list[tuple[int, int]],
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> dict[int, int]:
    """Pure-Python executable spec of the same kernel (test oracle)."""
    base = _base(scale, damping_pct)
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    rank = {v: scale for v in nodes}
    for _ in range(iterations):
        sums = {v: 0 for v in nodes}
        for s, d in edges:
            sums[d] += rank[s] // outdeg[s]
        rank = {v: base + (damping_pct * sums[v]) // 100 for v in nodes}
    return rank


def anchor_text_agg(
    links: DataFrame,
    dst_col: str = "link_url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target anchor-text index over the webgraph's (src → dst, anchor)
    edges: (url, n_inlinks, n_anchors, top_anchor, top_anchor_count).

    Anchor text is the classic off-page relevance signal (it describes the
    TARGET) — search pipelines aggregate it per destination URL; the
    reference extracts per-link anchor text (link_extractor.py, the F5
    kernel) but never aggregates it. ``top_anchor`` is the most frequent
    anchor for the target, ties broken by lexicographically LARGEST anchor —
    a total order, so the result is deterministic and oracle-checkable.

    Scale shape: one map-side-combined count on (dst, anchor) — shuffle
    bytes are per-distinct-pair, not per-edge — then a window partitioned
    by dst over the already-aggregated rows for the top-1 pick and the
    per-target totals. Mega-targets skew the FIRST aggregation's keyspace
    ((dst, anchor) pairs — already salted by the anchor), not the window:
    the window input is distinct-anchor-sized, bounded per target by its
    anchor vocabulary.
    """
    from pyspark.sql import Window

    per = links.groupBy(
        F.col(dst_col).alias("url"), F.col(anchor_col).alias("anchor")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("url")
    ranked = per.select(
        "url",
        "anchor",
        "cnt",
        F.row_number()
        .over(w.orderBy(F.col("cnt").desc(), F.col("anchor").desc()))
        .alias("rn"),
        F.sum("cnt").over(w).alias("n_inlinks"),
        F.count(F.lit(1)).over(w).alias("n_anchors"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "url",
        F.col("n_inlinks").cast("long").alias("n_inlinks"),
        F.col("n_anchors").cast("long").alias("n_anchors"),
        F.col("anchor").alias("top_anchor"),
        F.col("cnt").alias("top_anchor_count"),
    )
