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


def _hits_norm_divisor(scale: int, idiv: str) -> str:
    """Shared formula text: divisor that caps a score vector at ~scale.

    Division-only normalization — ``x div max(1, ceil(m / scale))`` — keeps
    every intermediate inside int64 (values only shrink), unlike the
    ``x * scale div m`` form whose product overflows at crawl-scale node
    counts. ``{m}`` is the vector max; ``idiv`` is the dialect's integer
    division template (Spark ``div``, DuckDB ``//`` — identical on the
    non-negative values here).
    """
    q = idiv.format(a=f"({{m}} + {scale - 1})", b=str(scale))
    return f"greatest(CAST(1 AS BIGINT), {q})"


def hits_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """HITS hubs & authorities — fixed-point int64, like :func:`pagerank_int`.

    Kleinberg's mutual recursion: ``a_{t+1}(v) = Σ_{u→v} h_t(u)`` then
    ``h_{t+1}(u) = Σ_{u→v} a_{t+1}(v)``, each vector renormalized to ~scale
    by the division-only rule of ``_hits_norm_divisor`` (the float version
    normalizes by L2; any fixed norm yields the same ORDERING, which is the
    signal a frontier prioritizer consumes). All sums are int64 — partial
    aggregation order cannot perturb the result — and the DuckDB oracle
    (:func:`hits_sql`) replays the identical formulas.

    Scale shape per iteration: two shuffles (one per direction's groupBy),
    both on node keys with map-side combine; the edge table is partitioned
    once on ``src`` and reused (the dst-keyed aggregation re-shuffles edge
    CONTRIBUTIONS, not payloads). The per-vector max rides a broadcast
    1-row frame — no driver action inside the loop, the whole ladder stays
    one lazy plan.

    Overflow bound: scores are ≤ ~scale after each normalization, so a sum
    is ≤ n_nodes * scale; asserted against the real node count below.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # SIMPLE-graph semantics: duplicate link rows collapse (crawl link
    # tables routinely repeat (src,dst)); without the dedup, multiplicity
    # multiplies the sums PAST the node-count overflow guard below —
    # n_nodes bounds a simple graph's in-degree, never a multigraph's.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).dropDuplicates(["src", "dst"])
    ed = e.repartition("src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    # post-normalization scores can reach 2*scale-1 (ceil division), so the
    # mass bound is 2 * n_nodes * scale
    if 2 * n_nodes * scale >= 2**63:
        ed.unpersist()
        nodes.unpersist()
        raise ValueError(
            f"scale={scale} overflows int64 at {n_nodes} nodes; "
            f"use scale <= {2**63 // (2 * max(n_nodes, 1))}"
        )

    def _norm(df: DataFrame, col: str) -> DataFrame:
        from scrape_spark.functions import textstats as ts

        m = df.agg(F.max(col).alias("_m"))
        div = _hits_norm_divisor(scale, ts.SPARK_DIALECT["idiv"]).format(m="_m")
        return (
            df.crossJoin(F.broadcast(m))
            .select("node", F.expr(f"{col} div ({div})").alias(col))
        )

    hubs = nodes.select("node", F.lit(scale).cast("long").alias("hub"))
    auths = None
    for _ in range(iterations):
        a = (
            ed.join(hubs, ed["src"] == hubs["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        auths = _norm(
            nodes.join(a, "node", "left").select(
                "node", F.coalesce("auth", F.lit(0)).cast("long").alias("auth")
            ),
            "auth",
        )
        h = (
            ed.join(auths, ed["dst"] == auths["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        hubs = _norm(
            nodes.join(h, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0)).cast("long").alias("hub")
            ),
            "hub",
        )
    out = (
        hubs.join(auths, "node")
        .select("node", "hub", "auth")
        .localCheckpoint(eager=True)
    )
    ed.unpersist()
    nodes.unpersist()
    return out


def hits_sql(edges_sql: str, iterations: int = 3, scale: int = SCALE) -> str:
    """The SAME HITS ladder as chained CTEs for the DuckDB oracle."""
    from scrape_spark.functions import textstats as ts

    div = _hits_norm_divisor(scale, ts.DUCK_DIALECT["idiv"])
    parts = [
        # DISTINCT mirrors hits_int's simple-graph edge dedup
        f"WITH _ht_e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "_ht_nodes AS (SELECT src AS node FROM _ht_e"
        " UNION SELECT dst AS node FROM _ht_e)",
        f"_ht_h0 AS (SELECT node, CAST({scale} AS BIGINT) AS hub FROM _ht_nodes)",
    ]
    for t in range(iterations):
        parts.append(
            f"_ht_ar{t} AS (SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT)"
            f" AS auth FROM _ht_nodes n LEFT JOIN"
            f" (SELECT e.dst AS node, SUM(h.hub) AS s FROM _ht_e e"
            f" JOIN _ht_h{t} h ON h.node = e.src GROUP BY e.dst) s"
            f" USING (node))"
        )
        parts.append(
            f"_ht_am{t} AS (SELECT MAX(auth) AS m FROM _ht_ar{t})"
        )
        parts.append(
            f"_ht_a{t + 1} AS (SELECT node, CAST(auth //"
            f" ({div.format(m='m')}) AS BIGINT) AS auth"
            f" FROM _ht_ar{t}, _ht_am{t})"
        )
        parts.append(
            f"_ht_hr{t} AS (SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT)"
            f" AS hub FROM _ht_nodes n LEFT JOIN"
            f" (SELECT e.src AS node, SUM(a.auth) AS s FROM _ht_e e"
            f" JOIN _ht_a{t + 1} a ON a.node = e.dst GROUP BY e.src) s"
            f" USING (node))"
        )
        parts.append(f"_ht_hm{t} AS (SELECT MAX(hub) AS m FROM _ht_hr{t})")
        parts.append(
            f"_ht_h{t + 1} AS (SELECT node, CAST(hub //"
            f" ({div.format(m='m')}) AS BIGINT) AS hub"
            f" FROM _ht_hr{t}, _ht_hm{t})"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.node, h.hub, a.auth FROM _ht_h{iterations} h"
        f" JOIN _ht_a{iterations} a USING (node)"
    )


def hits_py(
    edges: list[tuple[int, int]],
    iterations: int = 3,
    scale: int = SCALE,
) -> dict[int, tuple[int, int]]:
    """Pure-Python executable spec of the same kernel (test oracle)."""
    edges = sorted(set(edges))  # simple-graph semantics, like hits_int
    nodes = {s for s, _ in edges} | {d for _, d in edges}

    def norm(vec: dict[int, int]) -> dict[int, int]:
        m = max(vec.values())
        div = max(1, (m + scale - 1) // scale)
        return {v: x // div for v, x in vec.items()}

    hub = {v: scale for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iterations):
        auth = {v: 0 for v in nodes}
        for s, d in edges:
            auth[d] += hub[s]
        auth = norm(auth)
        hub = {v: 0 for v in nodes}
        for s, d in edges:
            hub[s] += auth[d]
        hub = norm(hub)
    return {v: (hub[v], auth[v]) for v in nodes}


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


# ---------------------------------------------------------------------------
# focused crawling: topic relevance from anchor text + URL tokens
# ---------------------------------------------------------------------------


def _topic_tokens_sql(s: str, d: dict) -> str:
    """Alphanumeric tokens of ``s`` — regex shared verbatim by both engines.

    The character class carries no backslash escapes, so the Spark-vs-
    DuckDB string-literal unescaping divergence (functions/textstats.py
    dialect notes) cannot bite. DuckDB's regexp_replace only rewrites the
    FIRST match unless given the 'g' flag; Spark's always rewrites all —
    hence the per-dialect call shape.
    """
    from scrape_spark.functions import textstats as ts

    flag = "" if d is ts.SPARK_DIALECT else ", 'g'"
    cleaned = f"trim(regexp_replace(lower({s}), '[^a-z0-9]+', ' '{flag}))"
    return d["split"].format(s=cleaned)


def topic_hits_sql(s: str, terms: list[str], d: dict) -> str:
    """Occurrences of any topic term among ``s``'s tokens (exact int64)."""
    from scrape_spark.functions import textstats as ts

    if not terms:
        raise ValueError("terms must be a non-empty list of topic terms")
    lits = ", ".join(
        ts.sql_str_literal(t) for t in dict.fromkeys(t.lower() for t in terms)
    )
    hits = d["filter"].format(
        arr=_topic_tokens_sql(s, d), lam=f"__w -> __w IN ({lits})"
    )
    return f"CAST({d['size'].format(arr=hits)} AS BIGINT)"


def topic_url_priority_expr(terms: list[str], url_col: str = "url"):
    """Shark-search-style dequeue priority over the frontier's own URL.

    Plugs straight into ``CrawlJob(priority=...)`` (plans/crawl.py): the
    hook ranks ASCENDING, so the topic-hit count is negated — URLs whose
    path mentions more topic terms dequeue first, FIFO seq breaking ties.
    Map-side expression over the url column only; no join, no shuffle
    beyond the dequeue's own ranking.
    """
    from scrape_spark.functions import textstats as ts

    return F.expr(
        f"-({topic_hits_sql(url_col, terms, ts.SPARK_DIALECT)})"
    )


def focused_scores(
    links: DataFrame,
    terms: list[str],
    w_anchor: int = 3,
    w_url: int = 1,
    dst_col: str = "link_url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(url, anchor_hits, url_hits, relevance) per link target.

    The enqueue-time half of a focused crawler (shark search): anchor
    text describes the TARGET before it is ever fetched, so topic-term
    hits over all inlink anchors — weighted above hits in the URL string
    itself — rank which discovered links deserve fetch slots. Exact
    int64: relevance = w_anchor*anchor_hits + w_url*url_hits, join it to
    new links at enqueue or feed a relevance-seeded frontier.

    Scale shape: per-edge hit counts are map-side array expressions; one
    map-side-combined groupBy(dst) carrying three int64s; the per-URL
    hits ride the same aggregate as ``max`` (constant within the group).
    """
    from scrape_spark.functions import textstats as ts

    d = ts.SPARK_DIALECT
    per_edge = links.select(
        F.col(dst_col).alias("url"),
        F.expr(topic_hits_sql(anchor_col, terms, d)).alias("_ah"),
        F.expr(topic_hits_sql(dst_col, terms, d)).alias("_uh"),
    )
    agg = per_edge.groupBy("url").agg(
        F.sum("_ah").alias("anchor_hits"),
        F.max("_uh").alias("url_hits"),
    )
    return agg.select(
        "url",
        "anchor_hits",
        "url_hits",
        (
            F.lit(int(w_anchor)) * F.col("anchor_hits")
            + F.lit(int(w_url)) * F.col("url_hits")
        ).cast("long").alias("relevance"),
    )


def focused_scores_sql(
    links_sql: str,
    terms: list[str],
    w_anchor: int = 3,
    w_url: int = 1,
    dst_col: str = "link_url",
    anchor_col: str = "anchor",
) -> str:
    """The identical kernel as portable SQL (the DuckDB oracle side)."""
    from scrape_spark.functions import textstats as ts

    d = ts.DUCK_DIALECT
    ah = topic_hits_sql(anchor_col, terms, d)
    uh = topic_hits_sql(dst_col, terms, d)
    return f"""WITH _links AS ({links_sql}),
_per AS (SELECT {dst_col} AS url, {ah} AS _ah, {uh} AS _uh FROM _links),
_agg AS (SELECT url, CAST(sum(_ah) AS BIGINT) AS anchor_hits,
                CAST(max(_uh) AS BIGINT) AS url_hits
         FROM _per GROUP BY url)
SELECT url, anchor_hits, url_hits,
  CAST({int(w_anchor)} * anchor_hits + {int(w_url)} * url_hits AS BIGINT)
    AS relevance
FROM _agg"""


# ---------------------------------------------------------------------------
# TrustRank — seed-personalized PageRank for spam demotion
# ---------------------------------------------------------------------------
def trustrank_int(
    edges: DataFrame,
    seeds: DataFrame | list[int],
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """(node, trust) — PageRank whose teleport mass lands ONLY on ``seeds``.

    Gyöngyi/Garcia-Molina/Pedersen's TrustRank (VLDB'04): start trust at a
    hand-vetted seed set and propagate it forward along links with decay;
    pages unreachable from any trusted page end at trust 0, which is the
    spam-demotion signal the frontier's priority dequeue consumes
    (``operators/politeness.py`` ``priority_expr`` takes any numeric
    column — crawl good-neighborhood pages first). The reference has no
    graph analytics at all; this extends its stored ``referrer`` lineage
    (models.py:8-47) the same way :func:`pagerank_int` does.

    Semantics (identical to :func:`trustrank_sql` / :func:`trustrank_py`):

    - ``r_0(v) = scale`` for seeds, else 0;
    - ``r_{t+1}(v) = base(v) + (damping_pct * S_t(v)) div 100`` with
      ``S_t(v) = Σ_{u→v} (r_t(u) div outdeg(u))`` and
      ``base(v) = (scale*(100-damping_pct)) div 100`` for seeds, else 0.

    Unlike uniform PageRank, the total trust mass is bounded by
    ``n_seeds * scale`` REGARDLESS of graph size (the teleport geometric
    series sums to n_seeds*base*100/(100-d) = n_seeds*scale, and the
    r_0 mass only decays), so ``scale=10**12`` survives a 10^10-node
    graph as long as the vetted seed list stays small — the overflow
    guard below is on the SEED count, not the node count.

    Scale shape: same as :func:`pagerank_int` — the edge table is
    hash-partitioned on ``src`` once and reused every iteration; rank
    frames are node-sized; the seed set rides a broadcast join (a vetted
    whitelist is O(100s) rows at any crawl scale). One (dst-keyed,
    map-side-combined) shuffle per iteration.
    """
    spark = edges.sparkSession
    if isinstance(seeds, list):
        seeds_df = spark.createDataFrame([(int(s),) for s in seeds], "node bigint")
    else:
        seeds_df = seeds.select(F.col(seeds.columns[0]).cast("long").alias("node"))
    seeds_df = seeds_df.distinct().persist()
    n_seeds = seeds_df.count()
    if n_seeds == 0:
        seeds_df.unpersist()
        raise ValueError("trustrank_int needs a non-empty seed set")
    if damping_pct * n_seeds * scale >= 2**63:
        seeds_df.unpersist()
        raise ValueError(
            f"scale={scale} overflows int64 at {n_seeds} seeds; "
            f"use scale <= {2**63 // (damping_pct * n_seeds)}"
        )
    base = _base(scale, damping_pct)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").repartition("src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(seeds_df)
        .distinct()
        .persist()
    )
    is_seed = F.col("_seed").isNotNull()
    marked = nodes.join(
        F.broadcast(seeds_df.select(F.col("node"), F.lit(1).alias("_seed"))),
        "node",
        "left",
    ).persist()
    rank = marked.select(
        "node",
        F.when(is_seed, F.lit(scale)).otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for _ in range(iterations):
        sums = (
            ed.join(rank, ed["src"] == rank["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("s"))
        )
        rank = marked.join(sums, "node", "left").select(
            "node",
            (
                F.when(is_seed, F.lit(base)).otherwise(F.lit(0))
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            )
            .cast("long")
            .alias("rank"),
        )
    out = rank.select("node", F.col("rank").alias("trust")).localCheckpoint(
        eager=True
    )
    ed.unpersist()
    nodes.unpersist()
    marked.unpersist()
    seeds_df.unpersist()
    return out


def trustrank_sql(
    edges_sql: str,
    seeds_sql: str,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> str:
    """The SAME TrustRank ladder as chained CTEs for the DuckDB oracle.

    ``edges_sql`` yields BIGINT (src, dst); ``seeds_sql`` yields one
    BIGINT column ``node``.
    """
    base = _base(scale, damping_pct)
    parts = [
        f"WITH _tr_e AS ({edges_sql})",
        f"_tr_seed AS (SELECT DISTINCT node FROM ({seeds_sql}))",
        "_tr_deg AS (SELECT src, COUNT(*) AS outdeg FROM _tr_e GROUP BY src)",
        "_tr_nodes AS (SELECT src AS node FROM _tr_e"
        " UNION SELECT dst AS node FROM _tr_e"
        " UNION SELECT node FROM _tr_seed)",
        "_tr_m AS (SELECT n.node, s.node IS NOT NULL AS is_seed"
        " FROM _tr_nodes n LEFT JOIN _tr_seed s USING (node))",
        f"_tr_r0 AS (SELECT node, CAST(CASE WHEN is_seed THEN {scale}"
        " ELSE 0 END AS BIGINT) AS rank FROM _tr_m)",
    ]
    for t in range(iterations):
        parts.append(
            f"_tr_s{t} AS (SELECT e.dst AS node,"
            f" SUM(r.rank // d.outdeg) AS s"
            f" FROM _tr_e e JOIN _tr_deg d USING (src)"
            f" JOIN _tr_r{t} r ON r.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"_tr_r{t + 1} AS (SELECT m.node,"
            f" CAST(CASE WHEN m.is_seed THEN {base} ELSE 0 END"
            f" + ({damping_pct} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank"
            f" FROM _tr_m m LEFT JOIN _tr_s{t} s USING (node))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, rank AS trust FROM _tr_r{iterations}"
    )


def trustrank_py(
    edges: list[tuple[int, int]],
    seeds: list[int],
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> dict[int, int]:
    """Pure-Python executable spec of the same kernel (test oracle)."""
    base = _base(scale, damping_pct)
    seed_set = set(seeds)
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = {s for s, _ in edges} | {d for _, d in edges} | seed_set
    rank = {v: scale if v in seed_set else 0 for v in nodes}
    for _ in range(iterations):
        sums = {v: 0 for v in nodes}
        for s, d in edges:
            sums[d] += rank[s] // outdeg[s]
        rank = {
            v: (base if v in seed_set else 0) + (damping_pct * sums[v]) // 100
            for v in nodes
        }
    return rank


# ---------------------------------------------------------------------------
# Host-graph contraction — page edges -> registered-domain edges
# ---------------------------------------------------------------------------
def host_graph(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    psl: DataFrame | list[str] | None = None,
) -> DataFrame:
    """(src_domain, dst_domain, weight) — the page graph contracted to eTLD+1.

    Domain-level link analysis (domain PageRank/TrustRank, link-farm
    detection) runs on the CONTRACTED graph: endpoints mapped to their
    registered domain, intra-domain edges dropped (they are navigation,
    not endorsement — the standard host-graph construction, e.g. Common
    Crawl's webgraph releases), parallel edges folded into an int64
    ``weight``. The output is ~4 orders of magnitude smaller than the
    page graph, so the iterative rank kernels upstairs run on it at
    interactive cost even for a 10^10-page crawl.

    Scale shape: domain resolution runs once over the DISTINCT host set
    (``registered_domain``'s own discipline — broadcast PSL, suffix
    explode bounded by label count), then attaches to the edge table by
    two host-keyed joins; the final fold is ONE (src_domain, dst_domain)
    groupBy with map-side combine. Edge payloads never enter the explode.
    """
    from scrape_spark.operators.corpus import registered_domain

    hosts = (
        edges.select(F.col(src_col).alias("host"))
        .union(edges.select(F.col(dst_col).alias("host")))
        .distinct()
    )
    rd = registered_domain(hosts, host_col="host").select(
        "host", "registered_domain"
    )
    e = edges.select(F.col(src_col).alias("_hg_src"), F.col(dst_col).alias("_hg_dst"))
    mapped = (
        e.join(rd.withColumnRenamed("host", "_hg_src"), "_hg_src")
        .withColumnRenamed("registered_domain", "src_domain")
        .join(rd.withColumnRenamed("host", "_hg_dst"), "_hg_dst")
        .withColumnRenamed("registered_domain", "dst_domain")
    )
    return (
        mapped.where(F.col("src_domain") != F.col("dst_domain"))
        .groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def host_graph_sql(
    edges_sql: str, psl: list[str] | None = None
) -> str:
    """The SAME contraction for the DuckDB oracle.

    ``edges_sql`` yields (src_host, dst_host) VARCHAR columns.
    """
    from scrape_spark.operators.corpus import registered_domain_duck_sql

    rd = registered_domain_duck_sql(
        f"SELECT src_host AS host FROM ({edges_sql})"
        f" UNION ALL SELECT dst_host AS host FROM ({edges_sql})",
        psl,
    )
    return f"""\
WITH _hg_e AS ({edges_sql}),
_hg_rd AS ({rd})
SELECT s.registered_domain AS src_domain,
       d.registered_domain AS dst_domain,
       CAST(COUNT(*) AS BIGINT) AS weight
FROM _hg_e e
JOIN _hg_rd s ON s.host = e.src_host
JOIN _hg_rd d ON d.host = e.dst_host
WHERE s.registered_domain <> d.registered_domain
GROUP BY s.registered_domain, d.registered_domain"""


def link_reciprocity(
    edges: DataFrame,
    src: str = "src_domain",
    dst: str = "dst_domain",
) -> DataFrame:
    """Per-domain reciprocal-link stats: (domain, n_out, n_reciprocal,
    reciprocity_pct) — the classic link-nepotism signal (link farms and
    exchange rings reciprocate; organically-cited sites mostly don't).

    Runs on the CONTRACTED graph (:func:`host_graph` output — domain
    pairs, weights ignored): one self-join on the flipped key plus one
    src-keyed fold. Both shuffles key on domain pairs — uniform unless
    one domain dominates the edge list, which the contraction already
    collapsed to one row per pair.
    """
    e = edges.select(
        F.col(src).alias("_lr_s"), F.col(dst).alias("_lr_d")
    ).dropDuplicates(["_lr_s", "_lr_d"])
    back = e.select(
        F.col("_lr_d").alias("_lr_s"),
        F.col("_lr_s").alias("_lr_d"),
        F.lit(1).alias("_lr_back"),
    )
    marked = e.join(back, ["_lr_s", "_lr_d"], "left")
    return (
        marked.groupBy(F.col("_lr_s").alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_out"),
            F.sum(F.coalesce("_lr_back", F.lit(0))).cast("long").alias(
                "n_reciprocal"
            ),
        )
        .withColumn(
            "reciprocity_pct",
            F.expr("(100 * n_reciprocal) div n_out").cast("long"),
        )
    )


def link_reciprocity_sql(edges_sql: str) -> str:
    """The SAME fold for the DuckDB oracle; ``edges_sql`` yields
    (src_domain, dst_domain)."""
    return f"""\
WITH _lr_e AS (SELECT DISTINCT src_domain AS s, dst_domain AS d
               FROM ({edges_sql})),
_lr_m AS (SELECT e.s, e.d,
            CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END AS back
          FROM _lr_e e LEFT JOIN _lr_e b ON b.s = e.d AND b.d = e.s)
SELECT s AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM(back) AS BIGINT) AS n_reciprocal,
       CAST((100 * SUM(back)) // COUNT(*) AS BIGINT) AS reciprocity_pct
FROM _lr_m GROUP BY s"""


# ---------------------------------------------------------------------------
# OPIC — Adaptive On-line Page Importance Computation (Abiteboul/Preda/
# Cobena, WWW'03). THE crawl-ordering algorithm: unlike PageRank it needs
# no converged fixpoint before it is useful — every page holds "cash",
# a processed page distributes its cash over its outlinks, and the
# accumulated HISTORY of cash a page has held estimates its importance
# while the crawl is still running. Dangling pages send their cash to a
# virtual ROOT that redistributes uniformly (the paper's virtual page),
# so mass is never lost and traps cannot hoard it.
#
# This is the synchronous batch formulation (every page distributes each
# round — the natural shape for a round-based frontier like plans/crawl.py,
# where OPIC history is exactly the priority signal the dequeue consumes):
#
#   cash_0(v) = scale;   hist_0(v) = 0
#   root_t       = Σ_{dangling u} cash_t(u)      (forwarded same round —
#                                                 no mass parks on the root)
#   cash_{t+1}(v) = Σ_{u→v} (cash_t(u) div outdeg(u)) + root_t div n
#   hist_{t+1}(v) = hist_t(v) + cash_t(v)
#
# All arithmetic is int64 (div = floor division on non-negatives), so
# partial-agg order cannot perturb values and the DuckDB oracle replays
# the ladder bit-for-bit. The reference has no crawl-ordering signal at
# all (FIFO by insertion id, models.py get_next_url_to_scrape); this is
# engine machinery for the north rule's priority-queue frontier.
# ---------------------------------------------------------------------------


def opic_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = SCALE,
    init: DataFrame | None = None,
) -> DataFrame:
    """(node, cash, hist) after ``iterations`` synchronous OPIC rounds.

    Scale shape per iteration: ONE edge-sized shuffle (the dst-keyed
    contribution fold, map-side combined) plus node-sized joins; the edge
    table is hash-partitioned on ``src`` once and reused every round
    (Pregel layout, same as :func:`pagerank_int`). The root scalar rides
    a broadcast 1-row frame — no driver action inside the loop, the whole
    ladder stays one lazy plan (same trick as ``hits_int``'s divisor).

    **Warm start (the "adaptive" in Adaptive OPIC)**: pass ``init`` —
    a prior (node, cash, hist) output — to CONTINUE the computation
    instead of restarting: running k then m iterations through ``init``
    is bit-identical to k+m straight (tested), so the crawl can persist
    OPIC state in a snapshot table and advance it incrementally each
    round. Nodes NEW since the init state (frontier growth) enter with
    the paper's new-page rule: fresh cash = scale, empty history.

    Overflow bound: total circulating mass is conserved at ≤ n·scale
    (floor division only loses mass), so hist ≤ (iterations+1)·n·scale —
    asserted against the real node count below (warm starts extend the
    bound by the init hist's own magnitude; re-derive externally when
    chaining many resumes). For a 10^10-node graph pass ``scale=10**6``.

    Simple-graph semantics: duplicate (src, dst) rows collapse, matching
    ``hits_int`` — outdeg counts DISTINCT outlinks.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).dropDuplicates(["src", "dst"])
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").repartition("src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        ed.unpersist()
        nodes.unpersist()
        raise ValueError("opic_int needs a non-empty edge set")
    if (iterations + 1) * n_nodes * scale >= 2**63:
        ed.unpersist()
        nodes.unpersist()
        raise ValueError(
            f"scale={scale} overflows int64 at {n_nodes} nodes over "
            f"{iterations} iterations; use scale <= "
            f"{2**63 // ((iterations + 1) * max(n_nodes, 1))}"
        )
    # (node, outdeg-or-null): the dangling marker reused every round
    marked = nodes.join(
        deg.select(F.col("src").alias("node"), "outdeg"), "node", "left"
    ).persist()
    dangling = F.col("outdeg").isNull()

    if init is not None:
        prior = init.select(
            F.col("node"),
            F.col("cash").cast("long").alias("_ic"),
            F.col("hist").cast("long").alias("_ih"),
        )
        state = (
            marked.join(prior, "node", "left")
            .select(
                "node",
                dangling.alias("_dang"),
                F.coalesce(F.col("_ic"), F.lit(scale))
                .cast("long")
                .alias("cash"),
                F.coalesce(F.col("_ih"), F.lit(0)).cast("long").alias("hist"),
            )
        )
    else:
        state = marked.select(
            "node",
            dangling,
            F.lit(scale).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
        ).toDF("node", "_dang", "cash", "hist")
    root = state.agg(
        F.coalesce(F.sum(F.when(F.col("_dang"), F.col("cash"))), F.lit(0))
        .cast("long")
        .alias("_root")
    )
    for _ in range(iterations):
        contrib = (
            ed.join(state, ed["src"] == state["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("cash div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        nxt = (
            marked.join(state.select("node", "hist", "cash"), "node")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(root))
            .select(
                "node",
                dangling.alias("_dang"),
                (
                    F.coalesce(F.col("s"), F.lit(0))
                    + F.expr(f"_root div {n_nodes}")
                )
                .cast("long")
                .alias("cash"),
                (F.col("hist") + F.col("cash")).cast("long").alias("hist"),
            )
        )
        state = nxt
        root = state.agg(
            F.coalesce(F.sum(F.when(F.col("_dang"), F.col("cash"))), F.lit(0))
            .cast("long")
            .alias("_root")
        )
    out = state.select("node", "cash", "hist").localCheckpoint(eager=True)
    ed.unpersist()
    nodes.unpersist()
    marked.unpersist()
    return out


def opic_sql(edges_sql: str, iterations: int = 3, scale: int = SCALE) -> str:
    """The SAME OPIC ladder as chained CTEs for the DuckDB oracle."""
    parts = [
        f"WITH _op_e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "_op_deg AS (SELECT src, COUNT(*) AS outdeg FROM _op_e GROUP BY src)",
        "_op_nodes AS (SELECT src AS node FROM _op_e"
        " UNION SELECT dst AS node FROM _op_e)",
        "_op_n AS (SELECT COUNT(*) AS n FROM _op_nodes)",
        "_op_m AS (SELECT n.node, d.outdeg IS NULL AS dang, d.outdeg"
        " FROM _op_nodes n LEFT JOIN _op_deg d ON d.src = n.node)",
        f"_op_s0 AS (SELECT node, dang, CAST({scale} AS BIGINT) AS cash,"
        " CAST(0 AS BIGINT) AS hist FROM _op_m)",
    ]
    for t in range(iterations):
        parts.append(
            f"_op_rt{t} AS (SELECT CAST(COALESCE(SUM(CASE WHEN dang"
            f" THEN cash END), 0) AS BIGINT) AS root FROM _op_s{t})"
        )
        parts.append(
            f"_op_c{t} AS (SELECT e.dst AS node,"
            f" SUM(s.cash // m.outdeg) AS s"
            f" FROM _op_e e JOIN _op_m m ON m.node = e.src"
            f" JOIN _op_s{t} s ON s.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"_op_s{t + 1} AS (SELECT m.node, m.dang,"
            f" CAST(COALESCE(c.s, 0) + r.root // n.n AS BIGINT) AS cash,"
            f" CAST(s.hist + s.cash AS BIGINT) AS hist"
            f" FROM _op_m m JOIN _op_s{t} s ON s.node = m.node"
            f" LEFT JOIN _op_c{t} c ON c.node = m.node,"
            f" _op_rt{t} r, _op_n n)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, cash, hist FROM _op_s{iterations}"
    )


def opic_py(
    edges: list[tuple[int, int]],
    iterations: int = 3,
    scale: int = SCALE,
    init: dict[int, tuple[int, int]] | None = None,
) -> dict[int, tuple[int, int]]:
    """Pure-Python executable spec of the same kernel (test oracle).

    Returns node -> (cash, hist). ``init`` warm-starts like ``opic_int``.
    """
    edges = sorted(set(edges))
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    n = len(nodes)
    init = init or {}
    cash = {v: init.get(v, (scale, 0))[0] for v in nodes}
    hist = {v: init.get(v, (scale, 0))[1] for v in nodes}
    for _ in range(iterations):
        root = sum(c for v, c in cash.items() if v not in outdeg)
        sums = {v: 0 for v in nodes}
        for s, d in edges:
            sums[d] += cash[s] // outdeg[s]
        hist = {v: hist[v] + cash[v] for v in nodes}
        cash = {v: sums[v] + root // n for v in nodes}
    return {v: (cash[v], hist[v]) for v in nodes}


# ---------------------------------------------------------------------------
# Spam mass — Gyöngyi/Berkhin/Garcia-Molina/Pedersen, "Link Spam Detection
# Based on Mass Estimation" (VLDB'06): the fraction of a page's PageRank
# that does NOT come from trusted neighborhoods. With p = PageRank (uniform
# teleport) and p' = TrustRank (teleport restricted to a vetted seed set),
# the relative spam mass is (p − k·p')/p where k rescales the seed-only
# teleport to PageRank's total teleport mass (k = n div n_seeds). High
# mass ⇒ the page's rank is manufactured by untrusted link structure —
# the demotion signal the frontier priority consumes alongside trust
# itself. Exact int64 end-to-end: both ladders are the fixed-point
# kernels above, k is an integer, and the percentage is floor-div.
# ---------------------------------------------------------------------------


def spam_mass_int(
    edges: DataFrame,
    seeds: DataFrame | list[int],
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """(node, rank, trust_scaled, spam_mass_pct).

    ``spam_mass_pct = 100·max(rank − k·trust, 0) div rank`` with
    ``k = n_nodes div n_seeds`` (rank ≥ teleport base > 0 for every node,
    so the division is total). Composes :func:`pagerank_int` and
    :func:`trustrank_int` — each ladder's scale shape is documented on it;
    the composition adds one node-sized join.

    Overflow: per-node trust ≤ n_seeds·scale (total trust mass bound), so
    k·trust ≤ n_nodes·scale — inside the PageRank guard already asserted
    by the ladders.
    """
    spark = edges.sparkSession
    if isinstance(seeds, list):
        seeds_df = spark.createDataFrame([(int(s),) for s in seeds], "node bigint")
    else:
        seeds_df = seeds.select(F.col(seeds.columns[0]).cast("long").alias("node"))
    seeds_df = seeds_df.distinct()
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    n_nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(seeds_df)
        .distinct()
        .count()
    )
    n_seeds = seeds_df.count()
    if n_seeds == 0:
        raise ValueError("spam_mass_int needs a non-empty seed set")
    k = n_nodes // n_seeds
    pr = pagerank_int(
        e, iterations=iterations, damping_pct=damping_pct, scale=scale
    )
    tr = trustrank_int(
        e,
        seeds_df,
        iterations=iterations,
        damping_pct=damping_pct,
        scale=scale,
    )
    return pr.join(tr, "node").select(
        "node",
        "rank",
        (F.lit(k) * F.col("trust")).cast("long").alias("trust_scaled"),
        F.expr(f"(100 * greatest(rank - {k} * trust, 0L)) div rank")
        .cast("long")
        .alias("spam_mass_pct"),
    )


def spam_mass_sql(
    edges_sql: str,
    seeds_sql: str,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> str:
    """The SAME composition for the DuckDB oracle (ladder CTE chains embedded
    as subqueries; k computed from the same node/seed counts)."""
    pr = pagerank_sql(
        edges_sql, iterations=iterations, damping_pct=damping_pct, scale=scale
    )
    tr = trustrank_sql(
        edges_sql,
        seeds_sql,
        iterations=iterations,
        damping_pct=damping_pct,
        scale=scale,
    )
    return f"""\
WITH _sm_pr AS ({pr}),
_sm_tr AS ({tr}),
_sm_e AS (SELECT src, dst FROM ({edges_sql})),
_sm_k AS (SELECT (SELECT COUNT(*) FROM (
            SELECT src AS node FROM _sm_e
            UNION SELECT dst AS node FROM _sm_e
            UNION SELECT node FROM ({seeds_sql}))) //
          (SELECT COUNT(DISTINCT node) FROM ({seeds_sql})) AS k)
SELECT p.node, p.rank,
       CAST(k.k * t.trust AS BIGINT) AS trust_scaled,
       CAST((100 * GREATEST(p.rank - k.k * t.trust, 0)) // p.rank AS BIGINT)
         AS spam_mass_pct
FROM _sm_pr p JOIN _sm_tr t ON t.node = p.node, _sm_k k"""


# ---------------------------------------------------------------------------
# one-pass webgraph shape report
# ---------------------------------------------------------------------------


def graph_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row structural summary of the crawl webgraph — the shape report
    every ranking run should gate on (dangling share drives PageRank's
    virtual-root mass; max out-degree flags link farms / trap hubs before
    they skew the edge shuffle): ``(n_nodes, n_edges, n_distinct_edges,
    n_self_loops, n_dangling, max_out_degree, avg_out_degree_q4)``.

    Exact int64 only (avg quantized ×1e4 via integer division). Scale
    shape: one edge-keyed distinct + one src-keyed count (both map-side
    combined) + one node union-distinct, each collapsing to a single-row
    aggregate; the final assembly is cross-joins of 1-row frames, so the
    whole report is ONE lazy plan with no driver-side action.

    Edges with a NULL endpoint (unresolvable link target) are not graph
    edges and are excluded from EVERY stat — the rule both engines apply
    identically (NULL would otherwise poison the oracle's NOT-IN dangling
    count while the anti-join kept it).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).where(
        F.col("s").isNotNull() & F.col("d").isNotNull()
    )
    nodes = e.select(F.col("s").alias("n")).union(
        e.select(F.col("d").alias("n"))
    ).distinct()
    dist = e.distinct()
    outdeg = dist.groupBy("s").agg(F.count("*").cast("long").alias("od"))
    raw_agg = e.agg(F.count("*").cast("long").alias("n_edges"))
    de_agg = dist.agg(
        F.count("*").cast("long").alias("n_distinct_edges"),
        F.coalesce(
            F.sum((F.col("s") == F.col("d")).cast("long")), F.lit(0)
        ).alias("n_self_loops"),
    )
    od_agg = outdeg.agg(
        F.coalesce(F.max("od"), F.lit(0)).alias("max_out_degree"),
        F.coalesce(F.sum("od"), F.lit(0)).alias("_od_tot"),
    )
    n_agg = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    # dangling = nodes that never appear as a distinct-edge source
    dang_agg = nodes.join(
        outdeg.select(F.col("s").alias("n")), on="n", how="left_anti"
    ).agg(F.count("*").cast("long").alias("n_dangling"))
    return (
        n_agg.crossJoin(raw_agg)
        .crossJoin(de_agg)
        .crossJoin(dang_agg)
        .crossJoin(od_agg)
        .select(
            "n_nodes",
            "n_edges",
            "n_distinct_edges",
            "n_self_loops",
            "n_dangling",
            "max_out_degree",
            F.expr(
                "CAST(10000 * _od_tot div greatest(1, n_nodes) AS BIGINT)"
            ).alias("avg_out_degree_q4"),
        )
    )


def graph_stats_sql(edges_sql: str, src: str = "src", dst: str = "dst") -> str:
    """DuckDB replay of ``graph_stats`` (same distinct/dangling/avg and
    NULL-endpoint-exclusion rules)."""
    return f"""WITH _e AS (SELECT {src} AS s, {dst} AS d FROM ({edges_sql})
            WHERE {src} IS NOT NULL AND {dst} IS NOT NULL),
_n AS (SELECT DISTINCT n FROM (SELECT s AS n FROM _e
                               UNION ALL SELECT d FROM _e)),
_de AS (SELECT DISTINCT s, d FROM _e),
_od AS (SELECT s, CAST(count(*) AS BIGINT) AS od FROM _de GROUP BY s)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM _n) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM _e) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM _de) AS n_distinct_edges,
       (SELECT CAST(coalesce(sum(CASE WHEN s = d THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM _de) AS n_self_loops,
       (SELECT CAST(count(*) AS BIGINT) FROM _n
        WHERE n NOT IN (SELECT s FROM _od)) AS n_dangling,
       (SELECT CAST(coalesce(max(od), 0) AS BIGINT) FROM _od)
         AS max_out_degree,
       CAST(10000 * (SELECT coalesce(sum(od), 0) FROM _od)
            // greatest(1, (SELECT count(*) FROM _n)) AS BIGINT)
         AS avg_out_degree_q4"""
