"""Redirect-chain resolution — pointer doubling over a functional edge set.

Live crawlers resolve redirects inline (the reference's ``requests.get``
follows them silently, scraper.py fetch path — the stored URL is the
REQUESTED one, so a lake built from such a crawl is full of chains:
``http→https``, ``www→apex``, tracking hops, moved pages). Offline, a
100 TB lake wants every chain collapsed to its terminal target so dedup,
ranking and recrawl all key on the final URL.

A redirect set is a FUNCTIONAL graph (≤ 1 outgoing edge per URL), so the
chain walk composes: if ``f_k`` advances a URL up to ``2^k`` hops (stopping
early at a terminal), then ``f_{k+1} = f_k ∘ f_k``. ``resolve_redirects``
therefore runs ``ceil(log2(max_hops))`` SELF-JOIN rounds instead of
``max_hops`` sequential joins — 3 shuffles for 8 hops, 5 for 32; each round
is a plain hash join on the URL key, no driver-side iteration over rows.
Cycles never terminate; the hop cap bounds them and the ``terminal`` column
(does the resolved URL still have an outgoing edge?) tells resolved chains
apart from capped walks — a cycle or an over-long chain both surface as
``terminal = false``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 8,
) -> DataFrame:
    """Resolve every chain start up to ``max_hops`` advances.

    ``max_hops`` is rounded UP to the next power of two — the walk advances
    in doubling rounds, and a partial final round cannot be expressed as a
    composition of the full map (a node that happens to sit near a terminal
    would under-advance). Input: one row per redirect edge. Output: one row
    per input edge's source with (``src``, ``resolved``, ``hops``,
    ``terminal``) where ``hops = min(chain length, cap)`` and ``terminal``
    is false iff the walk was capped mid-chain (long chain or cycle).

    Duplicate sources violate the functional contract and would fan out in
    the self-join; deduped defensively on entry (a redirect map should be
    unique per source).
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    m = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("resolved")
        )
        .dropDuplicates(["src"])
        .withColumn("hops", F.lit(1).cast("long"))
    )
    rounds = (max_hops - 1).bit_length()  # cap = 2**rounds >= max_hops
    for _ in range(rounds):
        nxt = m.select(
            F.col("src").alias("_jsrc"),
            F.col("resolved").alias("_jdst"),
            F.col("hops").alias("_jhops"),
        )
        m = (
            m.join(nxt, m["resolved"] == nxt["_jsrc"], "left")
            .select(
                "src",
                F.coalesce("_jdst", "resolved").alias("resolved"),
                (F.col("hops") + F.coalesce("_jhops", F.lit(0))).alias("hops"),
            )
        )
    heads = edges.select(F.col(src_col).alias("_hsrc")).dropDuplicates(
        ["_hsrc"]
    )
    return (
        m.join(heads, m["resolved"] == heads["_hsrc"], "left")
        .select(
            "src",
            "resolved",
            "hops",
            F.col("_hsrc").isNull().alias("terminal"),
        )
    )
