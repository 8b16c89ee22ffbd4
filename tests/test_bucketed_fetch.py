"""Large-batch fetch path: bucketed pages table, probe-only shuffle.

VERDICT r1 item 3: CrawlJob must exploit a ``CLUSTERED BY (url) SORTED BY
(url)`` pages layout above the broadcast limit — the 100 TB side (html bytes)
must never cross an Exchange. Asserted directly on the physical plan, plus
end-to-end equality of the bucketed-path crawl with the broadcast-path crawl.
"""

import contextlib
import io

from pyspark.sql import functions as F

from scrape_spark.plans.crawl import CrawlJob, simulated_fetch
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import generate_pages, robots_source_df, seed_urls

N_HOSTS = 3
PPH = 20
K = 3
N_BUCKETS = 8


def _bucketed_pages(spark, tmp_path, name):
    loc = str(tmp_path / name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        generate_pages(spark, N_HOSTS, PPH, K, mega_host=None)
        .repartition(N_BUCKETS, "url")
        .write.format("parquet")
        .bucketBy(N_BUCKETS, "url")
        .sortBy("url")
        .option("path", loc)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return spark.table(name)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_fetch_plan_never_shuffles_html(spark, tmp_path):
    pages = _bucketed_pages(spark, tmp_path, "pages_bkt_plan")
    probe = (
        pages.select("url")
        .limit(50)
        .select(
            "url",
            F.lit("GET").alias("method"),
            F.lit("").alias("_payload_key"),
            F.lit(0).cast("long").alias("seq"),
            F.lit(0).alias("depth"),
        )
    )
    fetched = simulated_fetch(
        pages.select("url", "html", F.col("text").alias("src_text")),
        probe,
        pages_have_methods=False,
        broadcast=False,
        bucketed=True,
    )
    plan = _formatted_plan(fetched)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # no Exchange node may carry the html column: the pages side merge-joins
    # straight off the pre-sorted bucket files, only the probe shuffles
    for section in plan.split("\n\n"):
        if section.lstrip().startswith("(") and "Exchange" in section.splitlines()[0]:
            assert "html#" not in section, section


def test_bucketed_crawl_matches_broadcast_crawl(spark, tmp_path):
    pages_b = _bucketed_pages(spark, tmp_path, "pages_bkt_e2e")
    jb = CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / "bkt")),
        pages_b,
        robots_source_df(spark, N_HOSTS, mega_host=None),
        n_buckets=4,
        bucket_capacity=1 << 12,
        broadcast_batch_limit=0,  # force the large-batch path
        pages_bucketed=True,
    )
    jb.seed(seed_urls(N_HOSTS))
    jb.run()

    pages_p = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    jg = CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / "bc")),
        pages_p,
        robots_source_df(spark, N_HOSTS, mega_host=None),
        n_buckets=4,
        bucket_capacity=1 << 12,
    )
    jg.seed(seed_urls(N_HOSTS))
    jg.run()

    cols = ["url", "status", "seq", "depth", "content_hash", "error_message"]
    sb = sorted(tuple(r) for r in jb.frontier().select(*cols).collect())
    sg = sorted(tuple(r) for r in jg.frontier().select(*cols).collect())
    assert sb == sg
    pages_p.unpersist()
