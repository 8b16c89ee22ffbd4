"""HTTP conditional-revisit (304) extension — CrawlJob(conditional_fetch=True).

The reference re-downloads and re-parses every page on a re-crawl
(scraper.py:73-109 has no validator handling); the engine's extension sends
the stored content_hash as a strong validator and takes a 304 path for
unchanged bodies: no Arrow transfer, no parse, no link re-expansion, prior
derived columns preserved. Pinned here:

- first crawl is all-200 even with the flag on (no prior validator);
- an unchanged re-crawl is all-304 and OBSERVATIONALLY IDENTICAL to the
  unconditional re-crawl on every frontier column except status_code;
- a changed subset re-fetches (200, new hashes) while the unchanged rest
  304s, and a link added to a changed page IS discovered and crawled.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from scrape_spark.plans.crawl import CrawlJob
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.sources.webgraph import generate_pages, robots_source_df, seed_urls

N_HOSTS = 2
PPH = 8
K = 3


def _job(spark, path, pages, conditional: bool) -> CrawlJob:
    return CrawlJob(
        spark,
        SnapshotStore(spark, str(path)),
        pages,
        robots_source_df(spark, N_HOSTS, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
        conditional_fetch=conditional,
    )


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, N_HOSTS, PPH, K, mega_host=None).persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def first_crawl(spark, pages, tmp_path_factory):
    """One conditional-flag crawl to completion; tests clone the store."""
    root = tmp_path_factory.mktemp("cond_base") / "store"
    job = _job(spark, root, pages, conditional=True)
    job.seed(seed_urls(N_HOSTS))
    job.run()
    return root


def _clone(src, tmp_path, name):
    dst = tmp_path / name
    shutil.copytree(src, dst)
    return dst


def _rows(job):
    return {
        r["url"]: r.asDict()
        for r in job.frontier().collect()
    }


def test_first_crawl_has_no_304(spark, pages, first_crawl, tmp_path):
    job = _job(spark, _clone(first_crawl, tmp_path, "s0"), pages, True)
    codes = {r["status_code"] for r in job.frontier().collect()}
    assert 304 not in codes
    assert 200 in codes


def test_unchanged_recrawl_is_all_304_and_state_preserving(
    spark, pages, first_crawl, tmp_path
):
    job = _job(spark, _clone(first_crawl, tmp_path, "s1"), pages, True)
    before = _rows(job)
    job.reset_processed()
    metrics = job.run()
    after = _rows(job)

    n304 = 0
    for url, b in before.items():
        a = after[url]
        if b["status"] == "done":
            assert a["status"] == "done"
            assert a["status_code"] == 304, url
            n304 += 1
            for col in ("content_hash", "page_title", "text_sha", "text_match"):
                assert a[col] == b[col], (url, col)
        elif b["status"] == "error":
            # errors carry no validator -> full (failed) re-fetch, as before
            assert a["status"] == "error" and a["status_code"] is None
    assert n304 >= 4
    # no re-discovery: link expansion skipped, and every link is seen anyway
    assert set(after) == set(before)
    assert sum(m.get("new_urls", 0) for m in metrics) == 0
    # the metric rides the round observe()
    assert sum(m.get("not_modified", 0) for m in metrics) == n304


def test_conditional_equals_unconditional_except_status_code(
    spark, pages, first_crawl, tmp_path
):
    jc = _job(spark, _clone(first_crawl, tmp_path, "s2c"), pages, True)
    ju = _job(spark, _clone(first_crawl, tmp_path, "s2u"), pages, False)
    for j in (jc, ju):
        j.reset_processed()
        j.run()
    got_c, got_u = _rows(jc), _rows(ju)
    assert set(got_c) == set(got_u)
    skip = {"status_code"}
    for url, c in got_c.items():
        u = got_u[url]
        for col, vc in c.items():
            if col in skip:
                continue
            assert vc == u[col], (url, col, vc, u[col])
        if c["status"] == "done":
            assert (c["status_code"], u["status_code"]) == (304, 200)


def test_changed_subset_refetches_and_discovers_new_link(
    spark, pages, first_crawl, tmp_path
):
    target = f"http://host0.test/p/0/{K}"  # a non-seed crawled page
    # must be under the changed page's own URL or is_under_base drops it
    added = f"{target}/newly-added"
    patch = f'<p>updated body</p><a href="{added}">Fresh</a>'
    mutated = pages.withColumn(
        "html",
        F.when(
            F.col("url") == target,
            F.concat(F.col("html"), F.lit(patch.encode("utf-8"))),
        ).otherwise(F.col("html")),
    )
    job = _job(spark, _clone(first_crawl, tmp_path, "s3"), mutated, True)
    before = _rows(job)
    assert before[target]["status"] == "done"
    job.reset_processed()
    job.run()
    after = _rows(job)

    chg = after[target]
    assert chg["status_code"] == 200
    assert chg["content_hash"] != before[target]["content_hash"]
    assert chg["text_sha"] != before[target]["text_sha"]
    # the added link was discovered (changed page re-parsed), then fetched
    # and 404'd (no such page in the web) — proof expansion ran
    assert after[added]["status"] == "error"
    # every other previously-done page took the 304 path untouched
    for url, b in before.items():
        if url == target or b["status"] != "done":
            continue
        assert after[url]["status_code"] == 304, url
        assert after[url]["content_hash"] == b["content_hash"]


# ---------------------------------------------------------------------------
# digest mode: pages carry payload_digest (WARC-Payload-Digest analog) —
# the 304 decision never reads the html column
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pages_parquet(spark, pages, tmp_path_factory):
    """Digest-bearing pages materialized as parquet so column pruning is real."""
    out = str(tmp_path_factory.mktemp("cond_digest") / "pages")
    pages.withColumn("payload_digest", F.sha2(F.col("html"), 256)).write.parquet(out)
    return spark.read.parquet(out)


def test_digest_mode_equals_instream_mode(
    spark, pages, pages_parquet, first_crawl, tmp_path
):
    jd = _job(spark, _clone(first_crawl, tmp_path, "d1"), pages_parquet, True)
    ji = _job(spark, _clone(first_crawl, tmp_path, "d2"), pages, True)
    metrics = {}
    for tag, j in (("digest", jd), ("instream", ji)):
        j.reset_processed()
        metrics[tag] = j.run()
    got_d, got_i = _rows(jd), _rows(ji)
    assert got_d == got_i
    assert any(r["status_code"] == 304 for r in got_d.values())
    assert sum(m.get("not_modified", 0) for m in metrics["digest"]) == sum(
        m.get("not_modified", 0) for m in metrics["instream"]
    ) > 0


def test_digest_mode_changed_page_refetched(
    spark, pages_parquet, first_crawl, tmp_path
):
    target = f"http://host0.test/p/0/{K}"
    mutated = pages_parquet.withColumn(
        "html",
        F.when(
            F.col("url") == target,
            F.concat(F.col("html"), F.lit(b"<p>changed</p>")),
        ).otherwise(F.col("html")),
    ).withColumn("payload_digest", F.sha2(F.col("html"), 256))
    job = _job(spark, _clone(first_crawl, tmp_path, "d3"), mutated, True)
    before = _rows(job)
    job.reset_processed()
    job.run()
    after = _rows(job)
    assert after[target]["status_code"] == 200
    assert after[target]["content_hash"] != before[target]["content_hash"]
    others = [
        u for u, b in before.items() if b["status"] == "done" and u != target
    ]
    assert others and all(after[u]["status_code"] == 304 for u in others)


def test_digest_decision_scan_prunes_html(spark, pages_parquet, first_crawl, tmp_path):
    """The digest-only projection must reach the parquet scan: the plan has a
    pages scan whose ReadSchema includes payload_digest and NOT html."""
    import contextlib
    import io
    import re

    job = _job(spark, _clone(first_crawl, tmp_path, "d4"), pages_parquet, True)
    job.reset_processed()
    pending = job.frontier().where(F.col("status") == "pending")
    probe = pending.select(
        "url",
        "method",
        F.coalesce(F.col("payload"), F.lit("")).alias("_payload_key"),
        F.col("content_hash").alias("_prior_hash"),
    )
    digests = job.pages.select("url", "payload_digest")
    nm = digests.join(F.broadcast(probe), on="url").where(
        F.col("payload_digest") == F.col("_prior_hash")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        nm.explain("formatted")
    plan = buf.getvalue()
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    digest_scans = [s for s in schemas if "payload_digest" in s]
    assert digest_scans, plan
    assert all("html" not in s for s in digest_scans), digest_scans
