"""Structured Streaming frontier pipelines: streaming dedup + windowed metrics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scrape_spark.streaming.frontier_stream import (
    dedup_link_stream,
    fetch_metrics_stream,
)

T0 = dt.datetime(2025, 6, 1, 0, 0, 0)


def _run_stream(out_df, name: str):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_dedup_drops_in_window_duplicates(spark, tmp_path):
    rows = [
        ("http://h.test/a", "seed", 0, T0),
        ("http://h.test/b", "seed", 1, T0 + dt.timedelta(seconds=10)),
        ("http://h.test/a", "other", 2, T0 + dt.timedelta(seconds=20)),  # dup
    ]
    src = spark.createDataFrame(
        rows, "url string, referrer string, link_pos int, discovered_at timestamp"
    )
    src_dir = str(tmp_path / "links")
    src.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    out = dedup_link_stream(stream, watermark="1 hour")
    _run_stream(out, "dedup_links")
    got = spark.sql("SELECT url FROM dedup_links").collect()
    assert sorted(r["url"] for r in got) == ["http://h.test/a", "http://h.test/b"]


def test_streaming_fetch_metrics_windows(spark, tmp_path):
    rows = [
        ("http://h1.test/a", 200, 100, T0 + dt.timedelta(seconds=5)),
        ("http://h1.test/b", 404, 0, T0 + dt.timedelta(seconds=30)),
        ("http://h2.test/a", 200, 50, T0 + dt.timedelta(seconds=70)),
        # append mode only emits windows the watermark has passed; this late
        # "flush" event closes the minute-1 window (its own window stays open)
        ("http://h9.test/z", 200, 1, T0 + dt.timedelta(seconds=600)),
    ]
    src = spark.createDataFrame(
        rows, "url string, status_code int, content_len long, fetched_at timestamp"
    )
    src_dir = str(tmp_path / "results")
    src.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    out = fetch_metrics_stream(stream, window="1 minute", watermark="0 seconds")
    _run_stream(out, "fetch_metrics")
    got = {
        (r["host"], r["win"]["start"].minute): (r["n_fetched"], r["n_errors"], r["bytes"])
        for r in spark.sql("SELECT * FROM fetch_metrics").collect()
    }
    assert got[("h1.test", 0)] == (2, 1, 100)
    assert got[("h2.test", 1)] == (1, 0, 50)


def test_stateful_politeness_slots_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: per-host slot spacing ≥ crawl_delay holds
    ACROSS micro-batches (state carries), hosts independent."""
    import pyspark.sql.functions as F

    from scrape_spark.streaming.frontier_stream import politeness_slot_stream

    src_dir = str(tmp_path / "cand")
    schema = "url string, enqueued_at timestamp"
    batch1 = [
        ("http://slow.test/a", T0),
        ("http://slow.test/b", T0),  # same arrival → must space out by delay
        ("http://fast.test/a", T0),
    ]
    batch2 = [
        ("http://slow.test/c", T0 + dt.timedelta(seconds=1)),  # arrives before
        # slow.test's last granted slot + delay → must be pushed later
        ("http://fast.test/b", T0 + dt.timedelta(seconds=1)),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src_dir)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(src_dir)
    )
    out = politeness_slot_stream(
        stream, crawl_delays={"slow.test": 5}, default_delay=0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("slots")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT host, url, fetch_slot FROM slots").collect()
    assert len(rows) == 5
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["fetch_slot"])
    for slots in by_host.values():
        slots.sort()
    # slow.test: delay 5 → spacing ≥ 5s even across the batch boundary
    slow = by_host["slow.test"]
    assert len(slow) == 3
    for a, b in zip(slow, slow[1:]):
        assert (b - a).total_seconds() >= 5, (a, b)
    # fast.test: delay 0 → slots equal event times
    fast = by_host["fast.test"]
    assert [s.second for s in sorted(fast)] == [0, 1]


def test_rate_source_e2e_dedup_then_politeness(spark, tmp_path):
    """Live e2e of SURVEY §2.8: an unbounded rate-micro-batch source feeds
    link discovery → watermarked streaming dedup → parquet frontier dir,
    while a second query tails that dir (frontier_file_stream) through the
    stateful politeness scheduler into a memory sink — the two-stage shape a
    real deployment runs (durable frontier between the stages). Asserts the
    cross-stage invariants: the sink never sees a duplicate URL, and
    per-host fetch slots stay >= crawl_delay apart across micro-batches."""
    import time

    from scrape_spark.streaming.frontier_stream import (
        frontier_file_stream,
        politeness_slot_stream,
    )

    frontier_dir = str(tmp_path / "frontier")
    # deterministic unbounded source: 20 rows/batch, event time advances 1s
    # per batch; url cycles every 30 values → in-watermark duplicates
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 20)
        .option("numPartitions", 2)
        .option("startTimestamp", 1_750_000_000_000)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )
    links = rate.selectExpr(
        "concat('http://host', value % 3, '.test/p/', value % 10) AS url",
        "'seed' AS referrer",
        "CAST(value AS INT) AS link_pos",
        "timestamp AS discovered_at",
    )
    q1 = (
        dedup_link_stream(links, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", frontier_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            p = q1.lastProgress
            if p and p["batchId"] >= 4:
                break
            time.sleep(0.5)
    finally:
        q1.stop()
    q1.awaitTermination(60)

    schema = (
        "url string, referrer string, link_pos int, "
        "discovered_at timestamp, url_hash long"
    )
    tail = frontier_file_stream(spark, frontier_dir, schema)
    out = politeness_slot_stream(
        tail,
        crawl_delays={"host0.test": 3, "host1.test": 1},
        default_delay=0,
        time_col="discovered_at",
    )
    q2 = (
        out.writeStream.format("memory")
        .queryName("rate_e2e_slots")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("SELECT host, url, fetch_slot FROM rate_e2e_slots").collect()
    assert rows, "politeness stage emitted nothing"
    # stage-1 invariant survives the stage boundary: every URL exactly once
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls))
    assert len(set(urls)) <= 30  # the source's full URL universe
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["fetch_slot"])
    assert set(by_host) <= {"host0.test", "host1.test", "host2.test"}
    for host, delay in (("host0.test", 3), ("host1.test", 1)):
        slots = sorted(by_host[host])
        for a, b in zip(slots, slots[1:]):
            assert (b - a).total_seconds() >= delay, (host, a, b)


# ---------------------------------------------------------------------------
# Continuous ingest: discovered-link stream -> live frontier (foreachBatch)
# ---------------------------------------------------------------------------


def _ingest_job(spark, root):
    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.webgraph import (
        generate_pages,
        robots_source_df,
        seed_urls,
    )

    pages = generate_pages(spark, 2, 10, 2, mega_host=None)
    job = CrawlJob(
        spark,
        SnapshotStore(spark, root),
        pages,
        robots_source_df(spark, 2, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
    )
    job.seed(seed_urls(2))
    return job


def _link_rows(spark, urls, t0=1700000000):
    return spark.createDataFrame(
        [
            (u, None, f"anchor{i}", i, i)
            for i, u in enumerate(urls)
        ],
        "url string, referrer string, anchor_text string, link_pos int,"
        " _off long",
    ).select(
        "url",
        "referrer",
        "anchor_text",
        "link_pos",
        F.timestamp_seconds(F.lit(t0) + F.col("_off")).alias("discovered_at"),
    )


def test_enqueue_stream_appends_new_urls_once(spark, tmp_path):
    from scrape_spark.streaming.frontier_stream import enqueue_stream

    job = _ingest_job(spark, str(tmp_path / "store"))
    seeded = {r["url"] for r in job.frontier().select("url").collect()}

    src_dir = str(tmp_path / "links")
    ckpt = str(tmp_path / "ckpt")
    batch1 = _link_rows(
        spark,
        ["http://ext.test/a", "http://ext.test/b", "http://ext.test/a"],
    )
    batch1.coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(batch1.schema).parquet(src_dir)
    q = enqueue_stream(stream, job, ckpt)
    q.awaitTermination(120)

    rows = {
        r["url"]: (r["status"], r["seq"])
        for r in job.frontier().select("url", "status", "seq").collect()
    }
    assert set(rows) == seeded | {"http://ext.test/a", "http://ext.test/b"}
    assert rows["http://ext.test/a"][0] == "pending"
    # in-batch duplicate collapsed; seqs continue past the seed range
    assert rows["http://ext.test/a"][1] != rows["http://ext.test/b"][1]

    # second delivery: one replayed url + one genuinely new -> only the new
    # one lands (seen anti-join makes replays idempotent)
    batch2 = _link_rows(
        spark, ["http://ext.test/a", "http://ext.test/c"], t0=1700001000
    )
    batch2.coalesce(1).write.mode("append").parquet(src_dir)
    q2 = enqueue_stream(
        spark.readStream.schema(batch1.schema).parquet(src_dir), job, ckpt
    )
    q2.awaitTermination(120)

    after = {
        r["url"] for r in job.frontier().select("url").collect()
    }
    assert after == set(rows) | {"http://ext.test/c"}
    n_a = (
        job.frontier().where(F.col("url") == "http://ext.test/a").count()
    )
    assert n_a == 1  # replay did NOT duplicate the frontier row


def test_enqueued_urls_are_crawled_by_next_rounds(spark, tmp_path):
    # the enqueue path feeds the SAME drive loop: a streamed-in URL that
    # exists in the pages table gets fetched on the next run()
    from scrape_spark.streaming.frontier_stream import enqueue_stream

    job = _ingest_job(spark, str(tmp_path / "store"))
    job.run(max_rounds=1)

    # host1's root page re-discovered via the stream under a fresh path:
    # pick a real page url not yet in the frontier
    pages_urls = [
        r["url"] for r in job.pages.select("url").limit(50).collect()
    ]
    fresh = [
        u
        for u in pages_urls
        if job.frontier().where(F.col("url") == u).count() == 0
    ]
    if not fresh:  # tiny graphs may have everything enqueued already
        return
    target = fresh[0]

    src_dir = str(tmp_path / "links2")
    _link_rows(spark, [target]).coalesce(1).write.mode("append").parquet(
        src_dir
    )
    q = enqueue_stream(
        spark.readStream.schema(_link_rows(spark, [target]).schema).parquet(
            src_dir
        ),
        job,
        str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(120)

    job.run()
    row = job.frontier().where(F.col("url") == target).collect()
    assert len(row) == 1 and row[0]["status"] in ("done", "error", "blocked")


def test_enqueue_frame_crash_between_steps_is_repaired(spark, tmp_path):
    # simulate a crash AFTER the frontier enqueue delta but BEFORE the seen
    # ref lands: a fresh job must repair the pair on resume, so the URL is
    # in the seen set and a replayed enqueue is a no-op
    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.webgraph import (
        generate_pages,
        robots_source_df,
    )

    root = str(tmp_path / "store")
    job = _ingest_job(spark, root)

    # crash window: monkeypatch add_ref to a no-op for ONE call
    real_add_ref = job.seen.add_ref
    job.seen.add_ref = lambda *a, **k: None
    n = job.enqueue_frame(_link_rows(spark, ["http://ext.test/x"]))
    assert n == 1
    job.seen.add_ref = real_add_ref

    # fresh process over the same store
    pages = generate_pages(spark, 2, 10, 2, mega_host=None)
    j2 = CrawlJob(
        spark,
        SnapshotStore(spark, root),
        pages,
        robots_source_df(spark, 2, mega_host=None),
        round_seconds=60,
        n_buckets=4,
        bucket_capacity=1 << 12,
    )
    n2 = j2.enqueue_frame(_link_rows(spark, ["http://ext.test/x"]))
    assert n2 == 0  # repair registered the ref; replay is a no-op
    assert (
        j2.frontier().where(F.col("url") == "http://ext.test/x").count() == 1
    )


def test_enqueue_frame_requires_seeded_store(spark, tmp_path):
    import pytest

    from scrape_spark.plans.crawl import CrawlJob
    from scrape_spark.plans.statestore import SnapshotStore
    from scrape_spark.sources.webgraph import generate_pages, robots_source_df

    job = CrawlJob(
        spark,
        SnapshotStore(spark, str(tmp_path / "empty")),
        generate_pages(spark, 2, 5, 1, mega_host=None),
        robots_source_df(spark, 2, mega_host=None),
    )
    with pytest.raises(ValueError, match="seed"):
        job.enqueue_frame(_link_rows(spark, ["http://ext.test/a"]))


def test_kmv_sketch_stream_matches_batch_and_replay_is_idempotent(
    spark, tmp_path
):
    """The standing sketch after two micro-batches equals the one-shot
    batch sketch over the union, and re-running a batch (at-least-once
    replay) leaves every register unchanged — idempotence by algebra."""
    from scrape_spark.operators.sketches import kmv_distinct
    from scrape_spark.streaming.frontier_stream import (
        kmv_sketch_stream,
        read_kmv_estimates,
    )

    src = tmp_path / "keys_src"
    store = tmp_path / "kmv_store"
    ckpt = tmp_path / "kmv_ckpt"
    store.mkdir()
    b1 = spark.range(0, 400).selectExpr(
        "concat('h', CAST(id % 3 AS STRING)) AS host",
        "concat('u', CAST(id AS STRING)) AS url",
    )
    b2 = spark.range(200, 700).selectExpr(  # overlaps b1: dup URLs collapse
        "concat('h', CAST(id % 3 AS STRING)) AS host",
        "concat('u', CAST(id AS STRING)) AS url",
    )
    b1.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema("host string, url string").parquet(
        str(src / "*")
    )
    q = kmv_sketch_stream(stream, str(store), str(ckpt), k=32)
    q.awaitTermination(120)
    b2.write.parquet(str(src / "b2"))
    q2 = kmv_sketch_stream(stream, str(store), str(ckpt), k=32)
    q2.awaitTermination(120)

    got = {
        r["host"]: (r["n_mins"], r["est_distinct"])
        for r in read_kmv_estimates(spark, str(store), k=32).collect()
    }
    want = {
        r["host"]: (r["n_mins"], r["est_distinct"])
        for r in kmv_distinct(b1.unionByName(b2), k=32).collect()
    }
    assert got == want  # streaming merge == one-shot batch sketch

    # at-least-once replay: merging batch 2 AGAIN changes nothing
    from scrape_spark.streaming import frontier_stream as fs

    before = sorted(
        (r["host"], tuple(r["mins"]))
        for r in fs._kmv_store_read(spark, str(store))[0].collect()
    )
    # simulate the replay by re-running the sink body on the same data
    sk = fs._kmv_store_read(spark, str(store))[0]
    from scrape_spark.operators.sketches import kmv_sketch

    import pyspark.sql.functions as F
    from scrape_spark.functions import textstats as ts

    d = ts.SPARK_DIALECT
    pair = d["aconcat"].format(a="_ma", b="_mb")
    merged_expr = d["aslice"].format(
        arr=d["asort"].format(arr=d["adistinct"].format(arr=pair)), k="32"
    )
    replay = (
        sk.select(F.col("host").alias("_g"), F.col("mins").alias("_ma"))
        .join(
            kmv_sketch(b2, k=32).select(
                F.col("host").alias("_g"), F.col("mins").alias("_mb")
            ),
            "_g",
        )
        .select(F.col("_g").alias("host"), F.expr(merged_expr).alias("mins"))
    )
    after = sorted((r["host"], tuple(r["mins"])) for r in replay.collect())
    assert before == after


def test_kmv_sketch_stream_replay_gc_and_k_guard(spark, tmp_path):
    """Post-flip replay of a committed batch is skipped (the overwrite of a
    path being lazily read would wedge the stream); superseded versions are
    GC'd down to the ``gc_keep`` newest (a reader resolved several commits
    ago may still be mid-scan — ADVICE r3); a mismatched k raises on read."""
    import os

    import pytest

    from scrape_spark.streaming.frontier_stream import (
        _kmv_store_read,
        kmv_sketch_stream,
        read_kmv_estimates,
    )

    src = tmp_path / "keys_src2"
    store = tmp_path / "kmv_store2"
    ckpt = tmp_path / "kmv_ckpt2"
    store.mkdir()
    for i in range(3):
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "concat('h', CAST(id % 2 AS STRING)) AS host",
            "concat('u', CAST(id AS STRING)) AS url",
        ).write.parquet(str(src / f"b{i}"))
        stream = spark.readStream.schema("host string, url string").parquet(
            str(src / "*")
        )
        q = kmv_sketch_stream(stream, str(store), str(ckpt), k=16, gc_keep=2)
        q.awaitTermination(120)
    # GC with gc_keep=2: at most the two newest versions remain
    versions = [n for n in os.listdir(str(store)) if n.startswith("sketch_v")]
    assert len(versions) <= 2
    # replay-skip: re-invoking the sink with the committed batch id is a
    # no-op (the pointer already names that path) — simulated directly
    df, path, stored_k = _kmv_store_read(spark, str(store))
    assert stored_k == 16 and path is not None
    before = sorted((r["host"], tuple(r["mins"])) for r in df.collect())
    # read with the stored k works; mismatched k raises
    est = read_kmv_estimates(spark, str(store))
    assert est is not None and est.count() == 2
    with pytest.raises(ValueError):
        read_kmv_estimates(spark, str(store), k=64)
    df2, path2, _ = _kmv_store_read(spark, str(store))
    after = sorted((r["host"], tuple(r["mins"])) for r in df2.collect())
    assert before == after and path2 == path
