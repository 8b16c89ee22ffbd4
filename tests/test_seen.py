"""SeenSet: exact dedup semantics with the bloom prefilter in the path."""

from pyspark.sql import functions as F

from scrape_spark.operators.seen import SeenSet
from scrape_spark.plans.statestore import SnapshotStore


def _mk(spark, tmp_path, **kw):
    store = SnapshotStore(spark, str(tmp_path / "state"))
    # bloom_build_min=0: tests exercise the bloom machinery at toy sizes
    # (production defers builds below probe_broadcast_limit, where the
    # broadcast fast path never probes them — see deferral tests below)
    kw.setdefault("bloom_build_min", 0)
    return SeenSet(store, n_buckets=8, bucket_capacity=1 << 12, **kw)


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_filter_new_on_empty_set_passes_all(spark, tmp_path):
    seen = _mk(spark, tmp_path)
    cand = _urls(spark, ["http://a.test/1", "http://a.test/2"])
    assert seen.filter_new(cand).count() == 2


def test_add_then_filter(spark, tmp_path):
    seen = _mk(spark, tmp_path)
    seen.add(_urls(spark, [f"http://h.test/p/{i}" for i in range(500)]))
    cand = _urls(
        spark,
        [f"http://h.test/p/{i}" for i in range(450, 550)],  # 50 dup, 50 new
    )
    out = seen.filter_new(cand)
    urls = {r["url"] for r in out.collect()}
    assert urls == {f"http://h.test/p/{i}" for i in range(500, 550)}
    # schema untouched for downstream
    assert out.columns == ["url"]


def test_incremental_add_unions(spark, tmp_path):
    seen = _mk(spark, tmp_path)
    seen.add(_urls(spark, ["http://h.test/a"]))
    seen.add(_urls(spark, ["http://h.test/b"]))
    out = seen.filter_new(
        _urls(spark, ["http://h.test/a", "http://h.test/b", "http://h.test/c"])
    )
    assert {r["url"] for r in out.collect()} == {"http://h.test/c"}
    # seen table content is the union, deduped
    assert seen.read().count() == 2


def test_extra_columns_survive(spark, tmp_path):
    seen = _mk(spark, tmp_path)
    seen.add(_urls(spark, ["http://h.test/a"]))
    cand = spark.createDataFrame(
        [("http://h.test/a", 1), ("http://h.test/x", 2)], "url string, depth int"
    )
    out = seen.filter_new(cand)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["depth"] == 2
    assert set(out.columns) == {"url", "depth"}


def test_exact_on_url_mode(spark, tmp_path):
    seen = _mk(spark, tmp_path)
    seen.add(_urls(spark, ["http://h.test/a"]))
    out = seen.filter_new(_urls(spark, ["http://h.test/a", "http://h.test/b"]),
                          exact_on_url=True)
    assert {r["url"] for r in out.collect()} == {"http://h.test/b"}


def test_hash_collision_does_not_drop_new_url(spark, tmp_path):
    """Force a 64-bit hash collision (constant _key_hash): the colliding NEW
    URL must survive filter_new on BOTH plan paths, because exactness
    resolves on the URL text, never the hash (VERDICT r2 item 2)."""
    seen = _mk(spark, tmp_path)
    seen._key_hash = lambda url_col: F.lit(7).cast("long")  # everything collides
    seen.add(_urls(spark, ["http://h.test/seen"]))
    cand = _urls(spark, ["http://h.test/seen", "http://h.test/new"])
    # small/broadcast path
    assert {r["url"] for r in seen.filter_new(cand).collect()} == {
        "http://h.test/new"
    }
    # forced bloom/cogroup path: the bloom flags the colliding new URL as
    # "maybe seen"; the text-keyed exact check must rescue it
    seen.probe_broadcast_limit = 0
    assert {r["url"] for r in seen.filter_new(cand).collect()} == {
        "http://h.test/new"
    }


def test_hash_collision_does_not_merge_rows_in_add(spark, tmp_path):
    """Two DISTINCT urls with colliding hashes must both be stored: add() and
    compaction dedup on the key text, not the hash."""
    seen = _mk(spark, tmp_path)
    seen._key_hash = lambda url_col: F.lit(7).cast("long")
    seen.add(_urls(spark, ["http://h.test/a", "http://h.test/b"]))
    assert seen.read().count() == 2
    # drive a compaction (chain_length >= compact_every) and recheck
    seen.add(_urls(spark, ["http://h.test/c"]), compact_every=1)
    assert {r["url"] for r in seen.read().collect()} == {
        "http://h.test/a", "http://h.test/b", "http://h.test/c"
    }


def test_bloom_prefilter_routes_most_rows_past_join(spark, tmp_path):
    """Sanity: fresh urls are 'definitely new' (bloom), dups are 'maybe'."""
    seen = _mk(spark, tmp_path)
    seen.add(_urls(spark, [f"http://h.test/{i}" for i in range(1000)]))
    # internal probe: reuse the machinery via filter_new and check counts only
    fresh = _urls(spark, [f"http://new.test/{i}" for i in range(1000)])
    assert seen.filter_new(fresh).count() == 1000
    dups = _urls(spark, [f"http://h.test/{i}" for i in range(1000)])
    assert seen.filter_new(dups).count() == 0


def test_large_path_bloom_cogroup_matches_small_path(spark, tmp_path):
    """Forcing the bloom/cogroup path (probe_broadcast_limit=0) must give
    exactly the same survivors as the small broadcast path."""
    small = _mk(spark, tmp_path)
    small.add(_urls(spark, [f"http://h.test/p/{i}" for i in range(300)]))
    small.add(_urls(spark, [f"http://h.test/q/{i}" for i in range(50)]))  # delta
    cand = _urls(
        spark,
        [f"http://h.test/p/{i}" for i in range(250, 320)]
        + [f"http://h.test/q/{i}" for i in range(40, 60)],
    )
    expect = {r["url"] for r in small.filter_new(cand).collect()}
    small.probe_broadcast_limit = 0  # force bloom + scan-only exact checks
    got = {r["url"] for r in small.filter_new(cand).collect()}
    assert got == expect
    assert got == {f"http://h.test/p/{i}" for i in range(300, 320)} | {
        f"http://h.test/q/{i}" for i in range(50, 60)
    }


def test_bloom_build_deferred_below_threshold(spark, tmp_path):
    """Small seen sets never build a bloom table (the broadcast fast path
    doesn't probe it), and dedup stays exact without one — including on the
    forced large path, which falls back to all-exact checks."""
    seen = _mk(spark, tmp_path, bloom_build_min=10_000)
    seen.add(_urls(spark, [f"http://h.test/{i}" for i in range(200)]))
    assert not seen.store.exists(seen.bloom_name)
    cand = _urls(spark, ["http://h.test/5", "http://fresh.test/a"])
    assert {r["url"] for r in seen.filter_new(cand).collect()} == {
        "http://fresh.test/a"
    }
    seen.probe_broadcast_limit = 0  # large path with NO bloom table
    assert {r["url"] for r in seen.filter_new(cand).collect()} == {
        "http://fresh.test/a"
    }
    # compaction below the threshold still skips the bloom build
    seen.add(_urls(spark, ["http://h.test/x"]), compact_every=1)
    assert not seen.store.exists(seen.bloom_name)


def test_existing_bloom_always_rebuilt_at_base_writes(spark, tmp_path):
    """Once a bloom table exists it must be refreshed by every base write —
    a bloom staler than the base yields false 'definitely new' verdicts."""
    seen = _mk(spark, tmp_path, bloom_build_min=0)  # force initial build
    seen.add(_urls(spark, [f"http://h.test/{i}" for i in range(50)]))
    assert seen.store.exists(seen.bloom_name)
    v0 = seen.store.current_snapshot(seen.bloom_name)["id"]
    # raise the threshold ABOVE the table size: rebuild must happen anyway
    seen.bloom_build_min = 10_000
    seen.add(_urls(spark, ["http://h.test/new1"]))  # delta (chain length 1)
    seen.add(_urls(spark, ["http://h.test/new2"]), compact_every=1)  # compaction
    assert seen.store.current_snapshot(seen.bloom_name)["id"] > v0
    # the refreshed bloom covers the new key on the forced large path
    seen.probe_broadcast_limit = 0
    out = seen.filter_new(
        _urls(spark, ["http://h.test/new1", "http://fresh.test/b"])
    )
    assert {r["url"] for r in out.collect()} == {"http://fresh.test/b"}


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------
def test_kmv_exact_below_k(spark):
    from scrape_spark.operators.seen import kmv_distinct

    urls = [(f"http://h.test/{i}",) for i in range(40)] * 3  # heavy repeats
    df = spark.createDataFrame(urls, "url string")
    row = kmv_distinct(df, k=256).collect()[0]
    assert row["n_kept"] == 40 and row["estimate"] == 40  # exact below k


def test_kmv_estimate_accuracy_and_determinism(spark):
    import duckdb

    from scrape_spark.operators.seen import kmv_distinct, kmv_distinct_sql

    n = 3000
    urls = [(f"http://h{i % 37}.test/page/{i}",) for i in range(n)]
    df = spark.createDataFrame(urls, "url string")
    got = tuple(kmv_distinct(df, k=128).collect()[0])
    gen = (
        f"SELECT 'http://h' || CAST(i % 37 AS VARCHAR) || '.test/page/' "
        f"|| CAST(i AS VARCHAR) AS url FROM range({n}) t(i)"
    )
    want = duckdb.sql(kmv_distinct_sql(gen, k=128)).fetchone()
    assert got == tuple(want)  # bit-identical across engines
    est = got[2]
    assert abs(est - n) / n < 0.25  # KMV with k=128: ~9% stderr, 25% bound


def test_stale_bloom_detected_and_rebuilt(spark, tmp_path):
    """review r5: a crash between a compaction's base commit and the bloom
    rebuild leaves the OLD bloom probing the NEW base — keys that moved
    from the delta chain into the base would flow out as false 'definitely
    new'. filter_new must detect the stale stamp and self-heal."""
    seen = _mk(spark, tmp_path, bloom_build_min=0)
    seen.add(_urls(spark, [f"http://h.test/p/{i}" for i in range(100)]))
    stale_bloom_snap = seen.store.current_snapshot(seen.bloom_name)["id"]
    # delta, then compaction with the bloom rebuild suppressed = the crash
    seen.add(_urls(spark, [f"http://h.test/q/{i}" for i in range(30)]))
    orig = seen._maybe_build_blooms
    seen._maybe_build_blooms = lambda meta: None  # crash window
    seen.add(_urls(spark, ["http://h.test/z"]), compact_every=1)
    seen._maybe_build_blooms = orig
    assert (
        seen.store.current_snapshot(seen.bloom_name)["id"]
        == stale_bloom_snap  # bloom genuinely stale on disk
    )
    seen.probe_broadcast_limit = 0  # force the bloom path
    cand = _urls(
        spark,
        [f"http://h.test/q/{i}" for i in range(20, 40)]  # 10 dup, 10 new
        + ["http://h.test/z", "http://fresh.test/a"],
    )
    got = {r["url"] for r in seen.filter_new(cand).collect()}
    assert got == {f"http://h.test/q/{i}" for i in range(30, 40)} | {
        "http://fresh.test/a"
    }
    # and the repair stamped a fresh bloom for the new base
    m = seen.store.current_snapshot(seen.bloom_name)["meta"]
    assert m["for_snap"] == seen.store.chain_parts(seen.name)[0]["id"]


def test_prune_never_drops_the_chain_base(spark, tmp_path):
    """review r5: prune counted raw snapshots, so on a delta-chained table
    it could delete the chain's BASE — merge-on-read would then silently
    promote the oldest surviving delta and lose rows."""
    from scrape_spark.plans.statestore import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "ps"))
    base = _urls(spark, [f"http://h.test/{i}" for i in range(20)])
    store.write("t", base, meta={"base": True})
    for j in range(4):
        store.write("t", _urls(spark, [f"http://d{j}.test/x"]), meta={"delta": True})
    store.prune("t", keep_last=2)
    parts = store.chain_parts("t")
    assert parts[0]["meta"].get("base"), "chain base must survive prune"
    assert len(parts) == 5  # whole current chain retained
    # and the data is still readable end to end
    assert store.read_chain("t").count() == 24


def test_failed_write_preserves_rollback_targets(spark, tmp_path):
    """review r5: orphan data files are deleted only AFTER the manifest
    commit — a write that fails mid-parquet must leave every snapshot the
    on-disk manifest lists readable (the copy-on-write contract)."""
    from scrape_spark.plans.statestore import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "cw"))
    for j in range(3):
        store.write("t", _urls(spark, [f"http://s{j}.test/x"]))
    store.rollback("t", 1)
    # a write whose parquet stage fails (unwritable frame)
    bad = _urls(spark, ["http://x.test/1"]).selectExpr(
        "assert_true(url IS NULL) AS boom", "url"
    )
    try:
        store.write("t", bad)
    except Exception:
        pass
    # snapshot 2 was cut from the in-memory manifest of the failed write,
    # but the on-disk manifest still lists it — its files must exist
    fresh = SnapshotStore(spark, str(tmp_path / "cw"))
    snaps = [s["id"] for s in fresh._load()["tables"]["t"]["snapshots"]]
    assert 2 in snaps
    fresh.rollback("t", 2)
    assert fresh.read("t").count() == 1  # files intact, readable
