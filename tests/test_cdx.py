"""SURT canonicalization + CDX index: goldens, layout, pushdown, parity.

The SURT kernel (functions/surt.py) is the CDX sort key; the index operator
(operators/cdx.py) must deliver a GLOBALLY sorted layout whose prefix probes
push down to the parquet scan. A pure-python reference implementation of the
transform (urllib-based, below) pins the kernel against an independent
formulation on adversarial inputs.
"""

from __future__ import annotations

import contextlib
import io
import os
from urllib.parse import urlsplit

from pyspark.sql import functions as F

from scrape_spark.functions.surt import surt_key_col
from scrape_spark.operators.cdx import (
    build_cdx_index,
    prefix_lookup,
    prefix_range_pred,
    read_cdx_index,
    write_cdx_index,
)

GOLDENS = {
    "https://USER@WWW.Example.COM:8443/a/b?z=1&a=2#frag": (
        "com,example:8443)/a/b?a=2&z=1"
    ),
    "http://www.example.com:80/": "com,example)/",
    "https://example.com": "com,example)/",
    "http://sub.host10.test/path/x?b=2&a=1&a=0": (
        "test,host10,sub)/path/x?a=0&a=1&b=2"
    ),
    "https://example.com:443/q?single=1": "com,example)/q?single=1",
    "http://host.test/semi;colon": "test,host)/semi;colon",
    "http://host.test/UPPER/Case?Z=9": "test,host)/UPPER/Case?Z=9",
    # empty query after '?' keeps no suffix; root with params
    "http://host.test/?b=2&a=1": "test,host)/?a=1&b=2",
    # query with NO path: authority ends at '?' (RFC 3986)
    "https://example.com?a=1&b=2": "com,example)/?a=1&b=2",
    "http://www.example.com:8080?z=1": "com,example:8080)/?z=1",
}


def pyref_surt(url: str) -> str:
    """Independent SURT formulation via urllib — the parity oracle."""
    s = urlsplit(url)
    host = (s.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    port = ""
    if s.port is not None and s.port != {"http": 80, "https": 443}.get(s.scheme):
        port = f":{s.port}"
    path = s.path or "/"
    q = ""
    if s.query:
        q = "?" + "&".join(sorted(s.query.split("&")))
    return f"{rev}{port}){path}{q}"


def _spark_keys(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", surt_key_col("url").alias("k")).collect()
    return {r.url: r.k for r in rows}


def test_surt_goldens(spark):
    got = _spark_keys(spark, list(GOLDENS))
    assert got == GOLDENS


def test_surt_pyref_parity(spark):
    urls = list(GOLDENS) + [
        "http://a.b.c.d.e.test/deep/path",
        "https://HOST.TEST:8443/x?k=v",
        "http://www.test/",  # single post-www label
        "http://host.test/p?a=1&a=1",  # duplicate params survive sort
        "http://host.test/p?",  # bare '?': empty query, no suffix
        "http://x.test/a/b/c?m=2&l=10",  # lexical (not numeric) param sort
        "https://x.test:444/nondefault",
        "http://x.test:443/wrong-scheme-default-kept",
        "https://no.path.test?only=query",
    ]
    got = _spark_keys(spark, urls)
    for u in urls:
        assert got[u] == pyref_surt(u), u


def _captures(spark, n=240):
    # shuffled input on purpose: the index must SORT, not inherit order
    rows = [
        (f"http://host{(i * 7) % 12}.test/doc/{i % 40}", 1_600_000_000 + i)
        for i in range(n)
    ]
    rows.reverse()
    return spark.createDataFrame(rows, "url string, ts bigint")


def test_index_globally_sorted(spark):
    idx = build_cdx_index(_captures(spark), num_ranges=4).withColumn(
        "pid", F.spark_partition_id()
    )
    rows = idx.select("pid", "surt_key", "ts").collect()
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append((r.surt_key, r.ts))
    # within-partition sorted, and partition ranges are disjoint + ordered
    flat = []
    for pid in sorted(by_pid):
        part = by_pid[pid]
        assert part == sorted(part), f"partition {pid} unsorted"
        flat.extend(part)
    assert flat == sorted(flat), "partition ranges overlap"
    assert len([p for p in by_pid if by_pid[p]]) > 1, "want a multi-part layout"


def test_prefix_pushdown_and_semantics(spark, tmp_path):
    path = os.path.join(str(tmp_path), "cdx")
    write_cdx_index(build_cdx_index(_captures(spark), num_ranges=4), path)
    index = read_cdx_index(spark, path)

    probe = index.where(prefix_range_pred("test,host1)"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "StartsWith" in plan or "GreaterThanOrEqual" in plan, plan

    # ')' closes the authority: exact host only
    exact = {r.surt_key.split(")")[0] for r in probe.collect()}
    assert exact == {"test,host1"}
    # no ')': the whole lexical subtree (host1, host10, host11)
    sub = {
        r.surt_key.split(")")[0]
        for r in prefix_lookup(index, "test,host1", with_rank=False).collect()
    }
    assert sub == {"test,host1", "test,host10", "test,host11"}


def test_capture_rank_replay_order(spark):
    index = build_cdx_index(_captures(spark), num_ranges=2)
    hits = prefix_lookup(index, "test,host3)/doc/1").collect()
    per_key: dict[str, list] = {}
    for r in hits:
        per_key.setdefault(r.surt_key, []).append((r.capture_rank, r.ts))
    assert per_key, "probe matched nothing"
    for key, pairs in per_key.items():
        pairs.sort()
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1)), key
        ts = [p[1] for p in pairs]
        assert ts == sorted(ts), key


def test_prefix_upper_bound_keeps_supplementary_plane_keys(spark):
    # keys whose continuation sorts ABOVE U+FFFF (emoji path) must still
    # match the prefix range — _next_prefix increments the prefix itself
    from scrape_spark.operators.cdx import _next_prefix

    assert _next_prefix("test,host1)") == "test,host1*"
    emoji = chr(0x1F600)
    rows = [
        ("test,host1)/" + emoji, 1),
        ("test,host1)/plain", 2),
        ("test,host2)/other", 3),
    ]
    idx = spark.createDataFrame(rows, "surt_key string, ts long")
    got = {r.surt_key for r in
           idx.where(prefix_range_pred("test,host1)")).collect()}
    assert got == {"test,host1)/" + emoji, "test,host1)/plain"}


def test_multi_run_probe_and_compaction(spark, tmp_path):
    from scrape_spark.operators.cdx import compact_cdx_runs, prefix_lookup_runs

    # two crawls of the same web, one hour apart
    runs = []
    for i, base_ts in enumerate((1_600_000_000, 1_600_003_600)):
        caps = spark.createDataFrame(
            [(f"http://host{j % 4}.test/p/{j % 6}", base_ts + j)
             for j in range(48)],
            "url string, ts bigint",
        )
        path = os.path.join(str(tmp_path), f"run{i}")
        write_cdx_index(build_cdx_index(caps, num_ranges=2), path)
        runs.append(path)

    hits = prefix_lookup_runs(spark, runs, "test,host2)").collect()
    assert hits and all(r.surt_key.startswith("test,host2)") for r in hits)
    # rank replays ACROSS runs: per key, ranks are 1..n ordered by ts,
    # interleaving both crawls
    per_key: dict[str, list] = {}
    for r in hits:
        per_key.setdefault(r.surt_key, []).append((r.ts, r.capture_rank))
    for key, pairs in per_key.items():
        pairs.sort()
        assert [p[1] for p in pairs] == list(range(1, len(pairs) + 1)), key

    # compaction folds the runs into one sorted index with the same content
    out = os.path.join(str(tmp_path), "compacted")
    idx = compact_cdx_runs(spark, runs, out, num_ranges=3)
    assert sorted(map(tuple, idx.select("surt_key", "ts").collect())) == sorted(
        map(tuple,
            prefix_lookup_runs(spark, runs, "", with_rank=False)
            .select("surt_key", "ts").collect())
    )
    direct = prefix_lookup(idx, "test,host2)").collect()
    assert sorted((r.surt_key, r.ts, r.capture_rank) for r in direct) == sorted(
        (r.surt_key, r.ts, r.capture_rank) for r in hits
    )
