"""Average-hash media dedup: fingerprint search + stub-decode chain."""

import hashlib

from pyspark.sql import functions as F

from scrape_spark.functions.multimodal import (
    _fake_decode_pixels,
    ahash_features,
    media_neardup_pairs,
)
from scrape_spark.operators.dedup import fingerprint_neardup_pairs


def _py_ahash(payload: bytes, bits: int = 60) -> int:
    px = _fake_decode_pixels(payload)
    total = sum(px)
    v = 0
    for i in range(bits):
        v = (v << 1) | (1 if px[i] * 64 > total else 0)
    return v


def _media(spark, payloads):
    return spark.createDataFrame(
        [(i, p, "image", {}) for i, p in enumerate(payloads)],
        "media_id long, media binary, media_type string, meta map<string,string>",
    )


def test_ahash_matches_python_formula(spark):
    payloads = [b"alpha", b"beta", b"alpha"]
    rows = {r["media_id"]: r["ahash"] for r in ahash_features(_media(spark, payloads)).collect()}
    assert rows == {i: _py_ahash(p) for i, p in enumerate(payloads)}
    assert rows[0] == rows[2] != rows[1]
    assert all(0 <= v < 1 << 60 for v in rows.values())


def test_fingerprint_pairs_exact_at_all_distances(spark):
    # crafted fingerprints: hamming(a,b)=1, (a,c)=3, (a,d)=4, (b,c)=2
    a = 0b111000
    b = a ^ 0b000001
    c = a ^ 0b000111
    d = a ^ 0b001111
    fps = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "id long, sh long"
    )
    got = sorted(
        (r["id_1"], r["id_2"], r["hamming"])
        for r in fingerprint_neardup_pairs(fps, bits=8, max_hamming=3).collect()
    )
    # exact: every pair at hamming<=3, none beyond
    assert got == [(1, 2, 1), (1, 3, 3), (2, 3, 2), (2, 4, 3), (3, 4, 1)]


def test_media_neardup_duplicate_groups(spark):
    payloads = [b"x0", b"x1", b"x0", b"x1", b"x2"]
    got = sorted(
        (r["id_1"], r["id_2"], r["hamming"])
        for r in media_neardup_pairs(_media(spark, payloads)).collect()
    )
    assert got == [(0, 2, 0), (1, 3, 0)]


def test_media_bytes_not_in_exchange(spark):
    df = media_neardup_pairs(_media(spark, [b"a", b"b"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "media#" not in line
