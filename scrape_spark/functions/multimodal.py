"""Multimodal column plumbing — opaque binary media + typed metadata.

A training-data pipeline at 100 TB carries image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages (decode → feature-extract → resize/frame-sample).
The decode step itself requires codec libraries (PIL/libav) that are NOT in
this container, so decoding is **stubbed behind a deterministic fake**
(clearly marked below); everything Spark-side — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested.

Scale notes: media rows are large, so the pipeline keeps Arrow batches small
(session.py caps ``maxRecordsPerBatch``), prunes the ``media`` column out of
any scheduling path, and never shuffles payload bytes — feature extraction is
map-only; joins happen on the extracted (small) feature rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media binary, media_type string, meta map<string,string>"
)
FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_sha string, "
    "width int, height int, duration_ms long"
)


def media_from_documents(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Wrap document text bytes as a synthetic media column (test fixture).

    Real deployments read WARC/tar shards into the same shape; the point is
    the column contract, not the payload.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
        F.lit(media_type).alias("media_type"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """STUB decode — deterministic fake in place of PIL/libav (not installed).

    Returns (width, height, duration_ms) derived from the payload hash so
    tests are stable. A real deployment replaces ONLY this function with
    `PIL.Image.open` / `av.open`; the Spark plumbing is unchanged.
    """
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    duration = (h[2] * 256 + h[3]) if media_type in ("audio", "video") else 0
    return width, height, duration


def decode_media_real(payload: bytes, media_type: str):
    """Real decode entry point — NOT AVAILABLE in this container."""
    raise NotImplementedError(
        "image/audio decoding requires PIL/pyav which are not installed; "
        "swap _fake_decode for this function in a full deployment"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """media → per-item features via Arrow-batched mapInPandas (map-only)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["media"], pdf["media_type"]
            ):
                data = bytes(payload) if payload is not None else b""
                w, h, dur = _fake_decode(data, mtype)
                rows.append(
                    (
                        int(mid),
                        mtype,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        w,
                        h,
                        dur,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "media_type",
                    "n_bytes",
                    "content_sha",
                    "width",
                    "height",
                    "duration_ms",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_plan(features: DataFrame, max_side: int = 224) -> DataFrame:
    """Plan the resize stage: scale factors computed relationally (no decode)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return features.withColumn("resize_scale", F.round(scale, 4))


FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame_sha string"


def frame_sample(media: DataFrame, k: int = 4) -> DataFrame:
    """Uniform frame sampling over video payloads (Arrow-batched, map-only).

    Emits ``k`` rows per video: frame_idx, its timestamp (uniform over the
    decoded duration, exact integer math), and the frame content hash. The
    frame DECODE is the same stub contract as ``_fake_decode`` — the hash is
    a deterministic formula over (payload, frame_idx), so the whole stage is
    oracle-checkable; a real deployment replaces only the inner kernel with
    `av.open(...).decode(video=0)` seek-and-grab. Non-video rows are dropped
    (audio/image sampling is a different kernel).

    Scale shape: the k-fold row explosion happens INSIDE the Arrow batch
    (mapInPandas), so peak memory is batch_rows × k small feature rows —
    payload bytes are read once per batch and never duplicated per frame;
    output carries no binary column, so downstream shuffles are cheap.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["media"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                data = bytes(payload) if payload is not None else b""
                _, _, duration_ms = _fake_decode(data, mtype)
                for i in range(k):
                    rows.append(
                        (
                            int(mid),
                            i,
                            (i * duration_ms) // k,
                            hashlib.sha256(
                                data + b"#" + str(i).encode()
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_sha"]
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual near-dup: average-hash fingerprints over decoded pixels
# ---------------------------------------------------------------------------


def _fake_decode_pixels(payload: bytes) -> list[int]:
    """STUB pixel decode — 64 deterministic grayscale bytes in place of the
    real decode+downsample (PIL ``convert('L').resize((8, 8))``, not
    installed here). Two chained digests so tests and the DuckDB oracle
    share an exact formula; a real deployment replaces ONLY this function —
    the bit-assembly and pair-search stages below are payload-agnostic."""
    a = hashlib.sha256(payload).digest()
    b = hashlib.sha256(payload + b".").digest()
    return list(a + b)


def ahash_features(media: DataFrame, bits: int = 60) -> DataFrame:
    """(media_id, ahash) — the classic average-hash perceptual fingerprint.

    Decode to an 8x8 grayscale grid, then bit i = 1 iff pixel i exceeds the
    grid mean — assembled MSB-first over the first ``bits`` pixels. The
    mean test is exact integer arithmetic (``pixel * 64 > sum``), so the
    fingerprint is bit-reproducible across engines (no float threshold).
    ``bits`` defaults to 60 (not the canonical 64) so the value stays in
    int64's non-negative range, which the Manku block search's div/mod
    block split requires; four low-order pixels of an 8x8 aHash carry
    negligible discrimination.

    Arrow-batched mapInPandas, map-only: payload bytes are read once per
    batch and never shuffled — only the (id, int64) sliver leaves the scan,
    so the stage costs the same at 100 TB as the feature extractor.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                data = bytes(payload) if payload is not None else b""
                px = _fake_decode_pixels(data)
                total = sum(px)
                v = 0
                for i in range(bits):
                    v = (v << 1) | (1 if px[i] * 64 > total else 0)
                rows.append((int(mid), v))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.mapInPandas(run, schema="media_id long, ahash long")


def media_neardup_pairs(
    media: DataFrame, bits: int = 60, max_hamming: int = 3
) -> DataFrame:
    """(id_1, id_2, hamming) pairs of perceptually-near media items.

    Average-hash fingerprints + the exact Manku block-pigeonhole search
    shared with SimHash text dedup (operators/dedup.py
    ``fingerprint_neardup_pairs``): recall 1.0 at Hamming <= ``max_hamming``
    with ONE bucket shuffle of (id, int64) rows — never all-pairs, media
    bytes never leave the map side. This is how image dedup runs at
    LAION scale: re-encoded/resized copies land within a few bits of each
    other while distinct images are ~30 bits apart.
    """
    from scrape_spark.operators.dedup import fingerprint_neardup_pairs

    return fingerprint_neardup_pairs(
        ahash_features(media, bits=bits),
        bits=bits,
        max_hamming=max_hamming,
        id_col="media_id",
        fp_col="ahash",
    )
