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
