"""WARC (ISO 28500) source + sink — the web-archive interchange format.

The reference stores raw HTML in a MySQL LONGTEXT column
(schema/scraped_pages.sql:9); a 100 TB lake stores it as WARC files (the
Common-Crawl layout) and keeps only hashes/metadata in the engine tables.
This module supplies both directions:

- ``write_warc``: one ``.warc.gz`` file per partition, each record its own
  gzip member (the CC convention — readers can split a file at member
  boundaries, and stdlib ``gzip`` reads the concatenation transparently).
- ``read_warc``: ``binaryFile`` scan + Arrow-batched ``mapInPandas`` parse.
  A ``.warc.gz`` is NOT splittable (gzip), so the unit of parallelism is
  the file — exactly how Common Crawl ships it (~1 GB/file, 100 TB =
  ~10^5 files spread across executors). Records are framed by the spec's
  ``Content-Length`` header, never by scanning payload bytes for a
  separator (payloads may contain anything).

Parsing is pure stdlib; payload bytes move driver-free end to end
(executor-side write, executor-side parse).
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"

#: Output schema of :func:`read_warc` — one row per WARC record.
WARC_SCHEMA = (
    "warc_file string, warc_type string, record_id string, warc_date string, "
    "target_uri string, content_type string, content_length long, "
    "http_status int, http_content_type string, body binary"
)


# -- record codec (shared by sink and source; unit-testable without Spark) ----
def encode_record(
    target_uri: str,
    body: bytes,
    warc_date: str,
    warc_type: str = "response",
    http_status: int = 200,
    http_content_type: str = "text/html",
    record_id: str | None = None,
) -> bytes:
    """One WARC record as bytes (uncompressed).

    ``response`` records wrap the body in an HTTP/1.1 response envelope
    (``Content-Type: application/http;msgtype=response``), like a crawler
    capture; other types (``resource``, ``metadata``) carry the body raw.
    ``record_id`` defaults to a UUID derived from (uri, date) so identical
    logical records encode identically — determinism the roundtrip oracle
    relies on.
    """
    if record_id is None:
        record_id = str(uuid.uuid5(uuid.NAMESPACE_URL, f"{target_uri}\n{warc_date}"))
    if warc_type == "response":
        payload = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body
        ctype = "application/http;msgtype=response"
    else:
        payload = body
        ctype = http_content_type
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    return head + payload + _CRLF + _CRLF


def decode_records(blob: bytes) -> Iterator[dict]:
    """Parse a WARC file's bytes (gzip multi-member or plain) into records.

    Framing follows the spec: read header lines to the blank line, take
    ``Content-Length`` payload bytes verbatim, skip the two record-ending
    CRLFs. Malformed trailing garbage ends the scan rather than raising —
    a truncated tail file (killed writer) yields its complete records.
    """
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)  # stdlib reads concatenated members
    buf = io.BytesIO(blob)
    while True:
        line = buf.readline()
        while line in (_CRLF, b"\n"):  # inter-record padding
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # trailing garbage — stop at the last whole record
        headers: dict[str, str] = {}
        while True:
            line = buf.readline()
            if line in (_CRLF, b"\n", b""):
                break
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = buf.read(length)
        if len(payload) < length:
            return  # truncated record
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", "").strip("<>"),
            "warc_date": headers.get("warc-date", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "content_type": headers.get("content-type", ""),
            "content_length": length,
            "http_status": None,
            "http_content_type": None,
            "body": payload,
        }
        if rec["content_type"].startswith("application/http"):
            # split the HTTP envelope: status line, headers, body
            head, sep, body = payload.partition(b"\r\n\r\n")
            if sep:
                lines = head.split(_CRLF)
                parts = lines[0].split(b" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for h in lines[1:]:
                    k, _, v = h.decode("utf-8", "replace").partition(":")
                    if k.strip().lower() == "content-type":
                        rec["http_content_type"] = v.strip()
                rec["body"] = body
        yield rec


# -- sink ---------------------------------------------------------------------
def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    body_col: str = "body",
    date_col: str = "warc_date",
    status_col: str | None = None,
) -> int:
    """Write one ``.warc.gz`` per partition; returns the record count.

    Each record is its own gzip member (CC layout). Executors write
    directly — no payload byte ever reaches the driver; only (file, count)
    manifest rows do. Idempotent per task attempt: the file name carries
    the partition index, so a re-executed task overwrites its own output
    rather than duplicating records.
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = [uri_col, body_col, date_col] + ([status_col] if status_col else [])

    def _write(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        n = 0
        with open(path, "wb") as fh:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    body = getattr(row, body_col)
                    if isinstance(body, str):
                        body = body.encode("utf-8")
                    rec = encode_record(
                        getattr(row, uri_col),
                        body or b"",
                        getattr(row, date_col),
                        http_status=(
                            int(getattr(row, status_col)) if status_col else 200
                        ),
                    )
                    fh.write(gzip.compress(rec))
                    n += 1
        yield pd.DataFrame({"file": [path], "records": [n]})

    manifest = df.select(*cols).mapInPandas(_write, "file string, records long")
    return sum(r["records"] for r in manifest.collect())  # manifest rows only


# -- source ---------------------------------------------------------------------
def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory/glob of WARC files into one row per record.

    ``binaryFile`` gives (path, content) per file; the parse fans out one
    task per file (gzip is unsplittable — the file IS the split, as in
    Common Crawl). Column pruning applies downstream as usual; the body
    column is binary and rides Arrow batches, never the driver.
    """
    files = spark.read.format("binaryFile").load(path)

    def _parse(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out: list[dict] = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                for rec in decode_records(bytes(blob)):
                    rec["warc_file"] = os.path.basename(fpath)
                    out.append(rec)
            if out:
                yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(_parse, WARC_SCHEMA)


def warc_pages_view(records: DataFrame) -> DataFrame:
    """Project parsed records onto the crawl's pages shape: (url, html,
    status_code, fetched_at) — the adapter that lets a CC snapshot feed the
    fetch join instead of the synthetic pages table."""
    return records.where(F.col("warc_type") == "response").select(
        F.col("target_uri").alias("url"),
        F.col("body").cast("string").alias("html"),
        F.col("http_status").alias("status_code"),
        F.col("warc_date").alias("fetched_at"),
    )
