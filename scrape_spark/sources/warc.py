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
(executor-side write, executor-side parse). Memory shape per parse task:
``binaryFile`` hands the COMPRESSED blob as one value (that part is the
source contract), decompression streams through ``gzip.GzipFile`` (never
the whole decompressed file at once), and records are yielded one
DataFrame per WARC file — peak ≈ compressed blob + one file's parsed
records, not the whole Arrow batch's.

NULL fidelity: a NULL body/status/date round-trips as NULL via an
``X-Scrape-Null`` record header (WARC readers ignore unknown headers), so
the sink is lossless even on rows the curation ops are required to
preserve (e.g. null-text docs — see ``line_dedup``).
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
import zlib
from typing import IO, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"

#: Output schema of :func:`read_warc` — one row per WARC record.
WARC_SCHEMA = (
    "warc_file string, warc_type string, record_id string, warc_date string, "
    "target_uri string, content_type string, content_length long, "
    "http_status int, http_content_type string, body binary, "
    "refers_to_uri string, refers_to_date string, payload_digest string"
)

#: WARC 1.1 profile URI for digest-based revisit records (ISO 28500 §6.7.2)
REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


# -- record codec (shared by sink and source; unit-testable without Spark) ----
def encode_record(
    target_uri: str,
    body: bytes,
    warc_date: str,
    warc_type: str = "response",
    http_status: int = 200,
    http_content_type: str = "text/html",
    record_id: str | None = None,
    null_fields: tuple[str, ...] = (),
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One WARC record as bytes (uncompressed).

    ``response`` records wrap the body in an HTTP/1.1 response envelope
    (``Content-Type: application/http;msgtype=response``), like a crawler
    capture; other types (``resource``, ``metadata``) carry the body raw.
    ``record_id`` defaults to a UUID derived from (uri, date) so identical
    logical records encode identically — determinism the roundtrip oracle
    relies on.

    Headers are encoded UTF-8 (the decoder reads them UTF-8 as well):
    frontier URLs are stored verbatim, so IRIs / raw-unicode hrefs must
    encode without crashing the task. ``null_fields`` (subset of
    {'body','status','date'}) emits an ``X-Scrape-Null`` header so the
    decoder can restore genuine NULLs instead of '' / 200 / ''.
    """
    if record_id is None:
        record_id = str(uuid.uuid5(uuid.NAMESPACE_URL, f"{target_uri}\n{warc_date}"))
    if warc_type == "response":
        payload = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("utf-8") + body
        ctype = "application/http;msgtype=response"
    else:
        payload = body
        ctype = http_content_type
    null_line = (
        f"X-Scrape-Null: {' '.join(sorted(null_fields))}\r\n" if null_fields else ""
    )
    for k, v in (extra_headers or {}).items():
        null_line += f"{k}: {v}\r\n"
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"{null_line}"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return head + payload + _CRLF + _CRLF


def _scan_records(buf: IO[bytes]) -> Iterator[dict]:
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
        nulls = set(headers.get("x-scrape-null", "").split())
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", "").strip("<>"),
            "warc_date": (
                None if "date" in nulls else headers.get("warc-date", "")
            ),
            "target_uri": headers.get("warc-target-uri", ""),
            "content_type": headers.get("content-type", ""),
            "content_length": length,
            "http_status": None,
            "http_content_type": None,
            "body": payload,
            "refers_to_uri": headers.get("warc-refers-to-target-uri"),
            "refers_to_date": headers.get("warc-refers-to-date"),
            "payload_digest": headers.get("warc-payload-digest"),
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
        if "status" in nulls:
            rec["http_status"] = None
        if "body" in nulls:
            rec["body"] = None
        yield rec


def decode_records(blob: bytes) -> Iterator[dict]:
    """Parse a WARC file's bytes (gzip multi-member or plain) into records.

    Framing follows the spec: read header lines to the blank line, take
    ``Content-Length`` payload bytes verbatim, skip the two record-ending
    CRLFs. Decompression STREAMS (``gzip.GzipFile`` over the compressed
    blob) — the decompressed file never exists in memory at once, which is
    the difference between ~1 GB and ~5 GB peak per task at the CC file
    size. Malformed trailing garbage (or a truncated/corrupt gzip tail
    from a killed writer) ends the scan rather than raising — the file
    yields its complete records.
    """
    if blob[:2] == b"\x1f\x8b":
        buf: IO[bytes] = gzip.GzipFile(fileobj=io.BytesIO(blob))
    else:
        buf = io.BytesIO(blob)
    try:
        yield from _scan_records(buf)
    except (EOFError, OSError, zlib.error):
        # truncated member (EOFError), BadGzipFile tail (OSError), or
        # corrupt bytes mid-member (zlib.error — bit-rot, an external
        # writer's partial overwrite): the file yields its complete
        # leading records either way
        return


# -- sink ---------------------------------------------------------------------
def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    body_col: str = "body",
    date_col: str = "warc_date",
    status_col: str | None = None,
    warc_type: str = "response",
    http_content_type: str = "text/html",
    revisit_col: str | None = None,
    digest_col: str | None = None,
    refers_uri_col: str | None = None,
    refers_date_col: str | None = None,
) -> int:
    """Write one ``.warc.gz`` per partition; returns the record count.

    Each record is its own gzip member (CC layout). Executors write
    directly — no payload byte ever reaches the driver; only (file, count)
    manifest rows do. Overwrite semantics like every other sink in the
    repo: pre-existing ``part-*.warc.gz`` (and orphaned temp files) in
    ``out_dir`` are removed first, so a re-write with fewer partitions
    cannot leave stale parts that a later ``read_warc`` would merge in
    (``out_dir`` must be a shared filesystem path, same contract as any
    Spark sink). Attempt-safe: each task writes to an attempt-unique temp
    name and ``os.replace``s it into place on completion, so a speculative
    or zombie duplicate attempt can never interleave gzip members — the
    last finished attempt atomically wins with a complete file.

    NULL handling is lossless: NULL body/status/date are flagged with an
    ``X-Scrape-Null`` header and restored as NULLs by ``decode_records``
    (a NULL body is NOT silently rewritten as ``b''``).

    Revisit support (ISO 28500 §6.7.2): when ``revisit_col`` names a
    boolean column, rows flagged true are written as ``revisit`` records —
    EMPTY payload, ``WARC-Profile`` identical-payload-digest, and the
    ``WARC-Refers-To-Target-URI`` / ``WARC-Refers-To-Date`` /
    ``WARC-Payload-Digest`` headers from the companion columns (the
    :func:`assign_revisits` output shape). Non-flagged rows still carry
    their digest header when ``digest_col`` is given. This is how a
    deduped crawl stores N captures of one payload in payload-size
    1x + (N-1) x ~300 bytes.
    """
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(out_dir):  # overwrite: drop stale parts + temps
        if name.endswith(".warc.gz") or ".warc.gz.inprogress-" in name:
            os.unlink(os.path.join(out_dir, name))
    cols = [uri_col, body_col, date_col] + ([status_col] if status_col else [])
    cols += [
        c
        for c in (revisit_col, digest_col, refers_uri_col, refers_date_col)
        if c
    ]

    def _write(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        tmp = f"{path}.inprogress-{uuid.uuid4().hex}"
        n = 0
        try:
            with open(tmp, "wb") as fh:
                for pdf in pdfs:
                    for row in pdf.itertuples(index=False):
                        nulls: list[str] = []
                        body = getattr(row, body_col)
                        if body is None or (
                            isinstance(body, float) and pd.isna(body)
                        ):
                            nulls.append("body")
                            body = b""
                        elif isinstance(body, str):
                            body = body.encode("utf-8")
                        date = getattr(row, date_col)
                        if date is None or (
                            isinstance(date, float) and pd.isna(date)
                        ):
                            nulls.append("date")
                            date = ""
                        status = getattr(row, status_col) if status_col else 200
                        if status is None or pd.isna(status):
                            nulls.append("status")
                            status = 200
                        extra: dict[str, str] = {}
                        rec_type = warc_type
                        if digest_col and getattr(row, digest_col) is not None:
                            extra["WARC-Payload-Digest"] = (
                                f"sha256:{getattr(row, digest_col)}"
                            )
                        if revisit_col and bool(getattr(row, revisit_col)):
                            rec_type = "revisit"
                            body = b""
                            nulls = [x for x in nulls if x != "body"]
                            extra["WARC-Profile"] = REVISIT_PROFILE
                            if refers_uri_col:
                                extra["WARC-Refers-To-Target-URI"] = getattr(
                                    row, refers_uri_col
                                )
                            if refers_date_col:
                                extra["WARC-Refers-To-Date"] = getattr(
                                    row, refers_date_col
                                )
                        rec = encode_record(
                            getattr(row, uri_col),
                            body,
                            date,
                            warc_type=rec_type,
                            http_status=int(status),
                            http_content_type=http_content_type,
                            null_fields=tuple(nulls),
                            extra_headers=extra,
                        )
                        fh.write(gzip.compress(rec))
                        n += 1
            os.replace(tmp, path)  # atomic: complete file or nothing
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        yield pd.DataFrame({"file": [path], "records": [n]})

    manifest = df.select(*cols).mapInPandas(_write, "file string, records long")
    return sum(r["records"] for r in manifest.collect())  # manifest rows only


# -- source ---------------------------------------------------------------------
def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory/glob of WARC files into one row per record.

    ``binaryFile`` gives (path, content) per file; the parse fans out one
    task per file (gzip is unsplittable — the file IS the split, as in
    Common Crawl). One output DataFrame is yielded PER FILE, so peak task
    memory is one file's parsed records (plus the compressed blob the
    source hands over), never the whole multi-file batch. Column pruning
    applies downstream as usual; the body column is binary and rides
    Arrow batches, never the driver.
    """
    files = spark.read.format("binaryFile").load(path)

    def _parse(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                out = [
                    {**rec, "warc_file": os.path.basename(fpath)}
                    for rec in decode_records(bytes(blob))
                ]
                if out:
                    yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(_parse, WARC_SCHEMA)


def warc_pages_view(records: DataFrame) -> DataFrame:
    """Project parsed records onto the engine's pages shape
    (``PAGES_SCHEMA``: url, warc_ts, html binary, text, lang) — the adapter
    that lets a CC snapshot feed ``CrawlJob``'s fetch join instead of the
    synthetic pages table. ``text`` is produced by the SAME extraction
    kernel the invariant path uses (one Arrow pass), ``lang`` by the
    dialect-templated marker kernel; both are map-side, nothing shuffles.
    ``http_status`` / ``warc_date`` ride along as ``status_code`` /
    ``fetched_at`` for callers that want the HTTP metadata too.
    """
    from scrape_spark.functions.textstats import lang_pred
    from scrape_spark.functions.udfs import extract_text_udf

    return (
        records.where(F.col("warc_type") == "response")
        .withColumn("text", extract_text_udf(F.col("body").cast("string")))
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").cast("timestamp").alias("warc_ts"),
            F.col("body").alias("html"),
            F.col("text"),
            lang_pred("text").alias("lang"),
            F.col("http_status").alias("status_code"),
            F.col("warc_date").alias("fetched_at"),
        )
    )


# -- Common-Crawl derivative record sets (WET / WAT) ---------------------------
# CC publishes three parallel file sets per crawl: WARC (captures), WET
# (conversion records: extracted plain text) and WAT (metadata records:
# JSON envelopes — links, title, HTTP info). Downstream text pipelines read
# WET/WAT and never touch payload HTML; the engine produces both from its
# pages frame with pure column ops + the same executor-side sink.


def wet_records(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str = "warc_date",
) -> DataFrame:
    """``conversion``-record frame (the WET shape) from extracted text."""
    return pages.select(
        F.col(url_col).alias("target_uri"),
        F.col(text_col).alias("body"),
        F.col(date_col).alias("warc_date"),
    )


def write_wet(
    pages: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str = "warc_date",
) -> int:
    """One ``.warc.gz`` of ``conversion``/``text/plain`` records per
    partition — NULL text survives the trip (X-Scrape-Null, as the WARC
    sink), so curation ops downstream of a WET read see the same rows."""
    return write_warc(
        wet_records(pages, url_col, text_col, date_col),
        out_dir,
        warc_type="conversion",
        http_content_type="text/plain",
    )


def wat_records(
    pages: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    status_col: str | None = None,
    title_col: str | None = None,
    links_col: str | None = None,
) -> DataFrame:
    """``metadata``-record frame (the WAT shape): one compact JSON body per
    capture — url, http status, title, out-link list and count. Optional
    columns are included only when the caller has them (``to_json`` of one
    struct; the body never leaves the JVM)."""
    fields = [F.col(url_col).alias("url")]
    if status_col:
        fields.append(F.col(status_col).cast("int").alias("status"))
    if title_col:
        fields.append(F.col(title_col).alias("title"))
    if links_col:
        fields.append(F.col(links_col).alias("links"))
        fields.append(F.size(F.col(links_col)).cast("long").alias("n_links"))
    return pages.select(
        F.col(url_col).alias("target_uri"),
        F.to_json(F.struct(*fields)).alias("body"),
        F.col(date_col).alias("warc_date"),
    )


def write_wat(pages: DataFrame, out_dir: str, **cols) -> int:
    """One ``.warc.gz`` of ``metadata``/``application/json`` records per
    partition."""
    return write_warc(
        wat_records(pages, **cols),
        out_dir,
        warc_type="metadata",
        http_content_type="application/json",
    )


# -- revisit dedup (ISO 28500 identical-payload-digest) -------------------------
def assign_revisits(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    body_col: str = "body",
    digest_col: str | None = None,
) -> DataFrame:
    """Mark every non-first capture of a payload as a revisit of the first.

    Adds (payload_digest, is_revisit, refers_to_uri, refers_to_date): the
    corpus-wide earliest capture of each digest — ties broken by URL, so
    the choice is deterministic under any partitioning — stays a full
    ``response``; later captures point at it. NULL-body captures are never
    revisits (there is no payload to deduplicate) and never referents.

    Scale shape: ONE digest-keyed window pass (sha256 keys are uniform —
    no skew even when one page dominates the crawl, because the partition
    is per-distinct-payload, not per-URL). Payload bytes do ride this
    shuffle once; at CC scale run it per-segment or feed pre-hashed
    ``digest_col`` from the page store and select the body lazily.
    """
    from pyspark.sql import Window

    d = (
        F.col(digest_col)
        if digest_col
        else F.when(
            F.col(body_col).isNotNull(), F.sha2(F.col(body_col), 256)
        )
    )
    w = Window.partitionBy("payload_digest").orderBy(
        F.col(date_col).asc(), F.col(url_col).asc()
    )
    marked = captures.withColumn("payload_digest", d).select(
        "*",
        (
            (F.row_number().over(w) > 1)
            & F.col("payload_digest").isNotNull()
        ).alias("is_revisit"),
        F.first(url_col).over(w).alias("_rv_fu"),
        F.first(date_col).over(w).alias("_rv_fd"),
    )
    return marked.select(
        *captures.columns,
        "payload_digest",
        "is_revisit",
        F.when(F.col("is_revisit"), F.col("_rv_fu")).alias("refers_to_uri"),
        F.when(F.col("is_revisit"), F.col("_rv_fd")).alias("refers_to_date"),
    )


def write_warc_deduped(
    captures: DataFrame,
    out_dir: str,
    url_col: str = "url",
    body_col: str = "body",
    date_col: str = "warc_date",
    status_col: str | None = None,
) -> int:
    """:func:`assign_revisits` + :func:`write_warc` in one call: originals
    as full ``response`` records, repeats as ~300-byte ``revisit`` stubs."""
    marked = assign_revisits(
        captures, url_col=url_col, date_col=date_col, body_col=body_col
    )
    return write_warc(
        marked,
        out_dir,
        uri_col=url_col,
        body_col=body_col,
        date_col=date_col,
        status_col=status_col,
        revisit_col="is_revisit",
        digest_col="payload_digest",
        refers_uri_col="refers_to_uri",
        refers_date_col="refers_to_date",
    )


def restore_revisits(records: DataFrame) -> DataFrame:
    """Re-materialize full captures from a deduped record set.

    ``response`` rows pass through; ``revisit`` rows join their referent
    on (target_uri, date) — the natural key :func:`assign_revisits`
    emitted — and take its body and HTTP fields. Output: the WARC record
    shape with every body restored plus ``was_revisit``. One join, keyed
    on the referent URI (url-partitioned like every other page join);
    referents are dropDuplicates'd on the key first so a re-written
    original can never fan out a revisit row.
    """
    resp = records.where(F.col("warc_type") == "response")
    rev = records.where(F.col("warc_type") == "revisit")
    referent = resp.select(
        F.col("target_uri").alias("refers_to_uri"),
        F.col("warc_date").alias("refers_to_date"),
        F.col("body").alias("_rv_body"),
        F.col("http_status").alias("_rv_status"),
        F.col("http_content_type").alias("_rv_ct"),
    ).dropDuplicates(["refers_to_uri", "refers_to_date"])
    restored = rev.join(
        referent, ["refers_to_uri", "refers_to_date"], "left"
    ).select(
        *[
            c
            for c in records.columns
            if c not in ("body", "http_status", "http_content_type")
        ],
        F.col("_rv_body").alias("body"),
        F.col("_rv_status").alias("http_status"),
        F.col("_rv_ct").alias("http_content_type"),
    )
    out_cols = records.columns
    return (
        resp.select(*out_cols).withColumn("was_revisit", F.lit(False))
        .unionByName(
            restored.select(*out_cols).withColumn("was_revisit", F.lit(True))
        )
    )
