"""MIME sniffing over the lake's ``html:binary`` column — dialect-templated.

A Common-Crawl-style lake stores the fetched body as opaque bytes; routing
(parse as HTML? gunzip first? skip images?) needs a content sniff that does
NOT trust the server's Content-Type. This kernel classifies the first
:data:`SNIFF_PREFIX_BYTES` of the blob following the WHATWG
mime-sniffing algorithm's structure (magic signatures, then tag scan after
whitespace/BOM skip, then the binary-byte check) — simplified to the
signature set a crawler routes on. The reference fetches text-only via
``requests`` and never sees bytes (fetch_and_store_robots.py:30-37), so
this is engine-side plumbing its pipeline lacks.

Discipline (functions/textstats.py): one formula string compiles to Spark
SQL and DuckDB SQL, so the operator is oracle-checkable bit-for-bit and the
hot path is 100% JVM map-side — no Python, no shuffle. The ONLY dialect
split is how to take the prefix: Spark slices the BLOB *before* hexing
(``hex(substring(b,1,64))`` — never hex a 1 MB page to read 64 bytes);
DuckDB lacks blob slicing so the oracle hexes then slices (fixture blobs
are small).

Labels: empty gzip zip pdf png jpeg gif webp warc xml html text binary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scrape_spark.functions.textstats import (
    DUCK_DIALECT,
    SPARK_DIALECT,
    _bind,
)

SNIFF_PREFIX_BYTES = 64

#: (hex-signature, label) — checked in order, first match wins. WEBP is the
#: one two-part signature (RIFF....WEBP) and is special-cased below.
MAGIC = [
    ("1F8B", "gzip"),
    ("504B0304", "zip"),
    ("255044462D", "pdf"),  # %PDF-
    ("89504E470D0A1A0A", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),  # GIF8
    ("574152432F", "warc"),  # WARC/
]

#: lowercase tag openers that mean text/html (WHATWG's tag set, trimmed to
#: the ones that appear as byte 0 of real pages)
HTML_TAGS = [
    "<!doctype html",
    "<html",
    "<head",
    "<body",
    "<script",
    "<style",
    "<title",
    "<table",
    "<div",
    "<p>",
    "<br",
    "<!--",
    "<iframe",
    "<h1",
    "<font",
]

_WS = (9, 10, 12, 13, 32)


def hex_prefix_sql(bin_col: str, d: dict, n: int = SNIFF_PREFIX_BYTES) -> str:
    """Uppercase hex of the first ``n`` bytes (the one per-dialect split)."""
    if d is SPARK_DIALECT:
        return f"hex(substring({bin_col}, 1, {n}))"
    return f"substr(hex({bin_col}), 1, {2 * n})"


def mime_sniff_sql(bin_col: str, d: dict, n: int = SNIFF_PREFIX_BYTES) -> str:
    """Label expression over binary column ``bin_col`` in dialect ``d``."""
    hx = "__mh"
    # decoded byte values of the hex prefix, as a BIGINT array
    hv1 = f"(position(substr({hx}, CAST(2 * _mi - 1 AS INT), 1) IN '0123456789ABCDEF') - 1)"
    hv2 = f"(position(substr({hx}, CAST(2 * _mi AS INT), 1) IN '0123456789ABCDEF') - 1)"
    octets = f"(length({hx}) {('div' if d is SPARK_DIALECT else '//')} 2)"
    bytes_expr = (
        f"CASE WHEN length({hx}) = 0 THEN {d['empty_bigint_array']} ELSE "
        + d["transform"].format(
            arr=d["seq"].format(a="CAST(1 AS BIGINT)", b=f"CAST({octets} AS BIGINT)"),
            lam=f"_mi -> CAST(16 * {hv1} + {hv2} AS BIGINT)",
        )
        + " END"
    )
    mb = "__mb"
    n_b = d["size"].format(arr=mb)
    at_i = d["at"].format(arr=mb, i="CAST(_mj AS INT)")
    ws = f"({at_i} IN (9, 10, 12, 13, 32))"
    bom_off = f"(CASE WHEN substr({hx}, 1, 6) = 'EFBBBF' THEN 3 ELSE 0 END)"
    # first non-whitespace byte index after the BOM (NULL when none)
    scan_idx = (
        f"CASE WHEN {n_b} >= {bom_off} + 1 THEN "
        + d["seq"].format(
            a=f"CAST({bom_off} + 1 AS BIGINT)", b=f"CAST({n_b} AS BIGINT)"
        )
        + f" ELSE {d['empty_bigint_array']} END"
    )
    k_expr = d["amin"].format(
        arr=d["filter"].format(arr=f"({scan_idx})", lam=f"_mj -> NOT {ws}")
    )
    mk = "__mk"
    # lowercase-folded printable rendering of bytes k..k+15 (non-printables
    # become '?', so chr() never sees 0 or an invalid codepoint)
    at_t = d["at"].format(arr=mb, i="CAST(_mj AS INT)")
    fold = (
        f"CASE WHEN {at_t} BETWEEN 65 AND 90 THEN {at_t} + 32 "
        f"WHEN {at_t} BETWEEN 32 AND 126 THEN {at_t} "
        f"ELSE 63 END"
    )
    chrfn = "char" if d is SPARK_DIALECT else "chr"
    tag_expr = d["ajoin"].format(
        arr=d["transform"].format(
            arr=d["filter"].format(
                arr=d["seq"].format(
                    a=f"CAST({mk} AS BIGINT)", b=f"CAST({mk} + 15 AS BIGINT)"
                ),
                lam=f"_mj -> _mj <= {n_b}",
            ),
            lam=f"_mj -> {chrfn}(CAST({fold} AS INT))",
        ),
        sep="''",
    )
    mt = "__mt"
    html_hit = " OR ".join(
        f"substr({mt}, 1, {len(t)}) = '{t}'" for t in HTML_TAGS
    )
    # WHATWG binary byte check over the whole scanned prefix
    at_s = d["at"].format(arr=mb, i="CAST(_mj AS INT)")
    is_bin_byte = (
        f"({at_s} BETWEEN 0 AND 8 OR {at_s} = 11 "
        f"OR {at_s} BETWEEN 14 AND 26 OR {at_s} BETWEEN 28 AND 31)"
    )
    has_bin = (
        d["size"].format(
            arr=d["filter"].format(
                arr=d["seq"].format(a="CAST(1 AS BIGINT)", b=f"CAST({n_b} AS BIGINT)"),
                lam=f"_mj -> {is_bin_byte}",
            )
        )
        + " > 0"
    )
    sig_branches = " ".join(
        f"WHEN substr({hx}, 1, {len(sig)}) = '{sig}' THEN '{label}'"
        for sig, label in MAGIC
    )
    expr = (
        f"CASE WHEN length({hx}) = 0 THEN 'empty' "
        + sig_branches
        + f" WHEN substr({hx}, 1, 8) = '52494646'"
        f" AND substr({hx}, 17, 8) = '57454250' THEN 'webp'"
        f" WHEN {mk} IS NULL THEN 'text'"
        f" WHEN substr({mt}, 1, 5) = '<?xml' THEN 'xml'"
        f" WHEN {html_hit} THEN 'html'"
        f" WHEN {has_bin} THEN 'binary'"
        f" ELSE 'text' END"
    )
    expr = _bind(expr, mt, tag_expr, d)
    expr = _bind(expr, mk, k_expr, d)
    expr = _bind(expr, mb, bytes_expr, d)
    return _bind(expr, hx, hex_prefix_sql(bin_col, d, n), d)


def mime_sniff(bin_col: str) -> Column:
    """The Spark-side column (engine API)."""
    return F.expr(mime_sniff_sql(bin_col, SPARK_DIALECT))


def with_mime(df: DataFrame, bin_col: str = "html", out_col: str = "mime") -> DataFrame:
    """Attach the sniffed label — map-only, zero shuffle, no Python."""
    return df.withColumn(out_col, mime_sniff(bin_col))


def mime_sniff_py(data: bytes, n: int = SNIFF_PREFIX_BYTES) -> str:
    """Pure-Python executable spec of the same decision procedure."""
    b = data[:n]
    if len(b) == 0:
        return "empty"
    hx = b.hex().upper()
    for sig, label in MAGIC:
        if hx.startswith(sig):
            return label
    if hx[:8] == "52494646" and hx[16:24] == "57454250":
        return "webp"
    off = 3 if b[:3] == b"\xef\xbb\xbf" else 0
    k = None
    for i in range(off, len(b)):
        if b[i] not in _WS:
            k = i
            break
    if k is None:
        return "text"
    tag = "".join(
        chr(c + 32) if 65 <= c <= 90 else (chr(c) if 32 <= c <= 126 else "?")
        for c in b[k : k + 16]
    )
    if tag.startswith("<?xml"):
        return "xml"
    if any(tag.startswith(t) for t in HTML_TAGS):
        return "html"
    if any(
        c <= 8 or c == 11 or 14 <= c <= 26 or 28 <= c <= 31 for c in b
    ):
        return "binary"
    return "text"
