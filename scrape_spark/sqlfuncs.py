"""SQL-surface registration: the engine's kernels as Spark SQL functions.

A user of the reference drives everything imperatively; a lake user lives in
``spark.sql``. This module registers the dialect kernels as SQL scalar
functions (Spark 4 ``CREATE TEMPORARY FUNCTION … RETURNS … RETURN <expr>``),
so every curation signal is one `SELECT` away:

    >>> from scrape_spark.sqlfuncs import register
    >>> register(spark)
    >>> spark.sql("SELECT ss_lang_id(text), ss_token_count(text) FROM docs")

SQL functions stay PURE CATALYST — the body is inlined into the calling
plan at resolution time (no Python worker, no serialization boundary, CSE
and codegen apply), so this surface has zero cost over the DataFrame API.
The bodies are the SAME kernel texts the operators use (spliced with the
parameter name), so SQL-surface results are oracle-checkable bit-for-bit
like everything else; the URL helpers mirror functions/urls.py's Column
builders and a parity test pins them against each other.

The reference has no SQL surface at all; this is the engine's equivalent
of its Python accessor layer (models.py) for SQL-first consumers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from scrape_spark.functions import textstats as ts
from scrape_spark.functions.canonical import canonical_sql, charset_sql
from scrape_spark.functions.cleantext import mojibake_count_sql, normalize_punct_sql
from scrape_spark.functions.imgtext import resolve_src_sql
from scrape_spark.functions.surt import surt_sql
from scrape_spark.functions.urltrap import url_class_sql, url_ext_sql, url_lang_hint_sql

_D = ts.SPARK_DIALECT


def _stripped_path(u: str) -> str:
    """``urlparse``-style path of URL expr ``u`` with the last segment's
    ``;params`` dropped — the ONE textual mirror of
    ``functions/urls.py:_strip_path_params`` (parity pinned against the
    Column builders by test_sqlfuncs); NULL when the URL has no path."""
    p = f"try_parse_url({u}, 'PATH')"
    last = f"substring_index({p}, '/', -1)"
    return (
        f"concat(substr({p}, 1, length({p}) - length({last})),"
        f" substring_index({last}, ';', 1))"
    )


#: (name, typed params, return type, body builder over the param names).
#: Bodies come from the kernel generators — never hand-written twice.
_FUNCS: list[tuple[str, str, str, str]] = [
    # text-analysis kernels
    ("fingerprint", "t STRING", "BIGINT", ts.fingerprint_sql("t", _D)),
    ("token_count", "t STRING", "BIGINT", ts.token_count_sql("t", _D)),
    ("quality_score", "t STRING", "DOUBLE", ts.quality_score_sql("t", _D)),
    ("lang_id", "t STRING", "STRING", ts.lang_pred_sql("t", _D)),
    ("simhash", "t STRING", "BIGINT", ts.simhash_sql("t", _D)),
    (
        "minhash_sigs",
        "t STRING",
        "ARRAY<BIGINT>",
        ts.minhash_sigs_array_sql("t", _D),
    ),
    ("char_entropy_q4", "t STRING", "BIGINT", ts.char_entropy_q4_sql("t", _D)),
    ("dup_line_frac_q4", "t STRING", "BIGINT", ts.dup_line_frac_q4_sql("t", _D)),
    ("mojibake_count", "t STRING", "BIGINT", mojibake_count_sql("t")),
    ("normalize_punct", "t STRING", "STRING", normalize_punct_sql("t")),
    # URL kernels
    ("surt", "u STRING", "STRING", surt_sql("u", _D)),
    ("url_class", "u STRING", "STRING", url_class_sql("u", _D)),
    ("url_ext", "u STRING", "STRING", url_ext_sql("u", _D)),
    ("url_lang_hint", "u STRING", "STRING", url_lang_hint_sql("u", _D)),
    ("resolve_href", "h STRING, base STRING", "STRING", resolve_src_sql("h", "base")),
    # page-metadata kernels
    ("canonical_href", "h STRING", "STRING", canonical_sql("h", _D)),
    ("charset", "h STRING", "STRING", charset_sql("h", _D)),
    # URL parse helpers — mirror functions/urls.py's Column builders
    # (url_host / url_path / normalize_url_expr); test_sqlfuncs pins parity
    ("host", "u STRING", "STRING", "try_parse_url(u, 'HOST')"),
    (
        "path",
        "u STRING",
        "STRING",
        f"coalesce(nullif({_stripped_path('u')}, ''), '/')",
    ),
    (
        "normalize_url",
        "u STRING",
        "STRING",
        "concat(coalesce(try_parse_url(u, 'PROTOCOL'), ''), '://',"
        " coalesce(try_parse_url(u, 'HOST'), ''),"
        f" coalesce({_stripped_path('u')}, ''))",
    ),
]


def register(spark: SparkSession, prefix: str = "ss_") -> list[str]:
    """Create the temporary SQL functions; returns the registered names.

    Temporary (session-scoped) by design: the sandbox has no persistent
    catalog; against a real metastore the same bodies register once with
    ``CREATE FUNCTION`` minus ``TEMPORARY``.
    """
    names = []
    for name, params, ret, body in _FUNCS:
        fn = f"{prefix}{name}"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {fn}({params}) "
            f"RETURNS {ret} RETURN {body}"
        )
        names.append(fn)
    return names
