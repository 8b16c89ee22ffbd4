"""Cross-engine parity fuzz for the dialect-templated text kernels.

Every kernel in functions/textstats.py is ONE formula compiled to Spark SQL
and DuckDB SQL; the oracle harness checks them over the fixed corpus, this
suite checks them over adversarial/random strings (empty, whitespace runs,
unicode, token-cap boundaries, repeated lines) — one batched DataFrame per
engine, value-for-value equality.
"""

import random

import duckdb

from scrape_spark.functions import textstats as ts

_WORDS = ["spark", "row", "a", "the", "héllo", "wörld", "dup", "line", "x9"]


def _cases() -> list[str]:
    rng = random.Random(42)
    cases = [
        "",
        " ",
        "   ",
        "a",
        "a b",
        "a a a a a a a a",  # exactly one 8-word fixture line, all dup bigrams
        "w " * 7 + "w",  # 8 words
        "w " * 8 + "w",  # 9 words -> 2 fixture lines
        " ".join(f"t{i}" for i in range(ts.SHINGLE_WORDS + 5)),  # over the cap
        "héllo wörld héllo wörld",
        "x\ty tab inside token",
    ]
    for _ in range(40):
        n = rng.randint(1, 40)
        cases.append(" ".join(rng.choice(_WORDS) for _ in range(n)))
    return cases


_KERNELS = {
    "h": ts.text_hash_sql,
    "fp": ts.fingerprint_sql,
    "dup": lambda s, d: ts.dup_line_frac_q4_sql(ts.lines_sql(s, d), d),
    "tb": ts.top_bigram_cover_q4_sql,
    "sim": ts.simhash_sql,
    "mh0": lambda s, d: ts.minhash_sig_sql(s, d, 0),
}


def test_kernels_match_duckdb_on_fuzzed_strings(spark):
    cases = _cases()
    # DuckDB side
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    for i, s in enumerate(cases):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
    dd = ", ".join(
        f"{fn('s', ts.DUCK_DIALECT)} AS {name}" for name, fn in _KERNELS.items()
    )
    duck_rows = {
        r[0]: r[1:] for r in con.sql(f"SELECT i, {dd} FROM t ORDER BY i").fetchall()
    }
    # Spark side — one DataFrame, one collect
    df = spark.createDataFrame(list(enumerate(cases)), "i int, s string")
    sd = [
        f"{fn('s', ts.SPARK_DIALECT)} AS {name}" for name, fn in _KERNELS.items()
    ]
    spark_rows = {
        r["i"]: tuple(r[n] for n in _KERNELS)
        for r in df.selectExpr("i", *sd).collect()
    }
    assert duck_rows.keys() == spark_rows.keys()
    for i in duck_rows:
        assert duck_rows[i] == spark_rows[i], (i, cases[i], duck_rows[i], spark_rows[i])
