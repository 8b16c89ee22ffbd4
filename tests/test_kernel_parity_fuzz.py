"""Cross-engine parity fuzz for the dialect-templated text kernels.

Every kernel in functions/textstats.py is ONE formula compiled to Spark SQL
and DuckDB SQL; the oracle harness checks them over the fixed corpus, this
suite checks them over adversarial/random strings (empty, whitespace runs,
unicode, token-cap boundaries, repeated lines) — one batched DataFrame per
engine, value-for-value equality.
"""

import random

import duckdb

from scrape_spark.functions import cleantext as ct
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
        "don’t — “quoted” … end",
        "Ã©tÃ© dÃ©jÃ  â€™ Â«xÂ» Â°",
        "zero​width‌ and nbsp thin",
        "mixed Ã© … — plain",
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
    "simw": ts.simhash_wide_sql,
    "mh0": lambda s, d: ts.minhash_sig_sql(s, d, 0),
    "tn3": lambda s, d: ts.top_ngram_cover_q4_sql(s, d, 3),
    "dn5": lambda s, d: ts.dup_ngram_frac_q4_sql(s, d, 5),
    "np": ct.normalize_punct_sql,
    "mj": ct.mojibake_count_sql,
    "scm": lambda s, d: ts.main_script_sql(ts.script_counts_sql(s, d), d),
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


def test_surt_charset_canonical_c4_parity_on_adversarial_strings(spark):
    """The session-2 kernels under the same cross-engine fuzz discipline.

    URLs: scheme soup, empty authority pieces, repeated separators, unicode
    hosts/paths, query-before-path. HTML: attribute-order permutations,
    charset mentions vs declarations, broken tags, newline bodies.
    """
    from scrape_spark.functions.canonical import canonical_sql, charset_sql
    from scrape_spark.functions.surt import surt_duck_sql, surt_sql
    from scrape_spark.operators.corpus import c4_rules_sql

    rng = random.Random(7)
    hosts = ["a.test", "WWW.B.test", "x.y.z.test", "test", "ümlaut.test"]
    paths = ["", "/", "/p", "/p/q", "/a;b", "/p?z=1&a=2", "?bare=query",
             "/p?", "/p#f", "#onlyfrag", "/ünïcode/päth"]
    urls = ["http://" + h + p for h in hosts for p in paths]
    urls += [
        "https://u@WWW.Host.TEST:8443/x?b=2&a=1#f",
        "http://h.test:80?q=1",
        "h.test/no/scheme",
        "http://",
        "",
        "http:///triple",
        "http://h.test//double//slash?&&",
    ]
    for _ in range(25):
        urls.append(
            "http://" + rng.choice(hosts) + rng.choice(paths)
            + rng.choice(["", "?k=" + str(rng.randint(0, 9)), "#z"])
        )
    htmls = [
        '<meta charset="UTF-8"><link rel="canonical" href="http://a.test/c">',
        '<link href="http://a.test/c" rel="canonical"><meta charset=utf-8>',
        '<meta content="charset=big5 how-to" name="d"><meta charset = "latin1">',
        '<meta content="text/html; charset=Shift_JIS" http-equiv="Content-Type">',
        "<html><body>plain\nline two with words here.\n{ code }</body></html>",
        "",
        "<link rel=\"canonical\" href=\"\">",
        "<?xml encoding='single-quoted-out-of-scope'?>",
        "<LINK REL=\"canonical\" HREF=\"http://UP.test/C\">",
    ]
    texts = [
        "", "One good line with enough words here.\nshort.\nlorem ipsum x.",
        "no terminal punct at all\nanother one",
        'quoted end counts as terminal she said."\nenable javascript now please.',
        "a. b. c.",  # 3 terminal lines but each under 5 words
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE u(i INT, s VARCHAR)")
    for i, s in enumerate(urls):
        con.execute("INSERT INTO u VALUES (?, ?)", [i, s])
    con.execute("CREATE TABLE h(i INT, s VARCHAR)")
    for i, s in enumerate(htmls):
        con.execute("INSERT INTO h VALUES (?, ?)", [i, s])
    con.execute("CREATE TABLE x(i INT, s VARCHAR)")
    for i, s in enumerate(texts):
        con.execute("INSERT INTO x VALUES (?, ?)", [i, s])

    duck_surt = {r[0]: r[1] for r in con.sql(
        f"SELECT i, {surt_duck_sql('s')} FROM u ORDER BY i").fetchall()}
    duck_html = {r[0]: r[1:] for r in con.sql(
        f"SELECT i, {canonical_sql('s', ts.DUCK_DIALECT)},"
        f" {charset_sql('s', ts.DUCK_DIALECT)} FROM h ORDER BY i").fetchall()}
    c4 = c4_rules_sql("s", ts.DUCK_DIALECT)
    c4_cols = list(c4)
    duck_c4 = {r[0]: r[1:] for r in con.sql(
        "SELECT i, " + ", ".join(c4[c] for c in c4_cols)
        + " FROM x ORDER BY i").fetchall()}

    sdf = spark.createDataFrame(list(enumerate(urls)), "i int, s string")
    got_surt = {r["i"]: r["k"] for r in sdf.selectExpr(
        "i", f"{surt_sql('s', ts.SPARK_DIALECT)} AS k").collect()}
    hdf = spark.createDataFrame(list(enumerate(htmls)), "i int, s string")
    got_html = {r["i"]: (r["c1"], r["c2"]) for r in hdf.selectExpr(
        "i", f"{canonical_sql('s', ts.SPARK_DIALECT)} AS c1",
        f"{charset_sql('s', ts.SPARK_DIALECT)} AS c2").collect()}
    xdf = spark.createDataFrame(list(enumerate(texts)), "i int, s string")
    c4s = c4_rules_sql("s", ts.SPARK_DIALECT)
    got_c4 = {r["i"]: tuple(r[c] for c in c4_cols) for r in xdf.selectExpr(
        "i", *[f"{c4s[c]} AS {c}" for c in c4_cols]).collect()}

    for i, u in enumerate(urls):
        assert got_surt[i] == duck_surt[i], (u, got_surt[i], duck_surt[i])
    for i, page in enumerate(htmls):
        assert got_html[i] == duck_html[i], (page, got_html[i], duck_html[i])
    for i, t in enumerate(texts):
        assert got_c4[i] == tuple(duck_c4[i]), (t, got_c4[i], duck_c4[i])


def test_entropy_kernel_fuzz(spark):
    from scrape_spark.functions import textstats as ts2

    cases = _cases() + ["a" * 3000, ("ab" * 1500), "\x00\x01 control", None]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    for i, s in enumerate(cases):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
    dd = ts2.char_entropy_q4_sql("s", ts2.DUCK_DIALECT)
    duck = {r[0]: r[1] for r in con.sql(f"SELECT i, {dd} FROM t").fetchall()}
    df = spark.createDataFrame(list(enumerate(cases)), "i int, s string")
    sd = ts2.char_entropy_q4_sql("s", ts2.SPARK_DIALECT)
    got = {r["i"]: r["e"] for r in df.selectExpr("i", f"{sd} AS e").collect()}
    assert got == duck


def _html_cases() -> list[str]:
    rng = random.Random(7)
    metas = [
        '<meta property="og:title" content="{v}">',
        '<meta content="{v}" property="og:title">',
        '<META PROPERTY="og:title" CONTENT="{v}">',
        '<meta name="description" content="{v}">',
        '<meta name="robots" content="{v}">',
        '<meta name="robots" content="noindex">'
        '<meta name="robots" content="nofollow">',
        '<script type="application/ld+json">{{"@type":"{v}"}}</script>',
        '<script type="application/ld+json">{{broken {v}</script>',
        '<img src="/i/{v}.png" alt="{v} is a nice alt">',
        '<a href="/l/{v}" rel="nofollow">{v}</a>',
        "<a\nhref=\"/nl/{v}\" rel='nofollow'>{v}</a>",
        "plain text {v} with no markup",
        "",
    ]
    vals = ["x", "none", "noindex, nofollow", "a b c", "üñí", "1<2", "q"]
    cases = []
    for _ in range(30):
        n = rng.randint(1, 4)
        frag = "".join(
            rng.choice(metas).format(v=rng.choice(vals)) for _ in range(n)
        )
        cases.append("<html><head>" + frag + "</head></html>")
    return cases


def test_html_metadata_kernels_fuzz(spark):
    from scrape_spark.functions import metadata as md
    from scrape_spark.functions import robotsmeta as rm
    from scrape_spark.functions.imgtext import resolve_src_sql

    cases = _html_cases()
    bases = [
        "http://h.test", "http://h.test/", "https://h.test/a/b",
        "http://h.test/a/", "weird-no-scheme",
    ]
    srcs = ["/abs.png", "rel.png", "//cdn.test/p.png", "http://x.test/i.png",
            "data:image/gif;base64,AAA", "a/b/c.png"]
    rng = random.Random(9)
    rows = [
        (i, h, rng.choice(bases), rng.choice(srcs))
        for i, h in enumerate(cases)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, h VARCHAR, b VARCHAR, s VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO t VALUES (?, ?, ?, ?)", list(r))
    raw = md.jsonld_raw_sql("h")
    duck_cols = {
        "ogt": md.og_sql("h", "title"),
        "desc": md.meta_name_sql("h", "description"),
        "jt": md.jsonld_field_sql(raw, "@type", spark=False),
        "ni": rm.robots_noindex_sql("h", spark=False),
        "nf": rm.robots_nofollow_sql("h", spark=False),
        "rs": resolve_src_sql("s", "b"),
    }
    dd = ", ".join(f"{e} AS {n}" for n, e in duck_cols.items())
    duck = {r[0]: r[1:] for r in con.sql(f"SELECT i, {dd} FROM t").fetchall()}
    spark_cols = {
        "ogt": md.og_sql("h", "title"),
        "desc": md.meta_name_sql("h", "description"),
        "jt": md.jsonld_field_sql(raw, "@type", spark=True),
        "ni": rm.robots_noindex_sql("h", spark=True),
        "nf": rm.robots_nofollow_sql("h", spark=True),
        "rs": resolve_src_sql("s", "b"),
    }
    df = spark.createDataFrame(rows, "i int, h string, b string, s string")
    sel = ["i"] + [f"{e} AS {n}" for n, e in spark_cols.items()]
    got = {
        r["i"]: tuple(r[n] for n in spark_cols)
        for r in df.selectExpr(*sel).collect()
    }
    assert got == duck


def test_new_kernels_match_duckdb_on_fuzzed_strings(spark):
    """Session-9 kernels: 64-bit KMV digest, winnowing fingerprints, and
    the hreflang per-tag extraction formulas — same fuzz discipline."""
    from scrape_spark.functions.hreflang import _tag_cols_sql
    from scrape_spark.operators.dedup import winnow_fingerprints_sql

    cases = _cases() + [
        '<link rel="alternate" hreflang="EN" href="/en">',
        '<link hreflang="de" href="/de" rel="alternate">',
        '<link rel="stylesheet" href="/css">',
        '<link rel="alternate" hreflang="" href="">',
        'rel="alternate" outside a tag hreflang="fr"',
    ]
    hl = _tag_cols_sql("s")
    kernels = {
        "kmv": lambda s, d: ts.kmv_digest64_sql(s, d),
        "win": lambda s, d: winnow_fingerprints_sql(s, d),
        "hll": lambda s, d: hl["hreflang"],
        "hlh": lambda s, d: hl["raw_href"],
        "hla": lambda s, d: hl["is_alt"],
    }
    import duckdb as _dd

    con = _dd.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    for i, s in enumerate(cases):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
    dd = ", ".join(
        f"{fn('s', ts.DUCK_DIALECT)} AS {name}" for name, fn in kernels.items()
    )
    duck_rows = {
        r[0]: tuple(r[1:])
        for r in con.sql(f"SELECT i, {dd} FROM t ORDER BY i").fetchall()
    }
    df = spark.createDataFrame(list(enumerate(cases)), "i int, s string")
    sd = [
        f"{fn('s', ts.SPARK_DIALECT)} AS {name}" for name, fn in kernels.items()
    ]
    spark_rows = {
        r["i"]: tuple(r[n] for n in kernels)
        for r in df.selectExpr("i", *sd).collect()
    }
    assert spark_rows == duck_rows


def test_id_digest_matches_duckdb_on_fuzzed_ids(spark):
    import random

    import duckdb as _dd

    rng = random.Random(9)
    ids = [0, 1, 2**31 - 1, 2**31, 2**62, 2**63 - 1] + [
        rng.randrange(2**62) for _ in range(40)
    ]
    expr = ts.kmv_id_digest64_sql("v")
    con = _dd.connect()
    con.execute("CREATE TABLE t(i INT, v BIGINT)")
    for i, v in enumerate(ids):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, v])
    duck = {r[0]: r[1] for r in con.sql(f"SELECT i, {expr} AS d FROM t").fetchall()}
    df = spark.createDataFrame(list(enumerate(ids)), "i int, v long")
    got = {r["i"]: r["d"] for r in df.selectExpr("i", f"{expr} AS d").collect()}
    assert got == duck
