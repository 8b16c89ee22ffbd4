"""Text-analysis kernels for the training-data pipeline — dialect-templated.

Large-scale training-data preparation needs text statistics (token counts,
quality scores), document fingerprints (rolling hash), MinHash/SimHash
signatures for near-dup detection, and a language-ID heuristic. The reference
crawler stores raw text only (fetch_and_store_robots.py:37 is its single
HTML→text op); everything here is an engine extension over the `documents`
table shape (doc_id, text, lang, source, n_chars).

Design rule: every kernel is a **pure SQL expression built from a dialect
table**, so the *identical formula* compiles to both Spark SQL (the engine)
and DuckDB SQL (the correctness oracle). That keeps the hot path 100%
JVM-side (whole-stage codegen over higher-order array functions — zero Python
in these kernels) and makes every operator oracle-checkable bit-for-bit:
no floating hashes, all arithmetic is exact int64 mod-prime.

Scale notes: all kernels are per-row map expressions — no shuffle, no UDF
serialization, trivially parallel at 100 TB. MinHash/SimHash costs are
bounded by SHINGLE_WORDS/SIMHASH_WORDS caps, not document length.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 31-bit Mersenne prime — classic Karp-Rabin modulus; keeps a*x+b within int64.
HASH_P = 2_147_483_647
# deterministic affine-hash constants for the MinHash family h_i(x)=(A_i*x+B_i)%P
MINHASH_A = [769_121, 933_199, 180_511, 421_847, 654_911, 302_873, 508_229, 717_419]
MINHASH_B = [12_289, 524_287, 98_317, 331_777, 70_657, 786_433, 214_129, 402_653]
N_MINHASH = len(MINHASH_A)

SHINGLE_WORDS = 32  # shingling looks at the first 32 tokens (cost cap)
SHINGLE_K = 3  # word 3-grams
SIMHASH_WORDS = 32
SIMHASH_BITS = 16
FINGERPRINT_CHARS = 64

# ---------------------------------------------------------------------------
# dialect tables: the SAME template strings compile to Spark SQL and DuckDB SQL
# ---------------------------------------------------------------------------
SPARK_DIALECT = {
    "chr": "ascii({x})",  # code point of 1-char string
    "split": "split({s}, ' ')",
    "transform": "transform({arr}, {lam})",
    "filter": "filter({arr}, {lam})",
    "fold0": "aggregate({arr}, CAST(0 AS BIGINT), {lam})",  # fold with init 0
    "dfold0": "aggregate({arr}, CAST(0 AS DOUBLE), {lam})",  # double fold
    "seq": "sequence({a}, {b})",  # inclusive range a..b (guard a<=b!)
    "at": "element_at({arr}, {i})",  # 1-based index
    "amin": "array_min({arr})",
    "asum": "aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + x)",
    "size": "size({arr})",
    "idiv": "({a} div {b})",
    "empty_bigint_array": "CAST(array() AS array<bigint>)",
    # sep must be a SQL string expression that is regex-safe on Spark
    # (Spark's split() is regex-based; DuckDB's string_split is literal)
    "splitc": "split({s}, {sep})",
    "ajoin": "array_join({arr}, {sep})",
    "amax": "array_max({arr})",
    "adistinct": "array_distinct({arr})",
    "areverse": "reverse({arr})",
    "asort": "array_sort({arr})",
    # a literal '.' separator for splitc (Spark split() is regex-based)
    "dot": r"'\\.'",
    "mkarr": "array({x})",  # 1-element array (the let-binding carrier)
    "empty_str_array": "CAST(array() AS array<string>)",
    "aflatten": "flatten({arr})",
    "acontains": "array_contains({arr}, {x})",
    "apos": "array_position({arr}, {x})",  # 1-based first occurrence
    "sha256hex": "sha2({x}, 256)",  # lowercase hex, both engines
    "aconcat": "concat({a}, {b})",  # array concatenation
    "ainter": "array_intersect({arr}, {brr})",  # set intersect (dedup; order engine-specific)
    "aslice": "slice({arr}, 1, {k})",  # first k elements (fewer if shorter)
    "asliceat": "slice({arr}, {i}, {n})",  # n elements from 1-based pos i
    "shl1": "shiftleft(CAST(1 AS BIGINT), {k})",  # 2^k as BIGINT
}
DUCK_DIALECT = {
    "chr": "unicode({x})",
    "split": "string_split({s}, ' ')",
    "transform": "list_transform({arr}, {lam})",
    "filter": "list_filter({arr}, {lam})",
    "fold0": "list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}), {lam})",
    "dfold0": "list_reduce(list_prepend(CAST(0 AS DOUBLE), {arr}), {lam})",
    "seq": "range({a}, ({b}) + 1)",  # DuckDB range is end-exclusive
    "at": "{arr}[{i}]",
    "amin": "list_min({arr})",
    "asum": "list_sum({arr})",
    "size": "len({arr})",
    "idiv": "({a} // {b})",
    "empty_bigint_array": "CAST([] AS BIGINT[])",
    "splitc": "string_split({s}, {sep})",
    "ajoin": "array_to_string({arr}, {sep})",
    "amax": "list_max({arr})",
    "adistinct": "list_distinct({arr})",
    "areverse": "list_reverse({arr})",
    "asort": "list_sort({arr})",
    "dot": "'.'",
    "mkarr": "[{x}]",
    "empty_str_array": "CAST([] AS VARCHAR[])",
    "aflatten": "flatten({arr})",
    "acontains": "list_contains({arr}, {x})",
    "apos": "list_position({arr}, {x})",
    "sha256hex": "sha256({x})",  # lowercase hex, both engines
    "aconcat": "list_concat({a}, {b})",
    "ainter": "list_intersect({arr}, {brr})",
    "aslice": "({arr})[1:{k}]",
    "asliceat": "({arr})[({i}):(({i}) + ({n}) - 1)]",
    "shl1": "(CAST(1 AS BIGINT) << ({k}))",  # 2^k as BIGINT
}


def _char_fold(s: str, d: dict, base: int = 31) -> str:
    """Karp-Rabin rolling hash of a whole string: fold (acc*base+code) % P.

    ``base`` selects the fold family — distinct coprime bases give
    (near-)independent digests of the same key, the ingredient the 64-bit
    KMV digest combines (:func:`kmv_digest64_sql`). Default 31 is the
    historical kernel every existing oracle pins.
    """
    codes = d["transform"].format(
        arr=d["seq"].format(a="1", b=f"length({s})"),
        lam="i -> CAST(" + d["chr"].format(x=f"substr({s}, i, 1)") + " AS BIGINT)",
    )
    return d["fold0"].format(
        arr=codes, lam=f"(acc, c) -> (acc * {int(base)} + c) % {HASH_P}"
    )


# ---------------------------------------------------------------------------
# Integer fixed-point natural log — the engine-proof ln for quantized scores
# ---------------------------------------------------------------------------
# Round 4's driver gate proved that even "identical IEEE expression trees"
# can hash-diverge across environments (lang_temperature_plan), and ln() is
# worse than the arithmetic ops: libm/JVM log implementations are only
# 1-ulp-accurate, NOT identical between platforms. Every kernel whose
# QUANTIZED output (floor over a score) consumed ln() therefore rode an
# assumption. This kernel removes it: ``lnq_sql(m)`` computes
# ``~round(ln(m) * 2^20)`` for integer ``1 <= m < 2^46`` in EXACT int64
# arithmetic — decompose m = 2^k * (1 + i/128 + f), take k from the binary
# string length (bin() is exact on both engines), look k·ln2 and
# ln(1 + i/128) up in spliced integer tables (the CGM ln-table discipline,
# operators/recrawl.py), and linearly interpolate the 1/128-wide cell with
# a 16-bit integer fraction. Max |lnq/2^20 − ln| ≈ 3e-5 nats (measured over
# the domain) — the kernel DEFINES the score semantics; both engines splice
# the same table text, so parity is constructed, not assumed.
#
# Overflow bounds (documented contract): m < 2^46 keeps m*128 < 2^53 and
# the 16-bit cell fraction product < 2^61; callers pass counts (corpus
# token / bigram totals), far below 7·10^13 in any per-shard model.

#: fixed-point bits of lnq (score quantizers divide this back out)
LNQ_BITS = 20
_LNQ_Q = 1 << LNQ_BITS


def _lnq_tables() -> tuple[list[int], int]:
    import math

    t = [round(math.log1p(i / 128) * _LNQ_Q) for i in range(129)]
    return t, round(math.log(2) * _LNQ_Q)


def lnq_sql(m: str, d: dict) -> str:
    """``round-ish(2^20 * ln(m))`` as one exact-int64 scalar expression.

    ``m`` must be an integer SQL expression with value in [1, 2^46); the
    expression text is spliced several times, so pass a short column
    reference or parenthesized arithmetic, not a subquery.
    """
    t, ln2q = _lnq_tables()
    big = f"CAST(({m}) AS BIGINT)"
    k = f"(length(bin({big})) - 1)"
    p = d["shl1"].format(k=k)
    m128 = f"({big} * 128)"
    i = f"({d['idiv'].format(a=m128, b=p)} - 128)"
    f16 = d["idiv"].format(a=f"(({m128} % {p}) * 65536)", b=p)
    ti = "(CASE {i} {w} END)".format(
        i=i, w=" ".join(f"WHEN {j} THEN {t[j]}" for j in range(128))
    )
    dt = "(CASE {i} {w} END)".format(
        i=i,
        w=" ".join(f"WHEN {j} THEN {t[j + 1] - t[j]}" for j in range(128)),
    )
    interp = d["idiv"].format(a=f"({dt} * ({f16}))", b="65536")
    return f"CAST({k} * {ln2q} + {ti} + {interp} AS BIGINT)"


def lnq_py(m: int) -> int:
    """Python replica of :func:`lnq_sql` — the spec both engines implement
    (used to splice constant-argument lookups and by tests)."""
    t, ln2q = _lnq_tables()
    k = m.bit_length() - 1
    p = 1 << k
    i = (m * 128) // p - 128
    f16 = ((m * 128) % p) * 65536 // p
    return k * ln2q + t[i] + (t[i + 1] - t[i]) * f16 // 65536


def lnq_wide_sql(m: str, d: dict) -> str:
    """:func:`lnq_sql` extended to the full int64 domain ``1 <= m < 2^62``:
    arguments at or above 2^46 evaluate as ``lnq(m div 2^16) + 16·ln2q``
    (exact-integer shift; the dropped low bits perturb ln by < 2^-45
    nats — far below the table's own 3e-5 bound, so the spec just folds
    it in). Same splice-several-times caveat as lnq_sql."""
    _, ln2q = _lnq_tables()
    small = lnq_sql(m, d)
    big = lnq_sql(d["idiv"].format(a=f"({m})", b="65536"), d)
    return (
        f"(CASE WHEN ({m}) < {1 << 46} THEN {small}"
        f" ELSE {big} + {16 * ln2q} END)"
    )


def lnq_wide_py(m: int) -> int:
    """Python replica of :func:`lnq_wide_sql`."""
    _, ln2q = _lnq_tables()
    if m < 1 << 46:
        return lnq_py(m)
    return lnq_py(m // 65536) + 16 * ln2q


# ---------------------------------------------------------------------------
# 64-bit-universe KMV digest — shared by operators.seen / operators.sketches
# ---------------------------------------------------------------------------
#: KMV digest universe: [0, P²) ≈ [0, 4.6e18) — a 31-bit universe saturates
#: at ~2.1e9 distinct keys (est ≤ P regardless of truth), far below the
#: 10^10-URL regime the sketches exist for; P² keeps every product within
#: exact int64 on both engines.
KMV_UNIVERSE = HASH_P * HASH_P
#: square-then-affine mix constants for the two lanes. The square breaks
#: the fold's trailing-char lattice, the affine spread breaks the square's
#: quadratic-residue clustering (measured: affine-only and square-only each
#: bias ~2× on some structured key family; composed worst ±17% at k=64).
_KMV_MIX = ((1_103_515_245, 12_345, 7), (948_751_347, 54_321, 11))


def _kmv_mix_sql(h: str, lane: int) -> str:
    """(a·(h² + c mod P) + b) mod P over an [0, P) value — exact int64."""
    a, b, c = _KMV_MIX[lane]
    return f"(({a} * ((({h}) * ({h}) + {c}) % {HASH_P}) + {b}) % {HASH_P})"


def kmv_digest64_sql(key: str, d: dict) -> str:
    """Uniform digest of a string key over [0, P²) — h1·P + h2.

    Two independent Karp-Rabin folds (base 31 / base 37) mixed per lane;
    the pair addresses a P² universe, so order statistics stay unbiased
    past 10^10 distinct keys. All products < 2^63: h1·P ≤ (P−1)·P ≈
    4.6e18, mixes ≤ a·(P−1) ≈ 2.4e18.
    """
    h1 = _bind(_kmv_mix_sql("__k1", 0), "__k1", _char_fold(key, d, 31), d)
    h2 = _bind(_kmv_mix_sql("__k2", 1), "__k2", _char_fold(key, d, 37), d)
    return f"(({h1}) * {HASH_P} + ({h2}))"


def kmv_estimate_sql(n: str, theta: str, k: int, d: dict) -> str:
    """KMV cardinality estimate over scalar exprs (count ``n``, k-th min
    ``theta``) in the U = P² universe — int64-exact, no overflow, no
    precision loss.

    Branches: below-k sketches are exact; θ < k (incl. the legal digest 0)
    means an impossible >U estimate and returns the deterministic cap U;
    the main branch is split division — (k−1)(U div θ) + ((k−1)(U mod θ))
    div θ — exact while (k−1)·θ < 2^62 (the naive multiply needs 127 bits,
    the naive truncate-first quantizes to multiples of k−1, measured ±16%
    at n/k ≈ 6); past that bound (θ huge ⇒ estimate ≈ k) both operands are
    2^20-pre-scaled — relative error < 2^20/θ ≤ 10^-11, deterministic on
    both engines.
    """
    kk = int(k) - 1
    th = f"({theta})"
    u = f"CAST({KMV_UNIVERSE} AS BIGINT)"
    t_bound = (1 << 62) // kk if kk else 1 << 62
    exact = (
        f"{kk} * {d['idiv'].format(a=u, b=th)} + "
        f"{d['idiv'].format(a=f'({kk} * ({u} % {th}))', b=th)}"
    )
    scaled = d["idiv"].format(
        a=f"{kk} * {d['idiv'].format(a=u, b=str(1 << 20))}",
        b=d["idiv"].format(a=th, b=str(1 << 20)),
    )
    return (
        f"CAST(CASE WHEN {n} < {int(k)} THEN {n} "
        f"WHEN {th} < {int(k)} THEN {u} "
        f"WHEN {th} < {t_bound} THEN {exact} "
        f"ELSE {scaled} END AS BIGINT)"
    )


def kmv_id_digest64_sql(node: str) -> str:
    """Uniform [0, P²) digest of a nonnegative int64 id — dialect-free.

    Lane inputs ``id mod P`` and ``id mod P2`` (P2 the next prime below P)
    are CRT-independent for ids < P·P2, so sequential ids — the lattice
    case par excellence — spread across the full universe.
    """
    p2 = 2_147_483_629
    m1 = f"(({node}) % {HASH_P})"
    m2 = f"(({node}) % {p2})"
    return (
        f"(({_kmv_mix_sql(m1, 0)}) * {HASH_P} + ({_kmv_mix_sql(m2, 1)}))"
    )


def fingerprint_sql(text: str, d: dict, n_chars: int = FINGERPRINT_CHARS) -> str:
    """Rolling-hash document fingerprint over the first ``n_chars`` chars."""
    prefix = f"substr({text}, 1, {n_chars})"
    return f"CASE WHEN length({text}) = 0 THEN 0 ELSE {_char_fold(prefix, d)} END"


def words_sql(text: str, d: dict, cap: int | None = None) -> str:
    w = d["split"].format(s=text)
    if cap is None:
        return w
    # first `cap` words via index transform (portable slice)
    n = f"least({d['size'].format(arr=w)}, {cap})"
    return d["transform"].format(
        arr=d["seq"].format(a="1", b=n),
        lam=f"i -> {d['at'].format(arr=w, i='i')}",
    )


def word_hashes_sql(text: str, d: dict, cap: int = SHINGLE_WORDS) -> str:
    """int64 hash per token (first ``cap`` tokens)."""
    ws = words_sql(text, d, cap)
    return d["transform"].format(arr=ws, lam=f"__w -> {_char_fold('__w', d)}")


def shingle_hashes_sql(text: str, d: dict) -> str:
    """Hashes of word 3-gram shingles over the first SHINGLE_WORDS tokens.

    Shingle hash combines the three word hashes with base-1000003 mixing
    (exact int64: values < P * 1e6 * 2 < 2^52). The word-hash array is bound
    ONCE (``_bind``) — naive inlining recomputes all 32 char-folds for every
    shingle element reference, a ~100× blowup measured on both engines.
    """
    wh = word_hashes_sql(text, d, SHINGLE_WORDS)
    n = d["size"].format(arr="__wh")
    a1 = d["at"].format(arr="__wh", i="i")
    a2 = d["at"].format(arr="__wh", i="i + 1")
    a3 = d["at"].format(arr="__wh", i="i + 2")
    body = d["transform"].format(
        arr=d["seq"].format(a="1", b=f"{n} - {SHINGLE_K - 1}"),
        lam=f"i -> (({a1} * 1000003 + {a2}) % {HASH_P} * 1000003 + {a3}) % {HASH_P}",
    )
    # guard: fewer than K words -> empty array (sequence(1,0) is DESCENDING in
    # Spark, so the guard is load-bearing, not cosmetic)
    guarded = (
        f"CASE WHEN {n} < {SHINGLE_K} THEN {d['empty_bigint_array']} "
        f"ELSE {body} END"
    )
    return _bind(guarded, "__wh", wh, d)


def minhash_sigs_array_sql(text: str, d: dict, k: int | None = None) -> str:
    """All k MinHash components as one array, shingles computed ONCE per row."""
    k = k or N_MINHASH
    sh = shingle_hashes_sql(text, d)
    sigs = []
    for i in range(k):
        mapped = d["transform"].format(
            arr="__sh",
            lam=f"s -> ({MINHASH_A[i]} * s + {MINHASH_B[i]}) % {HASH_P}",
        )
        sigs.append(f"coalesce({d['amin'].format(arr=f'({mapped})')}, -1)")
    arr = (
        "array(" + ", ".join(sigs) + ")"
        if d is SPARK_DIALECT
        else "[" + ", ".join(sigs) + "]"
    )
    return _bind(arr, "__sh", sh, d)


def minhash_sig_sql(text: str, d: dict, i: int) -> str:
    """i-th MinHash signature component: min over shingles of (A*sh+B)%P."""
    sh = shingle_hashes_sql(text, d)
    mapped = d["transform"].format(
        arr="__sh",
        lam=f"s -> ({MINHASH_A[i]} * s + {MINHASH_B[i]}) % {HASH_P}",
    )
    sig = f"coalesce({d['amin'].format(arr=f'({mapped})')}, -1)"
    return _bind(sig, "__sh", sh, d)


def _simhash_terms(d: dict, bits: int, mix: tuple[int, int], shift: int) -> list[str]:
    """Per-bit majority-vote terms over the bound ``__wh`` word-hash array.

    ``mix=(a,b)`` votes on bits of ``(a*h+b) % P`` instead of ``h`` — an
    independent affine remix, so two mixes give two independent fingerprint
    halves (the word hashes are < P = 2^31-1, capping any single mix at 31
    usable bits). ``shift`` packs this half's bits above another's.
    """
    a, b = mix
    terms = []
    for i in range(bits):
        pow2 = 1 << i
        h = "h" if (a, b) == (1, 0) else f"(({a} * h + {b}) % {HASH_P})"
        votes = d["transform"].format(
            arr="__wh",
            lam=f"h -> ({d['idiv'].format(a=h, b=pow2)} % 2) * 2 - 1",
        )
        s = d["asum"].format(arr=f"({votes})")
        terms.append(f"(CASE WHEN ({s}) > 0 THEN {pow2 << shift} ELSE 0 END)")
    return terms


def simhash_sql(text: str, d: dict, bits: int = SIMHASH_BITS) -> str:
    """SimHash over token hashes: per-bit majority vote packed into an int64."""
    wh = word_hashes_sql(text, d, SIMHASH_WORDS)
    expr = " + ".join(_simhash_terms(d, bits, (1, 0), 0))
    return _bind(expr, "__wh", wh, d)


SIMHASH2_A, SIMHASH2_B = 48271, 11  # second-half affine remix (Lehmer multiplier)


def simhash_wide_sql(text: str, d: dict, bits: int = 56) -> str:
    """Wide SimHash: two independently-mixed halves packed into one int64.

    A single word-hash mix caps at 31 vote bits (hashes live in [0, P)); the
    Manku near-dup search wants ~64 so each pigeonhole block spans enough
    values to keep bucket fan-in flat at corpus scale. Two affine mixes over
    the SAME bound word-hash array give ``bits/2 + bits/2`` independent
    votes — hi half << bits/2 | lo half — at one extra vote pass, zero extra
    tokenization.
    """
    if bits % 2 or bits > 62:
        raise ValueError("bits must be even and <= 62")
    half = bits // 2
    wh = word_hashes_sql(text, d, SIMHASH_WORDS)
    terms = _simhash_terms(d, half, (1, 0), 0) + _simhash_terms(
        d, half, (SIMHASH2_A, SIMHASH2_B), half
    )
    return _bind(" + ".join(terms), "__wh", wh, d)


LINE_WORDS = 8  # deterministic line fixture: 8 words per synthesized line


def text_hash_sql(s: str, d: dict) -> str:
    """Rolling hash of an arbitrary string (guarded: '' hashes to 0).

    The guard is load-bearing on the Spark side: ``sequence(1, 0)`` is
    DESCENDING there, so the unguarded fold would walk [1, 0] for an empty
    string instead of the empty range DuckDB produces.
    """
    return f"CASE WHEN length({s}) = 0 THEN CAST(0 AS BIGINT) ELSE {_char_fold(s, d)} END"


def lines_sql(text: str, d: dict, words_per_line: int = LINE_WORDS) -> str:
    """Deterministic line structure: words regrouped into newline-joined
    groups of ``words_per_line``.

    The synthetic `documents` corpus carries no newlines of its own, so
    line-granular operators (line_dedup, dup-line fraction) are exercised
    over this fixture — the SAME construction compiles to both engines, so
    the line boundaries are bit-identical on the Spark and DuckDB sides.
    """
    w = d["split"].format(s=text)
    n = d["size"].format(arr="__lw")
    inner = d["transform"].format(
        arr=d["seq"].format(
            a=f"__j * {words_per_line} + 1",
            b=f"least((__j + 1) * {words_per_line}, {n})",
        ),
        lam=f"__i -> {d['at'].format(arr='__lw', i='__i')}",
    )
    line = d["ajoin"].format(arr=f"({inner})", sep="' '")
    # CAST to INT keeps the outer sequence (and so every index the inner
    # lambda derives from __j) INT on Spark — `div` alone yields BIGINT and
    # element_at rejects BIGINT indices
    arr = d["transform"].format(
        arr=d["seq"].format(
            a="0",
            b=f"CAST({d['idiv'].format(a=f'({n} - 1)', b=words_per_line)} AS INT)",
        ),
        lam=f"__j -> {line}",
    )
    return _bind(d["ajoin"].format(arr=f"({arr})", sep="chr(10)"), "__lw", w, d)


def dup_line_frac_q4_sql(text: str, d: dict) -> str:
    """Within-doc duplicate-line fraction (Gopher repetition signal), q4.

    floor(1e4 * (n_lines - n_distinct_lines) / n_lines) as exact integer
    arithmetic (idiv) — no floats, bit-identical across engines. ``text``
    must already carry newline-separated lines (see lines_sql).
    """
    lines = d["splitc"].format(s=text, sep="chr(10)")
    n = d["size"].format(arr="__ln")
    nd = d["size"].format(arr=d["adistinct"].format(arr="__ln"))
    expr = d["idiv"].format(a=f"10000 * ({n} - {nd})", b=n)  # split() => n >= 1
    return _bind(f"CAST({expr} AS BIGINT)", "__ln", lines, d)


def _gram_hashes_sql(d: dict, n: int) -> str:
    """Word n-gram hashes over the bound ``__wh`` word-hash array.

    Left-fold base-1000003 mixing, unrolled per position (exact int64:
    every partial stays < P·1e6·2 < 2^52). Guarded empty under n words —
    sequence(1, 0) is DESCENDING on Spark, same trap as shingles.
    """
    nvar = d["size"].format(arr="__wh")
    expr = d["at"].format(arr="__wh", i="i")
    for j in range(1, n):
        nxt = d["at"].format(arr="__wh", i=f"i + {j}")
        expr = f"(({expr}) * 1000003 + {nxt}) % {HASH_P}"
    body = d["transform"].format(
        arr=d["seq"].format(a="1", b=f"{nvar} - {n - 1}"),
        lam=f"i -> {expr}",
    )
    return (
        f"CASE WHEN {nvar} < {n} THEN {d['empty_bigint_array']} "
        f"ELSE {body} END"
    )


def _gram_counts_sql(d: dict) -> str:
    """Occurrence count per distinct gram of the bound ``__gh`` array
    (O(cap²) worst case — constant per row under the SHINGLE_WORDS cap)."""
    return d["transform"].format(
        arr=d["adistinct"].format(arr="__gh"),
        lam=(
            "__x -> CAST("
            + d["size"].format(
                arr=d["filter"].format(arr="__gh", lam="__y -> __y = __x")
            )
            + " AS BIGINT)"
        ),
    )


def top_ngram_cover_q4_sql(text: str, d: dict, n: int = 2) -> str:
    """Share of n-gram occurrences held by the most frequent word n-gram
    (Gopher "top n-gram fraction" repetition rule, Rae et al. A1.1 —
    occurrence-count form of the paper's character fraction), q4:
    floor(1e4 * max_count / n_grams), 0 when under n words.
    """
    wh = word_hashes_sql(text, d, SHINGLE_WORDS)
    counts = _gram_counts_sql(d)
    ng = d["size"].format(arr="__gh")
    cover = d["idiv"].format(
        a=f"10000 * {d['amax'].format(arr=f'({counts})')}", b=ng
    )
    expr = (
        f"CASE WHEN {ng} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST({cover} AS BIGINT) END"
    )
    return _bind(_bind(expr, "__gh", _gram_hashes_sql(d, n), d), "__wh", wh, d)


def top_bigram_cover_q4_sql(text: str, d: dict) -> str:
    """Coverage of the most frequent word bigram — ``top_ngram_cover`` at
    n=2 (kept as the named kernel doc_repetition ships)."""
    return top_ngram_cover_q4_sql(text, d, 2)


def dup_ngram_frac_q4_sql(text: str, d: dict, n: int) -> str:
    """Share of n-gram positions whose n-gram occurs more than once
    (Gopher "duplicate n-gram fraction", occurrence form), q4:
    floor(1e4 * (n_grams - n_singleton_grams) / n_grams), 0 under n words.
    Each singleton gram contributes exactly one position, so duplicated
    positions = total - singletons — no per-position second pass needed.
    """
    wh = word_hashes_sql(text, d, SHINGLE_WORDS)
    counts = _gram_counts_sql(d)
    ng = d["size"].format(arr="__gh")
    n_once = d["size"].format(
        arr=d["filter"].format(arr=f"({counts})", lam="__c -> __c = 1")
    )
    frac = d["idiv"].format(a=f"10000 * ({ng} - {n_once})", b=ng)
    expr = (
        f"CASE WHEN {ng} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST({frac} AS BIGINT) END"
    )
    return _bind(_bind(expr, "__gh", _gram_hashes_sql(d, n), d), "__wh", wh, d)


def _bind(expr: str, var: str, value: str, d: dict) -> str:
    """Bind a repeated subexpression via a 1-element transform (portable CTE).

    Avoids recomputing ``value`` per use site: wraps expr as
    transform(array(value), var -> expr)[1].
    """
    arr = f"array({value})" if d is SPARK_DIALECT else f"[{value}]"
    one = d["transform"].format(arr=arr, lam=f"{var} -> {expr}")
    return d["at"].format(arr=f"({one})", i="1")


# ---------------------------------------------------------------------------
# token / quality / language statistics (plain portable SQL arithmetic)
# ---------------------------------------------------------------------------


def token_count_sql(text: str, d: dict) -> str:
    return d["size"].format(arr=d["split"].format(s=text))


def sql_str_literal(s: str) -> str:
    """A single-quoted SQL string literal, quote-escaped — the one shared
    escaping helper for every dialect kernel (both engines double the
    quote; neither side's literal may contain backslash escapes, see the
    dialect notes above)."""
    return "'" + s.replace("'", "''") + "'"


def occurrences_sql(text: str, needle: str) -> str:
    """Occurrence count via length arithmetic — portable across both engines."""
    nlen = len(needle)
    lit = sql_str_literal(needle)
    return f"((length({text}) - length(replace({text}, {lit}, ''))) / {nlen})"


# Marker stopwords per language for the stopword lang-ID heuristic. Dict
# order is the tie-break priority (first language with a maximal score wins;
# keep the original en/de/fr order first for stable predictions). Markers
# containing non-ASCII (CJK) are counted as raw substrings — those scripts
# don't delimit words with spaces — while ASCII markers are whole-word
# matches via space padding.
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "is"],
    "de": ["der", "und", "die", "das", "nicht"],
    "fr": ["le", "et", "les", "une", "est"],
    "es": ["el", "que", "los", "una", "para"],
    "it": ["il", "che", "per", "gli", "sono"],
    "pt": ["o", "que", "uma", "para", "não"],
    "nl": ["de", "het", "een", "niet", "aan"],
    "zh": ["的", "是", "了", "在", "和"],
    # non-Latin scripts: markers are script-exclusive, so these languages
    # only ever compete within their own script (a Latin text scores 0 on
    # all of them). ru/uk and ar/fa are split by script-internal
    # distinctives: ы/э/ъ are Russian-only, ї/є/і Ukrainian-only;
    # پ/گ/چ/ژ exist in Persian but not Arabic.
    "ru": ["ы", "э", "ъ", "что", "это"],
    "uk": ["ї", "є", "і", "що", "це"],
    "ar": ["ال", "في", "من", "هذا", "على"],
    "fa": ["پ", "گ", "چ", "ژ", "است"],
    "ja": ["の", "は", "を", "です", "した"],
    "ko": ["이", "는", "을", "의", "하"],
    "hi": ["के", "है", "की", "में", "का"],
}


def lang_score_sql(text: str, lang: str) -> str:
    padded = f"(' ' || {text} || ' ')"
    terms = [
        occurrences_sql(text, m)
        if all(ord(ch) > 127 for ch in m)
        else occurrences_sql(padded, f" {m} ")
        for m in LANG_MARKERS[lang]
    ]
    return "(" + " + ".join(terms) + ")"


def lang_pred_sql(text: str, d: dict = SPARK_DIALECT) -> str:
    """argmax over LANG_MARKERS scores; 'und' (undetermined) when all zero.

    Generic over the marker table. The score array is LET-BOUND once (the
    same combinator as the SURT pipeline): the previous pairwise CASE chain
    inlined every score expression O(L²) times, which stops being viable at
    a 15-language table; this renders each score exactly once and picks the
    winner with first-position-of-max — identical tie-break semantics
    (earliest dict entry among maximal scores wins).
    """
    langs = list(LANG_MARKERS)
    scores = ", ".join(lang_score_sql(text, lg) for lg in langs)
    names = ", ".join(f"'{lg}'" for lg in langs)
    names_arr = f"array({names})" if d is SPARK_DIALECT else f"[{names}]"
    amax = d["amax"].format(arr="__ls")
    pick = d["at"].format(
        arr=f"({names_arr})",
        i=f"CAST({d['apos'].format(arr='__ls', x=amax)} AS INT)",
    )
    scores_arr = f"array({scores})" if d is SPARK_DIALECT else f"[{scores}]"
    body = f"CASE WHEN {amax} = 0 THEN 'und' ELSE {pick} END"
    return _bind(body, "__ls", scores_arr, d)


def quality_score_sql(text: str, d: dict) -> str:
    """Heuristic quality score in [0,1]: length, word-shape, punctuation mix.

    score = 0.4*min(tokens/100,1) + 0.3*(1/(1+|avg_word_len-5|))
          + 0.3*min(10*punct_ratio, 1)   — exact rational arithmetic, rounded
    by the caller.
    """
    nt = f"CAST({token_count_sql(text, d)} AS DOUBLE)"
    awl = f"(CAST(length({text}) AS DOUBLE) - ({nt} - 1)) / {nt}"
    punct = (
        f"({occurrences_sql(text, '.')} + {occurrences_sql(text, ',')}) "
        f"/ CAST(length({text}) AS DOUBLE)"
    )
    # every literal CAST to DOUBLE: DuckDB otherwise parses 0.4 as DECIMAL and
    # its decimal arithmetic diverges from Spark's IEEE doubles in the last ulp
    def D(x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    return (
        f"({D('0.4')} * least({nt} / {D('100')}, {D('1')}) "
        f"+ {D('0.3')} * ({D('1')} / ({D('1')} + abs(({awl}) - {D('5')}))) "
        f"+ {D('0.3')} * least({D('10')} * ({punct}), {D('1')}))"
    )


# ---------------------------------------------------------------------------
# Spark Column wrappers (the engine-side API)
# ---------------------------------------------------------------------------


def fingerprint(text_col: str) -> Column:
    return F.expr(fingerprint_sql(text_col, SPARK_DIALECT))


def token_count(text_col: str) -> Column:
    return F.expr(token_count_sql(text_col, SPARK_DIALECT))


def minhash_signature(text_col: str, k: int = N_MINHASH) -> Column:
    return F.expr(minhash_sigs_array_sql(text_col, SPARK_DIALECT, k))


def simhash(text_col: str, bits: int = SIMHASH_BITS) -> Column:
    return F.expr(simhash_sql(text_col, SPARK_DIALECT, bits))


def simhash_wide(text_col: str, bits: int = 56) -> Column:
    return F.expr(simhash_wide_sql(text_col, SPARK_DIALECT, bits))


def quality_score(text_col: str) -> Column:
    return F.expr(quality_score_sql(text_col, SPARK_DIALECT))


def lang_pred(text_col: str) -> Column:
    return F.expr(lang_pred_sql(text_col))


# ---------------------------------------------------------------------------
# Unicode-script mix — the "what writing system is this page actually in"
# signal a webtext curation pass needs BEFORE n-gram lang-ID is meaningful
# (LANG_MARKERS assumes the script is already known; CJK/Cyrillic/Arabic
# pages match zero Latin markers and would all collapse into 'und').
# Per-character codepoint-range classification over a capped prefix, pure
# dialect-templated int64 — one array bind per document, zero Python.
# ---------------------------------------------------------------------------

SCRIPT_SCAN_CHARS = 2000  # prefix cap: script identity saturates fast

#: label -> inclusive codepoint ranges; label ORDER is the argmax tie-break
SCRIPT_RANGES: dict[str, tuple[tuple[int, int], ...]] = {
    "latin": ((65, 90), (97, 122), (0xC0, 0x24F)),
    "cyrillic": ((0x400, 0x4FF),),
    "greek": ((0x370, 0x3FF),),
    "arabic": ((0x600, 0x6FF), (0x750, 0x77F)),
    "cjk": ((0x3040, 0x30FF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF)),
    "hangul": ((0x1100, 0x11FF), (0xAC00, 0xD7AF)),
    "digit": ((48, 57),),
}
SCRIPT_LABELS = list(SCRIPT_RANGES)


def script_counts_sql(text: str, d: dict, cap: int = SCRIPT_SCAN_CHARS) -> str:
    """array<bigint> of per-script char counts (SCRIPT_LABELS order) over
    the first ``cap`` chars. The codepoint array is bound ONCE; each label
    filters the bound array (k small passes over ≤cap ints, not k char
    re-scans)."""
    prefix = f"substr({text}, 1, {cap})"
    codes = d["transform"].format(
        arr=d["seq"].format(a="1", b=f"length({prefix})"),
        lam="i -> CAST("
        + d["chr"].format(x=f"substr({prefix}, i, 1)")
        + " AS BIGINT)",
    )
    # seq(1, 0) is invalid on both engines — empty text yields no codes
    codes = (
        f"CASE WHEN length({text}) = 0 THEN "
        + d["empty_bigint_array"]
        + f" ELSE ({codes}) END"
    )
    counts = []
    for ranges in SCRIPT_RANGES.values():
        cond = " OR ".join(f"(c >= {lo} AND c <= {hi})" for lo, hi in ranges)
        filt = d["filter"].format(arr="__sc", lam=f"c -> ({cond})")
        counts.append(f"CAST({d['size'].format(arr=filt)} AS BIGINT)")
    arr = (
        f"array({', '.join(counts)})"
        if d is SPARK_DIALECT
        else f"[{', '.join(counts)}]"
    )
    return _bind(arr, "__sc", codes, d)


def main_script_sql(counts_arr: str, d: dict) -> str:
    """argmax label over a script-counts array expression; 'und' when all
    zero. Ties break by SCRIPT_LABELS order (first max wins — both engines'
    position functions return the first occurrence)."""
    labels = ", ".join(f"'{lb}'" for lb in SCRIPT_LABELS)
    labels_arr = f"array({labels})" if d is SPARK_DIALECT else f"[{labels}]"
    mx = d["amax"].format(arr="__cc")
    pos = d["apos"].format(arr="__cc", x=f"({mx})")
    pick = d["at"].format(arr=labels_arr, i=f"CAST({pos} AS INT)")
    expr = f"CASE WHEN ({mx}) IS NULL OR ({mx}) = 0 THEN 'und' ELSE {pick} END"
    return _bind(expr, "__cc", counts_arr, d)


def script_counts(text_col: str) -> Column:
    return F.expr(script_counts_sql(text_col, SPARK_DIALECT))


def main_script(counts_col: str) -> Column:
    return F.expr(main_script_sql(counts_col, SPARK_DIALECT))


# ---------------------------------------------------------------------------
# hashed bag-of-words embedding (feature hashing / "hashing trick")
# ---------------------------------------------------------------------------


def hash_embedding_sql(
    text: str, d: dict, dim: int = 16, cap: int = SHINGLE_WORDS
) -> str:
    """Deterministic dense text embedding via feature hashing
    (Weinberger et al. 2009): component b = Σ over the first ``cap`` tokens
    with ``word_hash % dim = b`` of a ±1 sign drawn from the hash's next
    bits. Exact int64 (``array<bigint>``) — no floats, no model — so the
    kernel is bit-replayable on the oracle side; cast to double downstream
    to feed the cosine/LSH/IVF/PQ vector operators (the raw-text on-ramp to
    semantic dedup when no learned embeddings exist). Map-only, O(dim·cap)
    per row.
    """
    wh = word_hashes_sql(text, d, cap)
    comps = []
    for b in range(dim):
        filt = d["filter"].format(arr="__wh", lam=f"__h -> __h % {dim} = {b}")
        signed = d["transform"].format(
            arr=f"({filt})",
            lam=(
                "__h -> CAST("
                + d["idiv"].format(a="__h", b=str(dim))
                + " % 2 * 2 - 1 AS BIGINT)"
            ),
        )
        # coalesce: DuckDB list_sum([]) is NULL where Spark's fold is 0
        comps.append(
            f"coalesce({d['asum'].format(arr=f'({signed})')}, CAST(0 AS BIGINT))"
        )
    arr = (
        "array(" + ", ".join(comps) + ")"
        if d is SPARK_DIALECT
        else "[" + ", ".join(comps) + "]"
    )
    return _bind(arr, "__wh", wh, d)


def hash_embedding(text_col: str, dim: int = 16) -> Column:
    return F.expr(hash_embedding_sql(text_col, SPARK_DIALECT, dim))


# ---------------------------------------------------------------------------
# character-distribution entropy (compression-ratio-style quality signal)
# ---------------------------------------------------------------------------

#: Entropy window: the leading slice that is scored. Bounds the O(d·n)
#: distinct-char counting (d <= alphabet size) per row; 2000 chars is
#: plenty to characterize a page's character distribution.
ENTROPY_CHARS = 2000


def char_entropy_q4_sql(text: str, d: dict) -> str:
    """Shannon entropy of the character distribution (nats, q4) over the
    first ENTROPY_CHARS characters — the cheap stand-in for the
    compression-ratio quality check CC-era pipelines run: template sludge
    and repeated-character runs score near 0, normal prose ~2.9-3.2,
    random base64-ish noise ~4+. Both tails are curation signals.

    ``H = ln(n) − (Σ cᵢ·ln cᵢ)/n`` in EXACT int64 via the spliced lnq
    table (r5 double-audit: ln is libm-dependent, so the quantized score
    previously rode a cross-environment bit-identity assumption — the
    class the r4 driver gate falsified): ``H_q4 = max(0, 10000·(n·lnq(n)
    − Σ cᵢ·lnq(cᵢ))) div (n·2^20)``. The numerator is clamped BEFORE the
    division (table error can push uniform text a hair negative, and
    Spark ``div`` truncates where DuckDB ``//`` floors — they only agree
    on non-negatives). No fold ordering needed: integer sums commute.
    Bounds: n ≤ 2000 keeps every product < 2^48. Empty text scores 0.
    """
    n_capped = f"least(length({text}), {ENTROPY_CHARS})"
    chars = d["transform"].format(
        arr=d["seq"].format(a="1", b=n_capped),
        lam=f"i -> substr({text}, i, 1)",
    )
    count_of = d["size"].format(
        arr=d["filter"].format(arr="__ch", lam="__y -> __y = __c")
    )
    counts = d["transform"].format(
        arr=d["adistinct"].format(arr="__ch"),
        lam=f"__c -> CAST({count_of} AS BIGINT)",
    )
    sumterm = d["fold0"].format(
        arr="__cc", lam=f"(acc, c) -> acc + c * {lnq_sql('c', d)}"
    )
    nv = d["size"].format(arr="__ch")
    num = (
        f"greatest(CAST(0 AS BIGINT), 10000 * "
        f"(CAST({nv} AS BIGINT) * {lnq_sql(nv, d)} - ({sumterm})))"
    )
    h_q4 = d["idiv"].format(a=num, b=f"(CAST({nv} AS BIGINT) * {_LNQ_Q})")
    expr = f"CAST({h_q4} AS BIGINT)"
    bound = _bind(_bind(expr, "__cc", counts, d), "__ch", chars, d)
    # NULL/empty guard OUTSIDE the array construction: Spark's
    # sequence(1, 0) is DESCENDING (the a<=b trap, same as text_hash_sql)
    # and least(length(NULL), cap) is cap on both engines (least skips
    # NULLs) — either would poison the char array before any inner guard.
    return (
        f"CASE WHEN {text} IS NULL OR length({text}) = 0 "
        f"THEN CAST(0 AS BIGINT) ELSE {bound} END"
    )
