"""Live HTTP fetch (S2 executable variant) — e2e vs the simulated join.

A stdlib ``http.server`` fixture (threaded, bound to 0.0.0.0 so the
127.0.0.0/8 loopback block provides several distinct virtual hosts on one
socket) serves a small linked corpus. The same corpus backs a pages table,
so one CrawlJob runs the simulated fetch join and another actually fetches
over HTTP — final frontier state must be byte-identical, including the
missing-link 404 path, the encoding re-decode (shift_jis meta declaration,
header-declared latin-1) and the text/content hashes. Timeout and non-200
responses get their own live-only assertions (the simulated join cannot
express them), as does POST payload round-tripping and per-host sequential
fetch ordering (politeness)."""

from __future__ import annotations

import hashlib
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from scrape_spark.plans.crawl import CrawlJob, FRONTIER_COLS
from scrape_spark.plans.httpfetch import HttpFetcher, sniff_decode
from scrape_spark.plans.statestore import SnapshotStore
from scrape_spark.session import local_df


class _Handler(BaseHTTPRequestHandler):
    routes: dict[str, tuple[int, str, bytes]] = {}
    log: list[tuple[str, str, float]] = []
    lock = threading.Lock()

    def _serve(self, body_extra: bytes = b"") -> None:
        with _Handler.lock:
            _Handler.log.append(
                (self.headers.get("Host", ""), self.path, time.monotonic())
            )
        if self.path == "/slow":
            time.sleep(2.0)
        route = _Handler.routes.get(self.path)
        if route is None:
            self.send_error(404, "Not Found")
            return
        status, ctype, body = route
        body = body + body_extra
        if status >= 400:
            self.send_error(status)
            return
        if 300 <= status < 400:  # redirect: ctype slot carries Location
            self.send_response(status)
            self.send_header("Location", ctype)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — http.server API
        self._serve()

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        posted = self.rfile.read(n)
        self._serve(body_extra=b"<p>posted:" + posted + b"</p>")

    def log_message(self, *a):  # silence stderr
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("0.0.0.0", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _host(i: int, srv) -> str:
    return f"127.0.0.{i + 2}:{srv.server_address[1]}"


def _corpus(srv):
    """(pages_rows, routes): 2 virtual hosts, hierarchical paths (the crawl
    confines links UNDER the referring page's path — is_under_base, P2),
    one dangling missing link per host, one shift_jis page (meta charset),
    one latin-1 page (header charset only)."""
    rows, routes = [], {}

    def page(host_i, path, html, enc="utf-8", ctype="text/html"):
        url = f"http://{_host(host_i, srv)}{path}"
        rows.append((url, html, f"text-of {url}"))
        routes[path] = (200, ctype, html.encode(enc))
        return url

    for hi in range(2):
        h = _host(hi, srv)
        extra = (
            f'<a href="http://{h}/h{hi}/sjis">enc</a>' if hi == 0
            else f'<a href="http://{h}/h{hi}/latin">enc</a>'
        )
        page(
            hi,
            f"/h{hi}/",
            f'<html><title>H{hi} root</title><body>'
            f'<a href="http://{h}/h{hi}/a">one</a>'
            f'<a href="http://{h}/h{hi}/b">two</a>{extra}</body></html>',
        )
        page(
            hi,
            f"/h{hi}/a",
            f'<html><title>H{hi} a</title><body>'
            f'<a href="http://{h}/h{hi}/a/deep">three</a>'
            f'<a href="http://{h}/h{hi}/a/missing">gone</a></body></html>',
        )
        page(hi, f"/h{hi}/b", "")  # blank body: done, no links (P7)
        page(
            hi,
            f"/h{hi}/a/deep",
            f"<html><title>H{hi} deep</title><body>leaf</body></html>",
        )
    # encoding paths: meta-declared shift_jis; header-declared latin-1
    page(
        0,
        "/h0/sjis",
        '<html><head><meta charset="shift_jis"><title>日本語</title></head>'
        "<body>テキスト本文</body></html>",
        enc="shift_jis",
    )
    page(
        1,
        "/h1/latin",
        "<html><title>café</title><body>déjà vu</body></html>",
        enc="latin-1",
        ctype="text/html; charset=iso-8859-1",
    )
    return rows, routes


def _job(spark, tmp_path, name, pages, fetcher=None, **kw):
    store = SnapshotStore(spark, str(tmp_path / name))
    robots = local_df(spark, [], "host string, robots_txt string")
    return CrawlJob(
        spark, store, pages, robots, n_buckets=4,
        bucket_capacity=1 << 10, fetcher=fetcher, **kw,
    )


def _state(job) -> dict[str, tuple]:
    cols = [c for c in FRONTIER_COLS]
    return {
        r["url"]: tuple(r[c] for c in cols if c != "url")
        for r in job.frontier().select(*cols).collect()
    }


def test_live_state_byte_identical_to_simulated(spark, tmp_path, server):
    rows, routes = _corpus(server)
    _Handler.routes = routes
    pages = local_df(spark, rows, "url string, html string, text string")
    seeds = [f"http://{_host(i, server)}/h{i}/" for i in range(2)]

    sim = _job(spark, tmp_path, "sim", pages)
    sim.seed(seeds)
    sim.run(max_rounds=10)

    live = _job(
        spark, tmp_path, "live", pages, fetcher=HttpFetcher(timeout=5.0)
    )
    live.seed(seeds)
    live.run(max_rounds=10)

    s, l = _state(sim), _state(live)
    assert set(s) == set(l)
    for url in s:
        assert s[url] == l[url], (url, s[url], l[url])
    # sanity: the crawl actually exercised the paths under test
    statuses = {u: v[11] for u, v in s.items()}  # status col index
    assert sum(1 for v in statuses.values() if v == "error") == 2  # missing×2
    assert any(u.endswith("/h0/sjis") for u in s)
    assert any(u.endswith("/h1/latin") for u in s)


def test_live_error_rows_carry_reference_semantics(spark, tmp_path, server):
    """Non-200 → '<code> <reason>' error rows with NULL status_code (the
    raise_for_status path); unreachable-port → transport error string."""
    _Handler.routes = {
        "/": (
            200,
            "text/html",
            b'<html><body><a href="/gone">x</a></body></html>',
        ),
        "/gone": (410, "text/html", b""),
    }
    h = _host(0, server)
    live = _job(
        spark, tmp_path, "err", None, fetcher=HttpFetcher(timeout=5.0)
    )
    live.seed([f"http://{h}/"])
    live.run(max_rounds=5)
    st = {
        r["url"]: (r["status"], r["error_message"], r["status_code"])
        for r in live.frontier().collect()
    }
    assert st[f"http://{h}/"] == ("done", None, 200)
    assert st[f"http://{h}/gone"] == ("error", "410 Gone", None)


def test_live_timeout_rows(spark, tmp_path, server):
    _Handler.routes = {
        "/": (
            200,
            "text/html",
            b'<html><body><a href="/slow">s</a></body></html>',
        ),
        "/slow": (200, "text/html", b"<html>slow</html>"),
    }
    h = _host(1, server)
    live = _job(
        spark, tmp_path, "tmo", None, fetcher=HttpFetcher(timeout=0.5)
    )
    live.seed([f"http://{h}/"])
    live.run(max_rounds=5)
    st = {
        r["url"]: (r["status"], r["error_message"])
        for r in live.frontier().collect()
    }
    assert st[f"http://{h}/slow"] == ("error", "timed out")


def test_live_post_payload_roundtrip(spark, tmp_path, server):
    _Handler.routes = {
        "/form": (200, "text/html", b"<html><title>form</title>"),
    }
    h = _host(0, server)
    url = f"http://{h}/form"
    live = _job(
        spark, tmp_path, "post", None, fetcher=HttpFetcher(timeout=5.0)
    )
    live.seed([(url, "POST", '{"q": "spark", "n": 2}')])
    live.run(max_rounds=2)
    row = live.frontier().where(F.col("url") == url).collect()[0]
    assert row["status"] == "done" and row["status_code"] == 200
    expected = "<html><title>form</title><p>posted:q=spark&n=2</p>"
    assert row["content_hash"] == hashlib.sha256(
        expected.encode()
    ).hexdigest()


def test_per_host_fetches_are_sequential_in_seq_order(spark, tmp_path, server):
    """Politeness: one host's fetches arrive strictly in frontier order
    (the fetcher serializes per host; distinct hosts run in parallel)."""
    rows, routes = _corpus(server)
    _Handler.routes = routes
    _Handler.log = []
    pages = local_df(spark, rows, "url string, html string, text string")
    live = _job(
        spark, tmp_path, "seqorder", pages, fetcher=HttpFetcher(timeout=5.0)
    )
    live.seed([f"http://{_host(i, server)}/h{i}/" for i in range(2)])
    live.run(max_rounds=10)
    order = {r["url"]: r["seq"] for r in live.frontier().collect()}
    by_host: dict[str, list[int]] = {}
    for host, path, _t in _Handler.log:
        url = f"http://{host}{path}"
        if url in order:
            by_host.setdefault(host, []).append(order[url])
    for host, seqs in by_host.items():
        assert seqs == sorted(seqs), (host, seqs)


def test_sniff_decode_header_meta_fallback():
    sjis = "<meta charset=shift_jis>日本語".encode("shift_jis")
    assert "日本語" in sniff_decode(sjis, "text/html")
    latin = "café".encode("latin-1")
    assert sniff_decode(latin, "text/html; charset=iso-8859-1") == "café"
    # undeclared non-utf8 degrades via replacement, never raises
    assert sniff_decode(b"\xff\xfe caf", "text/html") != ""
    assert sniff_decode("ok".encode(), None) == "ok"


def test_non_http_scheme_is_an_error_row_not_a_read():
    """file:// (or any non-http scheme) must NEVER touch the worker's
    filesystem — the reference's requests raises InvalidSchema and stores
    str(e); the engine mirrors that exact message (ADVICE r4, medium)."""
    from scrape_spark.plans.httpfetch import _fetch_one

    for url in ("file:///etc/passwd", "ftp://example.com/x", "data:text/html,hi"):
        html, status, err, final = _fetch_one(
            url, "GET", None, None, "UA", 1.0, None
        )
        assert html == "" and status is None and final is None
        assert err == f"No connection adapters were found for {url!r}"
    # the guard must not shadow the P1 empty-URL path
    assert _fetch_one("", "GET", None, None, "UA", 1.0, None)[2] == "URL is empty"


def test_partition_streams_one_frame_per_host(server):
    """_run_partition yields one pandas frame PER HOST (r5 memory cap:
    bodies never accumulate for the whole partition), rows and values
    identical to the single-frame contract."""
    import pandas as pd

    from scrape_spark.plans.httpfetch import _run_partition

    _Handler.routes = {"/a": (200, "text/html", b"<html>A</html>")}
    hosts = [_host(i, server) for i in range(3)]
    pdf = pd.DataFrame(
        {
            "url": [f"http://{h}/a" for h in hosts for _ in range(2)],
            "host": [h for h in hosts for _ in range(2)],
            "seq": list(range(6)),
        }
    )
    frames = list(_run_partition([pdf], 5.0, 4, "UA", False, None))
    assert len(frames) == 3  # one per host, not one per partition
    assert sorted(set(f["host"].iloc[0] for f in frames)) == sorted(hosts)
    out = pd.concat(frames).sort_values("seq")
    assert list(out["status_code"]) == [200] * 6
    assert all("<html>A</html>" in h for h in out["html"])


def test_live_robots_fetch_honors_disallow_and_delay(spark, tmp_path, server):
    """S5/S7 live variant (r5): with ZERO pre-seeded robots rows, the crawl
    fetches {scheme}://{host}/robots.txt itself through the HttpFetcher,
    honors the live-fetched Disallow and Crawl-delay, and lands in state
    byte-identical to the simulated robots source on the same corpus.
    round_seconds=1 with Crawl-delay: 1 forces one-URL-per-host rounds, so
    the delay actively shapes the schedule both jobs must agree on."""
    rows, routes = _corpus(server)
    robots_body = "User-agent: *\nDisallow: /h0/a\nCrawl-delay: 1"
    routes["/robots.txt"] = (200, "text/plain", robots_body.encode())
    _Handler.routes = routes
    pages = local_df(spark, rows, "url string, html string, text string")
    seeds = [f"http://{_host(i, server)}/h{i}/" for i in range(2)]

    live_store = SnapshotStore(spark, str(tmp_path / "roblive"))
    live = CrawlJob(
        # pages rides along as the parallel-truth capture (supplies
        # src_text for text_match) — robots_source=None is the live part
        spark, live_store, pages, None, n_buckets=4,
        bucket_capacity=1 << 10, fetcher=HttpFetcher(timeout=5.0),
        robots_scheme="http", round_seconds=1,
    )
    live.seed(seeds)
    live.run(max_rounds=20)

    sim_store = SnapshotStore(spark, str(tmp_path / "robsim"))
    sim_source = local_df(
        spark,
        # the frontier host column is PORTLESS (parse_url HOST semantics)
        # — the simulated network keys rows the same way
        [(_host(i, server).split(":")[0], robots_body) for i in range(2)],
        "host string, robots_txt string",
    )
    sim = CrawlJob(
        spark, sim_store, pages, sim_source, n_buckets=4,
        bucket_capacity=1 << 10, round_seconds=1,
    )
    sim.seed(seeds)
    sim.run(max_rounds=20)

    assert _state(live) == _state(sim)
    st = {r["url"]: r for r in live.frontier().collect()}
    blocked = st[f"http://{_host(0, server)}/h0/a"]
    assert blocked["status"] == "blocked" or "robots" in (
        blocked["error_message"] or ""
    ).lower()
    # the disallowed subtree is never discovered
    assert f"http://{_host(0, server)}/h0/a/deep" not in st
    # live-fetched Crawl-delay landed in the rules table (portless keys)
    rules = {
        r["host"]: r["crawl_delay"]
        for r in live_store.read("robots").collect()
    }
    assert rules["127.0.0.2"] == 1 and rules["127.0.0.3"] == 1


def test_live_robots_transport_failure_stores_nothing(spark, tmp_path, server):
    """A host whose robots.txt fetch fails at the TRANSPORT level must not
    get a rules row (robots_handler.py:42-44: URLError -> store nothing);
    an HTTP 404 host stores an empty-rules (allow-all) row."""
    from scrape_spark.plans.httpfetch import live_robots_source

    _Handler.routes = {}  # no /robots.txt -> 404 for live hosts
    good = _host(0, server)
    dead = "127.0.0.2:1"  # nothing listens on port 1 -> connection refused
    hosts = local_df(spark, [(good,), (dead,)], "host string")
    src = live_robots_source(
        HttpFetcher(timeout=2.0), hosts, scheme="http"
    ).collect()
    got = {r["host"]: r["robots_txt"] for r in src}
    assert dead not in got  # transport failure -> dropped
    assert got[good] == ""  # 404 -> empty rules = allow-all


def test_sniff_decode_undeclared_legacy_content_statistics():
    """r5 (verdict item 8): a legacy page with NO charset declaration
    anywhere decodes via content-statistics ranking, like the reference's
    chardet apparent_encoding — not into mojibake."""
    jp = "<html><title>日本語のページ</title><body>これは本文です。図書館、新聞、天気。</body></html>"
    assert sniff_decode(jp.encode("shift_jis"), "text/html") == jp
    assert sniff_decode(jp.encode("euc_jp"), "text/html") == jp
    zh = "<html><body>这是一个中文网页，包含简体字内容。</body></html>"
    assert sniff_decode(zh.encode("gbk"), "text/html") == zh
    west = "<html><body>café déjà vu — naïve résumé</body></html>"
    assert sniff_decode(west.encode("cp1252"), None) == west
    # declared charset still wins over statistics; valid UTF-8 short-circuits
    assert sniff_decode(jp.encode("utf-8"), "text/html") == jp
    assert (
        sniff_decode(jp.encode("shift_jis"), "text/html; charset=shift_jis")
        == jp
    )


def test_live_redirects_store_under_original_url(spark, tmp_path, server):
    """301/302 parity (r5, verdict item 7): urllib follows silently, like
    the reference's requests — the page is stored under the ORIGINAL url
    (scraper.py:92) with the FINAL status/content; with
    record_redirects=True the hop surfaces as a (url, final_url) edge that
    resolve_redirects consumes."""
    h = _host(0, server)
    _Handler.routes = {
        "/old": (301, f"http://{h}/mid", b""),
        "/mid": (302, f"http://{h}/new", b""),
        "/new": (200, "text/html", b"<html><title>landed</title></html>"),
    }
    live = _job(
        spark, tmp_path, "redir", None, fetcher=HttpFetcher(timeout=5.0)
    )
    live.seed([f"http://{h}/old"])
    live.run(max_rounds=3)
    st = {r["url"]: r for r in live.frontier().collect()}
    row = st[f"http://{h}/old"]  # stored under the ORIGINAL url
    assert row["status"] == "done" and row["status_code"] == 200
    assert row["page_title"] == "landed"
    assert f"http://{h}/new" not in st  # no phantom frontier row

    # opt-in edge surface: (url, final_url) feeds the redirect resolver
    probe = local_df(
        spark,
        [(f"http://{h}/old", h), (f"http://{h}/new", h)],
        "url string, host string",
    )
    fetched = HttpFetcher(timeout=5.0, record_redirects=True).fetch(probe)
    got = {r["url"]: r["final_url"] for r in fetched.collect()}
    assert got[f"http://{h}/old"] == f"http://{h}/new"  # chain collapsed
    assert got[f"http://{h}/new"] is None  # no redirect -> NULL

    from scrape_spark.operators.redirects import resolve_redirects

    edges = fetched.where(F.col("final_url").isNotNull()).select(
        F.col("url").alias("src"), F.col("final_url").alias("dst")
    )
    res = {r["src"]: (r["resolved"], r["terminal"])
           for r in resolve_redirects(edges).collect()}
    assert res[f"http://{h}/old"] == (f"http://{h}/new", True)


def test_fetch_one_never_raises_on_malformed_urls():
    """'Never raises' contract (review r5): malformed IPv6 brackets made
    the pre-guard urlsplit throw, crashing the task instead of producing
    an error row like every other exception path."""
    from scrape_spark.plans.httpfetch import _fetch_one

    for url in ("http://[::1", "http://[bad", "https://exa mple.com/x"):
        html, status, err, final = _fetch_one(
            url, "GET", None, None, "UA", 1.0, None
        )
        assert html == "" and status is None and final is None
        assert err  # str(e), reference semantics


def test_robots_probe_authority_uses_first_scheme(spark, server):
    """review r5: the probe authority must come from the FIRST '://' — an
    archive-style exemplar embedding another absolute URL previously made
    the crawler fetch the WRONG host's robots.txt."""
    from scrape_spark.plans.httpfetch import HttpFetcher, live_robots_source

    _Handler.routes = {
        "/robots.txt": (200, "text/plain", b"User-agent: *\nDisallow: /x")
    }
    h = _host(0, server)
    hosts = local_df(
        spark,
        [("127.0.0.2", f"http://{h}/web/2020/https://evil.example/page")],
        "host string, url string",
    )
    src = live_robots_source(
        HttpFetcher(timeout=3.0), hosts, scheme="http"
    ).collect()
    got = {r["host"]: r["robots_txt"] for r in src}
    # fetched OUR server's robots.txt (authority = 127.0.0.2:<port>),
    # not evil.example's (which would be a transport failure -> dropped)
    assert got == {"127.0.0.2": "User-agent: *\nDisallow: /x"}
