"""Product-fuzz parity: JVM-side URL expressions vs the urllib-based kernels.

functions/urls.py documents its contract as "already-wellformed absolute
URLs" on the scheduler path (no userinfo/port — those never survive the
extraction path's normalize). This test enumerates the cartesian product of
canonical URL parts and checks, in ONE Spark job, that

- ``normalize_url_expr``  == htmlparse.normalize_url (urllib semantics),
- ``url_host``            == urlparse(url).netloc,
- ``url_path``            == urlparse(url).path or "/"

for every generated URL. Deterministic by construction (no random seeds), so
a failure is a reproducible counterexample printed by the assert.
"""

from urllib.parse import urlparse

from pyspark.sql import functions as F

from scrape_spark.functions.htmlparse import normalize_url
from scrape_spark.functions.urls import normalize_url_expr, url_host, url_path

SCHEMES = ["http", "https"]
HOSTS = [
    "h.test",
    "sub.h.test",
    "a-b.h0.test",
    "xn--bcher-kva.test",  # punycode label
    "single",
]
PATHS = [
    "",
    "/",
    "/doc",
    "/doc/",
    "/a/b/c.html",
    "/a%20b/c",
    "/a.b/..weird",
    "/trailing.dots...",
    "/@at/in/path",
    "/semi;colon",
]
SUFFIXES = [
    "",
    "?q=1",
    "?q=1&r=two",
    "#frag",
    "?q=1#frag",
]

# URLs java.net.URI rejects outright — urllib parses them, the JVM side must
# yield NULL (try_parse_url), NEVER throw: one hostile href in a crawl batch
# must not kill the stage (Spark 4 ANSI parse_url would).
HOSTILE = [
    "http://h.test?@?##",
    "http://h.test/a b/c",
    "http://[bad/path",
    "http://h.test/%zz",
    "://no-scheme",
]


def _gen_urls() -> list[str]:
    return [
        f"{s}://{h}{p}{x}"
        for s in SCHEMES
        for h in HOSTS
        for p in PATHS
        for x in SUFFIXES
    ]


def test_url_exprs_match_urllib_on_canonical_urls(spark):
    urls = _gen_urls()
    expected = [
        (
            u,
            normalize_url(u),
            urlparse(u).netloc,
            urlparse(u).path or "/",
        )
        for u in urls
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r
        for r in df.select(
            "url",
            normalize_url_expr("url").alias("norm"),
            url_host("url").alias("host"),
            url_path("url").alias("path"),
        ).collect()
    }
    assert len(got) == len(urls)
    for u, exp_norm, exp_host, exp_path in expected:
        r = got[u]
        assert r["norm"] == exp_norm, (u, r["norm"], exp_norm)
        assert r["host"] == exp_host, (u, r["host"], exp_host)
        assert r["path"] == exp_path, (u, r["path"], exp_path)


def test_hostile_urls_yield_null_not_stage_kill(spark):
    df = spark.createDataFrame([(u,) for u in HOSTILE], "url string")
    rows = df.select(
        "url",
        url_host("url").alias("host"),
        url_path("url").alias("path"),
        normalize_url_expr("url").alias("norm"),
    ).collect()  # the assertion that matters: this does not throw
    assert len(rows) == len(HOSTILE)
    for r in rows:
        assert r["host"] is None  # degraded to NULL, row survived
        assert r["path"] == "/"  # url_path's reference default kicks in
