"""S10 CLI surface — reference scraper.py:210-267 argument parity.

--url seeds one (url, method, payload) row; --reset re-pends all records
before running; before/after counts print; the drive loop drains the store.
"""

import os

from scrape_spark import cli
from scrape_spark.sources.webgraph import generate_pages, robots_txt_fixture


def _fixture(spark, tmp_path):
    pages = str(tmp_path / "pages")
    robots = str(tmp_path / "robots")
    if not os.path.exists(pages):
        generate_pages(spark, 2, 8, 3, mega_host=None).write.parquet(pages)
        spark.createDataFrame(
            robots_txt_fixture(2, None), "host string, robots_txt string"
        ).write.parquet(robots)
    return pages, robots


def _run(spark, tmp_path, *extra, capsys=None):
    pages, robots = _fixture(spark, tmp_path)
    rc = cli.main(
        [
            "--store", str(tmp_path / "store"),
            "--pages", pages,
            "--robots", robots,
            *extra,
        ],
        spark=spark,
    )
    assert rc == 0
    return capsys.readouterr().out if capsys else None


def test_cli_url_seeds_and_drains(spark, tmp_path, capsys):
    out = _run(spark, tmp_path, "--url", "http://host0.test/p/0", capsys=capsys)
    assert "Starting scraper with User-Agent: MyScraperBot" in out
    assert "unprocessed: 0, processed: 8" in out.splitlines()[-1]


def test_cli_reset_reprocesses(spark, tmp_path, capsys):
    _run(spark, tmp_path, "--url", "http://host0.test/p/0", capsys=capsys)
    out = _run(spark, tmp_path, "--reset", capsys=capsys)
    assert "processed this run: 8" in out
    assert out.splitlines()[-1].endswith("unprocessed: 0, processed: 8")


def test_cli_post_url_seed(spark, tmp_path, capsys):
    out = _run(
        spark, tmp_path,
        "--url", "http://host0.test/api",
        "--method", "POST",
        "--payload", '{"q": 1}',
        capsys=capsys,
    )
    # no POST page exists in the all-GET fixture → fetch-error row, processed
    assert "processed this run: 1" in out


def test_cli_referrer_stamped_on_fresh_store(spark, tmp_path, capsys):
    """--referrer reaches the seeded row on a FRESH store (reference
    scraper.py:249-257 stamps the referrer on the CLI row)."""
    _run(
        spark, tmp_path,
        "--url", "http://host0.test/p/0",
        "--referrer", "http://elsewhere.test/src",
        capsys=capsys,
    )
    from scrape_spark.plans.statestore import SnapshotStore

    frontier = SnapshotStore(spark, str(tmp_path / "store")).read_chain("frontier")
    seeded = frontier.where(frontier.url == "http://host0.test/p/0").collect()
    assert seeded and seeded[0]["referrer"] == "http://elsewhere.test/src"


def test_cli_second_url_appends_to_existing_store(spark, tmp_path, capsys):
    _run(spark, tmp_path, "--url", "http://host0.test/p/0", capsys=capsys)
    out = _run(spark, tmp_path, "--url", "http://host1.test/p/0", capsys=capsys)
    # host1's robots block the /p/0/1 subtree (webgraph fixture): root + the
    # blocked node + 2 open children + 1 grandchild = 5 rows processed
    assert "processed this run: 5" in out
    out = _run(spark, tmp_path, "--url", "http://host1.test/p/0", capsys=capsys)
    assert "processed this run: 0" in out  # idempotent: already seen


def test_cli_runs_without_robots(spark, tmp_path, capsys):
    """--robots is optional: omitting it must not crash (empty robots source
    => no host is robots-denied) and the crawl still drains."""
    pages, _ = _fixture(spark, tmp_path)
    rc = cli.main(
        [
            "--store", str(tmp_path / "store_nr"),
            "--pages", pages,
            "--url", "http://host0.test/p/0",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "processed this run:" in out
    assert out.splitlines()[-1].startswith("unprocessed: 0")


def test_cli_seed_crash_between_frontier_and_seen_is_repaired(
    spark, tmp_path, capsys, monkeypatch
):
    """The existing-store --url append is a two-step commit (frontier
    'cli_seed' delta, then seen ref). A crash between the steps must be
    repaired on the next run — the URL re-enters the seen set via the
    stamped src_snap ref instead of being appended a second time."""
    import pytest

    from scrape_spark.operators.seen import SeenSet
    from scrape_spark.plans.statestore import SnapshotStore

    _run(spark, tmp_path, "--url", "http://host0.test/p/0", capsys=capsys)

    def boom(self, *a, **k):
        raise RuntimeError("simulated crash before seen registration")

    monkeypatch.setattr(SeenSet, "add_ref", boom)
    with pytest.raises(RuntimeError):
        _run(spark, tmp_path, "--url", "http://host1.test/p/0", capsys=capsys)
    monkeypatch.undo()

    # resume: repair registers the crashed row; no duplicate append, and the
    # pending row is crawled (host1 subtree = 5 rows, one robots-blocked)
    out = _run(spark, tmp_path, "--url", "http://host1.test/p/0", capsys=capsys)
    assert "processed this run: 5" in out
    chain = SnapshotStore(spark, str(tmp_path / "store")).read_chain("frontier")
    appended = chain.where(
        (chain.url == "http://host1.test/p/0") & (chain.status == "pending")
    )
    assert appended.count() == 1  # exactly one pending append, ever
    out = _run(spark, tmp_path, "--url", "http://host1.test/p/0", capsys=capsys)
    assert "processed this run: 0" in out  # idempotent: url is seen
