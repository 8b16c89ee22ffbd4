"""scrape_spark — a PySpark-native distributed URL-frontier + fetch-scheduler engine.

A brand-new implementation (NOT a port) with the query/data-processing
capabilities of the reference crawler (NITOH-Hisashi/Scrape): a partitioned
URL-seen set (bloom prefilter + exact anti-join) replaces its per-row MySQL
duplicate check (reference models.py:207-216), a per-host politeness scheduler
replaces its global ``time.sleep`` loop (reference scraper.py:28-36), and
recursive link extraction becomes an iterative frontier-expansion DataFrame job
with vectorized pandas/Arrow UDFs for HTML parsing (reference
link_extractor.py:14-39).

Layout
------
- ``functions``  : pure kernels (HTML parse, URL canonicalization) + pandas UDFs
                   + text-analysis expression builders
- ``operators``  : seen-set anti-join, robots predicate, politeness scheduler,
                   frontier round plan, dedup / similarity operators
- ``plans``      : driver-side crawl iteration, snapshot state store, metrics
- ``sources``    : deterministic synthetic web-graph generator (fixtures)
- ``oracle``     : in-memory sequential re-statement of the reference crawler
                   semantics, used as the equivalence oracle in tests
"""

__version__ = "0.1.0"
