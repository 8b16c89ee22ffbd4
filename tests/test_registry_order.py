"""The driver's correctness gate samples the FIRST 50 registered queries —
pin that the curated prefix (one+ query per operator family) stays first
and that the reorder is a pure permutation (no query gained/lost/renamed).
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_driver_sample_is_the_registry_prefix():
    names = list(entry.queries())
    assert len(entry._DRIVER_SAMPLE) == 50
    assert names[: len(entry._DRIVER_SAMPLE)] == entry._DRIVER_SAMPLE
    assert len(set(names)) == len(names)


def test_driver_sample_covers_every_family():
    """Family → representative members; at least one of each must sit in
    the driver's 50-query window."""
    head = set(list(entry.queries())[:50])
    families = {
        "crawl": {"crawl_order_seq", "crawl_expand_round"},
        "robots/politeness": {"robots_gate", "politeness_slots"},
        "dedup": {"minhash_neardup_pairs", "simhash_neardup_pairs"},
        "dedup-graph": {"neardup_components"},
        "semantic-dedup": {"semantic_dedup_retain"},
        "line-dedup": {"line_dedup"},
        "winnowing": {"winnow_dup_candidates", "winnow_novelty"},
        "ann": {"ann_cosine_topk", "ivf_ann_topk", "pq_ann_topk"},
        "multimodal": {"multimodal_features", "media_neardup_pairs"},
        "quality": {"doc_quality", "gopher_quality_rules"},
        "language": {"lang_id_eval", "lang_temperature_plan"},
        "lm-quality": {"lm_ppl_buckets", "dsir_weights"},
        "tokenizer": {"bpe_pair_counts", "pack_sequences"},
        "contamination/pii": {"contamination_ngram", "pii_redact"},
        "sketches": {"kmv_crawl_overlap", "hyperball_neighborhood"},
        "webgraph": {"link_pagerank", "link_hits", "spam_mass"},
        "search": {"bm25_topk", "term_postings"},
        "bitext": {"hreflang_pairs", "bitext_margin_pairs"},
        "budgets": {"host_budget_alloc"},
        "recrawl": {"recrawl_priority", "change_estimate"},
        "sampling": {"weighted_sample_aes", "stratified_sample"},
        "sources": {"warc_latest_capture", "sitemap_entries"},
        "events": {"events_hourly"},
    }
    missing = {fam for fam, members in families.items() if not members & head}
    assert not missing, f"families absent from the driver window: {missing}"


def test_every_driver_sample_query_has_an_oracle():
    oracles = entry.oracle_sql()
    no_oracle = [n for n in entry._DRIVER_SAMPLE if n not in oracles]
    assert not no_oracle, no_oracle
