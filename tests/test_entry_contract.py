"""Driver-contract smoke: entry() runs, queries()/oracle_sql() keys align."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["subj", "pred", "obj"]


def test_oracle_keys_subset_of_queries():
    qs = set(entry_mod.queries())
    os_ = set(entry_mod.oracle_sql())
    assert os_ <= qs
    # the non-oracle set is exactly the documented non-SQL-expressible ops
    # (round 5: kg_references/kg_citations/kg_jurisdiction gained real
    # DuckDB oracles over the materialized corpus parquet, leaving only
    # the principled exemptions: ivf_topk at n_probe<C — approximate by
    # design, ivf_topk_full_probe is the oracle-green mode — and
    # kg_triples, whose LSH-linking + connected-components core is
    # genuinely non-SQL and stays locked by goldens + a green SQL twin)
    assert qs - os_ == {"ivf_topk", "kg_triples"}


def test_driver_window_composition():
    """The external driver records only the FIRST 50 queries() entries.
    Lock the curation invariant: every operator family's representatives
    — the flagship KG set with its green twins and the full dedup/ANN
    family — must sit inside that window, so a future reorder cannot
    silently push a family off the driver board."""
    qs = list(entry_mod.queries())
    first_50 = set(qs[:50])
    must_be_visible = {
        # flagship KG + green twins
        "kg_star_triples", "kg_triples", "kg_references", "kg_citations",
        "kg_jurisdiction", "reference_extract", "citation_snippets",
        "jurisdiction_counts", "md_blocks",
        # dedup / similarity family
        "simhash_hamming_check", "minhash_dups", "simhash_pairs",
        "ngram_jaccard", "embedding_dup_lsh", "ivf_topk",
        "ivf_topk_full_probe", "embedding_topk", "exact_dedup",
        # iterative-graph + temporal-join families (round-3 ops)
        "graph_pagerank", "asof_join", "range_join",
        # text-analysis family (language_id moved to the tail in round 3,
        # quality_score in round 5 — textstats twins with green prior
        # driver rows; regex_scan/token_counts stay visible)
        "token_counts", "regex_scan",
        # streaming family (stream_events_versioned new in round 5)
        "events_windowed", "stream_events_versioned",
        # versioned-table (Iceberg-semantics) read paths (rounds 4-5)
        "versioned_pruned_read", "versioned_month_read",
    }
    assert must_be_visible <= first_50, must_be_visible - first_50


def test_all_queries_runnable_sf0001(spark):
    """Every query must run at sf0.001 (schema-stable, >= 0 rows)."""
    sf = "/root/testdata/sf0.001"
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf)
        assert df.count() >= 0, name
