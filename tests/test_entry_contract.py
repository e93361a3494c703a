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
    # (round 4: simhash_pairs switched its query to the md5-portable
    # signature with a full-corpus brute-force oracle — the xxhash64
    # production kernel stays pytest-locked and bench-timed. Still
    # rows-only by nature: ivf_topk at n_probe<C (approximate by design;
    # ivf_topk_full_probe is the oracle-green mode), and the
    # synthetic-corpus KG queries locked by goldens + green SQL twins)
    assert qs - os_ == {
        "ivf_topk",
        "kg_triples", "kg_references", "kg_citations", "kg_jurisdiction",
    }


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
        # text-analysis family (language_id moved to the tail in round 3:
        # a textstats twin with green r1/r2 driver rows)
        "token_counts", "quality_score",
        # streaming family
        "events_windowed",
        # versioned-table (Iceberg-semantics) read path (round 4)
        "versioned_pruned_read",
    }
    assert must_be_visible <= first_50, must_be_visible - first_50


def test_all_queries_runnable_sf0001(spark):
    """Every query must run at sf0.001 (schema-stable, >= 0 rows)."""
    sf = "/root/testdata/sf0.001"
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf)
        assert df.count() >= 0, name
