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
    # round 5: EVERY flagship query now has a real DuckDB oracle over
    # the materialized corpus parquet — including kg_triples, whose
    # full pipeline (regex extraction, three-path linking, temporal
    # cutoffs, recursive-CTE connected components) is re-derived in
    # SQL. The single remaining rows-only entry is the principled
    # exemption: ivf_topk at n_probe<C is approximate BY DESIGN
    # (ivf_topk_full_probe is its oracle-green exact mode).
    assert qs - os_ == {"ivf_topk"}


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
        # dedup / similarity family (simhash_hamming_check moved to the
        # tail in the round-5 curation swap — simhash stays visible via
        # simhash_pairs; span_dedup is the new global-dedup representative)
        "minhash_dups", "simhash_pairs",
        "ngram_jaccard", "embedding_dup_lsh", "ivf_topk",
        "ivf_topk_full_probe", "embedding_topk", "exact_dedup",
        "span_dedup",
        # round-5 tenth pass: the incremental signature-store dedup loop
        # (displacing block_numbering; window/sequencing family stays
        # visible via seq_ids + range_window)
        "incremental_dedup",
        # iterative-graph + temporal-join families (round-3 ops)
        "graph_pagerank", "asof_join", "range_join",
        # text-analysis / curation family (language_id moved to the tail
        # in round 3, quality_score + token_counts in the round-5 swap,
        # repetition_stats in the round-5 k-hop swap — textstats twins
        # with green prior driver rows; regex_scan stays visible)
        "regex_scan",
        # bounded k-hop BFS — the KG neighborhood primitive (round-5
        # ninth pass; recursive-CTE oracle) — and merge-on-read deletes
        # (Iceberg v2 position-delete analog, displacing percentiles
        # whose distribution-agg family stays visible via
        # pricing_summary/teaching_pivot)
        "khop_reachability", "versioned_mor_read",
        # streaming family (stream_events_versioned new in round 5)
        "events_windowed", "stream_events_versioned",
        # versioned-table (Iceberg-semantics) read + row-op paths (r4-5;
        # versioned_mv_read = incremental MV maintenance joined in the
        # round-5 seventh pass, displacing top_orders whose corpus
        # equi-join family stays visible via dimension_lookup +
        # asof_join/range_join)
        # round-5 eighth pass: WAP + the versioned-appends streaming
        # source join the window (displacing exclusion_filter and
        # top1_per_group, whose families stay visible via
        # unmapped_discovery and range_window/block_numbering/seq_ids)
        "versioned_pruned_read", "versioned_month_read",
        "versioned_merge_read", "versioned_mv_read",
        "versioned_wap_read", "stream_versioned_source",
        # training-data assembly family (round-5 second pass; the
        # displaced twins sessionize/anti_join stay covered by
        # range_window/running_window and unmapped_discovery)
        "train_split", "doc_chunks",
        # modern extension / streaming surfaces (round-5 sixth pass:
        # Python DataSource API, Python UDTF, VARIANT, built-in
        # watermark dedup; displaced twins translate_cache/coerce_cast/
        # rollup_agg/set_ops stay covered by dimension_lookup,
        # keyword_validation + sha_invariant, pricing_summary +
        # teaching_pivot + percentiles, and nway_intersection)
        "python_datasource", "udtf_chunks", "variant_extract",
        "stream_dedup_watermark",
    }
    assert must_be_visible <= first_50, must_be_visible - first_50


def test_all_queries_runnable_sf0001(spark):
    """Every query must run at sf0.001 (schema-stable, >= 0 rows)."""
    sf = "/root/testdata/sf0.001"
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf)
        assert df.count() >= 0, name


def test_similarity_surfaces_are_ascii():
    """The kg_triples oracle's levenshtein is DuckDB's BYTE-based
    implementation; Spark's is character-based. They agree exactly on
    ASCII, so the oracle is sound only while every string that reaches
    the similarity scorer — registry titles and RULE surface titles —
    is ASCII. The generator guarantees that today; this test makes a
    future generator change fail HERE, next to the documented caveat in
    __spark_entry__._kg_corpus_oracles, instead of as an opaque
    hash-mismatch on the driver board."""
    from decisions_knowledge_graph_data_spark.sources.corpus import (
        gen_corpus, gen_registry,
    )
    reg = gen_registry()
    assert all(t.isascii() for t in reg.titles.values())
    bundle = gen_corpus(40, reg)
    rules = bundle.expected_mentions.query("mention_kind == 'RULE'")
    assert all(s.isascii() for s in rules["surface"])
