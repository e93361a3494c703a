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
    # (round 3: ngram_jaccard, minhash_dups and embedding_dup_lsh gained
    # exhaustive DuckDB oracles — their verify passes make the output a
    # subset of the exhaustive join, and recall is complete on the
    # deterministic oracle corpus. Still rows-only by nature:
    # simhash_pairs (xxhash64 signatures DuckDB cannot reproduce — the
    # md5-portable twin simhash_hamming_check is the oracle-green proxy),
    # ivf_topk at n_probe<C (approximate by design; ivf_topk_full_probe
    # is the oracle-green mode), and the synthetic-corpus KG queries)
    assert qs - os_ == {
        "simhash_pairs", "ivf_topk",
        "kg_triples", "kg_references", "kg_citations", "kg_jurisdiction",
    }


def test_all_queries_runnable_sf0001(spark):
    """Every query must run at sf0.001 (schema-stable, >= 0 rows)."""
    sf = "/root/testdata/sf0.001"
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf)
        assert df.count() >= 0, name
