"""Incremental near-dup against a persisted signature store.

The 100-TB dedup loop: a new batch is deduped against the already-kept
corpus via the corpus's persisted LSH signature store (bands index +
hashed shingle sets), never by reprocessing corpus text. These tests
lock (a) exact equivalence to the batch×store restriction of the
all-pairs `minhash_dup_pairs` semantics, (b) the append loop (kept
batch docs become visible to the next batch), (c) LSH-parameter safety
on append, and (d) the file-pruning property of the candidate-driven
shingle read.
"""

import pytest
from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.operators.dedup import (
    build_signature_store,
    hashed_shingle_sets,
    incremental_dedup,
    minhash_dup_pairs,
    shingled_docs,
)

_T = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep woods near the winding river bank at dawn"
)
_U = (
    "completely unrelated legal text about procurement directives and "
    "annexes governing supply contracts between member state agencies"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def corpus_and_batch(spark):
    # store half (even ids) and batch half (odd ids) with planted
    # cross-half near-dups: 1≈0, 5≈2; 3 and 4 are singletons.
    corpus = _docs(spark, [
        (0, _T + " alpha beta gamma"),
        (2, _U + " first variant tail"),
        (4, "short standalone document about nothing in particular at all"),
    ])
    batch = _docs(spark, [
        (1, _T + " alpha beta delta"),          # near-dup of 0
        (3, "totally novel content that matches no stored document text"),
        (5, _U + " second variant tail"),        # near-dup of 2
    ])
    return corpus, batch


def _exact_cross_pairs(spark, corpus, batch, thr):
    """Oracle-in-Spark: exhaustive cross-half jaccard on string shingles."""
    a = shingled_docs(corpus, "doc_id", "text").select(
        F.col("_k").alias("key_stored"), F.col("_sh").alias("_sa"))
    b = shingled_docs(batch, "doc_id", "text").select(
        F.col("_k").alias("key_new"), F.col("_sh").alias("_sb"))
    jac = F.size(F.array_intersect("_sa", "_sb")) / F.greatest(
        F.size(F.array_union("_sa", "_sb")), F.lit(1))
    rows = (b.crossJoin(a).withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= thr)
            .select("key_new", "key_stored", F.round("jaccard", 6).alias("j"))
            .collect())
    return {(r.key_new, r.key_stored): r.j for r in rows}


def test_incremental_equals_exact_cross_half(spark, tmp_path, corpus_and_batch):
    corpus, batch = corpus_and_batch
    root = str(tmp_path / "store")
    build_signature_store(corpus, "doc_id", "text", root)
    got = {
        (r.key_new, r.key_stored): round(r.jaccard, 6)
        for r in incremental_dedup(
            spark, batch, "doc_id", "text", root, jaccard_threshold=0.4
        ).collect()
    }
    want = _exact_cross_pairs(spark, corpus, batch, 0.4)
    assert got == want
    assert (1, 0) in got and (5, 2) in got  # the planted dups were found
    assert all(k % 2 == 1 and s % 2 == 0 for k, s in got)


def test_incremental_matches_minhash_dup_pairs_restriction(
        spark, tmp_path, corpus_and_batch):
    """batch×store restriction of the all-pairs operator — identical
    banding scheme ⇒ identical candidate recall ⇒ identical output."""
    corpus, batch = corpus_and_batch
    root = str(tmp_path / "store")
    build_signature_store(corpus, "doc_id", "text", root)
    inc = {
        (r.key_new, r.key_stored)
        for r in incremental_dedup(
            spark, batch, "doc_id", "text", root, jaccard_threshold=0.4
        ).collect()
    }
    full = minhash_dup_pairs(
        corpus.unionByName(batch), "doc_id", "text", jaccard_threshold=0.4
    ).collect()
    cross = set()
    for r in full:
        lo, hi = sorted((r.key_a, r.key_b))
        if lo % 2 == 0 and hi % 2 == 1:   # store key even, batch key odd
            cross.add((hi, lo))
    assert inc == cross


def test_append_loop_sees_previous_batch(spark, tmp_path):
    """store=A; batch1's kept (novel) doc is appended; batch2's near-dup
    of that doc is then caught — the incremental loop end-to-end."""
    root = str(tmp_path / "store")
    corpus = _docs(spark, [(0, _T + " zero tail")])
    build_signature_store(corpus, "doc_id", "text", root)

    batch1 = _docs(spark, [(1, _T + " zero tails"),       # dup of 0
                           (3, _U + " novel one tail")])  # novel -> kept
    d1 = incremental_dedup(spark, batch1, "doc_id", "text", root,
                           jaccard_threshold=0.4)
    dup_keys = {r.key_new for r in d1.collect()}
    assert dup_keys == {1}
    kept = batch1.filter(~F.col("doc_id").isin(list(dup_keys)))
    build_signature_store(kept, "doc_id", "text", root, mode="append")

    batch2 = _docs(spark, [(5, _U + " novel one tails")])  # dup of 3
    d2 = incremental_dedup(spark, batch2, "doc_id", "text", root,
                           jaccard_threshold=0.4)
    got = {(r.key_new, r.key_stored) for r in d2.collect()}
    assert got == {(5, 3)}


def test_append_param_mismatch_raises(spark, tmp_path):
    root = str(tmp_path / "store")
    build_signature_store(_docs(spark, [(0, _T)]), "doc_id", "text", root,
                          n_bands=8)
    with pytest.raises(ValueError, match="params mismatch"):
        build_signature_store(_docs(spark, [(2, _U)]), "doc_id", "text",
                              root, n_bands=4, mode="append")


def test_same_key_never_self_pairs(spark, tmp_path):
    root = str(tmp_path / "store")
    build_signature_store(_docs(spark, [(7, _T)]), "doc_id", "text", root)
    out = incremental_dedup(spark, _docs(spark, [(7, _T)]), "doc_id",
                            "text", root, jaccard_threshold=0.4).collect()
    assert out == []


def test_shingle_read_prunes_files(spark, tmp_path):
    """The verify read is candidate-driven: with the shingle table
    range-partitioned on key, a candidate set touching one doc prunes
    the files whose key ranges exclude it (driver-side census — the
    write-once / prune-every-batch contract)."""
    from decisions_knowledge_graph_data_spark.operators.dedup import (
        _sig_store_roots,
    )
    from decisions_knowledge_graph_data_spark.sources.versioned import (
        plan_files_semijoin,
    )

    root = str(tmp_path / "store")
    corpus = _docs(spark, [
        (i, f"{_T} unique tail number {i} with extra words {i}")
        for i in range(0, 64, 2)
    ])
    build_signature_store(corpus, "doc_id", "text", root)
    _, shingles_root = _sig_store_roots(root)
    kept, skipped = plan_files_semijoin(shingles_root, "key", [2])
    # a single-key probe against the range-partitioned multi-file table
    # must keep exactly the one file whose key range holds it and skip
    # the rest (not merely "skip something" — that would pass even if
    # pruning regressed to keeping 7 of 8 files)
    assert len(kept) == 1
    assert skipped >= 4


def test_hashed_jaccard_equals_string_jaccard(spark):
    """Hash-set jaccard == string-set jaccard on real pairs (the
    injectivity premise the store's verify rests on)."""
    docs = _docs(spark, [(0, _T + " a b c"), (1, _T + " a b d")])
    s = shingled_docs(docs, "doc_id", "text")
    h = hashed_shingle_sets(docs, "doc_id", "text")
    def _pairjac(df, col):
        a = df.filter(F.col("_k") == 0).select(F.col(col).alias("_x"))
        b = df.filter(F.col("_k") == 1).select(F.col(col).alias("_y"))
        return a.crossJoin(b).select(
            (F.size(F.array_intersect("_x", "_y")) /
             F.size(F.array_union("_x", "_y"))).alias("j")
        ).collect()[0].j
    assert abs(_pairjac(s, "_sh") - _pairjac(h, "_hs")) < 1e-12
