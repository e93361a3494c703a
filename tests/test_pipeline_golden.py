"""End-to-end golden test: full pipeline → triple P/R ≥ 0.95 (BASELINE.json:2).

Also exercises checkpoint/resume: a second run with the same workdir must
reuse completed stages and produce the identical triple set; a partial
extraction checkpoint must resume via left_anti and converge to the same
result (north rule: "resumable from checkpoint").
"""

import os

from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.plans.pipeline import run_pipeline
from decisions_knowledge_graph_data_spark.plans.checkpoint import stage_path


def _dicts(tables):
    return {
        "entity_registry": tables["entity_registry"],
        "popular_entities": tables["popular_entities"],
        "alias_map": tables["alias_map"],
        "known_missing": tables["known_missing"],
        "family_map": tables["family_map"],
    }


def _pr(got: set, exp: set):
    tp = len(got & exp)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(exp) if exp else 0.0
    return precision, recall


def test_pipeline_triples_pr(spark, corpus20, tmp_path):
    tables, bundle, _ = corpus20
    out = run_pipeline(
        spark, tables["documents"], _dicts(tables), str(tmp_path / "wd"), resume=False
    )
    got = {(r["subj"], r["pred"], r["obj"]) for r in out["s5_triples"].collect()}
    exp = {(r.subj, r.pred, r.obj) for r in bundle.expected_triples.itertuples()}
    precision, recall = _pr(got, exp)
    assert precision >= 0.95, (precision, sorted(got - exp)[:10])
    assert recall >= 0.95, (recall, sorted(exp - got)[:10])
    # metrics rows exist per stage
    m = out["run_metrics"].toPandas()
    assert {"s0_ingest", "s1_mentions", "s5_triples"} <= set(m["stage"])
    assert (m["records"] >= 0).all()
    # nodes/edges materialized with type/pred partitioning
    assert out["s6_nodes"].count() > 0
    assert set(out["s6_edges"].select("pred").distinct().toPandas()["pred"]) == {
        "cites", "decided_by", "party_of", "applies_provision"
    }


def test_pipeline_resume_reuses_checkpoints(spark, corpus20, tmp_path):
    tables, bundle, _ = corpus20
    wd = str(tmp_path / "wd2")
    first = run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=True)
    t1 = {(r["subj"], r["pred"], r["obj"]) for r in first["s5_triples"].collect()}
    # second run: all stages complete → read-only resume, identical output
    second = run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=True)
    t2 = {(r["subj"], r["pred"], r["obj"]) for r in second["s5_triples"].collect()}
    assert t1 == t2


def test_row_level_resume_left_anti(spark, corpus20, tmp_path):
    """Simulate an interrupted s1: checkpoint only half the docs' mentions,
    then resume — only missing keys are recomputed, result identical."""
    tables, bundle, _ = corpus20
    wd = str(tmp_path / "wd3")
    full = run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=False)
    mentions_full = full["s1_mentions"]
    half_ids = [
        r["doc_id"]
        for r in mentions_full.select("doc_id").distinct().limit(10).collect()
    ]
    wd4 = str(tmp_path / "wd4")
    os.makedirs(wd4, exist_ok=True)
    mentions_full.filter(F.col("doc_id").isin(half_ids)).write.parquet(
        stage_path(wd4, "s1_mentions_partial")
    )
    resumed = run_pipeline(spark, tables["documents"], _dicts(tables), wd4, resume=True)
    a = {tuple(r) for r in mentions_full.select(
        "doc_id", "mention_kind", "surface", "char_start").collect()}
    b = {tuple(r) for r in resumed["s1_mentions"].select(
        "doc_id", "mention_kind", "surface", "char_start").collect()}
    assert a == b


def test_invariant_violation_detected(spark, corpus20, tmp_path):
    tables, _, _ = corpus20
    import pytest
    from decisions_knowledge_graph_data_spark.plans.pipeline import (
        InvariantViolation, ingest,
    )
    tampered = tables["documents"].withColumn(
        "content",
        F.when(F.col("repo") == "org/proj-00", F.concat(F.col("content"), F.lit("x")))
        .otherwise(F.col("content")),
    )
    with pytest.raises(InvariantViolation):
        ingest(tampered, strict=True)
    ok, failures = ingest(tampered, strict=False)
    assert failures.count() > 0
