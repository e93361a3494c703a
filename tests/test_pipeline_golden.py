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


def test_stage_state_machine_and_attempts(spark, corpus20, tmp_path):
    """status/attempt/duration per stage (PipelineOrchestrator.ts:19-47):
    a forced re-run increments the attempt counter; completed stages carry
    rows + duration_ms."""
    tables, _, _ = corpus20
    wd = str(tmp_path / "wd_state")
    first = run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=True)
    st1 = first["stage_status"].toPandas().set_index("stage")
    assert (st1["status"] == "completed").all()
    assert (st1["attempt"] == 1).all()
    assert (st1.loc["s0_ingest", "rows"] > 0)
    assert (st1["duration_ms"] >= 0).all()
    # resume run: stages are read, not re-run → attempts unchanged
    second = run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=True)
    st2 = second["stage_status"].toPandas().set_index("stage")
    assert (st2["attempt"] == 1).all()
    # forced re-run (resume=False) → every attempt increments
    third = run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=False)
    st3 = third["stage_status"].toPandas().set_index("stage")
    assert (st3["attempt"] == 2).all()
    # marker row count matches the actual stage table (observe-during-write)
    import json as _json
    with open(os.path.join(stage_path(wd, "s1_mentions"), "_KG_STAGE_COMPLETE.json")) as f:
        marker = _json.load(f)
    assert marker["rows"] == third["s1_mentions"].count()


def test_failures_idempotent_across_reruns(spark, corpus20, tmp_path):
    """Per-stage overwrite failure sinks: re-running a crashed/forced run
    cannot duplicate failure rows (round-1 ADVICE)."""
    from decisions_knowledge_graph_data_spark.plans.checkpoint import read_failures
    tables, _, _ = corpus20
    tampered = tables["documents"].withColumn(
        "content",
        F.when(F.col("repo") == "org/proj-00", F.concat(F.col("content"), F.lit("x")))
        .otherwise(F.col("content")),
    )
    wd = str(tmp_path / "wd_fail")
    run_pipeline(spark, tampered, _dicts(tables), wd, resume=False,
                 strict_invariant=False)
    n1 = read_failures(spark, wd).count()
    assert n1 > 0
    run_pipeline(spark, tampered, _dicts(tables), wd, resume=False,
                 strict_invariant=False)
    n2 = read_failures(spark, wd).count()
    assert n2 == n1


def test_strict_invariant_uncompletes_s0(spark, corpus20, tmp_path):
    """strict mode aborts AND removes the s0 completion marker so resume
    re-runs ingest after the data is fixed."""
    import pytest
    from decisions_knowledge_graph_data_spark.plans.checkpoint import is_complete
    from decisions_knowledge_graph_data_spark.plans.pipeline import InvariantViolation
    tables, _, _ = corpus20
    tampered = tables["documents"].withColumn(
        "content",
        F.when(F.col("repo") == "org/proj-00", F.concat(F.col("content"), F.lit("x")))
        .otherwise(F.col("content")),
    )
    wd = str(tmp_path / "wd_strict")
    with pytest.raises(InvariantViolation):
        run_pipeline(spark, tampered, _dicts(tables), wd, resume=True,
                     strict_invariant=True)
    assert not is_complete(wd, "s0_ingest")
    # the state machine must agree with the removed marker (round-2
    # ADVICE: it previously still said 'completed' until the next attempt)
    import json as _json
    with open(os.path.join(wd, "_state", "s0_ingest.json")) as f:
        assert _json.load(f)["status"] == "failed"
    # fixed data → the same workdir resumes cleanly end-to-end
    out = run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=True)
    assert out["s5_triples"].count() > 0


def test_run_metrics_guarded_when_absent(spark, corpus20, tmp_path):
    """A workdir where every stage resumed but run_metrics was never
    written must not throw (round-1 ADVICE) — empty typed DF instead."""
    import shutil
    tables, _, _ = corpus20
    wd = str(tmp_path / "wd_nm")
    run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=True)
    shutil.rmtree(os.path.join(wd, "run_metrics"))
    out = run_pipeline(spark, tables["documents"], _dicts(tables), wd, resume=True)
    assert out["run_metrics"].count() == 0
    assert out["run_metrics"].columns == ["run_id", "stage", "partition_id", "records"]


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
