"""Dependency resolution, test-set slice, family fanout join."""

from decisions_knowledge_graph_data_spark.operators.dependencies import (
    family_fanout_candidates,
    resolve_dependency,
)
from decisions_knowledge_graph_data_spark.operators.dependencies import (
    test_set_slice as eval_slice,  # aliased: pytest must not collect it
)


def test_resolve_dependency_required(spark):
    rows = spark.createDataFrame(
        [("d1", "fr", 1), ("d2", "nl", 2)], "doc_id string, lang string, x int"
    )
    dep = spark.createDataFrame(
        [("d1", "fr", "payload")], "doc_id string, lang string, result string"
    )
    enriched, missing = resolve_dependency(rows, dep, required=True, alias="prev")
    assert enriched.columns == ["doc_id", "lang", "x", "prev__result"]
    assert enriched.count() == 1
    m = missing.collect()
    assert len(m) == 1 and m[0]["doc_id"] == "d2"
    assert m[0]["reason"] == "Dependency Missing"


def test_resolve_dependency_optional(spark):
    rows = spark.createDataFrame(
        [("d1", "fr", 1), ("d2", "nl", 2)], "doc_id string, lang string, x int"
    )
    dep = spark.createDataFrame(
        [("d1", "fr", "payload")], "doc_id string, lang string, result string"
    )
    enriched, missing = resolve_dependency(rows, dep, required=False)
    assert enriched.count() == 2
    assert missing.count() == 0
    vals = {r["doc_id"]: r["result"] for r in enriched.collect()}
    assert vals["d1"] == "payload" and vals["d2"] is None


def test_test_set_slice(spark):
    docs = spark.createDataFrame(
        [("d1", "fr", "a"), ("d2", "nl", "b"), ("d3", "fr", "c")],
        "doc_id string, lang string, content string",
    )
    ts = spark.createDataFrame([("d1", "fr"), ("d3", "fr")], "doc_id string, lang string")
    got = {r["doc_id"] for r in eval_slice(docs, ts).collect()}
    assert got == {"d1", "d3"}


def test_family_fanout_with_temporal_cutoff(spark):
    mentions = spark.createDataFrame(
        [("d1", "family-00", "2020-06-01")], "doc_id string, family string, doc_date string"
    )
    fam = spark.createDataFrame(
        [("family-00", ["E1", "E2", "E3"])], "family string, entity_ids array<string>"
    )
    reg = spark.createDataFrame(
        [("E1", "t1", "2019-01-01"), ("E2", "t2", "2021-01-01"), ("E3", "t3", "2020-05-31")],
        "entity_id string, title string, valid_from string",
    )
    got = {r["entity_id"] for r in family_fanout_candidates(mentions, fam, reg).collect()}
    assert got == {"E1", "E3"}  # E2 excluded by valid_from < doc_date
