"""Block transform, snippet extraction, schema validation routing."""

import pytest
from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.operators.blocks import (
    block_transform,
    snippet_extract,
)
from decisions_knowledge_graph_data_spark.operators.validate import (
    enum_check,
    pattern_check,
    range_check,
    required_check,
    salvage_json,
    validate_columns,
    validate_json_kernel,
)


def test_block_transform(spark):
    d = spark.createDataFrame(
        [("d1", "first block. second block.   . third block.")],
        "doc_id string, content string",
    )
    got = block_transform(d).toPandas().sort_values("block_num")
    # empty segment (the lone '. ') must be skipped; numbering keeps doc order
    assert list(got["plain_text"]) == ["first block", "second block", "third block."]
    assert list(got["block_id"])[0] == "d1:block-001"
    assert (got["char_count"] == got["plain_text"].str.len()).all()


def test_snippet_extract(spark):
    d = spark.createDataFrame(
        [("d1", "aaaa bbbb target cccc dddd"), ("d2", "no hits here")],
        "doc_id string, content string",
    )
    got = snippet_extract(d, r"target", context=5).toPandas()
    assert len(got) == 1
    assert got["snippet"].iloc[0] == "bbbb target cccc"


def test_validate_columns_routing(spark):
    df = spark.createDataFrame(
        [("a", "HIGH", 0.5, "PARTY-x-001"),
         ("b", "WRONG", 0.5, "PARTY-x-001"),
         ("c", "LOW", 1.5, "nope"),
         (None, "LOW", 0.2, "PARTY-y-002")],
        "id string, conf string, score double, party_id string",
    )
    ok, bad = validate_columns(df, [
        required_check(F.col("id"), "id"),
        enum_check(F.col("conf"), ["HIGH", "MEDIUM", "LOW"], "conf"),
        range_check(F.col("score"), 0, 1, "score"),
        pattern_check(F.col("party_id"), r"^PARTY-[a-zA-Z0-9:.]+-\d{3}$", "party_id"),
    ])
    assert {r["id"] for r in ok.collect()} == {"a"}
    bad_rows = {r["id"]: r["error"] for r in bad.collect()}
    assert "conf: must be one of" in bad_rows["b"]
    assert "score" in bad_rows["c"] and "party_id" in bad_rows["c"]
    assert any("required" in e for e in bad_rows.values())
    assert all(r["reason"] == "Schema Validation" for r in bad.collect())


def test_salvage_json():
    assert salvage_json('{"a": 1}') == {"a": 1}
    assert salvage_json('noise ```json\n{"a": 2}\n``` more') == {"a": 2}
    assert salvage_json('prefix {"a": 3} suffix') == {"a": 3}
    assert salvage_json("not json at all") is None
    assert salvage_json(None) is None
    assert salvage_json("x" * 200_000) is None  # 100KB guard


def test_validate_json_kernel(spark):
    schema = {
        "type": "object",
        "required": ["name", "seq"],
        "properties": {
            "name": {"type": "string", "minLength": 2},
            "seq": {"type": "integer", "minimum": 1},
            "conf": {"anyOf": [{"type": "number"}, {"type": "null"}]},
            "tags": {"type": "array", "items": {"enum": ["x", "y"]}},
        },
    }
    df = spark.createDataFrame(
        [("k1", '{"name": "ok", "seq": 3, "tags": ["x"]}'),
         ("k2", '{"name": "ok"}'),
         ("k3", '```json {"name": "a", "seq": 0} ```'),
         ("k4", "garbage")],
        "key string, payload string",
    )
    got = {r["key"]: (r["valid"], r["error"])
           for r in validate_json_kernel(df, "payload", schema, ["key"]).collect()}
    assert got["k1"] == (True, None)
    assert not got["k2"][0] and "seq: required" in got["k2"][1]
    assert not got["k3"][0]  # salvaged from fence but fails minLength+minimum
    assert "minLength" in got["k3"][1] and "minimum" in got["k3"][1]
    assert not got["k4"][0] and "unparseable" in got["k4"][1]
