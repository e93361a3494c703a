"""Entity linking vs planted match goldens (FIXTURES.md §5)."""

from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.operators.extract import (
    extract_mentions,
    filter_self_references,
)
from decisions_knowledge_graph_data_spark.operators.linking import (
    link_rule_mentions,
    similarity_join,
)


def _linked(corpus20):
    tables, bundle, reg = corpus20
    mentions = filter_self_references(extract_mentions(tables["documents"]))
    return (
        link_rule_mentions(
            mentions, tables["entity_registry"], tables["popular_entities"]
        ).toPandas(),
        bundle,
    )


def test_link_rule_mentions_against_goldens(corpus20):
    got, bundle = _linked(corpus20)
    exp = bundle.expected_matches
    exp_rules = exp[exp["mention_uid"].str.contains(":RULE:")].copy()
    exp_rules["doc_id"] = exp_rules["mention_uid"].str.split(":").str[0]
    exp_rules["rule_seq"] = exp_rules["mention_uid"].str.split(":").str[2].astype(int)

    got_k = {(r.doc_id, r.rule_seq): (r.entity_id, r.matched_on, r.score)
             for r in got.itertuples()}
    assert len(got) >= len(exp_rules), f"{len(got)} < {len(exp_rules)}"
    missing, wrong = [], []
    for r in exp_rules.itertuples():
        k = (r.doc_id, r.rule_seq)
        if k not in got_k:
            missing.append(k)
            continue
        eid, mo, score = got_k[k]
        if eid != r.entity_id or mo != r.matched_on:
            wrong.append((k, (eid, mo), (r.entity_id, r.matched_on)))
        if r.matched_on in ("DICT", "EXACT_ID"):
            assert score == 100
        else:
            assert score >= 80
    assert not missing, f"missing matches: {missing}"
    assert not wrong, f"wrong matches: {wrong}"


def test_temporal_cutoff_excludes_future_entities(spark, corpus20):
    """A candidate with valid_from after doc_date must not be matched
    (mapping/steps.ts:452-454)."""
    got, _ = _linked(corpus20)
    tables, _, reg = corpus20
    future = set(
        reg.entity_registry[reg.entity_registry["valid_from"] == "2030-01-01"]["entity_id"]
    )
    sim = got[got["matched_on"] == "SIMILARITY"]
    assert set(sim["entity_id"]).isdisjoint(future)


import pytest


@pytest.mark.parametrize("strategy", ["broadcast", "lsh"])
def test_similarity_join_generic(spark, strategy):
    probes = spark.createDataFrame(
        [("p1", "stable runtime charter 001"), ("p2", "zzzz qqqq xxxx")],
        "pk string, pt string",
    )
    cands = spark.createDataFrame(
        [("c1", "stable runtime charter 001"), ("c2", "stable runtme charter 001"),
         ("c3", "completely different words")],
        "ck string, ct string",
    )
    got = similarity_join(probes, cands, "pk", "pt", "ck", "ct",
                          strategy=strategy).toPandas()
    p1 = got[got["pk"] == "p1"].sort_values("jaccard", ascending=False)
    assert list(p1["ck"])[0] == "c1"
    assert p1[p1["ck"] == "c1"]["score"].iloc[0] == 100
    assert "c2" in set(p1["ck"])  # 1-edit variant blocked into same bucket
    assert "p2" not in set(got[got["ck"] == "c3"]["pk"])


def test_plan_has_broadcast_fast_path(corpus20):
    """The dictionary fast path must be a broadcast join (SURVEY.md §4)."""
    tables, _, _ = corpus20
    mentions = filter_self_references(extract_mentions(tables["documents"]))
    df = link_rule_mentions(
        mentions, tables["entity_registry"], tables["popular_entities"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
