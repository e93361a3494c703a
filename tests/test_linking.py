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


def _mini_frames(spark, registry_rows):
    mentions = spark.createDataFrame(
        [("d1", "py", 1, "RULE", "rule 5 of unified kernel zzzzz charter 777",
          "2020-06-01")],
        "doc_id string, lang string, rule_seq int, mention_kind string, "
        "surface string, doc_date string",
    )
    registry = spark.createDataFrame(
        registry_rows, "entity_id string, title string, valid_from string"
    )
    popular = spark.createDataFrame([], "name_norm string, entity_id string")
    return mentions, registry, popular


def test_similarity_top1_tiebreak_min_id(spark):
    """Exact score/jaccard tie → ascending entity_id wins, matching the
    family-fanout path's min(entity_id) pick (round-1 ADVICE: the old
    array_max-over-struct picked the MAX id on ties)."""
    from decisions_knowledge_graph_data_spark.operators.linking import link_rule_mentions
    title = "unified kernel zzzzz charter 777"
    mentions, registry, popular = _mini_frames(
        spark,
        [("E0020", title, "2001-01-01"), ("E0010", title, "2001-01-01")],
    )
    got = link_rule_mentions(mentions, registry, popular).toPandas()
    assert len(got) == 1
    assert got["entity_id"].iloc[0] == "E0010"
    assert got["score"].iloc[0] == 100


def test_similarity_cutoff_is_strict(spark):
    """valid_from == doc_date must NOT link (`dossier date < decisionDate`,
    mapping/steps.ts:452-454); one day earlier must."""
    from decisions_knowledge_graph_data_spark.operators.linking import link_rule_mentions
    title = "unified kernel zzzzz charter 777"
    mentions, reg_eq, popular = _mini_frames(spark, [("E0010", title, "2020-06-01")])
    assert link_rule_mentions(mentions, reg_eq, popular).count() == 0
    _, reg_lt, _ = _mini_frames(spark, [("E0010", title, "2020-05-31")])
    got = link_rule_mentions(mentions, reg_lt, popular).toPandas()
    assert list(got["entity_id"]) == ["E0010"]


def test_boundary_date_mention_unmatched(corpus20):
    """Corpus doc 7 plants 'rule N of <E0300 title>' with
    E0300.valid_from == doc_date('2022-08-08') — extracted, scored 100 by
    similarity, but excluded by the strict cutoff: no match row."""
    from decisions_knowledge_graph_data_spark.sources.corpus import doc_uid_of
    got, bundle = _linked(corpus20)
    exp = bundle.expected_mentions
    d7 = doc_uid_of(7)
    planted = exp[(exp["doc_id"] == d7) & (exp["surface"].str.contains("charter 300"))]
    assert len(planted) == 1, "boundary fixture must be planted in doc 7"
    assert "E0300" not in set(got["entity_id"])


def test_fanback_size_adaptive(spark, corpus20, monkeypatch):
    """Below FANBACK_BROADCAST_THRESHOLD the name→candidates fan-back is a
    broadcast join; above it (threshold monkeypatched to 1) it joins by
    shuffle — with identical results (round-1 judge: the unbounded
    broadcast breaks at millions of distinct surface forms)."""
    import decisions_knowledge_graph_data_spark.operators.linking as L
    tables, _, _ = corpus20
    mentions = filter_self_references(extract_mentions(tables["documents"]))

    small = L.link_rule_mentions(
        mentions, tables["entity_registry"], tables["popular_entities"]
    )
    base = small.toPandas().sort_values(["doc_id", "rule_seq"]).reset_index(drop=True)

    monkeypatch.setattr(L, "FANBACK_BROADCAST_THRESHOLD", 1)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = L.link_rule_mentions(
            mentions, tables["entity_registry"], tables["popular_entities"]
        )
        plan = big._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        got = big.toPandas().sort_values(["doc_id", "rule_seq"]).reset_index(drop=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    import pandas as pd
    pd.testing.assert_frame_equal(
        base[["doc_id", "rule_seq", "entity_id", "score", "matched_on"]],
        got[["doc_id", "rule_seq", "entity_id", "score", "matched_on"]],
    )


def test_plan_has_broadcast_fast_path(corpus20):
    """The dictionary fast path must be a broadcast join (SURVEY.md §4)."""
    tables, _, _ = corpus20
    mentions = filter_self_references(extract_mentions(tables["documents"]))
    df = link_rule_mentions(
        mentions, tables["entity_registry"], tables["popular_entities"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_date_filter_before_limit_200(spark):
    """Reference order of operations: the date predicate applies inside the
    candidate query BEFORE ``LIMIT 200`` (mapping/steps.ts:452-454 then
    336-338). Plant 210 future-dated exact-title decoys that outrank (by
    entity_id tie-break) one date-eligible exact-title candidate: the
    eligible one sits past position 200 in the similarity ordering, so a
    cap-first implementation drops it (the round-3-fixed deviation) while
    the reference — and this engine — still links it."""
    title = "unified kernel zzzzz charter 777"
    decoys = [(f"E{i:04d}", title, "2030-01-01") for i in range(1, 211)]
    mentions, registry, popular = _mini_frames(
        spark, decoys + [("E9999", title, "2001-01-01")]
    )
    got = link_rule_mentions(mentions, registry, popular).toPandas()
    assert list(got["entity_id"]) == ["E9999"]
    assert got["score"].iloc[0] == 100
    assert got["matched_on"].iloc[0] == "SIMILARITY"


def test_per_vf_prune_keeps_semantics(spark):
    """The per-(name, valid_from) top-200 prune is exact: 300 same-vf
    FUTURE-dated decoys collapse to 200 stored candidates, but since
    ≥200 same-vf candidates outranking another are eligible whenever it
    is, no mention's post-filter top-200 changes — the lone eligible
    candidate still links, and among 300 same-vf ELIGIBLE candidates the
    min-entity-id winner is unchanged."""
    title = "unified kernel zzzzz charter 777"
    # case 1: 300 ineligible same-vf decoys + 1 eligible → eligible wins
    rows = [(f"E{i:04d}", title, "2030-01-01") for i in range(1, 301)]
    mentions, registry, popular = _mini_frames(
        spark, rows + [("E9999", title, "2001-01-01")]
    )
    got = link_rule_mentions(mentions, registry, popular).toPandas()
    assert list(got["entity_id"]) == ["E9999"]
    # case 2: 300 eligible same-vf candidates → min id (inside the kept
    # 200 by the entity_id tie-break) wins
    rows = [(f"E{i:04d}", title, "2001-01-01") for i in range(1, 301)]
    mentions, registry, popular = _mini_frames(spark, rows)
    got = link_rule_mentions(mentions, registry, popular).toPandas()
    assert list(got["entity_id"]) == ["E0001"]


def test_fanback_pairs_gate(spark, corpus20, monkeypatch):
    """Dropping FANBACK_BROADCAST_PAIRS to 1 must force the shuffle
    fan-back (total candidate pairs now bound broadcast bytes, not just
    row count) — with identical results."""
    import pandas as pd
    import decisions_knowledge_graph_data_spark.operators.linking as L
    tables, _, _ = corpus20
    mentions = filter_self_references(extract_mentions(tables["documents"]))
    base = (
        L.link_rule_mentions(mentions, tables["entity_registry"],
                             tables["popular_entities"])
        .toPandas().sort_values(["doc_id", "rule_seq"]).reset_index(drop=True)
    )
    monkeypatch.setattr(L, "FANBACK_BROADCAST_PAIRS", 1)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = L.link_rule_mentions(mentions, tables["entity_registry"],
                                   tables["popular_entities"])
        plan = big._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        got = big.toPandas().sort_values(["doc_id", "rule_seq"]).reset_index(drop=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    pd.testing.assert_frame_equal(
        base[["doc_id", "rule_seq", "entity_id", "score", "matched_on"]],
        got[["doc_id", "rule_seq", "entity_id", "score", "matched_on"]],
    )
