"""t2-tier golden test: 200-doc corpus through the full pipeline
(FIXTURES.md §7 — the correctness tier above the 20-doc smoke)."""

import pytest

from decisions_knowledge_graph_data_spark.operators.extract import (
    extract_mentions,
    filter_self_references,
)
from decisions_knowledge_graph_data_spark.operators.linking import link_rule_mentions
from decisions_knowledge_graph_data_spark.sources.corpus import (
    corpus_tables,
    gen_registry,
    gen_test_set,
)
from decisions_knowledge_graph_data_spark.operators.dependencies import (
    test_set_slice as eval_slice,
)
from decisions_knowledge_graph_data_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def corpus200(spark):
    tables, bundle, reg = corpus_tables(spark, 200, gen_registry())
    return tables, bundle, reg


def _dicts(tables):
    return {k: tables[k] for k in
            ("entity_registry", "popular_entities", "alias_map", "known_missing",
             "family_map")}


def test_t2_pipeline_pr(spark, corpus200, tmp_path):
    tables, bundle, _ = corpus200
    out = run_pipeline(
        spark, tables["documents"], _dicts(tables), str(tmp_path / "wd"), resume=False
    )
    got = {(r["subj"], r["pred"], r["obj"]) for r in out["s5_triples"].collect()}
    exp = {(r.subj, r.pred, r.obj) for r in bundle.expected_triples.itertuples()}
    tp = len(got & exp)
    precision = tp / len(got)
    recall = tp / len(exp)
    assert precision >= 0.95, (precision, sorted(got - exp)[:5])
    assert recall >= 0.95, (recall, sorted(exp - got)[:5])


def test_t2_match_paths_all_exercised(spark, corpus200):
    tables, bundle, _ = corpus200
    mentions = filter_self_references(extract_mentions(tables["documents"]))
    got = link_rule_mentions(
        mentions, tables["entity_registry"], tables["popular_entities"]
    ).toPandas()
    # at 200 docs every linking path must fire
    assert set(got["matched_on"]) == {"DICT", "EXACT_ID", "SIMILARITY"}
    exp = bundle.expected_matches
    exp_rules = exp[exp["mention_uid"].str.contains(":RULE:")].copy()
    exp_rules["doc_id"] = exp_rules["mention_uid"].str.split(":").str[0]
    exp_rules["rule_seq"] = exp_rules["mention_uid"].str.split(":").str[2].astype(int)
    got_k = {(r.doc_id, r.rule_seq): r.entity_id for r in got.itertuples()}
    wrong = [
        (r.doc_id, r.rule_seq, got_k.get((r.doc_id, r.rule_seq)), r.entity_id)
        for r in exp_rules.itertuples()
        if got_k.get((r.doc_id, r.rule_seq)) != r.entity_id
    ]
    assert not wrong, wrong[:5]


def test_stratified_test_set_slice(spark, corpus200):
    tables, bundle, _ = corpus200
    ts = gen_test_set(bundle)
    assert len(ts) > 0
    # stratified: no (lang, length_category) over-represented
    assert ts.groupby(["lang", "length_category"]).size().max() <= 2
    ts_df = spark.createDataFrame(ts[["doc_id", "lang"]])
    from decisions_knowledge_graph_data_spark.plans.pipeline import ingest
    docs, _ = ingest(tables["documents"])
    sliced = eval_slice(docs, ts_df)
    assert sliced.count() == len(ts)
