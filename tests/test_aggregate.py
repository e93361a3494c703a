"""Merged-full-data aggregation (aggregate.ts analog)."""

from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.operators.canonicalize import (
    apply_canonical,
    canonical_map,
)
from decisions_knowledge_graph_data_spark.operators.extract import (
    extract_mentions,
    filter_self_references,
)
from decisions_knowledge_graph_data_spark.operators.linking import link_rule_mentions
from decisions_knowledge_graph_data_spark.operators.references import extract_references
from decisions_knowledge_graph_data_spark.operators.triples import (
    applies_provision_triples,
    cites_triples,
    decided_by_triples,
    party_of_triples,
)
from decisions_knowledge_graph_data_spark.plans.aggregate import merged_documents
from decisions_knowledge_graph_data_spark.plans.pipeline import ingest


def test_reference_validation_matches_goldens(spark, corpus20):
    """The verified/extracted split must agree with the fixture's
    ref_valid flags PER REFERENCE — round 3 found celex_verified had
    been empty forever (the year check read the sector digit, chars
    7-10 = '3YYY' ≥ 3000) because nothing compared validation output
    to the goldens; this test closes that hole for all three families."""
    tables, bundle, _ = corpus20
    refs = extract_references(tables["documents"]).toPandas()
    by_doc = refs.set_index("doc_id")
    em = bundle.expected_mentions
    planted = em[em["mention_kind"] == "REF"]
    assert len(planted) > 0 and planted["ref_valid"].notna().all()
    n_checked = {"celex": 0, "numac": 0, "url": 0}
    for r in planted.itertuples():
        row = by_doc.loc[r.doc_id]
        if r.surface.startswith("CELEX:"):
            assert r.surface in list(row["celex_extracted"]), r.surface
            assert (r.surface in list(row["celex_verified"])) == bool(r.ref_valid), r.surface
            n_checked["celex"] += 1
        elif r.surface.startswith("https://"):
            assert r.surface in list(row["urls"]), r.surface
            n_checked["url"] += 1
        else:  # 10-digit NUMAC
            assert r.surface in list(row["numac_extracted"]), r.surface
            assert (r.surface in list(row["numac_verified"])) == bool(r.ref_valid), r.surface
            n_checked["numac"] += 1
    # the fixture must exercise valid AND invalid variants of each family
    assert all(v > 0 for v in n_checked.values()), n_checked
    assert (~planted["ref_valid"].astype(bool)).sum() > 0
    assert planted["ref_valid"].astype(bool).sum() > 0


def test_merged_documents(spark, corpus20):
    tables, bundle, _ = corpus20
    docs, _ = ingest(tables["documents"])
    mentions = filter_self_references(extract_mentions(tables["documents"]))
    refs = extract_references(tables["documents"])
    matches = link_rule_mentions(
        mentions, tables["entity_registry"], tables["popular_entities"]
    )
    canon = canonical_map(tables["entity_registry"])
    triples = (
        cites_triples(mentions, tables["documents"])
        .unionByName(decided_by_triples(mentions, tables["alias_map"], tables["known_missing"]))
        .unionByName(party_of_triples(mentions))
        .unionByName(applies_provision_triples(apply_canonical(matches, canon)))
    )
    merged = merged_documents(docs, mentions, refs, matches, triples)
    pdf = merged.toPandas()
    assert len(pdf) == docs.count()  # exactly one nested row per document
    # mention counts agree with the flat table
    flat = mentions.groupBy("doc_id").count().toPandas().set_index("doc_id")["count"]
    for r in pdf.itertuples():
        assert r.n_mentions == int(flat.get(r.doc_id, 0))
    # nested mentions ordered by mention_seq
    for ms in pdf["mentions"]:
        if ms is not None and len(ms):
            seqs = [m["mention_seq"] for m in ms]
            assert seqs == sorted(seqs)
    # triples attributed to their subject doc
    some = pdf[pdf["n_triples"] > 0].iloc[0]
    for t in some["triples"]:
        assert some.doc_id in t["subj"]
    assert (pdf["n_triples"].sum()) > 0
    # nested reference arrays equal the flat stage output per doc
    # (round-3 hardening: nested refs were never content-checked)
    flat_refs = refs.toPandas().set_index("doc_id")
    for r in pdf.itertuples():
        fr = flat_refs.loc[r.doc_id]
        assert sorted(r.celex_verified) == sorted(fr["celex_verified"])
        assert sorted(r.numac_verified) == sorted(fr["numac_verified"])
        assert sorted(r.urls) == sorted(fr["urls"])
    assert pdf["celex_verified"].str.len().sum() > 0, (
        "corpus plants valid CELEX refs; nested arrays must carry them")
