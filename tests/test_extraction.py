"""Extraction kernel vs planted goldens (FIXTURES.md §5).

The generator plants mentions at known offsets; the kernel must recover
every one (same kind, surface, offsets, cluster, confidence) — the analog
of the reference's golden per-step state files.
"""

import pandas as pd

from decisions_knowledge_graph_data_spark.operators.extract import (
    cluster_windows,
    extract_mentions,
    filter_self_references,
)


def _key(df: pd.DataFrame):
    return set(
        zip(df["doc_id"], df["mention_kind"], df["surface"],
            df["char_start"], df["char_end"], df["cluster_id"], df["confidence"])
    )


def test_mentions_exact_match(corpus20):
    tables, bundle, _ = corpus20
    got = extract_mentions(tables["documents"]).toPandas()
    exp = bundle.expected_mentions
    assert _key(got) == _key(exp)
    # sequence numbers are position-ordered and dense per doc
    for _, g in got.groupby("doc_id"):
        seqs = sorted(g["mention_seq"])
        assert seqs == list(range(1, len(g) + 1))


def test_self_reference_filtered(corpus20):
    tables, bundle, _ = corpus20
    raw = extract_mentions(tables["documents"])
    kept = filter_self_references(raw).toPandas()
    exp = bundle.expected_mentions
    planted_self = exp[exp.get("self_ref").notna()] if "self_ref" in exp else exp.iloc[0:0]
    assert len(planted_self) > 0, "goldens must include planted self-references"
    own = set(zip(planted_self["doc_id"], planted_self["surface"]))
    got_pairs = set(zip(kept["doc_id"], kept["surface"]))
    assert own.isdisjoint(got_pairs)
    # resequenced densely after the filter
    for _, g in kept.groupby("doc_id"):
        assert sorted(g["mention_seq"]) == list(range(1, len(g) + 1))


def test_cluster_windows(corpus20, spark):
    """Window extent AND the HIGH/MEDIUM/LOW region confidence are
    recomputed independently per cluster from the mention table
    (round-3 hardening: confidence was previously only membership-
    checked — the CELEX lesson: a field no test recomputes can be
    silently wrong forever)."""
    tables, _, _ = corpus20
    m = extract_mentions(tables["documents"])
    mp = m.toPandas()
    w = cluster_windows(m, tables["documents"]).toPandas()
    assert (w["window"].str.len() <= 1200).all()
    assert len(w) > 0

    clustered = mp[mp["cluster_id"] >= 0]
    by_cluster = dict(iter(clustered.groupby(["doc_id", "cluster_id"])))
    assert set(zip(w["doc_id"], w["cluster_id"])) == set(by_cluster)
    for r in w.itertuples():
        grp = by_cluster[(r.doc_id, r.cluster_id)]
        assert r.n_triggers == len(grp)
        kinds = set(grp["mention_kind"])
        expected = (
            "HIGH" if kinds & {"IDENT", "CASE_NUM"}
            else "MEDIUM" if kinds & {"NAME_DATE", "COURT_DATE"}
            else "LOW"
        )
        assert r.confidence == expected, (r.doc_id, r.cluster_id, kinds)
        # the window is centered on the cluster: every trigger surface
        # whose extent fits inside the 1200-char window appears in it
        c_start, c_end = grp["char_start"].min(), grp["char_end"].max()
        if c_end - c_start < 1100:  # margin for boundary clamping
            center_surface = grp.sort_values("char_start").iloc[len(grp) // 2]
            assert center_surface["surface"] in r.window, (
                r.doc_id, r.cluster_id)


def test_fast_matchers_equal_spec_patterns(registry):
    """The optimized matcher strategies (Python boundary/¶ post-checks,
    literal prescreens, maximal digit runs) must produce EXACTLY the raw
    _FAMILIES finditer results — on corpus docs and adversarial overlaps."""
    import re
    from decisions_knowledge_graph_data_spark.operators.extract import (
        _FAMILIES, _build_matchers,
    )
    from decisions_knowledge_graph_data_spark.sources.corpus import build_document

    texts = [build_document(i, 1000, registry)[0]["content"] for i in range(60)]
    texts += [
        "¶ C-999/99 and C-12/34 and xC.22.0123.N and C.22.0123.N. end",
        "per A dated 2020-01-01 per B dated notdate per C dated 2021-02-02",
        "per A dated 2020-01-01per B dated 2021-02-02",
        "Rev. Proto. 2019, 12 xRev. Proto. 2019, 12 J. Com. 2001, 999",
        "1234567890 12345678901 123456789 ¶C.11.1111.N C 33 3333 F",
        "per X dated Y dated 2024-01-01 tail",
        "",
    ]
    compiled = [(k, re.compile(p)) for k, p in _FAMILIES]
    matchers = _build_matchers()
    for t in texts:
        ref = sorted((k, m.start(), m.end())
                     for k, rx in compiled for m in rx.finditer(t))
        new = sorted((k, s, e) for k, scan in matchers for s, e in scan(t))
        assert ref == new, t[:80]


def test_jurisdiction_priority(corpus20, spark):
    """Identifier region first, court-token map second, UNKNOWN last
    (regex-extractor.ts:157-226)."""
    from decisions_knowledge_graph_data_spark.operators.extract import (
        classify_jurisdiction,
    )
    from decisions_knowledge_graph_data_spark.sources.corpus import doc_uid_of

    tables, _, _ = corpus20
    docs = tables["documents"]
    m = extract_mentions(docs)
    got = classify_jurisdiction(docs, m, tables["alias_map"]).toPandas()
    exp = {doc_uid_of(i): f"R{i % 100:02d}" for i in range(20)}
    assert dict(zip(got["doc_id"], got["jurisdiction"])) == exp
    assert set(got["juris_source"]) == {"IDENT"}

    # tier 2: drop the identifier column → court-token fallback via the
    # alias map's location column
    docs2 = docs.drop("doc_ident")
    got2 = classify_jurisdiction(
        docs2, extract_mentions(docs2), tables["alias_map"]
    ).toPandas()
    courts = got2[got2["juris_source"] == "COURT_TOKEN"]
    assert len(courts) > 0
    assert set(courts["jurisdiction"]) <= {f"LOC-{j:02d}" for j in range(8)}

    # tier 3: no ident, no mentions at all → UNKNOWN
    lone = spark.createDataFrame(
        [("r", "p", "c", "py", "plain text only")],
        "repo string, path string, commit string, lang string, content string",
    )
    got3 = classify_jurisdiction(
        lone, extract_mentions(lone), tables["alias_map"]
    ).toPandas()
    assert list(got3["jurisdiction"]) == ["UNKNOWN"]
    assert list(got3["juris_source"]) == ["UNKNOWN"]


def test_empty_and_null_content_filtered(spark):
    df = spark.createDataFrame(
        [("r", "p1", "c", "py", None, "DOC:00:0000000"),
         ("r", "p2", "c", "py", "", "DOC:00:0000001"),
         ("r", "p3", "c", "py", "see DOC:01:0000001 .", "DOC:00:0000002")],
        "repo string, path string, commit string, lang string, content string, doc_ident string",
    )
    got = extract_mentions(df).toPandas()
    assert set(got["surface"]) == {"DOC:01:0000001"}
