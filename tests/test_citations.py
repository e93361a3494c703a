"""Tiered citation-finder vs planted goldens (citation-finder.ts:48-313).

The corpus plants, per doc: ident cites (tier 1), case-number-only cites in
dotted/spaced variants (tier 2), court-token + ISO-date proximity cites
(tier 3) and court-only candidate records (tier 4), plus a '¶ '-prefixed
case token that the extraction negative filter must drop.
"""

import pandas as pd

from decisions_knowledge_graph_data_spark.operators.citations import find_citations
from decisions_knowledge_graph_data_spark.operators.extract import extract_mentions


def _run(spark, corpus):
    tables, bundle, _ = corpus
    exp = bundle.expected_citations
    cands = spark.createDataFrame(exp.drop(columns=["tier"]))
    got = find_citations(tables["documents"], cands, tables["alias_map"]).toPandas()
    return exp, got


def test_citation_tiers_match_goldens(spark, corpus20):
    exp, got = _run(spark, corpus20)
    assert set(exp["tier"]) >= {1, 2}, "fixture must plant multiple tiers"
    exp_k = {(r.doc_id, r.target_id): r.tier for r in exp.itertuples()}
    got_k = {(r.doc_id, r.target_id): (r.tier, r.method, r.snippet)
             for r in got.itertuples()}
    assert set(got_k) == set(exp_k), "every candidate must resolve, none extra"
    wrong = {k: (got_k[k][0], v) for k, v in exp_k.items() if got_k[k][0] != v}
    assert not wrong, f"tier mismatches: {wrong}"
    methods = {1: "IDENT", 2: "CASE_NUM", 3: "COURT_DATE", 4: "COURT_ONLY"}
    for k, v in exp_k.items():
        assert got_k[k][1] == methods[v]


def test_citation_all_four_tiers_covered(spark, registry):
    """At 60 docs every tier fires at least once — the fixture is rich
    enough that a tier regression cannot hide."""
    from decisions_knowledge_graph_data_spark.sources.corpus import corpus_tables
    corpus = corpus_tables(spark, 60, registry)
    exp, got = _run(spark, corpus)
    assert set(exp["tier"]) == {1, 2, 3, 4}
    merged = exp.merge(got, on=["doc_id", "target_id"], suffixes=("_exp", "_got"))
    assert (merged["tier_exp"] == merged["tier_got"]).all()


def test_citation_snippets_contain_evidence(spark, corpus20):
    exp, got = _run(spark, corpus20)
    merged = exp.merge(got, on=["doc_id", "target_id"], suffixes=("_exp", "_got"))
    for r in merged.itertuples():
        tier = r.tier_exp
        if tier == 1:
            assert r.ident in r.snippet
        elif tier == 2:
            variants = {r.case_canonical, r.case_canonical.replace(".", " "),
                        r.case_canonical.replace(".", "")}
            assert any(v in r.snippet for v in variants)
        elif tier == 3:
            assert r.decision_date in r.snippet
        # sentence alignment: snippets never start/end mid-ellipsis garbage
        assert len(r.snippet) > 0


def test_flexible_matching_case_and_separators(spark):
    """Round-2 ADVICE (medium): the reference's patterns are
    case-insensitive with flexible separators (citation-finder.ts:48-96)
    — a citation differing only in case, colon spacing, or separator
    style must still resolve at its proper tier, and at the matched
    position (snippet carries the as-written surface)."""
    docs = spark.createDataFrame(
        [
            # tier 1: lowercased ECLI with spaced colons
            ("d1", "the court held in ecli : be : cass : 2019 : 0042 that."),
            # tier 2: dashed separators + lowercase letters
            ("d2", "compare case c-17-0234-f which settled the point."),
            # tier 2: Cassation core with extra zero padding
            ("d3", "see C.17.00234.F for the rule."),
            # tier 3: court alias in different case + dd/mm/yyyy date
            ("d4", "per COUR DE cassation judgment of 05/03/2019 on costs."),
            # tier 4: alias with collapsed whitespace and missing dot
            ("d5", "the Cass  Ct has consistently ruled so."),
        ],
        "doc_id string, content string",
    )
    cands = spark.createDataFrame(
        [
            ("d1", "T1", "ECLI:BE:CASS:2019:0042", None, None, None),
            ("d2", "T2", None, "C.17.0234.F", None, None),
            ("d3", "T3", None, "C.17.0234.F", None, None),
            ("d4", "T4", None, None, "ORG-1", "2019-03-05"),
            ("d5", "T5", None, None, "ORG-1", "1999-01-01"),
        ],
        "doc_id string, target_id string, ident string, case_canonical string,"
        " org_code string, decision_date string",
    )
    aliases = spark.createDataFrame(
        [("ORG-1", "cour de cassation"), ("ORG-1", "Cass. Ct")],
        "canonical_code string, alias string",
    )
    got = {
        r["target_id"]: (r["tier"], r["method"], r["snippet"])
        for r in find_citations(docs, cands, aliases).collect()
    }
    assert got["T1"][0] == 1 and "ecli : be : cass" in got["T1"][2]
    assert got["T2"][0] == 2 and "c-17-0234-f" in got["T2"][2]
    assert got["T3"][0] == 2 and "C.17.00234.F" in got["T3"][2]
    assert got["T4"][:2] == (3, "COURT_DATE") and "05/03/2019" in got["T4"][2]
    assert got["T5"][:2] == (4, "COURT_ONLY")


def test_date_variants_fr_nl_month_names(spark):
    """'15 mars 2022' / '15 maart 2022' style dates satisfy the tier-3
    proximity check (citation-finder.ts:98-137)."""
    docs = spark.createDataFrame(
        [("d1", "arrêt de la cour de cassation du 5 mars 2019 précité."),
         ("d2", "arrest van het hof 05 maart 2019, cour de cassation.")],
        "doc_id string, content string",
    )
    cands = spark.createDataFrame(
        [("d1", "T1", None, None, "ORG-1", "2019-03-05"),
         ("d2", "T2", None, None, "ORG-1", "2019-03-05")],
        "doc_id string, target_id string, ident string, case_canonical string,"
        " org_code string, decision_date string",
    )
    aliases = spark.createDataFrame(
        [("ORG-1", "cour de cassation")], "canonical_code string, alias string"
    )
    got = {r["target_id"]: r["method"]
           for r in find_citations(docs, cands, aliases).collect()}
    assert got == {"T1": "COURT_DATE", "T2": "COURT_DATE"}


def test_date_reference_regex_forms(spark):
    """Round-3 ADVICE (low): the forms the reference's buildDatePatterns
    covers (citation-finder.ts:97-128) that literal variants missed —
    month abbreviations, the 1er ordinal, spaces around numeric
    separators, short-year DD/MM/YY — now satisfy tier 3; and the
    short-year probe must NOT fire inside a longer different year."""
    docs = spark.createDataFrame(
        [("d1", "cour de cassation, arrêt du 15 sept. 2022 sur le fond."),
         ("d2", "cour de cassation, arrêt du 1er juin 2022 précité."),
         ("d3", "cour de cassation, audience du 5 / 3 / 2019 au greffe."),
         ("d4", "cour de cassation, zitting van 05/03/19 te Brussel."),
         # short-year 19 must not match inside 05/03/1998 (\b guard)
         ("d5", "cour de cassation, audience du 05/03/1998 au greffe.")],
        "doc_id string, content string",
    )
    cands = spark.createDataFrame(
        [("d1", "T1", None, None, "ORG-1", "2022-09-15"),
         ("d2", "T2", None, None, "ORG-1", "2022-06-01"),
         ("d3", "T3", None, None, "ORG-1", "2019-03-05"),
         ("d4", "T4", None, None, "ORG-1", "2019-03-05"),
         ("d5", "T5", None, None, "ORG-1", "2019-03-05")],
        "doc_id string, target_id string, ident string, case_canonical string,"
        " org_code string, decision_date string",
    )
    aliases = spark.createDataFrame(
        [("ORG-1", "cour de cassation")], "canonical_code string, alias string"
    )
    got = {r["target_id"]: r["method"]
           for r in find_citations(docs, cands, aliases).collect()}
    assert got["T1"] == "COURT_DATE"
    assert got["T2"] == "COURT_DATE"
    assert got["T3"] == "COURT_DATE"
    assert got["T4"] == "COURT_DATE"
    assert got["T5"] == "COURT_ONLY"  # 1998 is not 2019; degrade to tier 4


def test_date_out_of_range_and_leading_boundary(spark):
    """Code-review round 4: (a) a shape-valid but out-of-range
    decision_date ('2022-13-05') must degrade to tier 4, not crash the
    job via element_at(months, 13) under ANSI mode; (b) day-first
    patterns must not anchor inside a longer digit run ('105/03/19'
    must not read as 05/03/19 — leading (?<!\\d) guard)."""
    docs = spark.createDataFrame(
        [("d1", "cour de cassation ruling of 13 mai 2022 cited here."),
         ("d2", "cour de cassation, rolnummer 105/03/19 in zake x.")],
        "doc_id string, content string",
    )
    cands = spark.createDataFrame(
        [("d1", "T1", None, None, "ORG-1", "2022-13-05"),   # month 13
         ("d2", "T2", None, None, "ORG-1", "2019-03-05")],
        "doc_id string, target_id string, ident string, case_canonical string,"
        " org_code string, decision_date string",
    )
    aliases = spark.createDataFrame(
        [("ORG-1", "cour de cassation")], "canonical_code string, alias string"
    )
    got = {r["target_id"]: r["method"]
           for r in find_citations(docs, cands, aliases).collect()}
    assert got["T1"] == "COURT_ONLY"
    assert got["T2"] == "COURT_ONLY"


def test_ecli_structural_guard(spark):
    """Round-3 ADVICE (low): buildEcliPattern returns null for idents
    with fewer colon-separated parts than the grammar's arity
    (citation-finder.ts:48-57 — 5 for real ECLIs, 3 for this corpus's
    DOC:rr:nnnnnnn analog); a malformed short ident must not become a
    bare substring probe that lands a spurious tier-1 hit."""
    docs = spark.createDataFrame(
        [("d1", "the cass ruling mentioned above controls this case.")],
        "doc_id string, content string",
    )
    cands = spark.createDataFrame(
        # "cass" appears in the text, but a 1-part ident is structurally
        # not an ECLI — the reference would never attempt the search
        [("d1", "T1", "cass", None, "ORG-1", None)],
        "doc_id string, target_id string, ident string, case_canonical string,"
        " org_code string, decision_date string",
    )
    aliases = spark.createDataFrame(
        [("ORG-1", "cour de cassation")], "canonical_code string, alias string"
    )
    assert find_citations(docs, cands, aliases).count() == 0


def test_paragraph_negative_not_extracted(corpus20):
    """'¶ C-999/99' is planted raw — the ¶ negative filter
    (regex-extractor.ts:362-368) must keep it out of the mention table."""
    tables, bundle, _ = corpus20
    docs = tables["documents"].toPandas()
    neg_docs = docs[docs["content"].str.contains("¶ C-999/99", regex=False)]
    assert len(neg_docs) > 0, "negative fixture must be planted"
    got = extract_mentions(tables["documents"]).toPandas()
    for row in neg_docs.itertuples():
        neg_pos = row.content.index("¶ C-999/99") + len("¶ ")
        from decisions_knowledge_graph_data_spark.functions.ids import doc_uid_py
        did = doc_uid_py(row.repo, row.path, row.commit)
        doc_mentions = got[got["doc_id"] == did]
        assert not ((doc_mentions["char_start"] == neg_pos)
                    & (doc_mentions["surface"] == "C-999/99")).any()


def test_date_patterns_property_sweep(spark):
    """Round-4 VERDICT item 8: property-sweep `_date_patterns` beyond
    the fixture corpus. 250 seeded-random valid dates are rendered in
    every surface family the reference's buildDatePatterns covers
    (citation-finder.ts:97-128) — month-name with FR/NL names,
    abbreviations and the 1er/1ère ordinal; numeric with any of the
    three separators, optional spacing and optional zero-padding;
    short-year — plus the ISO extension; each rendering must be hit by
    the built patterns. Negatives in the same job: structurally
    malformed dates yield EMPTY pattern arrays; a shape-valid but
    out-of-range month emits the numeric patterns but never the
    month-name one (the reference's undefined-template skip), and
    nothing crashes under ANSI mode."""
    import random

    from pyspark.sql import functions as F

    from decisions_knowledge_graph_data_spark.operators.citations import (
        _date_patterns, _first_hit_re,
    )

    month_surfaces = {
        1: ["janvier", "januari", "jan.", "jan"],
        2: ["février", "februari", "feb.", "feb"],
        3: ["mars", "maart", "mar.", "mar"],
        4: ["avril", "april", "apr.", "apr"],
        5: ["mai", "mei"],
        6: ["juin", "juni", "jun.", "jun"],
        7: ["juillet", "juli", "jul.", "jul"],
        8: ["août", "augustus", "aug.", "aug"],
        9: ["septembre", "september", "sept.", "sept", "sep.", "sep"],
        10: ["octobre", "oktober", "oct.", "okt.", "oct", "okt"],
        11: ["novembre", "november", "nov.", "nov"],
        12: ["décembre", "december", "dec.", "dec"],
    }
    rng = random.Random(5)
    rows = []
    for i in range(250):
        y = rng.randint(1950, 2030)
        mo = rng.randint(1, 12)
        d = rng.randint(1, 28)
        iso = f"{y:04d}-{mo:02d}-{d:02d}"
        family = i % 4
        d_s = rng.choice([str(d), f"{d:02d}"]) if d < 10 else str(d)
        m_s = rng.choice([str(mo), f"{mo:02d}"]) if mo < 10 else str(mo)
        if family == 0:  # ISO literal
            surface = iso
        elif family == 1:  # month name, maybe 1er/1ère ordinal
            day_r = d_s + rng.choice(["er", "ère"]) if d == 1 and rng.random() < 0.5 else d_s
            surface = f"{day_r} {rng.choice(month_surfaces[mo])} {y}"
        elif family == 2:  # numeric, any separator, optional spacing
            sep = rng.choice(["/", "-", "."])
            pad = rng.choice(["", " "])
            surface = f"{d_s}{pad}{sep}{pad}{m_s}{pad}{sep}{pad}{y}"
        else:  # short year (trailing \b needs the non-word char after)
            sep = rng.choice(["/", "-", "."])
            surface = f"{d_s}{sep}{m_s}{sep}{y % 100:02d}"
        text = f"decision of {surface} applies here."
        rows.append((f"c{i}", iso, text))
    df = spark.createDataFrame(rows, "cid string, iso string, text string")
    hit = _first_hit_re(F.col("text"), _date_patterns(F.col("iso")))
    missed = (
        df.select("cid", "text", hit.alias("h"))
        .filter(F.col("h").isNull() | (F.col("h.p") <= 0))
        .collect()
    )
    assert missed == [], f"unmatched renderings: {missed[:5]}"

    # negatives: malformed → no patterns; month 13 → numeric-only
    neg = spark.createDataFrame(
        [("garbage",), ("2022-5-05",), ("13/05/2022",), ("2022-13-05",),
         ("2022-00-40",)],
        "iso string",
    ).select(
        "iso", F.size(_date_patterns(F.col("iso"))).alias("n"),
        _date_patterns(F.col("iso")).alias("pats"),
    ).collect()
    by_iso = {r["iso"]: r for r in neg}
    assert by_iso["garbage"]["n"] == 0
    assert by_iso["2022-5-05"]["n"] == 0
    assert by_iso["13/05/2022"]["n"] == 0
    # shape-valid, month out of range: ISO + numeric + short survive,
    # month-name is dropped — and no ANSI element_at crash
    assert by_iso["2022-13-05"]["n"] == 3
    assert not any("(?:er|ère)" in p for p in by_iso["2022-13-05"]["pats"])
    assert by_iso["2022-00-40"]["n"] == 3
