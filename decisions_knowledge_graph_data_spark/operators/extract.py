"""Structured extraction: mention scan kernel + cluster windows.

Parity targets:
  - trigger scan regex families (`regex-extractor.ts:236-408`): identifier
    (ECLI analog), name+date (court-token + FR/NL date triggers),
    case-number / provision / biblio analogs;
  - trigger clustering, gap ≤ 500 chars (`regex-extractor.ts:425-475`,
    CLUSTER_DISTANCE at :425);
  - 1200-char windows around cluster centers (`regex-extractor.ts:483-497`,
    WINDOW_SIZE at :481);
  - region confidence HIGH/MEDIUM/LOW (`regex-extractor.ts:505-553`).

Execution: one ``mapInPandas`` kernel (Arrow-batched; regexes compiled once
per partition, C-level ``finditer`` over each document — no per-row Python
UDF). Clustering is per-document, so it never shuffles: at 100 TB the
kernel is embarrassingly parallel over input splits. Cluster windows are
pure column expressions (JVM-side ``substring``) over a per-(doc, cluster)
aggregate.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.corpus import CLUSTER_DISTANCE, WINDOW_SIZE, assign_clusters
from ..functions.ids import doc_uid

# ---------------------------------------------------------------- regex families
# Identifier citation (ECLI-pattern analog, regex-extractor.ts:240-243)
RE_IDENT = r"DOC:\d{2}:\d{7}"
# Bilingual date triggers (regex-extractor.ts:308-335): numeric + FR/NL months
_MONTH_ALT = (
    "janvier|février|mars|avril|mai|juin|juillet|août|septembre|octobre"
    "|novembre|décembre|januari|februari|maart|april|mei|juni|juli"
    "|augustus|september|oktober|november|december"
)
RE_DATE = rf"(?:\d{{1,2}}/\d{{1,2}}/\d{{4}}|\d{{1,2}} (?:{_MONTH_ALT}) \d{{4}})"
# Name+date trigger: reviewer-org token followed by a date (court-token scan
# analog, regex-extractor.ts:57-151 — one compiled alternation)
RE_NAME_DATE = rf"Reviewed by .{{1,60}}? on {RE_DATE}"
# Provision snippet ("article N du Code X" analog,
# provisionSnippetExtractor.ts:50-59)
RE_RULE = r"rule \d{1,3} of (?:E\d{4}(?:X{1,2})?|[a-zéû][a-zéû -]{0,60}charter \d{3})"
# Parties header (party grammar, extract-comprehensive/config.ts:214-218)
_P_SUF = "(?:Corp|NV|GmbH|Ltd|SA|BV)"
RE_PARTY = rf"PARTIES: [A-Z][A-Za-z]+ {_P_SUF} vs [A-Z][A-Za-z]+ {_P_SUF}"
# Reference codes (referenceExtractorN8N.ts:59-69): CELEX / NUMAC / URL analogs
RE_CELEX = r"CELEX:3\d{4}[LRD]\d{4}"
RE_NUMAC = r"(?<!\d)\d{10}(?!\d)"
RE_URL = r"https://(?:lex|codex)\.example\.(?:eu|be)/[\w/.-]+"

_FAMILIES: list[tuple[str, str]] = [
    ("IDENT", RE_IDENT),
    ("NAME_DATE", RE_NAME_DATE),
    ("RULE", RE_RULE),
    ("PARTY", RE_PARTY),
    ("REF", RE_CELEX),
    ("REF", RE_NUMAC),
    ("REF", RE_URL),
]

MENTION_SCHEMA = (
    "doc_id string, lang string, mention_seq int, mention_kind string, "
    "surface string, char_start long, char_end long, cluster_id int, "
    "confidence string, is_self boolean"
)


def _scan_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    compiled = [(kind, re.compile(pat)) for kind, pat in _FAMILIES]
    cols = ["doc_id", "lang", "mention_seq", "mention_kind", "surface",
            "char_start", "char_end", "cluster_id", "confidence", "is_self"]
    for pdf in batches:
        out: list[dict] = []
        for doc_id, lang, content, own in zip(
            pdf["doc_id"], pdf["lang"], pdf["content"], pdf["doc_ident"]
        ):
            if content is None or content == "":
                continue
            hits: list[dict] = []
            for kind, rx in compiled:
                for m in rx.finditer(content):
                    hits.append({
                        "mention_kind": kind, "surface": m.group(0),
                        "char_start": m.start(), "char_end": m.end(),
                        # self-reference flag (regex-extractor.ts:252-255) —
                        # computed here so no join is ever needed for it
                        "is_self": kind == "IDENT" and own is not None
                        and m.group(0) == own,
                    })
            if not hits:
                continue
            assign_clusters(hits)
            hits.sort(key=lambda h: h["char_start"])
            for seq, h in enumerate(hits, start=1):
                h["doc_id"] = doc_id
                h["lang"] = lang
                h["mention_seq"] = seq
                out.append(h)
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
            {c: pd.Series(dtype="object") for c in cols}
        )


def extract_mentions(docs: DataFrame) -> DataFrame:
    """documents(repo,path,commit,lang,content,…) → mentions table.

    Input rows with NULL/empty content are dropped first (non-empty filter,
    `extract-comprehensive/config.ts:93-94`) — a JVM-side predicate pushed
    to the scan, so empty docs never cross the Arrow boundary.
    """
    cols = ["doc_id", "lang", "content"]
    base = docs.filter(F.col("content").isNotNull() & (F.col("content") != "")).withColumn(
        "doc_id", doc_uid(F.col("repo"), F.col("path"), F.col("commit"))
    )
    if "doc_ident" in docs.columns:
        base = base.select(*cols, "doc_ident")
    else:
        base = base.select(*cols).withColumn("doc_ident", F.lit(None).cast("string"))
    return base.mapInPandas(_scan_kernel, schema=MENTION_SCHEMA)


def cluster_windows(mentions: DataFrame, docs: DataFrame) -> DataFrame:
    """Per-(doc, cluster) 1200-char context windows (regex-extractor.ts:483-497).

    Pure column expressions: aggregate cluster bounds, join the docs scan
    (only ``content`` + key columns are read — column pruning), substring
    around the center. No Python.
    """
    bounds = (
        mentions.filter(F.col("cluster_id") >= 0)
        .groupBy("doc_id", "cluster_id")
        .agg(
            F.min("char_start").alias("c_start"),
            F.max("char_end").alias("c_end"),
            F.count("*").alias("n_triggers"),
            F.max(F.col("mention_kind") == "IDENT").alias("has_ident"),
            F.max(F.col("mention_kind") == "NAME_DATE").alias("has_name_date"),
        )
        .withColumn("center", ((F.col("c_start") + F.col("c_end")) / 2).cast("long"))
    )
    keyed_docs = docs.withColumn(
        "doc_id", doc_uid(F.col("repo"), F.col("path"), F.col("commit"))
    ).select("doc_id", "content")
    half = WINDOW_SIZE // 2
    return (
        bounds.join(keyed_docs, "doc_id")
        .withColumn(
            "window",
            F.substring(
                F.col("content"),
                F.greatest(F.lit(1), (F.col("center") - half + 1).cast("int")),
                WINDOW_SIZE,
            ),
        )
        # region confidence (regex-extractor.ts:505-553): HIGH if an
        # identifier trigger is present, MEDIUM if name+date, else LOW.
        .withColumn(
            "confidence",
            F.when(F.col("has_ident"), "HIGH")
            .when(F.col("has_name_date"), "MEDIUM")
            .otherwise("LOW"),
        )
        .select("doc_id", "cluster_id", "c_start", "c_end", "n_triggers",
                "confidence", "window")
    )


def filter_self_references(mentions: DataFrame) -> DataFrame:
    """Drop self-identifier mentions (`regex-extractor.ts:252-255`; date-based
    self-cite filter `src/pipeline/steps.ts:237-244`), then re-sequence the
    survivors 1..n per doc (`src/pipeline/steps.ts:246-251`) with an explicit
    sort key — never arrival order (SURVEY.md §7.3 determinism note).

    ``is_self`` was computed inside the scan kernel, so this is a pure
    predicate + per-doc window: one shuffle on doc_id, no dimension join.
    """
    w = Window.partitionBy("doc_id").orderBy("char_start", "mention_kind")
    return (
        mentions.filter(~F.coalesce(F.col("is_self"), F.lit(False)))
        .withColumn("mention_seq", F.row_number().over(w))
    )
