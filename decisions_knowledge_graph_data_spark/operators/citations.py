"""Tiered citation-evidence finder — the citation-finder analog.

Parity target: `src/jobs/map-cited-decisions/citation-finder.ts:48-313`.
Given a candidate citation record (the decision it claims to cite, with
identifier / case number / court / date metadata), search the citing
document's text for evidence, in strict priority order:

  tier 1  exact identifier hit                 (:48-96, ECLI search)
  tier 2  case-number — 3 variant builders     (:98-170, dotted/spaced/
          compact variants of the same number)
  tier 3  court token + decision date within   (:172-224, ±200-char
          ±proximity chars                      proximity)
  tier 4  court token only (low confidence)    (:226-251)

plus a ±context snippet aligned to sentence boundaries (:253-313) at the
winning position.

Spark shape (the scale story): candidates equi-join the docs scan on
``doc_id`` — the ONLY wide operation, and it co-partitions with any
upstream per-doc work. Court aliases are a broadcast dictionary
aggregated to one array per org. Every tier probe is a column
expression (``instr`` / higher-order functions) inside whole-stage
codegen — no Python, no per-pair regex compilation, and no doc×target
cross join anywhere: pairs arrive from upstream extraction/mapping,
exactly as the reference receives one citation record per search.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .blocks import sentence_snippet

PROXIMITY = 200   # court↔date max distance (citation-finder.ts:172-224)
CONTEXT = 300     # snippet half-window (citation-finder.ts:253-313)


def _case_variants(canonical: Column) -> Column:
    """The reference's 3 case-number variant builders
    (citation-finder.ts:98-170): canonical dotted form → [dotted, spaced,
    compact]."""
    return F.array(
        canonical,
        F.replace(canonical, F.lit("."), F.lit(" ")),
        F.replace(canonical, F.lit("."), F.lit("")),
    )


def _first_hit(content: Column, needles: Column) -> Column:
    """struct<p,l> of the earliest-found needle (1-based pos, length);
    null when none occur. All JVM-side: transform → filter → array_min
    (struct ordering is by first field, i.e. position)."""
    hits = F.filter(
        F.transform(
            needles,
            lambda s: F.struct(
                F.instr(content, s).alias("p"), F.length(s).alias("l")
            ),
        ),
        lambda x: x["p"] > 0,
    )
    return F.array_min(hits)


def find_citations(
    docs: DataFrame,
    candidates: DataFrame,
    alias_map: DataFrame,
    proximity: int = PROXIMITY,
    context: int = CONTEXT,
) -> DataFrame:
    """docs(doc_id | repo/path/commit, content) × candidates(doc_id,
    target_id, ident, case_canonical, org_code, decision_date) →
    (doc_id, target_id, tier, method, pos, snippet). Rows with no
    evidence at any tier are dropped (the reference returns null).
    """
    if "doc_id" not in docs.columns:
        from ..functions.ids import doc_uid
        docs = docs.withColumn(
            "doc_id", doc_uid(F.col("repo"), F.col("path"), F.col("commit"))
        )
    texts = docs.select("doc_id", F.col("content").alias("_c"))

    # org → every alias surface form, one broadcast array per org
    org_aliases = alias_map.groupBy(
        F.col("canonical_code").alias("org_code")
    ).agg(F.collect_list("alias").alias("_aliases"))

    paired = (
        candidates.join(F.broadcast(org_aliases), "org_code", "left")
        .join(texts, "doc_id")
    )

    c = F.col("_c")
    p_ident = F.when(
        F.col("ident").isNotNull(), F.instr(c, F.col("ident"))
    ).otherwise(F.lit(0))
    case_hit = _first_hit(c, _case_variants(F.col("case_canonical")))
    court_hit = _first_hit(c, F.coalesce(F.col("_aliases"), F.array()))
    p_date = F.when(
        F.col("decision_date").isNotNull(), F.instr(c, F.col("decision_date"))
    ).otherwise(F.lit(0))

    probed = paired.select(
        "doc_id", "target_id", "_c",
        F.length(F.col("ident")).alias("_ident_len"),
        p_ident.alias("_p1"),
        case_hit.alias("_case"),
        court_hit.alias("_court"),
        p_date.alias("_pd"),
        F.length(F.col("decision_date")).alias("_date_len"),
    )

    t3_ok = (
        F.col("_court").isNotNull()
        & (F.col("_pd") > 0)
        & (F.abs(F.col("_court.p") - F.col("_pd")) <= proximity)
    )
    tier = (
        F.when(F.col("_p1") > 0, 1)
        .when(F.col("_case").isNotNull(), 2)
        .when(t3_ok, 3)
        .when(F.col("_court").isNotNull(), 4)
    )
    pos = (
        F.when(F.col("_p1") > 0, F.col("_p1"))
        .when(F.col("_case").isNotNull(), F.col("_case.p"))
        .when(t3_ok, F.least(F.col("_court.p"), F.col("_pd")))
        .when(F.col("_court").isNotNull(), F.col("_court.p"))
    )
    # evidence length: tier 3 spans court-token → date (or date → token)
    t3_len = (
        F.greatest(
            F.col("_court.p") + F.col("_court.l"),
            F.col("_pd") + F.col("_date_len"),
        )
        - F.least(F.col("_court.p"), F.col("_pd"))
    )
    hit_len = (
        F.when(F.col("_p1") > 0, F.col("_ident_len"))
        .when(F.col("_case").isNotNull(), F.col("_case.l"))
        .when(t3_ok, t3_len)
        .when(F.col("_court").isNotNull(), F.col("_court.l"))
    )
    method = (
        F.when(F.col("_p1") > 0, "IDENT")
        .when(F.col("_case").isNotNull(), "CASE_NUM")
        .when(t3_ok, "COURT_DATE")
        .when(F.col("_court").isNotNull(), "COURT_ONLY")
    )

    return (
        probed.withColumn("tier", tier)
        .filter(F.col("tier").isNotNull())
        .select(
            "doc_id", "target_id", "tier",
            method.alias("method"),
            pos.alias("pos"),
            sentence_snippet(F.col("_c"), pos, hit_len, context).alias("snippet"),
        )
    )
