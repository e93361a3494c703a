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
expression inside whole-stage codegen — no Python and no doc×target
cross join anywhere: pairs arrive from upstream extraction/mapping,
exactly as the reference receives one citation record per search.

Matching fidelity (round-2 ADVICE, medium): probes are now
case-INsensitive with the reference's flexible forms — ECLI tolerates
``\\s*:\\s*`` colon spacing (citation-finder.ts:48-57), case numbers
match exact / any-separator (``[\\s.\\-/]*``) / Cassation-core
zero-padded variants (:60-96), court tokens get flexible whitespace and
optional dots (:139-151), dates match the reference's 3 regex forms —
month-name with abbreviations and the 1er/1ère ordinal, numeric with
any separator/spacing/zero-padding, and short-year DD/MM/YY — plus the
ISO literal as an extension (:97-128; round-3 ADVICE). Tier-1 probes
are gated on the reference's ≥5-colon-parts ECLI structural guard
(:48-57). Every probe compiles one regex per candidate row — exactly
the reference's per-search pattern build; the pattern is tiny and the
candidate side is orders of magnitude smaller than the corpus scan it
joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .blocks import sentence_snippet

PROXIMITY = 200   # court↔date max distance (citation-finder.ts:172-224)
CONTEXT = 300     # snippet half-window (citation-finder.ts:253-313)

# month alternations by month number (citation-finder.ts:19-32): full
# FR + NL names plus the reference's dotted abbreviations
_MONTH_PATTERNS = [
    r"(?:janvier|januari|jan\.?)",
    r"(?:février|februari|feb\.?)",
    r"(?:mars|maart|mar\.?)",
    r"(?:avril|april|apr\.?)",
    r"(?:mai|mei)",
    r"(?:juin|juni|jun\.?)",
    r"(?:juillet|juli|jul\.?)",
    r"(?:août|augustus|aug\.?)",
    r"(?:septembre|september|sept?\.?)",
    r"(?:octobre|oktober|oct\.?|okt\.?)",
    r"(?:novembre|november|nov\.?)",
    r"(?:décembre|december|dec\.?)",
]


def _regex_escape(col: Column) -> Column:
    """Escape regex metacharacters in a data-derived string
    (citation-finder.ts:41-43)."""
    return F.regexp_replace(col, r"([.*+?^${}()|\[\]\\])", r"\\$1")


def _ecli_pattern(ident: Column) -> Column:
    """Case-insensitive ECLI pattern tolerating spacing around colons:
    'ECLI:BE:CASS:...' also matches 'ecli : be : cass : ...'
    (citation-finder.ts:48-57)."""
    parts = F.transform(F.split(ident, ":"), _regex_escape)
    return F.concat(F.lit("(?i)"), F.array_join(parts, r"\s*:\s*"))


# Cassation-core case-number grammar (citation-finder.ts:60-96) — module
# constant so the DuckDB oracle derives its literal from the same source
# (round-5 review: hand-copied twins go silently stale)
CASS_RE = r"^([A-Za-z])\.?(\d{2,4})\.?(\d{1,5})\.?([A-Za-z])$"


def _case_patterns(canonical: Column) -> Column:
    """The reference's 3 case-number pattern builders
    (citation-finder.ts:60-96): exact (case-insensitive), flexible
    separators (dots/spaces/dashes/slashes all collapse to
    ``[\\s.\\-/]*``), and the Cassation-core form X.YY.ZZZZ.L with
    optional zero padding on the number."""
    exact = F.concat(F.lit("(?i)"), _regex_escape(canonical))
    flex_parts = F.filter(
        F.transform(F.split(canonical, r"[\s.\-/]+"), _regex_escape),
        lambda p: p != "",
    )
    flex = F.concat(F.lit("(?i)"), F.array_join(flex_parts, r"[\s.\-/]*"))
    cass_re = CASS_RE
    cass = F.when(
        canonical.rlike(cass_re),
        F.concat(
            F.lit("(?i)"),
            F.regexp_extract(canonical, cass_re, 1), F.lit(r"[\s.\-]*"),
            F.regexp_extract(canonical, cass_re, 2), F.lit(r"[\s.\-]*0*"),
            F.regexp_extract(canonical, cass_re, 3), F.lit(r"[\s.\-]*"),
            F.regexp_extract(canonical, cass_re, 4),
        ),
    )
    return F.array_compact(F.array(exact, flex, cass))


def _court_pattern(alias: Column) -> Column:
    """Flexible court-name pattern: case-insensitive, whitespace runs
    match any whitespace, dots optional (citation-finder.ts:139-151)."""
    p = _regex_escape(alias)
    p = F.regexp_replace(p, r"\s+", r"\\s+")
    p = F.replace(p, F.lit(r"\."), F.lit(r"\.?"))
    return F.concat(F.lit("(?i)"), p)


def _date_patterns(iso: Column) -> Column:
    """The reference's 3 date regexes for a YYYY-MM-DD date
    (citation-finder.ts:97-128), built as column expressions:

      1. ``day(?:er|ère)?\\s+<month-name>\\s+year`` — "15 mars 2022",
         "1er juin 2022", dotted abbreviations ("15 sept. 2022");
      2. ``day\\s*[/.-]\\s*month\\s*[/.-]\\s*YYYY`` — numeric with any
         separator, optional zero padding, spaces around separators
         ("5 / 3 / 2019");
      3. the same with a 2-digit year and a trailing ``\\b``
         ("05/03/19").

    Day/month tolerate missing zero padding exactly as the reference
    does (``0?5`` when < 10, the padded literal otherwise). A
    structurally malformed date (not ``\\d{4}-\\d{2}-\\d{2}``) yields no
    patterns (buildDatePatterns returns []). An out-of-RANGE month
    (e.g. '2022-13-05') drops only the month-NAME pattern — exactly the
    reference's behavior, where ``MONTH_PATTERNS[13]`` is undefined and
    only that template dies while the numeric and short-year patterns
    still emit (round-4 ADVICE: the previous all-or-nothing range gate
    was an undocumented third deviation). The month-name branch is
    CaseWhen-gated so ``element_at`` never sees an out-of-range index
    under ANSI mode (branch values evaluate lazily per row). Two
    documented deviations, both strict improvements: the ISO form
    itself is kept as pattern 0 (for ISO-formatted corpora like the
    test fixtures), and every day-first pattern carries a leading
    ``(?<!\\d)`` so the day can't anchor inside a longer digit run (the
    reference's patterns have only the trailing ``\\b`` on the
    short-year form — '05/03/19' would match inside '105/03/19')."""
    structural = iso.rlike(r"^\d{4}-\d{2}-\d{2}$")
    y = F.substring(iso, 1, 4)
    # NULL unless structurally valid → every downstream cast is ANSI-safe
    mm = F.when(structural, F.substring(iso, 6, 2))
    dd = F.substring(iso, 9, 2)
    day_pat = F.when(
        F.substring(dd, 1, 1) == "0", F.concat(F.lit("0?"), F.substring(dd, 2, 1))
    ).otherwise(dd)
    mon_pat = F.when(
        F.substring(mm, 1, 1) == "0", F.concat(F.lit("0?"), F.substring(mm, 2, 1))
    ).otherwise(mm)
    month_name = F.when(
        mm.cast("int").between(1, 12),
        F.element_at(F.array(*[F.lit(x) for x in _MONTH_PATTERNS]), mm.cast("int")),
    )
    lead = F.lit(r"(?i)(?<!\d)")
    sep = F.lit(r"\s*[/\-.]\s*")
    named = F.concat(
        lead, day_pat, F.lit(r"(?:er|ère)?\s+"), month_name, F.lit(r"\s+"), y,
    )  # NULL when the month is out of range (concat propagates null)
    numeric = F.concat(lead, day_pat, sep, mon_pat, sep, y)
    short = F.concat(
        lead, day_pat, sep, mon_pat, sep, F.substring(iso, 3, 2), F.lit(r"\b"),
    )
    return F.when(
        structural,
        F.array_compact(F.array(_regex_escape(iso), named, numeric, short)),
    ).otherwise(F.array().cast("array<string>"))


def _first_hit_re(content: Column, patterns: Column) -> Column:
    """struct<p,l> of the earliest regex match across ``patterns``
    (1-based pos, MATCHED length — flexible separators can change it);
    null when none match. All JVM-side: transform → filter → array_min
    (struct ordering is by first field, i.e. position)."""
    hits = F.filter(
        F.transform(
            patterns,
            lambda pat: F.struct(
                F.regexp_instr(content, pat).alias("p"),
                F.length(F.regexp_substr(content, pat)).alias("l"),
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
    min_ident_parts: int = 3,
) -> DataFrame:
    """docs(doc_id | repo/path/commit, content) × candidates(doc_id,
    target_id, ident, case_canonical, org_code, decision_date) →
    (doc_id, target_id, tier, method, pos, snippet). Rows with no
    evidence at any tier are dropped (the reference returns null).

    ``min_ident_parts`` is the identifier grammar's colon-part arity:
    an ident with fewer parts is structurally malformed and skips the
    tier-1 probe entirely (buildEcliPattern returns null below 5 parts
    for true ECLIs, citation-finder.ts:48-57; this corpus's DOC:rr:nnn
    grammar has 3).
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
    # tier 1: case-insensitive ECLI with flexible colon spacing — gated
    # on the reference's structural guard (buildEcliPattern returns null
    # below the grammar's colon-part count, citation-finder.ts:48-57),
    # so a short/malformed ident never becomes a bare substring probe
    ident_hit = F.when(
        F.col("ident").isNotNull()
        & (F.size(F.split(F.col("ident"), ":")) >= min_ident_parts),
        F.struct(
            F.regexp_instr(c, _ecli_pattern(F.col("ident"))).alias("p"),
            F.length(F.regexp_substr(c, _ecli_pattern(F.col("ident")))).alias("l"),
        ),
    )
    case_hit = _first_hit_re(c, _case_patterns(F.col("case_canonical")))
    court_hit = _first_hit_re(
        c, F.transform(F.coalesce(F.col("_aliases"), F.array()), _court_pattern)
    )
    # dates probe with the reference's 3 regex forms (+ ISO extension)
    date_hit = F.when(
        F.col("decision_date").isNotNull(),
        _first_hit_re(c, _date_patterns(F.col("decision_date"))),
    )

    probed = paired.select(
        "doc_id", "target_id", "_c",
        ident_hit["l"].alias("_ident_len"),
        F.coalesce(ident_hit["p"], F.lit(0)).alias("_p1"),
        case_hit.alias("_case"),
        court_hit.alias("_court"),
        F.coalesce(date_hit["p"], F.lit(0)).alias("_pd"),
        date_hit["l"].alias("_date_len"),
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
