"""Pure-regex reference extraction — the "Agent 2B" analog, zero UDFs.

Parity target: `src/utils/referenceExtractorN8N.ts` — CELEX/NUMAC/URL
pattern extraction (:59-69), checksum-style validation (year ranges,
month validity; :94-202), and the verified-vs-extracted split (:329-385).

Everything here is ``regexp_extract_all`` + SQL predicates — whole-stage
codegen, fully pushed down, no Python. This is the reference's only
compute-bound path ("all 64k decisions in seconds",
guides/CODEBASE-ANALYSIS.md:1355-1357) and our headline throughput story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ids import doc_uid

# Pattern strings duplicated as SQL-dialect regex (no \d shorthand issues —
# Spark supports \\d in Java regex).
SQL_CELEX = r"CELEX:3\d{4}[LRD]\d{4}"
SQL_NUMAC = r"(?<!\d)(\d{10})(?!\d)"
SQL_URL = r"https://(?:lex|codex)\.example\.(?:eu|be)/[\w/.-]+"


def _valid_celex(c):
    """Year component in [1950, 2030] (year-range validation,
    referenceExtractorN8N.ts:94-140). The year starts at char 8:
    ``CELEX:`` is 6 chars, char 7 is the sector digit '3' — round-3 bug
    fix: the check previously read chars 7-10 ('3YYY' ≥ 3000), silently
    failing EVERY CELEX including the fixture's ref_valid=True plants;
    no test compared verified arrays to the goldens (now one does:
    test_aggregate.py::test_reference_validation_matches_goldens)."""
    year = F.substring(c, 8, 4).cast("int")
    return (year >= 1950) & (year <= 2030)


def _valid_numac(c):
    """Year in [1900, 2030] and month in [1, 12] (calendar validation,
    referenceExtractorN8N.ts:141-202)."""
    year = F.substring(c, 1, 4).cast("int")
    month = F.substring(c, 5, 2).cast("int")
    return (year >= 1900) & (year <= 2030) & (month >= 1) & (month <= 12)


def extract_references(docs: DataFrame) -> DataFrame:
    """documents → one row per doc with extracted/verified reference arrays.

    Output struct mirrors the reference's assembled shape
    (referenceExtractorN8N.ts:329-385): per family, the raw ``extracted``
    list and the validation-passing ``verified`` list.
    """
    base = docs.filter(
        F.col("content").isNotNull() & (F.col("content") != "")
    ).withColumn("doc_id", doc_uid(F.col("repo"), F.col("path"), F.col("commit")))

    celex = F.array_distinct(F.regexp_extract_all(F.col("content"), F.lit(SQL_CELEX), 0))
    numac = F.array_distinct(F.regexp_extract_all(F.col("content"), F.lit(SQL_NUMAC), 1))
    urls = F.array_distinct(F.regexp_extract_all(F.col("content"), F.lit(SQL_URL), 0))

    return base.select(
        "doc_id",
        "lang",
        F.array_sort(celex).alias("celex_extracted"),
        F.array_sort(F.filter(celex, _valid_celex)).alias("celex_verified"),
        F.array_sort(numac).alias("numac_extracted"),
        F.array_sort(F.filter(numac, _valid_numac)).alias("numac_verified"),
        F.array_sort(urls).alias("urls"),
    )


def reference_counts(docs: DataFrame) -> DataFrame:
    """Per-doc verified/extracted counts — the first driver query of the
    minimum end-to-end slice (SURVEY.md §7.2 step 2)."""
    refs = extract_references(docs)
    return refs.select(
        "doc_id",
        F.size("celex_extracted").alias("n_celex_extracted"),
        F.size("celex_verified").alias("n_celex_verified"),
        F.size("numac_extracted").alias("n_numac_extracted"),
        F.size("numac_verified").alias("n_numac_verified"),
        F.size("urls").alias("n_urls"),
    )
