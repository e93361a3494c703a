"""Text normalization / categorization column expressions.

Parity targets (SURVEY.md §2.7): normalize lower+trim
(`mapping/steps.ts:60-62`), whitespace/quote normalization
(`mapping/steps.ts:95-98`), length categorization thresholds from
`src/jobs/extract-comprehensive/config.ts:110-124`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact thresholds from extract-comprehensive/config.ts:110-124.
LEN_SHORT = 10_000
LEN_MEDIUM = 30_000
LEN_LONG = 60_000


def normalize_name(col: Column) -> Column:
    """lower + trim — dictionary-key normalization (`mapping/steps.ts:60-62`)."""
    return F.lower(F.trim(col))


def normalize_display(col: Column) -> Column:
    """Collapse whitespace runs, straighten curly quotes (`mapping/steps.ts:95-98`)."""
    c = F.regexp_replace(col, r"\s+", " ")
    c = F.regexp_replace(c, "[‘’]", "'")
    c = F.regexp_replace(c, "[“”]", '"')
    return F.trim(c)


def length_category(length: Column) -> Column:
    """short/medium/long/very_long bucketing (config.ts:110-124)."""
    return (
        F.when(length < LEN_SHORT, "short")
        .when(length < LEN_MEDIUM, "medium")
        .when(length < LEN_LONG, "long")
        .otherwise("very_long")
    )


def truncate_ellipsis(col: Column, n: int) -> Column:
    """Truncate-with-ellipsis (`mapping/steps.ts:861-864`)."""
    return F.when(
        F.length(col) > n, F.concat(F.substring(col, 1, n), F.lit("..."))
    ).otherwise(col)


def sanitize_filename(col: Column, max_len: int = 200) -> Column:
    """Filename sanitize (`ConcurrentProcessor.ts:824-878`): unsafe chars →
    ``_``, cap at ``max_len`` with an 8-hex sha256 suffix so truncated
    names stay collision-free and deterministic."""
    cleaned = F.regexp_replace(col, r"[^A-Za-z0-9._-]", "_")
    suffix = F.substring(F.sha2(col, 256), 1, 8)
    return F.when(
        F.length(cleaned) > max_len,
        F.concat(F.substring(cleaned, 1, max_len - 9), F.lit("_"), suffix),
    ).otherwise(cleaned)


def coerce_int(col: Column, default: int | None = None) -> Column:
    """Defensive parseInt (`mapping/steps.ts:505-511`): regex-gated cast —
    non-numeric input falls back instead of throwing (ANSI-safe)."""
    return F.when(
        F.trim(col).rlike(r"^-?\d{1,18}$"), F.trim(col).cast("long")
    ).otherwise(F.lit(default).cast("long"))


def coerce_enum(col: Column, allowed: list[str], fallback: str) -> Column:
    """Defensive enum mapping (`mapping/steps.ts:512-517`): normalized
    membership check, else the documented fallback value."""
    norm = F.upper(F.trim(col))
    return F.when(norm.isin([a.upper() for a in allowed]), norm).otherwise(
        F.lit(fallback)
    )


def length_category_py(n: int) -> str:
    if n < LEN_SHORT:
        return "short"
    if n < LEN_MEDIUM:
        return "medium"
    if n < LEN_LONG:
        return "long"
    return "very_long"
