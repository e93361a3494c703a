"""Dependency resolution + evaluation-slice sources.

Parity targets:
  - DependencyResolver (`src/core/DependencyResolver.ts:85-320`,
    design note `guides/SYSTEM-ARCHITECTURE.md:196-229`): prior-stage
    results matched to rows on the composite key (decision_id, language),
    O(n) build + O(1) probe, alias/transform hooks, required vs optional
    semantics. Spark translation: the hash map IS a join — broadcast when
    the dependency is small, sort-merge otherwise; ``required=True`` is an
    inner join (rows without the dependency are *routed to failures*, not
    silently dropped), ``required=False`` a left join with nulls.
  - Test-set source (`evals/test-sets/README.md:100-126`): a small
    (doc_id, lang) slice joined into the scan via broadcast semi-join.
  - Key-list fanout join (`mapping/steps.ts:429-465`): family →
    entity-id list from a broadcast map, exploded, joined to the registry
    with the temporal cutoff `valid_from < doc_date` as a non-equi
    predicate on the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ["doc_id", "lang"]  # composite key discipline (DependencyResolver.ts:27-30)


def resolve_dependency(
    rows: DataFrame,
    dependency: DataFrame,
    keys: list[str] | None = None,
    required: bool = True,
    alias: str | None = None,
    broadcast: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Join a prior stage's results onto rows by the composite key.

    Returns (enriched, missing): with ``required`` the rows lacking the
    dependency land in ``missing`` (failure routing, ConcurrentProcessor
    semantics); otherwise ``missing`` is empty and enriched carries nulls.
    Non-key dependency columns are prefixed with ``alias`` when given
    (the aliasing hook of DependencyResolver.ts:198-320).
    """
    keys = keys or KEYS
    dep = dependency
    if alias:
        for c in dep.columns:
            if c not in keys:
                dep = dep.withColumnRenamed(c, f"{alias}__{c}")
    if broadcast:
        dep = F.broadcast(dep)
    if required:
        enriched = rows.join(dep, keys, "inner")
        missing = rows.join(dep, keys, "left_anti").select(
            *keys, F.lit("Dependency Missing").alias("reason")
        )
        return enriched, missing
    return rows.join(dep, keys, "left"), rows.limit(0).select(
        *keys, F.lit("").alias("reason")
    ).limit(0)


def test_set_slice(docs: DataFrame, test_set: DataFrame,
                   keys: list[str] | None = None) -> DataFrame:
    """Restrict a scan to a curated evaluation slice (broadcast semi-join,
    the `unnest($1,$2) ... JOIN` of evals/test-sets/README.md:100-126)."""
    keys = keys or KEYS
    return docs.join(F.broadcast(test_set.select(*keys).distinct()), keys, "left_semi")


def family_fanout_candidates(
    family_mentions: DataFrame,
    family_map: DataFrame,
    registry: DataFrame,
) -> DataFrame:
    """Key-list fanout: mention(family, doc_date) → explode the family's
    entity-id list (broadcast map) → join the registry with the temporal
    cutoff valid_from < doc_date (mapping/steps.ts:429-465).

    family_mentions: (doc_id, family, doc_date); family_map:
    (family, entity_ids array<string>); registry: (entity_id, title,
    valid_from). Returns one candidate row per (mention, entity).
    """
    fanned = family_map.select(
        "family", F.explode("entity_ids").alias("entity_id")
    )
    reg = registry.select("entity_id", "title", "valid_from")
    return (
        family_mentions.join(F.broadcast(fanned), "family")
        .join(F.broadcast(reg), "entity_id")
        .filter(F.col("valid_from") < F.col("doc_date"))
        .select("doc_id", "family", "entity_id", "title", "valid_from", "doc_date")
    )
