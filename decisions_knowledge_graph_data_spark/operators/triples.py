"""Triple emission: mentions → (subj, pred, obj) rows.

Predicates: ``cites`` / ``decided_by`` / ``applies_provision`` /
``party_of`` (BASELINE.json:6). Node-id grammar follows the reference's
minted-id discipline (`src/pipeline/steps.ts:202-262`): ``DEC-{doc}``,
``ART-{act}-{seq:03d}``, ``PARTY-{doc}-{seq:03d}``, org codes for
decided_by.

All derivations are joins + column expressions:
  - cites: equi-join mention.surface = documents.doc_ident (the identifier
    column is a *key*, so citation resolution is a plain equi-join; at
    10^12 docs this is a shuffle join on a high-cardinality key — no skew,
    because each ident is cited a bounded number of times except hubs,
    which AQE skew-split handles);
  - decided_by: broadcast alias dictionary join (247 rows);
  - party_of: regexp split + posexplode;
  - applies_provision: produced by the linking stage (operators/linking.py)
    and minted here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ids import doc_uid
from ..functions.text import normalize_name

TRIPLE_SCHEMA = ["subj", "pred", "obj"]


def cites_triples(mentions: DataFrame, docs: DataFrame, dedupe: bool = True) -> DataFrame:
    """IDENT mentions → (DEC-src, cites, DEC-target).

    Target resolution = equi-join on the target's identifier column.
    Self-citations were already dropped by ``filter_self_references``.
    """
    targets = docs.select(
        F.col("doc_ident").alias("surface"),
        doc_uid(F.col("repo"), F.col("path"), F.col("commit")).alias("target_uid"),
    )
    return (
        mentions.filter(F.col("mention_kind") == "IDENT")
        .select("doc_id", "surface")
        .join(targets, "surface")
        .select(
            F.concat(F.lit("DEC-"), F.col("doc_id")).alias("subj"),
            F.lit("cites").alias("pred"),
            F.concat(F.lit("DEC-"), F.col("target_uid")).alias("obj"),
        )
        .transform(lambda d: d.dropDuplicates(TRIPLE_SCHEMA) if dedupe else d)
    )


def decided_by_triples(
    mentions: DataFrame, alias_map: DataFrame, known_missing: DataFrame,
    dedupe: bool = True,
) -> DataFrame:
    """NAME_DATE mentions → (DEC-doc, decided_by, ORG-code).

    Alias dictionary is broadcast (court-mapping.csv analog, 247 rows —
    `mapping/steps.ts:742-743`); known-missing names short-circuit to skip
    (`mapping/steps.ts:100-103`) via broadcast anti-join.
    """
    nd = (
        mentions.filter(F.col("mention_kind") == "NAME_DATE")
        .withColumn(
            "alias_raw",
            F.regexp_extract(F.col("surface"), r"Reviewed by (.*?) on ", 1),
        )
        .withColumn("alias_norm", normalize_name(F.col("alias_raw")))
    )
    dict_df = alias_map.select(
        normalize_name(F.col("alias")).alias("alias_norm"), "canonical_code"
    )
    missing = known_missing.select(F.col("name_norm").alias("alias_norm"))
    return (
        nd.join(F.broadcast(missing), "alias_norm", "left_anti")
        .join(F.broadcast(dict_df), "alias_norm")
        .select(
            F.concat(F.lit("DEC-"), F.col("doc_id")).alias("subj"),
            F.lit("decided_by").alias("pred"),
            F.col("canonical_code").alias("obj"),
        )
        .transform(lambda d: d.dropDuplicates(TRIPLE_SCHEMA) if dedupe else d)
    )


def party_of_triples(mentions: DataFrame, dedupe: bool = True) -> DataFrame:
    """PARTY mentions → (PARTY-doc-NNN, party_of, DEC-doc).

    Split the "PARTIES: A vs B" surface into its two parties with
    ``posexplode`` — position order mints the 3-digit sequence
    (party-id grammar `extract-comprehensive/config.ts:214-218`).
    """
    parties = (
        mentions.filter(F.col("mention_kind") == "PARTY")
        .withColumn("a", F.regexp_extract("surface", r"PARTIES: (.*) vs (.*)", 1))
        .withColumn("b", F.regexp_extract("surface", r"PARTIES: (.*) vs (.*)", 2))
        .select("doc_id", F.posexplode(F.array("a", "b")).alias("pos", "party_name"))
    )
    return parties.select(
        F.concat(
            F.lit("PARTY-"), F.col("doc_id"), F.lit("-"),
            F.lpad((F.col("pos") + 1).cast("string"), 3, "0"),
        ).alias("subj"),
        F.lit("party_of").alias("pred"),
        F.concat(F.lit("DEC-"), F.col("doc_id")).alias("obj"),
    ).transform(lambda d: d.dropDuplicates(TRIPLE_SCHEMA) if dedupe else d)


def applies_provision_triples(matches: DataFrame, dedupe: bool = True) -> DataFrame:
    """Linked RULE matches → (DEC-doc, applies_provision, ART-entity-NNN).

    ``matches`` comes from operators/linking.py: one row per RULE mention
    with its resolved (possibly canonicalized) entity_id and rule number.
    """
    return matches.select(
        F.concat(F.lit("DEC-"), F.col("doc_id")).alias("subj"),
        F.lit("applies_provision").alias("pred"),
        F.concat(
            F.lit("ART-"), F.col("entity_id"), F.lit("-"),
            F.lpad(F.col("rule_num").cast("string"), 3, "0"),
        ).alias("obj"),
    ).transform(lambda d: d.dropDuplicates(TRIPLE_SCHEMA) if dedupe else d)
