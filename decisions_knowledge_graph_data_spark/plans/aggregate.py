"""Final aggregation: the merged-full-data document.

Parity target: `src/pipeline/aggregate.ts:58-146` /
`merge_full_data.ts:133-187` — after all stages, flatten/rename each
stage's output into ONE nested document per (doc_id, lang): arrays of
mentions, matches, references, and the doc's triples. In Spark this is a
set of per-stage ``collect_list(struct(...))`` aggregations joined on the
composite key — each input is aggregated *before* the join so the join
itself is 1:1 (no row explosion, no re-aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nest(df: DataFrame, keys: list[str], payload_cols: list[str], out: str,
          order_col: str | None = None) -> DataFrame:
    lst = F.collect_list(F.struct(*payload_cols)).alias(out)
    agg = df.groupBy(*keys).agg(lst)
    if order_col:
        agg = agg.withColumn(
            out, F.array_sort(F.col(out))  # struct sort: first field = order key
        )
    return agg


def merged_documents(
    docs: DataFrame,
    mentions: DataFrame,
    references: DataFrame,
    matches: DataFrame,
    triples: DataFrame,
) -> DataFrame:
    """One nested row per document — the merged-full-data analog.

    ``docs`` must carry doc_id/lang (post-ingest); mention/match structs
    are ordered by their kernel-minted sequence so output is deterministic.
    """
    m = _nest(
        mentions.select(
            "doc_id", "lang",
            F.struct("mention_seq", "mention_kind", "surface", "char_start",
                     "char_end", "cluster_id", "confidence").alias("s"),
        ).select("doc_id", "lang", "s.*"),
        ["doc_id", "lang"],
        ["mention_seq", "mention_kind", "surface", "char_start", "char_end",
         "cluster_id", "confidence"],
        "mentions", order_col="mention_seq",
    )
    mt = _nest(
        matches, ["doc_id", "lang"],
        ["rule_seq", "rule_num", "surface_title", "entity_id", "score", "matched_on"],
        "matches", order_col="rule_seq",
    )
    tr = _nest(
        triples.withColumn(
            "doc_id", F.regexp_extract("subj", r"^(?:DEC|PARTY)-([0-9a-f]{12})", 1)
        ).filter(F.col("doc_id") != ""),
        ["doc_id"], ["pred", "subj", "obj"], "triples", order_col="pred",
    )
    base = docs.select("doc_id", "lang", "md_length", "length_category")
    out = (
        base.join(m, ["doc_id", "lang"], "left")
        .join(mt, ["doc_id", "lang"], "left")
        .join(references.select("doc_id", "celex_verified", "numac_verified", "urls"),
              "doc_id", "left")
        .join(tr, "doc_id", "left")
    )
    def nz_size(c: str):
        return F.when(F.col(c).isNull(), 0).otherwise(F.size(F.col(c)))

    return out.select(
        "doc_id", "lang", "md_length", "length_category",
        "mentions", "matches",
        F.coalesce("celex_verified", F.array().cast("array<string>")).alias("celex_verified"),
        F.coalesce("numac_verified", F.array().cast("array<string>")).alias("numac_verified"),
        F.coalesce("urls", F.array().cast("array<string>")).alias("urls"),
        "triples",
        nz_size("mentions").alias("n_mentions"),
        nz_size("triples").alias("n_triples"),
    ).orderBy("doc_id", "lang")
