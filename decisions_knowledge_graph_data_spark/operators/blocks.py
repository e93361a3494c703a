"""Document block transform + snippet extraction.

Parity targets:
  - HTML block transform (`src/utils/htmlTransformer.ts:48-188`): number
    content blocks 1..n in document order, mint ``{doc}:block-NNN`` ids,
    emit {blockId, plainText, elementType, charCount}, skip empties. Our
    documents are plain text, so "blocks" are paragraph/sentence segments —
    the numbering/id/skip semantics are identical and fully column-native
    (split → posexplode → filter → lpad).
  - Provision snippet extractor (`src/utils/provisionSnippetExtractor.ts:44-110`
    and citation-finder ±context windows `map-cited-decisions/
    citation-finder.ts:253-313`): ±N-char context around each pattern hit,
    whitespace-normalized, deduped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_display


def block_transform(docs: DataFrame, key_col: str = "doc_id",
                    text_col: str = "content", sep: str = r"\.\s+") -> DataFrame:
    """Split each document into blocks, number them 1..n in document order,
    mint ``{doc}:block-NNN`` ids, skip empty blocks (htmlTransformer
    semantics). Pure column expressions + posexplode."""
    blocks = docs.select(
        F.col(key_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "raw"),
    )
    return (
        blocks.withColumn("plain_text", normalize_display(F.col("raw")))
        .filter(F.length("plain_text") > 0)
        .withColumn(
            "block_id",
            F.concat(
                F.col("doc_id"), F.lit(":block-"),
                F.lpad((F.col("pos") + 1).cast("string"), 3, "0"),
            ),
        )
        .select(
            "doc_id", "block_id",
            (F.col("pos") + 1).alias("block_num"),
            F.lit("p").alias("element_type"),
            F.length("plain_text").alias("char_count"),
            "plain_text",
        )
    )


def snippet_extract(docs: DataFrame, pattern: str, context: int = 75,
                    key_col: str = "doc_id", text_col: str = "content") -> DataFrame:
    """±context-char snippets around every match of ``pattern``:
    regexp_extract_all for the hits, locate for positions, substring for
    the window, whitespace-normalized + deduped (provisionSnippetExtractor
    semantics). One scan, zero UDFs."""
    hits = docs.select(
        F.col(key_col).alias("doc_id"),
        F.col(text_col).alias("_c"),
        F.explode(
            F.array_distinct(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0))
        ).alias("hit"),
    )
    return (
        hits.withColumn("_pos", F.expr("locate(hit, _c)"))  # 1-based; 0 = miss
        .filter(F.col("_pos") > 0)
        .withColumn(
            "snippet",
            normalize_display(
                F.col("_c").substr(
                    F.greatest(F.lit(1), F.col("_pos") - context),
                    F.lit(context * 2) + F.length("hit"),
                )
            ),
        )
        .select("doc_id", "hit", "snippet")
        .dropDuplicates(["doc_id", "hit", "snippet"])
    )
