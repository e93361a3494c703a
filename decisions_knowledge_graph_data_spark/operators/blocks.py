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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_display


def match_positions(text: Column, pattern: str) -> Column:
    """``array<struct<start,hit>>`` of EVERY regex match (1-based start).

    Linear, JVM-side: split the text on the pattern (segments between
    matches) + regexp_extract_all (the matches), then one ``aggregate``
    over the zipped (segment, hit) pairs accumulates running offsets.
    No Python, no O(n²) re-scanning."""
    segs = F.split(text, pattern)
    hits = F.regexp_extract_all(text, F.lit(pattern), 0)
    pairs = F.arrays_zip(
        F.slice(segs, 1, F.size(hits)).alias("seg"), hits.alias("hit")
    )
    zero = F.struct(
        F.lit(1).cast("long").alias("pos"),
        F.expr("CAST(array() AS array<struct<start:bigint,hit:string>>)").alias("out"),
    )
    return F.aggregate(
        pairs,
        zero,
        lambda a, x: F.struct(
            (a["pos"] + F.length(x["seg"]) + F.length(x["hit"])).alias("pos"),
            F.concat(
                a["out"],
                F.array(F.struct(
                    (a["pos"] + F.length(x["seg"])).alias("start"),
                    x["hit"].alias("hit"),
                )),
            ).alias("out"),
        ),
        lambda a: a["out"],
    )


def sentence_snippet(text: Column, pos: Column, hit_len: Column,
                     context: int = 300) -> Column:
    """±context window around (pos, hit_len) ALIGNED to sentence boundaries
    (`map-cited-decisions/citation-finder.ts:253-313`): the lead is trimmed
    to start after the last '. ' inside the window, the trail is cut at the
    first '. '. Falls back to the raw ±context edges when no boundary is in
    range (substring_index returns the whole string on a miss)."""
    lead_len = F.least(pos - 1, F.lit(context)).cast("int")
    lead_raw = text.substr((pos - lead_len).cast("int"), lead_len)
    lead = F.substring_index(lead_raw, ". ", -1)
    hit = text.substr(pos.cast("int"), hit_len.cast("int"))
    trail_raw = text.substr((pos + hit_len).cast("int"), F.lit(context))
    trail = F.substring_index(trail_raw, ". ", 1)
    return normalize_display(F.concat(lead, hit, trail))


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
    """±context-char snippet around EVERY occurrence of ``pattern`` (the
    reference emits per-occurrence windows — provisionSnippetExtractor.ts /
    citation-finder.ts; round 1 only covered each hit's first position),
    whitespace-normalized and deduped on the normalized snippet. One scan,
    zero UDFs."""
    hits = docs.select(
        F.col(key_col).alias("doc_id"),
        F.col(text_col).alias("_c"),
        F.explode(match_positions(F.col(text_col), pattern)).alias("m"),
    )
    return (
        hits.select(
            "doc_id",
            F.col("m.hit").alias("hit"),
            normalize_display(
                F.col("_c").substr(
                    F.greatest(F.lit(1), (F.col("m.start") - context).cast("int")),
                    F.lit(context * 2) + F.length("m.hit"),
                )
            ).alias("snippet"),
        )
        .dropDuplicates(["doc_id", "hit", "snippet"])
    )
