"""Structured extraction: mention scan kernel + cluster windows.

Parity targets:
  - trigger scan regex families (`regex-extractor.ts:236-408`): identifier
    (ECLI analog), name+date (court-token + FR/NL date triggers),
    case-number / provision / biblio analogs;
  - trigger clustering, gap ≤ 500 chars (`regex-extractor.ts:425-475`,
    CLUSTER_DISTANCE at :425);
  - 1200-char windows around cluster centers (`regex-extractor.ts:483-497`,
    WINDOW_SIZE at :481);
  - region confidence HIGH/MEDIUM/LOW (`regex-extractor.ts:505-553`).

Execution: one ``mapInPandas`` kernel (Arrow-batched; per family a cheap
candidate-position pass — memchr ``str.find`` or vectorized numpy shape
masks — then the raw compiled pattern anchored at each candidate; no
per-row Python UDF). Clustering is per-document, so it never shuffles: at 100 TB the
kernel is embarrassingly parallel over input splits. Cluster windows are
pure column expressions (JVM-side ``substring``) over a per-(doc, cluster)
aggregate.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.corpus import CLUSTER_DISTANCE, WINDOW_SIZE, assign_clusters
from ..functions.ids import doc_uid

# ---------------------------------------------------------------- regex families
# Identifier citation (ECLI-pattern analog, regex-extractor.ts:240-243)
RE_IDENT = r"DOC:\d{2}:\d{7}"
# Bilingual date triggers (regex-extractor.ts:308-335): numeric + FR/NL months
_MONTH_ALT = (
    "janvier|février|mars|avril|mai|juin|juillet|août|septembre|octobre"
    "|novembre|décembre|januari|februari|maart|april|mei|juni|juli"
    "|augustus|september|oktober|november|december"
)
RE_DATE = rf"(?:\d{{1,2}}/\d{{1,2}}/\d{{4}}|\d{{1,2}} (?:{_MONTH_ALT}) \d{{4}})"
# Name+date trigger: reviewer-org token followed by a date (court-token scan
# analog, regex-extractor.ts:57-151 — one compiled alternation)
RE_NAME_DATE = rf"Reviewed by .{{1,60}}? on {RE_DATE}"
# Provision snippet ("article N du Code X" analog,
# provisionSnippetExtractor.ts:50-59)
RE_RULE = r"rule \d{1,3} of (?:E\d{4}(?:X{1,2})?|[a-zéû][a-zéû -]{0,60}charter \d{3})"
# Key-list family reference (code-family analog, mapping/steps.ts:429-441)
RE_FAMILY = r"rule \d{1,3} of family-\d{2}"
# Parties header (party grammar, extract-comprehensive/config.ts:214-218)
_P_SUF = "(?:Corp|NV|GmbH|Ltd|SA|BV)"
RE_PARTY = rf"PARTIES: [A-Z][A-Za-z]+ {_P_SUF} vs [A-Z][A-Za-z]+ {_P_SUF}"
# Reference codes (referenceExtractorN8N.ts:59-69): CELEX / NUMAC / URL analogs
RE_CELEX = r"CELEX:3\d{4}[LRD]\d{4}"
RE_NUMAC = r"(?<!\d)\d{10}(?!\d)"
RE_URL = r"https://(?:lex|codex)\.example\.(?:eu|be)/[\w/.-]+"
# Case-number family (regex-extractor.ts:341-380): cassation-style dotted
# and spaced variants + EU-style C-nnn/yy. The (?<!¶ )(?<!¶) lookbehinds
# are the paragraph-reference negative filter (:362-368): a case-shaped
# token right after '¶' is a paragraph citation, not a case number.
RE_CASE_DOT = r"(?<!¶ )(?<!¶)\b[CDFGHPS]\.\d{2}\.\d{4}\.[NFD]\b"
RE_CASE_SP = r"(?<!¶ )(?<!¶)\b[CDFGHPS] \d{2} \d{4} [NFD]\b"
RE_CASE_EU = r"(?<!¶ )(?<!¶)\bC-\d{1,4}/\d{2}\b"
# Court-token + ISO-date trigger (citation-finder court+date tier input)
RE_COURT_DATE = r"\bper .{1,60}? dated \d{4}-\d{2}-\d{2}"
# Biblio scan (journal abbreviation + year + page,
# regex-extractor.ts:386-408)
RE_BIBLIO = r"\b(?:Rev|Bull|Ann|J)\. (?:Proto|Leg|Arb|Com)\. \d{4}, \d{1,4}\b"

_FAMILIES: list[tuple[str, str]] = [
    ("IDENT", RE_IDENT),
    ("NAME_DATE", RE_NAME_DATE),
    ("RULE", RE_RULE),
    ("FAMILY", RE_FAMILY),
    ("PARTY", RE_PARTY),
    ("CASE_NUM", RE_CASE_DOT),
    ("CASE_NUM", RE_CASE_SP),
    ("CASE_NUM", RE_CASE_EU),
    ("COURT_DATE", RE_COURT_DATE),
    ("BIBLIO", RE_BIBLIO),
    ("REF", RE_CELEX),
    ("REF", RE_NUMAC),
    ("REF", RE_URL),
]

# ---------------------------------------------------------------- fast matchers
# CPython's re only fast-skips on LITERAL PREFIXES; patterns that open with
# a lookbehind, \b, or a character class scan every position (~100 ms/2.4 MB
# vs ~1.5 ms for a literal-anchored pattern — measured). The matchers below
# produce the EXACT same match sets as the _FAMILIES patterns (locked by the
# raw-finditer equivalence test) via CANDIDATE GENERATION + ANCHORED MATCH:
#
#   1. generate a superset of every position where the raw pattern could
#      start — memchr-fast ``str.find`` on a required literal, or a
#      vectorized numpy shape mask over the UTF-32 codepoint array (char
#      offsets == array indices, so accents never skew positions);
#   2. run the ORIGINAL compiled pattern with ``rx.match(text, pos)`` at
#      each candidate — unlike ^/\A, lookbehinds and \b evaluate against
#      the real text before ``pos``, so the raw pattern's ¶ filters and
#      Unicode word boundaries apply bit-for-bit;
#   3. emulate ``finditer`` consumption (non-overlapping, leftmost) by
#      skipping candidates that start before the previous match's end.
#
# Round-3 rework of the round-2 post-check matchers: ~2× further kernel
# speedup, and strictly MORE exact (the old ASCII boundary post-check
# approximated re's Unicode \b).


def _codepoints(text: str, cache: dict | None = None) -> "np.ndarray":
    """UTF-32 view: one uint32 per character, index == char offset.
    ``cache`` (one dict per document, passed by the kernel) shares the
    array and derived masks across the three vectorized matchers."""
    if cache is None:
        return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    cp = cache.get("cp")
    if cp is None:
        cp = cache["cp"] = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        )
    return cp


def _digit_mask(cp: "np.ndarray", cache: dict | None = None) -> "np.ndarray":
    if cache is None:
        return (cp >= 48) & (cp <= 57)
    dig = cache.get("dig")
    if dig is None:
        dig = cache["dig"] = (cp >= 48) & (cp <= 57)
    return dig


def _plain(pattern: str):
    rx = re.compile(pattern)

    def scan(text: str, cache: dict | None = None):
        for m in rx.finditer(text):
            yield m.start(), m.end()

    return scan


def _anchored(rx: "re.Pattern", text: str, starts):
    """finditer-equivalent over a sorted candidate-start superset."""
    last_end = 0
    for p in starts:
        if p < last_end:
            continue
        m = rx.match(text, p)
        if m is not None:
            yield p, m.end()
            last_end = m.end()


def _literal_candidates(pattern: str, literals: tuple[str, ...],
                        doc_prescreen: tuple[str, ...] | None = None):
    """Every raw match starts with one of ``literals`` (by the pattern's
    own structure) → candidates via str.find, verified by the raw
    pattern. ``doc_prescreen``: skip whole docs missing a required
    mid-pattern literal (cheaper than even the find loop)."""
    rx = re.compile(pattern)

    def scan(text: str, cache: dict | None = None):
        if doc_prescreen is not None and not any(
            lit in text for lit in doc_prescreen
        ):
            return
        starts: list[int] = []
        for lit in literals:
            # per-doc cache shares the find pass between matchers that
            # anchor on the same literal (RULE and FAMILY both scan
            # "rule "); extend() copies, so the cached list stays clean
            pos = None if cache is None else cache.get(("lit", lit))
            if pos is None:
                pos = []
                p = text.find(lit)
                while p != -1:
                    pos.append(p)
                    p = text.find(lit, p + 1)
                if cache is not None:
                    cache[("lit", lit)] = pos
            starts.extend(pos)
        if len(literals) > 1:
            starts.sort()
        yield from _anchored(rx, text, starts)

    return scan


def _biblio_matcher():
    """Biblio anchors on its most selective fixed shape: the second
    ``". "`` — preceded by the journal name's last letter (o/g/b/m for
    Proto/Leg/Arb/Com) and followed by the year's first digit. From each
    anchor the match start is anchor − (len(name) + 2 + len(abbrev)) for
    name ∈ {Proto, Leg, Arb, Com} × abbrev ∈ {Rev, Bull, Ann, J} — a
    closed set of five back-offsets; the raw pattern verifies each."""
    rx = re.compile(RE_BIBLIO)
    back_offsets = sorted({
        nl + 2 + al for nl in (5, 3) for al in (3, 4, 1)
    })  # {6, 8, 9, 10, 11}

    def scan(text: str, cache: dict | None = None):
        n = len(text)
        if n < 12:
            return
        cp = _codepoints(text, cache)
        dig = _digit_mask(cp, cache)
        last = cp[:n - 3]
        anchor = (
            (cp[1:n - 2] == 46) & (cp[2:n - 1] == 32) & dig[3:]
            & ((last == 111) | (last == 103) | (last == 98) | (last == 109))
        )
        hits = np.nonzero(anchor)[0]
        if not hits.size:
            return
        starts = sorted({
            p + 1 - off for p in hits.tolist() for off in back_offsets
            if p + 1 - off >= 0
        })
        yield from _anchored(rx, text, starts)

    return scan


def _case_shape_matcher(pattern: str, punct: str):
    """Dotted/spaced case numbers are FIXED-SHAPE (len 11):
    ``L ? d d ? d d d d ? L`` with ``?`` = the separator. Candidates =
    positions where the separator sits at +1/+4/+9 and digits at +2/+5 —
    five shifted boolean ANDs on the codepoint array; the raw pattern
    (incl. the ¶ lookbehinds and \\b) then verifies each candidate."""
    rx = re.compile(pattern)
    pc = ord(punct)

    def scan(text: str, cache: dict | None = None):
        n = len(text)
        if n < 11:
            return
        cp = _codepoints(text, cache)
        dig = _digit_mask(cp, cache)
        is_p = cp == pc
        cand = (
            is_p[1:n - 9] & is_p[4:n - 6] & is_p[9:n - 1]
            & dig[2:n - 8] & dig[5:n - 5]
        )
        yield from _anchored(rx, text, np.nonzero(cand)[0].tolist())

    return scan


def _numac_re_matcher():
    """Maximal digit runs (the engine skips whole runs) filtered to
    exactly 10 — equivalent to (?<!\\d)\\d{10}(?!\\d)."""
    rx = re.compile(r"\d{10,}")

    def scan(text: str, cache: dict | None = None):
        for m in rx.finditer(text):
            if m.end() - m.start() == 10:
                yield m.start(), m.end()

    return scan


def _numac_matcher():
    """Vectorized maximal-ASCII-digit runs of length exactly 10. ``\\d``
    also matches non-ASCII Unicode decimal digits, so any document
    containing one (``str.isdigit`` over the rare >0x7F codepoints — a
    superset of re's Nd category, i.e. the fallback can only over-fire)
    falls back to the regex-run path for exact parity."""
    fallback = _numac_re_matcher()

    def scan(text: str, cache: dict | None = None):
        if not text:
            return
        cp = _codepoints(text, cache)
        hi = cp[cp > 127]
        if hi.size and any(chr(c).isdigit() for c in np.unique(hi).tolist()):
            yield from fallback(text)
            return
        dig = _digit_mask(cp, cache)
        edges = np.diff(dig.astype(np.int8))
        starts = np.nonzero(edges == 1)[0] + 1
        ends = np.nonzero(edges == -1)[0] + 1
        if dig[0]:
            starts = np.concatenate(([0], starts))
        if dig[-1]:
            ends = np.concatenate((ends, [dig.size]))
        for s, e in zip(starts.tolist(), ends.tolist()):
            if e - s == 10:
                yield s, e

    return scan


def _build_matchers():
    return [
        ("IDENT", _literal_candidates(RE_IDENT, ("DOC:",))),
        ("NAME_DATE", _literal_candidates(RE_NAME_DATE, ("Reviewed by ",))),
        ("RULE", _literal_candidates(RE_RULE, ("rule ",))),
        ("FAMILY", _literal_candidates(RE_FAMILY, ("rule ",))),
        ("PARTY", _literal_candidates(RE_PARTY, ("PARTIES: ",))),
        ("CASE_NUM", _case_shape_matcher(RE_CASE_DOT, ".")),
        ("CASE_NUM", _case_shape_matcher(RE_CASE_SP, " ")),
        ("CASE_NUM", _literal_candidates(RE_CASE_EU, ("C-",))),
        ("COURT_DATE", _literal_candidates(
            RE_COURT_DATE, ("per ",), doc_prescreen=(" dated ",))),
        ("BIBLIO", _biblio_matcher()),
        ("REF", _literal_candidates(RE_CELEX, ("CELEX:",))),
        ("REF", _numac_matcher()),
        ("REF", _literal_candidates(RE_URL, ("https://",))),
    ]

MENTION_SCHEMA = (
    "doc_id string, lang string, mention_seq int, mention_kind string, "
    "surface string, char_start long, char_end long, cluster_id int, "
    "confidence string, is_self boolean, clean_seq int, rule_seq int, "
    "doc_date string"
)


def _scan_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    matchers = _build_matchers()
    cols = ["doc_id", "lang", "mention_seq", "mention_kind", "surface",
            "char_start", "char_end", "cluster_id", "confidence", "is_self",
            "clean_seq", "rule_seq", "doc_date"]
    for pdf in batches:
        # columnar accumulators: building one dict-of-lists then a single
        # DataFrame is measurably cheaper than list-of-dicts at batch size
        acc: dict[str, list] = {c: [] for c in cols}
        for doc_id, lang, content, own, doc_date in zip(
            pdf["doc_id"], pdf["lang"], pdf["content"], pdf["doc_ident"],
            pdf["doc_date"],
        ):
            if content is None or content == "":
                continue
            hits: list[dict] = []
            doc_cache: dict = {}  # shared codepoint/digit masks per doc
            for kind, scan in matchers:
                for s, e in scan(content, doc_cache):
                    surface = content[s:e]
                    hits.append({
                        "mention_kind": kind, "surface": surface,
                        "char_start": s, "char_end": e,
                        # self-reference flag (regex-extractor.ts:252-255) —
                        # computed here so no join is ever needed for it
                        "is_self": kind == "IDENT" and own is not None
                        and surface == own,
                    })
            if not hits:
                continue
            assign_clusters(hits)
            hits.sort(key=lambda h: h["char_start"])
            # all per-doc sequence numbers are minted HERE, in position
            # order, so no downstream window/shuffle is ever needed:
            # mention_seq (raw), clean_seq (post self-ref-filter,
            # pipeline/steps.ts:246-251), rule_seq (per-kind, for the
            # provision re-merge join, pipeline/steps.ts:384-419)
            clean = 0
            rule = 0
            for seq, h in enumerate(hits, start=1):
                if not h["is_self"]:
                    clean += 1
                is_rule = h["mention_kind"] == "RULE"
                if is_rule:
                    rule += 1
                acc["doc_id"].append(doc_id)
                acc["lang"].append(lang)
                acc["mention_seq"].append(seq)
                acc["mention_kind"].append(h["mention_kind"])
                acc["surface"].append(h["surface"])
                acc["char_start"].append(h["char_start"])
                acc["char_end"].append(h["char_end"])
                acc["cluster_id"].append(h["cluster_id"])
                acc["confidence"].append(h["confidence"])
                acc["is_self"].append(h["is_self"])
                acc["clean_seq"].append(None if h["is_self"] else clean)
                acc["rule_seq"].append(rule if is_rule else None)
                acc["doc_date"].append(doc_date)
        out = pd.DataFrame(acc)
        out["clean_seq"] = out["clean_seq"].astype("Int32")
        out["rule_seq"] = out["rule_seq"].astype("Int32")
        yield out


def extract_mentions(docs: DataFrame) -> DataFrame:
    """documents(repo,path,commit,lang,content,…) → mentions table.

    Input rows with NULL/empty content are dropped first (non-empty filter,
    `extract-comprehensive/config.ts:93-94`) — a JVM-side predicate pushed
    to the scan, so empty docs never cross the Arrow boundary.
    """
    base = docs.filter(F.col("content").isNotNull() & (F.col("content") != "")).withColumn(
        "doc_id", doc_uid(F.col("repo"), F.col("path"), F.col("commit"))
    )
    for optional in ("doc_ident", "doc_date"):
        if optional not in docs.columns:
            base = base.withColumn(optional, F.lit(None).cast("string"))
    base = base.select("doc_id", "lang", "content", "doc_ident", "doc_date")
    return base.mapInPandas(_scan_kernel, schema=MENTION_SCHEMA)


def cluster_windows(mentions: DataFrame, docs: DataFrame) -> DataFrame:
    """Per-(doc, cluster) 1200-char context windows (regex-extractor.ts:483-497).

    Pure column expressions: aggregate cluster bounds, join the docs scan
    (only ``content`` + key columns are read — column pruning), substring
    around the center. No Python.
    """
    bounds = (
        mentions.filter(F.col("cluster_id") >= 0)
        .groupBy("doc_id", "cluster_id")
        .agg(
            F.min("char_start").alias("c_start"),
            F.max("char_end").alias("c_end"),
            F.count("*").alias("n_triggers"),
            F.max(F.col("mention_kind").isin("IDENT", "CASE_NUM")).alias("has_ident"),
            F.max(F.col("mention_kind").isin("NAME_DATE", "COURT_DATE")).alias("has_name_date"),
        )
        .withColumn("center", ((F.col("c_start") + F.col("c_end")) / 2).cast("long"))
    )
    keyed_docs = docs.withColumn(
        "doc_id", doc_uid(F.col("repo"), F.col("path"), F.col("commit"))
    ).select("doc_id", "content")
    half = WINDOW_SIZE // 2
    return (
        bounds.join(keyed_docs, "doc_id")
        .withColumn(
            "window",
            F.substring(
                F.col("content"),
                F.greatest(F.lit(1), (F.col("center") - half + 1).cast("int")),
                WINDOW_SIZE,
            ),
        )
        # region confidence (regex-extractor.ts:505-553): HIGH if an
        # identifier trigger is present, MEDIUM if name+date, else LOW.
        .withColumn(
            "confidence",
            F.when(F.col("has_ident"), "HIGH")
            .when(F.col("has_name_date"), "MEDIUM")
            .otherwise("LOW"),
        )
        .select("doc_id", "cluster_id", "c_start", "c_end", "n_triggers",
                "confidence", "window")
    )


def classify_jurisdiction(docs: DataFrame, mentions: DataFrame,
                          alias_map: DataFrame) -> DataFrame:
    """Priority jurisdiction classification (`regex-extractor.ts:157-226`):

      1. identifier country/region code — our DOC:rr:… ident's rr is the
         ECLI-country analog (:157-178) → ``R{rr}``;
      2. court-token map — the doc's first NAME_DATE mention's alias,
         looked up in the broadcast court dictionary's location column
         (:180-208);
      3. ``UNKNOWN`` (:210-226).

    Returns (doc_id, jurisdiction, juris_source). Tier 2 is a broadcast
    join on the normalized alias; tier 1 is a pure column expression —
    no shuffle touches the doc-sized side beyond the mention aggregate.
    """
    from ..functions.text import normalize_name

    keyed = docs
    if "doc_id" not in docs.columns:
        keyed = docs.withColumn(
            "doc_id", doc_uid(F.col("repo"), F.col("path"), F.col("commit"))
        )
    ident = F.col("doc_ident") if "doc_ident" in keyed.columns else F.lit(None).cast("string")
    t1 = F.when(
        ident.rlike(r"^DOC:\d{2}:\d{7}$"), F.concat(F.lit("R"), F.substring(ident, 5, 2))
    )
    base = keyed.select("doc_id", t1.alias("_ident_region"))

    first_alias = (
        mentions.filter(F.col("mention_kind") == "NAME_DATE")
        .withColumn(
            "_alias", F.regexp_extract("surface", r"Reviewed by (.*?) on ", 1)
        )
        .groupBy("doc_id")
        .agg(F.min_by(F.col("_alias"), F.col("mention_seq")).alias("_alias"))
        .withColumn("_alias_norm", normalize_name(F.col("_alias")))
    )
    amap = alias_map.select(
        normalize_name(F.col("alias")).alias("_alias_norm"),
        F.col("region").alias("_court_region"),
    ).dropDuplicates(["_alias_norm"])
    court = first_alias.join(F.broadcast(amap), "_alias_norm").select(
        "doc_id", "_court_region"
    )
    return (
        base.join(court, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_ident_region", "_court_region", F.lit("UNKNOWN")).alias("jurisdiction"),
            F.when(F.col("_ident_region").isNotNull(), "IDENT")
            .when(F.col("_court_region").isNotNull(), "COURT_TOKEN")
            .otherwise("UNKNOWN")
            .alias("juris_source"),
        )
    )


def filter_self_references(mentions: DataFrame) -> DataFrame:
    """Drop self-identifier mentions (`regex-extractor.ts:252-255`; date-based
    self-cite filter `src/pipeline/steps.ts:237-244`) and re-sequence the
    survivors 1..n per doc (`src/pipeline/steps.ts:246-251`).

    Both the flag and the post-filter sequence (``clean_seq``) were minted
    inside the scan kernel in position order, so this is a pure narrow
    projection — zero shuffles, still deterministic (position order, never
    arrival order; SURVEY.md §7.3).
    """
    return (
        mentions.filter(~F.coalesce(F.col("is_self"), F.lit(False)))
        .withColumn("mention_seq", F.col("clean_seq"))
        .drop("clean_seq")
    )
