"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (JVM-side), designed
for 100 TB corpora: one scan, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny n-gram/stopword tables for the heuristic language ID
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for", "with", "on"],
    "fr": ["le", "la", "de", "et", "un", "une", "des", "du", "que", "pour"],
    "nl": ["de", "het", "een", "en", "van", "is", "dat", "op", "te", "met"],
}


def tokens_ws(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(F.regexp_replace(col, r"\s+", " ")), " ")


def token_count_ws(col: Column) -> Column:
    return F.size(tokens_ws(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation runs
    with a single regex pass (the GPT-style pre-tokenizer shape)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-zÀ-ÿ]+|\d+|[^\sA-Za-zÀ-ÿ\d]+"), 0)
    )


def language_id(col: Column) -> Column:
    """Heuristic language ID over stopword frequencies: argmax of per-language
    stopword hit counts among {en, fr, nl}; 'und' when nothing hits."""
    toks = F.transform(tokens_ws(F.lower(col)), lambda t: F.regexp_replace(t, r"[^a-zà-ÿ]", ""))
    scores = {
        lang: F.size(
            F.filter(toks, lambda t: t.isin(*_STOPWORDS[lang]))
        )
        for lang in _STOPWORDS
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic tie-break: en > fr > nl (fixed priority order)
    for lang in ("nl", "fr", "en"):
        out = F.when((best > 0) & (scores[lang] == best), lang).otherwise(out)
    return out


def quality_score(col: Column) -> Column:
    """Composite quality score in [0, 1]: length band + punctuation ratio +
    mean word length band + alpha ratio. Deterministic, explainable."""
    n = F.length(col)
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-zÀ-ÿ]", ""))
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    n_tokens = token_count_ws(col)
    mean_wlen = n_alpha / F.greatest(n_tokens, F.lit(1))
    len_ok = F.when((n >= 200) & (n <= 200_000), 1.0).otherwise(0.3)
    alpha_ratio = n_alpha / F.greatest(n, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_tokens, F.lit(1))
    punct_ok = F.when(punct_ratio <= 0.3, 1.0).otherwise(0.5)
    wlen_ok = F.when((mean_wlen >= 2.5) & (mean_wlen <= 12), 1.0).otherwise(0.5)
    return F.round(
        0.25 * len_ok + 0.25 * alpha_ratio * 1.25 + 0.25 * punct_ok + 0.25 * wlen_ok, 4
    )


def fingerprint(col: Column, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min rolling-hash over word
    windows → stable 64-bit content fingerprint (robust to whitespace)."""
    toks = tokens_ws(F.lower(col))
    n = F.greatest(F.size(toks) - (window - 1), F.lit(1))
    window_hashes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))),
    )
    return F.array_min(window_hashes)


def dup_word_frac(col: Column) -> Column:
    """1 - distinct_words / words over lowercased whitespace tokens,
    rounded to 4 — the repetition gate's word-level metric, shared by
    ``repetition_stats`` and the curation funnel so the two can never
    silently diverge."""
    words = tokens_ws(F.lower(col))
    return F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(words)) / F.greatest(F.size(words), F.lit(1)),
        4,
    )


def repetition_stats(
    df: DataFrame, key_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1
    shape): duplicate-word fraction plus most-frequent-n-gram and
    duplicate-n-gram character fractions, the standard pretraining-corpus
    repetition filters.

    Returns one row per input row:
      n_words           word count (whitespace tokens, lowercased)
      dup_word_frac     1 - distinct_words / words
      top_ngram         most frequent word n-gram ('' when < n words);
                        ties break count DESC then ngram DESC
      top_ngram_frac    chars covered by occurrences of top_ngram /
                        total n-gram chars
      dup_ngram_frac    chars covered by n-grams occurring >1 time /
                        total n-gram chars

    Scale: word metrics are pure column expressions (zero shuffle).
    N-gram metrics go explode -> two-level hash aggregation (map-side
    partial combine; shuffle payload is (key, ngram) only, never the
    document) -> doc-keyed join back — NOT per-row HOF counting loops,
    which are O(distinct * len) per row and melt on long documents.
    """
    from .dedup import word_ngrams

    txt = F.lower(F.col(text_col))
    words = tokens_ws(txt)
    base = df.select(
        F.col(key_col),
        F.size(words).cast("long").alias("n_words"),
        dup_word_frac(F.col(text_col)).alias("dup_word_frac"),
    )
    counts = (
        df.select(F.col(key_col), F.explode(word_ngrams(txt, n)).alias("_ng"))
        .groupBy(key_col, "_ng")
        .agg(F.count("*").alias("_cnt"))
    )
    per_doc = counts.groupBy(key_col).agg(
        F.max(F.struct(F.col("_cnt"), F.col("_ng"))).alias("_top"),
        F.sum(F.col("_cnt") * F.length("_ng")).alias("_tot_chars"),
        F.sum(
            F.when(F.col("_cnt") > 1, F.col("_cnt") * F.length("_ng")).otherwise(
                F.lit(0)
            )
        ).alias("_dup_chars"),
    )
    agg = per_doc.select(
        F.col(key_col),
        F.col("_top._ng").alias("top_ngram"),
        F.round(
            F.col("_top._cnt")
            * F.length("_top._ng")
            / F.greatest(F.col("_tot_chars"), F.lit(1)),
            4,
        ).alias("top_ngram_frac"),
        F.round(
            F.col("_dup_chars") / F.greatest(F.col("_tot_chars"), F.lit(1)), 4
        ).alias("dup_ngram_frac"),
    )
    return base.join(agg, key_col, "left").select(
        F.col(key_col),
        "n_words",
        "dup_word_frac",
        F.coalesce(F.col("top_ngram"), F.lit("")).alias("top_ngram"),
        F.coalesce(F.col("top_ngram_frac"), F.lit(0.0)).alias("top_ngram_frac"),
        F.coalesce(F.col("dup_ngram_frac"), F.lit(0.0)).alias("dup_ngram_frac"),
    )


# PII patterns, applied in this order (most-specific first so e.g. the
# national-register number is scrubbed before the broader IP/phone shapes
# can bite into it). Dialect-parity constraint: every pattern must mean
# the same thing to Java regex (Spark) and RE2 (DuckDB oracle) — no
# lookaround, no backrefs, ASCII \b only. The oracle derives its literals
# from THIS list (never hand-copied).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("natnum", r"\b[0-9]{2}\.[0-9]{2}\.[0-9]{2}-[0-9]{3}\.[0-9]{2}\b", "[NATNUM]"),
    ("iban", r"\bBE[0-9]{14}\b", "[IBAN]"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    # international form only (leading +): a bare separated-digit-run
    # pattern would eat dotted dates and case numbers
    ("phone", r"\+[0-9][0-9 ./-]{6,}[0-9]", "[PHONE]"),
]


def pii_scrub(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """PII redaction for training corpora: emails, Belgian national
    register numbers, IBANs, IPv4 addresses, international phone numbers
    → typed placeholders, plus per-type match counts (counted on the
    ORIGINAL text, so counts are order-independent).

    Pure column expressions (JVM regex, one scan, zero shuffle) — the
    shape that pipelines inside the parquet scan stage at 100 TB.
    """
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = c
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(key_col), *counts, scrubbed.alias("text_scrubbed"))


def top_terms(
    df: DataFrame,
    key_col: str,
    text_col: str,
    k: int = 3,
    min_len: int = 3,
    weighting: str = "reciprocal",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed tf-idf.

    ``weighting="reciprocal"`` scores ``(tf * 1_000_000) div (df + 1)``
    — all-integer arithmetic, bit-identical across engines (the oracle
    invariant); ``"log"`` is the textbook ``tf * ln((N+1)/(df+1))``
    (float ln is correctly-rounded-ish per libm, NOT guaranteed
    cross-engine-identical — use for ranking, not for value-hash
    comparison). Ties break score DESC, term ASC.

    Scale: explode → (doc, term) hash agg (map-side combine, key-only
    shuffle payload) → term-keyed df agg → join back on term → bounded
    per-doc window (partition size = distinct terms per doc).
    """
    toks = tokens_ws(F.lower(F.col(text_col)))
    terms = df.select(
        F.col(key_col), F.explode(toks).alias("term")
    ).filter(F.col("term").rlike(rf"^[a-zà-ÿ]{{{min_len},}}$"))
    tf = terms.groupBy(key_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    scored = tf.join(dfreq, "term")
    if weighting == "reciprocal":
        score = F.expr("(tf * 1000000) div (df_docs + 1)")
    else:
        # only the log weighting needs N — don't pay the corpus-count
        # pass + 1-row join on the default path
        n_docs = df.select(F.count("*").alias("_n"))
        scored = scored.join(F.broadcast(n_docs))
        score = F.col("tf") * F.log((F.col("_n") + F.lit(1.0)) / (F.col("df_docs") + F.lit(1.0)))
    scored = scored.withColumn("score", score)
    w = Window.partitionBy(key_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(key_col, "rank", "term", "tf", "df_docs", "score")
    )


def boilerplate_stats(
    df: DataFrame, key_col: str, text_col: str, n: int = 3, min_doc_pct: int = 10
) -> DataFrame:
    """Corpus-level boilerplate detection: an n-gram is boilerplate when
    it occurs in ≥ ``min_doc_pct``% of documents (headers, footers,
    templated legalese). Threshold is all-integer
    (``docs_with * 100 >= N * min_doc_pct``) — no float corpus fractions
    to diverge between engines.

    Per document:
      n_ngrams        total n-gram occurrences
      n_bp_distinct   distinct boilerplate n-grams present
      bp_char_frac    char fraction of n-gram occurrences that are
                      boilerplate (the removal-budget signal)

    Scale: explode → (doc, ngram) hash agg (key-only shuffle) → ngram
    doc-frequency agg → ngram-keyed join back (1 row per side per key:
    no row explosion; hot boilerplate keys are exactly the ones the
    doc-frequency agg already reduced) → doc agg → left join to keep
    short docs.
    """
    from .dedup import word_ngrams

    txt = F.lower(F.col(text_col))
    counts = (
        df.select(F.col(key_col), F.explode(word_ngrams(txt, n)).alias("_ng"))
        .groupBy(key_col, "_ng")
        .agg(F.count("*").alias("_cnt"))
    )
    dfreq = counts.groupBy("_ng").agg(F.count("*").alias("_nd"))
    n_docs = df.select(F.count("*").alias("_n"))
    bp = F.col("_nd") * 100 >= F.col("_n") * min_doc_pct
    per_doc = (
        counts.join(dfreq, "_ng")
        .join(F.broadcast(n_docs))
        .groupBy(key_col)
        .agg(
            F.sum("_cnt").alias("n_ngrams"),
            F.sum(F.when(bp, 1).otherwise(0)).alias("n_bp_distinct"),
            F.round(
                F.sum(F.when(bp, F.col("_cnt") * F.length("_ng")).otherwise(0))
                / F.greatest(F.sum(F.col("_cnt") * F.length("_ng")), F.lit(1)),
                4,
            ).alias("bp_char_frac"),
        )
    )
    return df.select(F.col(key_col)).join(per_doc, key_col, "left").select(
        F.col(key_col),
        F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
        F.coalesce("n_bp_distinct", F.lit(0)).alias("n_bp_distinct"),
        F.coalesce("bp_char_frac", F.lit(0.0)).alias("bp_char_frac"),
    )


def typicality_score(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """Corpus-LM typicality: score each document by the average corpus
    conditional probability of its word bigrams — the KenLM-filter shape
    (CCNet-style "does this look like the corpus?") built from the corpus
    itself, no external model.

    unit(w1 w2) = (corpus_count(w1 w2) * 1_000_000) div corpus_count(w1)
    typicality  = (Σ over bigram OCCURRENCES unit) div n_bigrams

    All-integer arithmetic end to end: float log-probs would make the
    per-doc sum order-dependent across engines (double addition is not
    associative), killing value-hash parity; scaled integer division is
    exact and order-free. The denominator counts ALL occurrences of w1
    (not just bigram-initial ones) — a documented, deterministic choice.

    Scale: two explode→hash-agg passes (words, bigrams; key-only shuffle
    payloads), then bigram-keyed and unigram-keyed joins where each side
    has one row per key (no explosion), then a doc-keyed agg.
    """
    from .dedup import word_ngrams

    txt = F.lower(F.col(text_col))
    uni = (
        df.select(F.explode(tokens_ws(txt)).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").alias("_c1"))
    )
    bg_counts = (
        df.select(F.col(key_col), F.explode(word_ngrams(txt, 2)).alias("_bg"))
        .groupBy(key_col, "_bg")
        .agg(F.count("*").alias("_cnt"))
    )
    bg_global = bg_counts.groupBy("_bg").agg(F.sum("_cnt").alias("_c2"))
    scored = (
        bg_counts.join(bg_global, "_bg")
        .withColumn("_w1", F.split_part(F.col("_bg"), F.lit(" "), F.lit(1)))
        .join(uni, F.col("_w1") == F.col("_w"))
        .withColumn("_unit", F.expr("(_c2 * 1000000) div _c1"))
    )
    per_doc = scored.groupBy(key_col).agg(
        F.sum("_cnt").alias("n_bigrams"),
        F.expr("sum(_cnt * _unit) div sum(_cnt)").alias("typicality"),
    )
    return df.select(F.col(key_col)).join(per_doc, key_col, "left").select(
        F.col(key_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("typicality", F.lit(0)).alias("typicality"),
    )


def text_profile(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """One-scan profile: all stats for every document."""
    c = F.col(text_col)
    return df.select(
        F.col(key_col),
        F.length(c).alias("n_chars"),
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_bpe_ish(c).alias("n_tokens_bpe"),
        language_id(c).alias("lang_id"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )
