"""Training-data assembly operators: deterministic splits, samples,
chunking, global shuffle, and contiguous sequence packing.

The family a 100-TB training-data pipeline needs BETWEEN dedup and the
trainer: assign train/val/test, re-weight a source/language mixture,
chunk documents into context windows, give the corpus a reproducible
global shuffle order, and pack variable-length docs into fixed token
budgets.

Design rules (all five operators follow them):

* **Hash-based, never RNG-based.** ``df.randomSplit`` / ``sample`` /
  ``sampleBy`` derive per-partition RNG streams from the partition
  index, so the SAME row can land in train on one run and test on the
  next whenever partitioning shifts (repartition, AQE coalescing, a
  different file split at 100 TB). Every assignment here is a pure
  function of (seed, key): stable across reshards, re-runs, engines —
  and therefore oracle-checkable.
* **Portable 60-bit hash.** ``h = int(md5(seed ':' key)[:15 hex], 16)``
  — computable bit-identically in Spark
  (``conv(substring(md5(..),1,15),16,10)``) and DuckDB
  (``CAST('0x'||substring(md5(..),1,15) AS BIGINT)``). Thresholds are
  pre-scaled to INTEGERS in the 2^60 domain driver-side, so engines
  compare int64s and never a float boundary.
* **No single-partition funnels, one full-data exchange.** The two
  order-dependent operators (shuffle rank, packing prefix-sum) ride
  ``functions/ids.py:ranked_prefix``: one range exchange, a narrow
  vectorized Arrow cumsum pass (NOT a Window.partitionBy(pid), which
  costs a hidden second full-data exchange), and a broadcast
  ``num_partitions``-row offsets fan-back.

Chunking is a narrow (shuffle-free) transform: ``sequence`` +
``explode`` + ``substr`` — at 100 TB it pipelines inside the scan
stage with zero exchanges (plan-locked in test_plan_quality.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_DOMAIN = 1 << 60  # the portable hash is uniform on [0, 2^60)


def portable_hash60(key: Column, seed: int) -> Column:
    """60-bit integer hash of ``seed ':' key`` — identical in any engine
    with md5 + hex→int (null key → null hash, matching SQL ``||``)."""
    s = F.concat(F.lit(f"{seed}:"), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash60_sql(key_sql: str, seed: int) -> str:
    """DuckDB rendering of :func:`portable_hash60` for oracle SQL —
    derived here (never hand-copied) so engine and oracle share one
    definition."""
    return (
        f"CAST(('0x' || substring(md5('{seed}:' || CAST({key_sql} AS VARCHAR)), 1, 15))"
        " AS BIGINT)"
    )


def fraction_threshold(fraction: float) -> int:
    """Integer threshold in the 2^60 domain for ``h < thr`` keep-tests.
    Shared by the operators and the DuckDB oracles (derived, never
    hand-copied)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    return min(int(fraction * HASH_DOMAIN), HASH_DOMAIN)


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer thresholds in the 2^60 domain, in dict order.

    If the fractions sum to 1 (±1e-9) the last threshold is forced to
    the full domain, so float rounding can never leave a row
    unassigned. If they sum to <1, rows past the last threshold get a
    NULL split (sample-then-split semantics).
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    cum = 0.0
    out: list[tuple[str, int]] = []
    for name, frac in splits.items():
        if frac < 0:
            raise ValueError(f"negative fraction for split {name!r}")
        cum += frac
        out.append((name, min(int(cum * HASH_DOMAIN), HASH_DOMAIN)))
    if cum > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {cum} > 1")
    if abs(cum - 1.0) <= 1e-9:
        out[-1] = (out[-1][0], HASH_DOMAIN)
    return out


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment keyed by ``key_col``.

    Every row lands in exactly one split (fractions summing to 1) or
    NULL (fractions summing to <1, i.e. subsampled corpus). The
    assignment is a pure function of (seed, key): adding data,
    repartitioning, or re-running never moves an existing key between
    splits — the property ``randomSplit`` cannot give you.
    """
    h = portable_hash60(F.col(key_col), seed)
    expr = None
    for name, thr in split_thresholds(splits):
        cond = h < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def sample_deterministic(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep each key with probability ``fraction``, deterministically.

    Unlike ``df.sample`` the decision sticks to the KEY, not the
    partition RNG stream: two tables sampled with the same (seed,
    fraction) keep the SAME keys — joinable samples for free.
    """
    thr = fraction_threshold(fraction)
    return df.filter(portable_hash60(F.col(key_col), seed) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture re-weighting
    primitive (e.g. downsample English to 30%, keep low-resource
    languages whole). Strata absent from ``fractions`` fall back to
    ``default_fraction``. One narrow filter; no shuffle, no RNG.
    """
    thr = F.lit(fraction_threshold(default_fraction))
    for stratum, frac in fractions.items():
        t = fraction_threshold(frac)
        thr = F.when(F.col(strata_col) == stratum, F.lit(t)).otherwise(thr)
    return df.filter(portable_hash60(F.col(key_col), seed) < thr)


def chunk_text(
    df: DataFrame,
    text_col: str,
    size: int,
    overlap: int = 0,
    start_col: str = "chunk_start",
    seq_col: str = "chunk_seq",
    out_col: str = "chunk_text",
) -> DataFrame:
    """Sliding-window chunking: one row per (doc, window) with the
    window's text, 1-based start offset, and 0-based sequence number.

    Windows start at 1, 1+stride, … (stride = size - overlap) while the
    start is within the text; the final window may be shorter than
    ``size``. Every character of the source is covered, and
    ``stride``-prefixes of the chunks concatenate back to the original
    (property-tested). Rows with empty/null text produce no chunks.

    Narrow transform — sequence/explode/substr pipeline inside the scan
    stage, zero exchanges (the shape that matters when the input is
    100 TB of documents).
    """
    if size <= 0 or not (0 <= overlap < size):
        raise ValueError("need size > 0 and 0 <= overlap < size")
    stride = size - overlap
    text = F.col(text_col)
    starts = F.sequence(F.lit(1), F.length(text), F.lit(stride))
    return (
        df.filter(F.length(text) > 0)
        .withColumn(start_col, F.explode(starts))
        .withColumn(seq_col, ((F.col(start_col) - 1) / stride).cast("int"))
        .withColumn(out_col, text.substr(F.col(start_col), F.lit(size)))
    )


def _hash_ordered_prefix(
    df: DataFrame,
    key_col: str,
    seed: int,
    num_partitions: int,
    tokens_col: str | None = None,
) -> DataFrame:
    """Shared scale recipe for the two order-dependent ops: attach the
    hash order key (ties broken by the key, so the order is total in
    any engine) and compute the global exclusive prefix through
    ``functions/ids.py:ranked_prefix`` — ONE full-data range exchange,
    a narrow Arrow cumsum pass, and a broadcast offsets fan-back.

    CONTRACT: ``key_col`` values must be UNIQUE and NON-NULL (same as
    :func:`global_seq`). Duplicate keys give two rows identical
    ``(_h60, key)`` sort keys, so which row precedes the other — and
    with ``tokens_col``, where a bin boundary falls between them — is
    partition-dependent; no engine-portable tiebreak exists for rows
    the sort key cannot distinguish. NULL keys hash to NULL
    (``portable_hash60`` is concat-null-propagating) and sort as one
    indistinguishable group. Dedup (operators/dedup.py) or mint a uid
    (``functions/ids.py:doc_uid``) first."""
    from decisions_knowledge_graph_data_spark.functions.ids import ranked_prefix

    clash = {"_h60", "_cum0"} & set(df.columns)
    if clash:
        raise ValueError(
            f"this operator reserves column names {sorted(clash)}; rename "
            "them on the input (ranked_prefix adds _pid/_local/_offset too)"
        )
    return ranked_prefix(
        df.withColumn("_h60", portable_hash60(F.col(key_col), seed)),
        ["_h60", key_col],
        num_partitions,
        tokens_col=tokens_col,
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    out_col: str = "shuffle_rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Reproducible global shuffle: rank 1..N in md5(seed:key) order
    (``key_col`` must be unique and non-null — see
    :func:`_hash_ordered_prefix`).

    The epoch-shuffle primitive — a different seed is a different
    epoch's order, and the order is identical across re-runs, reshards
    and engines. Scale shape: ``ranked_prefix`` — one full-data range
    exchange, never a single-partition ``ORDER BY`` window and never a
    second data-sized exchange (plan-locked)."""
    j = _hash_ordered_prefix(df, key_col, seed, num_partitions)
    return j.withColumn(out_col, F.col("_offset") + F.col("_local") + 1).drop(
        "_pid", "_offset", "_local", "_h60"
    )


def pack_contiguous(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    seed: int = 0,
    out_col: str = "bin_id",
    num_partitions: int = 32,
) -> DataFrame:
    """Contiguous sequence packing: stream docs in deterministic
    hash(seed:key) order and cut a new bin every ``budget`` tokens
    (``tokens_col`` must be non-null; ``key_col`` must be unique and
    non-null — see :func:`_hash_ordered_prefix`).

    ``bin_id = (running_sum_before_doc) DIV budget`` — the
    concat-and-split packing real LLM pipelines use (docs fill bins in
    stream order; a doc straddling a boundary belongs to the bin where
    it starts). Deterministic, embarrassingly parallel — the global
    token prefix sum is the same ``ranked_prefix`` recipe as the
    shuffle rank — and all-integer arithmetic (``DIV``, no float
    precision cliff past 2^53 tokens).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    j = _hash_ordered_prefix(df, key_col, seed, num_partitions, tokens_col)
    return (
        j.withColumn("_cum0", F.col("_offset").cast("long") + F.col("_local"))
        .withColumn(out_col, F.expr(f"_cum0 DIV {int(budget)}"))
        .drop("_pid", "_offset", "_local", "_h60", "_cum0")
    )


def group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    seed: int = 0,
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-group quota: keep at most ``k`` rows of each group — the
    domain-cap stage of a web-corpus pipeline ("at most k pages per
    host"), selecting the ``k`` smallest portable hashes of ``key_col``
    (ties by key asc), so the survivor set is a pure function of
    (seed, key): stable across reshards, re-runs, and engines — and
    oracle-checkable as a plain ``row_number() OVER (PARTITION BY
    group ORDER BY hash, key)`` in any SQL engine.

    ``key_col`` must be unique within its group (a doc id — duplicate
    keys would ride through the keep-set semi-join together). NULL keys
    hash to NULL and sort LAST on both engines (explicit
    ``asc_nulls_last`` here; DuckDB's ASC default), so they survive
    only in under-quota groups.

    Scale shape (the reason this is not one window): the naive
    formulation funnels every row of the hottest group through a single
    task's sort — a 1-billion-page host becomes a 1-billion-row window
    partition no salting or AQE can split. This runs TWO bounded
    windows instead: stage 1 partitions by ``(group, hash %
    salt_buckets)`` and keeps k per salt bucket — any global top-k row
    is top-k within its own bucket, so nothing is lost and no sort
    partition exceeds ~|group| / salt_buckets; stage 2 re-ranks the
    ≤ k·salt_buckets survivors per group. Only (group, key, hash)
    travel through the exchanges — payload columns (the document text)
    never shuffle; survivors rejoin via a semi-join on the keep-set.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    from pyspark.sql import Window

    reserved = {"_gc_h", "_gc_salt", "_gc_rn", "_gc_g", "_gc_k"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"group_cap reserves column names {sorted(reserved)}; rename "
            f"input columns {sorted(clash)} first"
        )
    keys = df.select(group_col, key_col).withColumn(
        "_gc_h", portable_hash60(F.col(key_col), seed)
    )
    order = [F.col("_gc_h").asc_nulls_last(), F.col(key_col).asc_nulls_last()]
    if salt_buckets > 1:
        keys = keys.withColumn(
            "_gc_salt", F.pmod(F.coalesce(F.col("_gc_h"), F.lit(0)), F.lit(salt_buckets))
        )
        w1 = Window.partitionBy(group_col, "_gc_salt").orderBy(*order)
        keys = (
            keys.withColumn("_gc_rn", F.row_number().over(w1))
            .filter(F.col("_gc_rn") <= k)
            .drop("_gc_rn", "_gc_salt")
        )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    keep = (
        keys.withColumn("_gc_rn", F.row_number().over(w2))
        .filter(F.col("_gc_rn") <= k)
        .select(
            F.col(group_col).alias("_gc_g"), F.col(key_col).alias("_gc_k")
        )
    )
    # null-SAFE equality: a NULL group or NULL key row that won its
    # quota slot must still rejoin (plain `on=[...]` would drop it)
    cond = F.col(group_col).eqNullSafe(F.col("_gc_g")) & F.col(
        key_col
    ).eqNullSafe(F.col("_gc_k"))
    return df.join(keep, on=cond, how="left_semi")
