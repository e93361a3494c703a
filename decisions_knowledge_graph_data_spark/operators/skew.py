"""Explicit skew handling: salting + two-stage aggregation.

The north rule (BASELINE.json:14) calls out mega-documents and hub
entities (frequently-cited decisions): a handful of keys carry a large
share of rows, so a naive groupBy/join puts one reducer on the hot key.
Three mitigations, layered:

  1. AQE skew-join splitting — on by default in session.py (runtime fix);
  2. dedup-before-expensive-op — the linking path scores each *distinct*
     surface form once (operators/linking.py), so hub mentions never fan
     into the scorer;
  3. the explicit operators here, for when the aggregation/join itself is
     the hot spot.

All salting is deterministic (xxhash64 of a caller-supplied unique
column), never random — resumability requires replayable salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def two_stage_agg(df: DataFrame, key: str, salt_src: str, aggs: dict[str, tuple],
                  n_salts: int = 32) -> DataFrame:
    """Two-stage aggregation over a skewed key.

    Stage 1 aggregates per (key, salt) — spreading a hot key over n_salts
    reducers; stage 2 re-aggregates partials per key. ``aggs`` maps output
    column name → (partial_fn_name, final_fn_name, input_col):
    e.g. {"n": ("count", "sum", "*"), "total": ("sum", "sum", "value")}.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("_salt")
    partial_exprs = []
    final_exprs = []
    for out, (p_fn, f_fn, col) in aggs.items():
        p = getattr(F, p_fn)("*" if col == "*" else col).alias(f"_p_{out}")
        partial_exprs.append(p)
        final_exprs.append(getattr(F, f_fn)(f"_p_{out}").alias(out))
    stage1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*partial_exprs)
    return stage1.groupBy(key).agg(*final_exprs)


def salted_join(fact: DataFrame, dim: DataFrame, key: str, salt_src: str,
                n_salts: int = 32, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: replicate the (small) dim n_salts times,
    salt the fact side deterministically, join on (key, salt).

    A hot fact key then lands on n_salts reducers instead of one. Use when
    the dim is too big to broadcast but the fact side is skewed; when the
    dim fits in memory, plain ``F.broadcast`` beats this.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return out.drop("_salt")


def skew_profile(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Diagnostic: per-key row counts + share of total for the top keys —
    the measurement that justifies (or rules out) salting.

    One pass over ``df`` (round-3 VERDICT nit: this used to run a
    separate ``count()`` action at build time): ``rollup`` emits the
    per-key partials AND the grand total from the same aggregation;
    ``F.grouping`` separates the total row from a genuine NULL key, and
    the 1-row total broadcasts back onto the key rows. Fully lazy — the
    caller decides when anything runs."""
    ct = df.rollup(key).agg(
        F.count("*").alias("n"), F.grouping(key).alias("_g")
    )
    total = F.broadcast(ct.filter(F.col("_g") == 1).select(F.col("n").alias("_total")))
    return (
        ct.filter(F.col("_g") == 0)
        .drop("_g")
        .crossJoin(total)
        .withColumn("share", F.round(F.col("n") / F.col("_total"), 6))
        .drop("_total")
        .orderBy(F.desc("n"), key)
        .limit(top_n)
    )
