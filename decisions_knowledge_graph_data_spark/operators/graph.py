"""Iterative graph algorithms over edge DataFrames.

The engine's canonicalization already runs one iterative graph kernel
(alternating large-star/small-star connected components,
``operators/canonicalize.py``); this module adds the other classic —
fixed-iteration damped PageRank — as a reusable operator over any
``(src, dst)`` edge DataFrame, e.g. the ``cites`` triples the pipeline
emits (`src/pipeline/steps.ts:202-262` mints the citation edges this
would rank).

Design for scale (the same discipline as the CC loop):
  - each iteration is exactly two shuffles — one join of the rank
    vector with the edge list on ``src`` (both sides hash-partitioned
    on the same key, so a bucketed/pre-partitioned edge table makes
    the join side exchange-free across iterations), and one
    ``groupBy(dst).sum`` with map-side partial aggregation;
  - ``localCheckpoint`` per iteration truncates the logical plan —
    without it iteration k re-analyzes a 2^k-deep join tree;
  - no driver-side state: the rank vector never leaves the executors;
  - FIXED iteration count, no convergence test — deterministic output
    (a tolerance check would need a driver action per iteration and
    make results depend on float noise).

The recurrence is the standard damped form without dangling-mass
redistribution: ``pr'(v) = (1-d) + d * Σ_{(u,v)∈E} pr(u)/outdeg(u)``
(parallel edges contribute multiply; nodes without in-edges hold
``1-d``). That keeps the operator a pure two-shuffle relational
program — and makes it expressible as chained SQL CTEs, which is what
the DuckDB oracle for the ``graph_pagerank`` driver query runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration damped PageRank. Returns (node, pr).

    ``edges`` is any DataFrame with ``src``/``dst`` columns (parallel
    edges allowed and meaningful). Ranks start at 1.0 for every node
    that appears as a source or destination.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("_src").agg(F.count("*").cast("double").alias("_deg"))
    # (src, dst, outdeg) — computed once, reused every iteration
    ed = e.join(deg, "_src").localCheckpoint(eager=False)

    pr = nodes.withColumn("pr", F.lit(1.0))
    for _ in range(iterations):
        contrib = (
            ed.join(pr, ed["_src"] == pr["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("pr") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr
