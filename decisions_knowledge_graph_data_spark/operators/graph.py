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
from ..functions.barriers import lazy_checkpoint


def min_label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration hash-min label propagation over the UNDIRECTED
    closure of ``edges``: ``label'(v) = min(label(v), min over
    neighbors u of label(u))``, labels initialized to the node id.
    After k iterations every node holds the minimum node id within its
    k-hop neighborhood; run to diameter it IS connected components
    (the full CC operator with large-star/small-star acceleration
    lives in operators/canonicalize.py — this is the bounded-round,
    oracle-expressible variant). All-integer/string min semantics:
    unlike PageRank there is no floating-point at all, so cross-engine
    parity is exact by construction. Returns (node, label).

    Same plan discipline as :func:`pagerank`: two shuffles per
    iteration (neighbor join + min agg), localCheckpoint truncation,
    no driver-side state. Parallel/duplicate edges need no dedup —
    min() is idempotent over duplicates, so the symmetric union skips
    the distinct shuffle entirely.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    sym = e.unionAll(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    sym = sym.transform(lazy_checkpoint)
    nodes = sym.select(F.col("_s").alias("node")).distinct().transform(lazy_checkpoint)
    lab = nodes.withColumn("label", F.col("node"))
    for _ in range(iterations):
        nbr_min = (
            sym.join(lab, sym["_s"] == lab["node"])
            .select(F.col("_d").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("_mn"))
        )
        lab = (
            lab.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_mn"), F.col("label"))
                ).alias("label"),
            )
            .transform(lazy_checkpoint)
        )
    return lab


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
        .transform(lazy_checkpoint)
    )
    deg = e.groupBy("_src").agg(F.count("*").cast("double").alias("_deg"))
    # (src, dst, outdeg) — computed once, reused every iteration
    ed = e.join(deg, "_src").transform(lazy_checkpoint)

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
            .transform(lazy_checkpoint)
        )
    return pr


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded multi-source BFS over a directed edge DataFrame: returns
    ``(node, dist)`` with ``dist`` = MINIMUM hop count from any source
    node, for every node within ``max_hops`` (sources at dist 0). The
    k-hop-neighborhood primitive a knowledge graph queries constantly
    (everything within k citation hops of a decision; blast radius of
    an entity edit).

    ``sources`` is a single-column DataFrame of start nodes (NULLs and
    duplicates ignored). Level-synchronous frontier expansion, the
    scale-correct relational form:
      - each hop is exactly one equi-join (frontier ⋈ edges on ``src``
        — broadcast-able while the frontier is small, AQE decides) plus
        one ``distinct`` and one anti-join against the visited set;
        never a path enumeration, so hub fan-out costs |reached nodes|,
        not |paths| (a cyclic hub graph has exponentially many bounded
        paths but this never materializes them — the DuckDB oracle, by
        contrast, must carry (node, dist) pairs and min() at the end);
      - first-visit distance IS the minimum distance (the anti-join
        guarantees a node joins the frontier at its earliest level), so
        no re-aggregation pass;
      - ``localCheckpoint`` per level truncates the growing plan, the
        same discipline as ``pagerank``/the CC loop;
      - FIXED hop count, no emptiness probe per level — no driver
        action inside the loop (an empty frontier makes the remaining
        levels no-op joins on an empty side, which AQE plans away).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    visited = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .filter(F.col("node").isNotNull())
        .distinct()
        .withColumn("dist", F.lit(0))
        .transform(lazy_checkpoint)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_src"])
            .select(F.col("_dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .transform(lazy_checkpoint)
        )
        visited = visited.unionByName(nxt).transform(lazy_checkpoint)
        frontier = nxt
    return visited


def sssp_bounded(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Bounded single-source(s) shortest path — Bellman-Ford with a
    FIXED number of relaxation rounds: returns ``(node, cost)`` with
    ``cost`` = minimum total edge weight over any path of at most
    ``rounds`` hops from any source (sources at cost 0). The weighted
    sibling of :func:`bfs_levels` — "cheapest within k hops" (citation
    chains weighted by confidence, dependency edges by resolution
    cost).

    Scale shape mirrors :func:`pagerank`, not a path enumeration: each
    round is ONE equi-join (current distances ⋈ edges on ``src``) and
    ONE ``groupBy(node).min`` with map-side partial aggregation — cost
    ∝ |edges| + |reached nodes| per round, while the bounded-path SET a
    naive formulation carries is exponential on hub graphs (the DuckDB
    oracle enumerates (node, cost) pairs and is only viable because
    the oracle runs at toy scale). ``localCheckpoint`` per round
    truncates the plan; FIXED rounds keep the loop free of driver
    actions. Negative weights are fine (it is Bellman-Ford with a hop
    bound, not Dijkstra); integer weights make results engine-exact."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    # NOT checkpointed: the edge frame is re-derived per round (for a
    # parquet-backed table that is a fresh columnar scan, cheaper and
    # more parallel than a block-manager round trip of the full edge
    # set — measured in tools/bench_graph.py; bfs_levels does the same)
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"),
        F.col(weight).alias("_w"),
    )
    dist = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .filter(F.col("node").isNotNull())
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .transform(lazy_checkpoint)
    )
    for _ in range(rounds):
        relax = (
            dist.join(e, dist["node"] == e["_src"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("cost") + F.col("_w")).alias("cost"),
            )
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .transform(lazy_checkpoint)
        )
    return dist


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph of
    ``edges`` (direction, parallel edges and self-loops are normalized
    away). Returns (node, n_triangles) for every node in ≥1 triangle.

    The scale formulation is degree-ordered orientation (the classic
    node-iterator++ / Latapy scheme): orient every undirected edge from
    the (degree, id)-SMALLER endpoint to the larger, enumerate wedges
    u→v, u→w with (deg,id)(v) < (deg,id)(w), and close them against the
    oriented edge v→w. Each triangle {a<b<c} is found exactly once (at
    its smallest vertex a). The orientation is what makes this survive
    skew at 100 TB: a hub of degree D sorts LAST in the total order, so
    it generates no wedges at all — without it the wedge join explodes
    as Σ deg² (a 10M-degree hub would emit 10¹⁴ wedges); with it the
    oriented out-degree is bounded by O(√m) on any graph. Three
    data-sized shuffles total (degree agg, wedge self-join on u, the
    closing join on (v, w)) plus the final per-node agg — every one an
    equi-join/agg, so AQE skew splitting applies; no iteration, no
    driver state.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
        .distinct()
        .transform(lazy_checkpoint)  # reused by the degree agg + both joins
    )
    deg = (
        und.select(F.col("_a").alias("node"))
        .unionAll(und.select(F.col("_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("_d"))
    )
    da = deg.select(F.col("node").alias("_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("node").alias("_b"), F.col("_d").alias("_db"))
    keyed = und.join(da, "_a").join(db, "_b")
    fwd = F.struct("_da", "_a") < F.struct("_db", "_b")
    oriented = keyed.select(
        F.when(fwd, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
        F.when(fwd, F.col("_b")).otherwise(F.col("_a")).alias("_v"),
        F.when(fwd, F.col("_db")).otherwise(F.col("_da")).alias("_dv"),
    ).transform(lazy_checkpoint)  # feeds the wedge join twice + closing
    e1 = oriented.select(
        F.col("_u"), F.col("_v").alias("_w1"), F.col("_dv").alias("_d1"))
    e2 = oriented.select(
        F.col("_u"), F.col("_v").alias("_w2"), F.col("_dv").alias("_d2"))
    wedges = e1.join(e2, "_u").filter(
        F.struct("_d1", "_w1") < F.struct("_d2", "_w2"))
    closing = oriented.select(
        F.col("_u").alias("_w1"), F.col("_v").alias("_w2"))
    tri = wedges.join(closing, ["_w1", "_w2"])  # (a=_u, b=_w1, c=_w2)
    return (
        tri.select(
            F.explode(F.array("_u", "_w1", "_w2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
