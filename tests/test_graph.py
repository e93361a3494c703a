"""Fixed-iteration PageRank vs a pure-Python reference recurrence."""

from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.operators.graph import pagerank


def _reference_pagerank(edges, iterations=3, damping=0.85):
    """The exact recurrence the operator implements, in plain Python:
    pr'(v) = (1-d) + d * sum over (u,v) of pr(u)/outdeg(u); parallel
    edges contribute multiply; no dangling redistribution."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    pr = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0.0 for n in nodes}
        for u, v in edges:
            contrib[v] += pr[u] / outdeg[u]
        pr = {n: (1.0 - damping) + damping * contrib[n] for n in nodes}
    return pr


EDGES = [
    ("A", "B"), ("A", "B"),      # parallel edge: B gets A's share twice
    ("A", "C"), ("B", "C"),
    ("C", "A"), ("D", "A"),      # D has no in-edges: pr(D) -> 1-d
]


def test_pagerank_matches_reference_recurrence(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=3).collect()}
    exp = _reference_pagerank(EDGES, iterations=3)
    assert set(got) == set(exp)
    for n in exp:
        assert abs(got[n] - exp[n]) < 1e-9, (n, got[n], exp[n])
    # structural facts: the no-in-edge node holds the damping floor, and
    # C (fed by A and B) outranks everything
    assert abs(got["D"] - 0.15) < 1e-12
    assert got["C"] == max(got.values())


def test_pagerank_iteration_zero_is_uniform(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=0).collect()}
    assert got == {"A": 1.0, "B": 1.0, "C": 1.0, "D": 1.0}


def test_pagerank_plan_is_join_agg_only(spark):
    """Each iteration must stay a relational join+agg program: no
    cartesian product, no window, no Python UDF in the plan."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    plan = pagerank(df, iterations=2)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_min_label_propagation_matches_khop_reference(spark):
    """After k rounds each node holds the min node id within k hops
    (undirected); run to diameter it equals connected components."""
    from decisions_knowledge_graph_data_spark.operators.graph import (
        min_label_propagation,
    )
    # two components: chain A-B-C-D (diameter 3) and pair X-Y; plus a
    # duplicate edge (must not need dedup)
    edges = [("B", "A"), ("B", "C"), ("C", "D"), ("X", "Y"), ("B", "A")]
    df = spark.createDataFrame(edges, "src string, dst string")

    def ref(k):
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        lab = {n: n for n in adj}
        for _ in range(k):
            lab = {n: min([lab[n]] + [lab[u] for u in adj[n]]) for n in adj}
        return lab

    for k in (1, 2, 3):
        got = {r["node"]: r["label"]
               for r in min_label_propagation(df, iterations=k).collect()}
        assert got == ref(k), k
    # k=3 covers the chain diameter → labels are component minima
    assert {r["label"] for r in
            min_label_propagation(df, iterations=3).collect()} == {"A", "X"}


def test_triangle_counts_known_graph_and_normalization(spark):
    """Two triangles sharing edge 2-3 plus a pendant edge; parallel,
    reversed and self-loop edges must normalize away, and a brute-force
    reference over all node triples must agree."""
    from itertools import combinations

    from decisions_knowledge_graph_data_spark.operators.graph import (
        triangle_counts,
    )

    edges = [
        (1, 2), (2, 3), (3, 1),      # triangle {1,2,3}
        (2, 4), (3, 4),              # triangle {2,3,4} via shared 2-3
        (4, 5),                      # pendant: 5 in no triangle
        (3, 2), (2, 3), (2, 2),      # reversed dup, dup, self-loop
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}

    # brute-force cross-check on a denser random-ish graph
    dense = [(i, j) for i, j in combinations(range(9), 2)
             if (i * 7 + j * 13) % 3 != 0]
    ddf = spark.createDataFrame(dense, "src long, dst long")
    got2 = {r["node"]: r["n_triangles"]
            for r in triangle_counts(ddf).collect()}
    es = {frozenset(e) for e in dense}
    exp = {}
    for t in combinations(range(9), 3):
        if all(frozenset(p) in es for p in combinations(t, 2)):
            for n in t:
                exp[n] = exp.get(n, 0) + 1
    assert got2 == exp


def _bfs_reference(edges, sources, max_hops):
    """Plain-Python level BFS: min hop distance from any source."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        nxt = {v for u in frontier for v in adj.get(u, ())} - dist.keys()
        for v in nxt:
            dist[v] = h
        frontier = nxt
    return dist


def test_bfs_levels_matches_reference(spark):
    from decisions_knowledge_graph_data_spark.operators.graph import bfs_levels

    # cyclic graph with a node reachable at two path lengths (E: via
    # A->E dist 1 and via A->B->C->E dist 3 — min must win), a cycle
    # back to the source, and an unreachable island
    edges = [
        ("A", "B"), ("B", "C"), ("C", "E"), ("A", "E"),
        ("C", "A"),            # cycle
        ("E", "F"), ("F", "G"),
        ("X", "Y"),            # island
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    srcs = spark.createDataFrame([("A",), (None,), ("A",)], "n string")
    for k in (0, 1, 3, 5):
        got = {r["node"]: r["dist"]
               for r in bfs_levels(e, srcs, max_hops=k).collect()}
        assert got == _bfs_reference(edges, ["A"], k), k


def test_bfs_levels_multi_source_and_validation(spark):
    import pytest
    from decisions_knowledge_graph_data_spark.operators.graph import bfs_levels

    edges = [("A", "B"), ("B", "C"), ("D", "C"), ("D", "E")]
    e = spark.createDataFrame(edges, "src string, dst string")
    srcs = spark.createDataFrame([("A",), ("D",)], "n string")
    got = {r["node"]: r["dist"]
           for r in bfs_levels(e, srcs, max_hops=2).collect()}
    # C is 1 hop from D (not 2 from A); both sources at dist 0
    assert got == {"A": 0, "D": 0, "B": 1, "C": 1, "E": 1}
    with pytest.raises(ValueError, match="max_hops"):
        bfs_levels(e, srcs, max_hops=-1)


def _sssp_reference(edges, sources, rounds):
    """Plain-Python bounded Bellman-Ford: min cost within k hops."""
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v, w in edges:
            if u in dist and (v not in nxt or dist[u] + w < nxt[v]):
                nxt[v] = dist[u] + w
        dist = nxt
    return dist


def test_sssp_bounded_matches_reference(spark):
    from decisions_knowledge_graph_data_spark.operators.graph import sssp_bounded

    # cheaper-but-longer path (A->B->C->D cost 3 vs A->D cost 10, needs
    # 3 rounds to surface), a negative edge, a cycle, a tie
    edges = [
        ("A", "B", 1), ("B", "C", 1), ("C", "D", 1), ("A", "D", 10),
        ("D", "E", -2), ("E", "A", 5),
        ("A", "F", 4), ("B", "F", 3),   # tie: both reach F at cost 4
    ]
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    srcs = spark.createDataFrame([("A",)], "n string")
    for k in (0, 1, 2, 3, 6):
        got = {r["node"]: r["cost"]
               for r in sssp_bounded(e, srcs, rounds=k).collect()}
        assert got == _sssp_reference(edges, ["A"], k), k


def test_sssp_bounded_multi_source(spark):
    import pytest
    from decisions_knowledge_graph_data_spark.operators.graph import sssp_bounded

    edges = [("A", "C", 5), ("B", "C", 2), ("C", "D", 1)]
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    srcs = spark.createDataFrame([("A",), ("B",), (None,)], "n string")
    got = {r["node"]: r["cost"]
           for r in sssp_bounded(e, srcs, rounds=3).collect()}
    assert got == {"A": 0, "B": 0, "C": 2, "D": 3}
    with pytest.raises(ValueError, match="rounds"):
        sssp_bounded(e, srcs, rounds=-1)
