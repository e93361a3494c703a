"""Two-parallelism scaling evidence for the bounded graph operators
(bfs_levels / sssp_bounded) — the same N vs 4N protocol as
tools/bench_scaling.py, on a synthetic hub-heavy directed graph.

Each leg runs in its own SparkSession, strictly sequentially (never two
Spark jobs at once on this box; the documented scaling pair is N=2 vs
4N=8 — the box is bandwidth-bound above ~8-16 workers). Output counts
must be identical across legs (output invariance), else the tool fails.

    python tools/bench_graph.py [n_edges] [lo_cores] [hi_cores]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from decisions_knowledge_graph_data_spark.operators.graph import (  # noqa: E402
    bfs_levels, sssp_bounded,
)

N_NODES_PER_EDGE = 0.15  # ~6.7 edges/node: hubby but connected


def leg(cores: int, n_edges: int, n_sources: int) -> dict:
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(8, cores * 4)))
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName(f"bench_graph_{cores}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_nodes = int(n_edges * N_NODES_PER_EDGE)
    # deterministic hub-heavy graph: src is xxhash-scattered, dst is
    # power-law-ish (square of a uniform — low ids become hubs)
    e = spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("src"),
        F.pmod(
            F.pmod(F.xxhash64(F.col("id") + 1), F.lit(n_nodes)) ** 2,
            F.lit(n_nodes),
        ).cast("long").alias("dst"),
        (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(97)) + 1).alias("w"),
    )
    srcs = spark.range(n_sources).select(F.col("id").alias("n"))
    out = {}
    t0 = time.monotonic()
    bfs = bfs_levels(e, srcs, max_hops=3)
    out["bfs_rows"] = bfs.count()
    out["bfs_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    sp = sssp_bounded(e, srcs, rounds=3)
    out["sssp_rows"] = sp.count()
    out["sssp_cost_sum"] = sp.agg(F.sum("cost")).collect()[0][0]
    out["sssp_sec"] = round(time.monotonic() - t0, 2)
    out["cores"] = cores
    out["n_sources"] = n_sources
    spark.stop()
    return out


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_sources = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    a = leg(lo, n_edges, n_sources)
    b = leg(hi, n_edges, n_sources)
    for k in ("bfs_rows", "sssp_rows", "sssp_cost_sum"):
        assert a[k] == b[k], (k, a[k], b[k])  # output invariance
    factor = hi / lo
    out = {
        "metric": "graph_ops_scaling",
        "n_edges": n_edges,
        "legs": [a, b],
        "bfs_speedup": round(a["bfs_sec"] / b["bfs_sec"], 2),
        "bfs_efficiency": round(a["bfs_sec"] / b["bfs_sec"] / factor, 2),
        "sssp_speedup": round(a["sssp_sec"] / b["sssp_sec"], 2),
        "sssp_efficiency": round(a["sssp_sec"] / b["sssp_sec"] / factor, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
