"""Round-6 optimization harness (bench.py is FROZEN — extra measurements
live here, per the optimization-round contract).

Usage:
    python tools/bench_extra.py plans  [names...]   # capture explain("formatted") → plans/r06/<q>_<tag>.txt
    python tools/bench_extra.py time   [names...]   # time query .count() (bench methodology), N repeats
    python tools/bench_extra.py kg                  # kg_end_to_end phase breakdown

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
round-5 measurement scale), SPARK_GRAFT_CPUS, BENCH_EXTRA_TAG
(before|after — plan filename suffix), BENCH_EXTRA_REPEATS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "plans", "r06")

DEFAULT_QUERIES = [
    "minhash_dups", "simhash_pairs", "kg_star_triples", "top1_per_group",
    "top_orders", "exact_dedup", "embedding_topk", "md_blocks",
    "sessionize", "events_windowed", "pricing_summary",
    "simhash_hamming_check", "citation_snippets", "dimension_lookup",
    "regex_scan", "token_counts", "quality_score",
]


def _get(spark_needed=True):
    from decisions_knowledge_graph_data_spark.session import get_spark
    import __spark_entry__ as entry_mod
    import bench as bench_mod

    spark = get_spark("bench-extra", parallelism=CPUS, shuffle_partitions=CPUS)
    qs = entry_mod.queries()
    qs.update(bench_mod.BENCH_OVERRIDES)  # simhash_pairs times the prod kernel
    return spark, qs


def _explain_str(df, mode="formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def cmd_plans(names):
    spark, qs = _get()
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        out = os.path.join(PLANS_DIR, f"{name}_{TAG}.txt")
        with open(out, "w") as f:
            f.write(_explain_str(df))
        print(f"wrote {out}")


def cmd_time(names):
    spark, qs = _get()
    for name in names:
        runs = []
        n = None
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(runs)} rows={n} runs={runs}")


def cmd_kg():
    import bench as bench_mod
    from decisions_knowledge_graph_data_spark.session import get_spark
    from decisions_knowledge_graph_data_spark.sources import corpus as _corpus_mod
    from decisions_knowledge_graph_data_spark.sources.corpus import documents_df
    import hashlib

    spark = get_spark("bench-extra-kg", parallelism=CPUS, shuffle_partitions=CPUS)
    kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "60000"))
    gen_fp = hashlib.sha256(open(_corpus_mod.__file__, "rb").read()).hexdigest()[:12]
    docs_path = f"/tmp/kg_bench_docs_{kg_docs}_{gen_fp}.parquet"
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        documents_df(spark, kg_docs).write.mode("overwrite").parquet(docs_path)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))
    from pyspark import StorageLevel
    for i in range(REPEATS):
        phases: dict = {}
        t0 = time.time()
        n = bench_mod.kg_end_to_end(
            spark, kg_docs, phase_times=phases, docs_path=docs_path,
            shared_storage=StorageLevel.MEMORY_AND_DISK,
        )
        print(f"kg run {i}: total={round(time.time()-t0,3)} triples={n} phases={phases}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or DEFAULT_QUERIES
    if cmd == "plans":
        cmd_plans(names)
    elif cmd == "time":
        cmd_time(names)
    elif cmd == "kg":
        cmd_kg()
    else:
        raise SystemExit(f"unknown command {cmd}")
