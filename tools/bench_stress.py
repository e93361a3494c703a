"""10x scale-stress leg (round-3 VERDICT item 2): the exact kg_end_to_end
job on a 20M-doc (~54 GB parquet) corpus at local[8] with a capped JVM
heap, recording wall time, per-phase times, shuffle SPILL metrics and
peak execution memory from the Spark REST API, and the triples count
(which must be invariant vs. any other parallelism/scale ladder on the
same corpus slice).

The point: round-3 evidence was a 2M-doc ladder; the shuffle phases
(link fan-back, global triple dedupe) were *extrapolated* to survive
10x. This leg measures them: a capped heap forces the shuffles to spill
rather than grow the heap, so "0 spill" is a real measurement of fit,
and any spill shows up in bytes, not as an OOM anecdote.

Usage:
  python tools/bench_stress.py setup N_DOCS          # write corpus (untimed)
  python tools/bench_stress.py run N_DOCS CPUS HEAP  # timed leg, one JSON line
e.g.  python tools/bench_stress.py setup 20000000
      python tools/bench_stress.py run 20000000 8 16g
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def docs_path(n_docs: int) -> str:
    return f"/tmp/kg_stress_docs_{n_docs}.parquet"


def setup(n_docs: int) -> None:
    from decisions_knowledge_graph_data_spark.session import get_spark
    from decisions_knowledge_graph_data_spark.sources.corpus import documents_df

    spark = get_spark("kg-stress-setup", parallelism=32, shuffle_partitions=32)
    documents_df(spark, n_docs).write.mode("overwrite").parquet(docs_path(n_docs))
    print("setup done:", docs_path(n_docs))


def _list_stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl  # e.g. http://host:4040
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def _rest_metrics(spark, exclude_stage_ids: set) -> dict:
    """Sum spill/peak-memory over the TIMED run's stages via the UI REST
    API (public monitoring surface; same numbers the History Server
    shows on a real cluster). Stages in ``exclude_stage_ids`` belong to
    the untimed warmup and are dropped, so '0 spill' describes exactly
    the measured leg."""
    stages = [
        s for s in _list_stages(spark)
        if s.get("stageId") not in exclude_stage_ids
    ]
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
    peak_exec = max(
        (s.get("peakExecutionMemory", 0) for s in stages), default=0
    )
    shuffle_write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return {
        "memory_spill_bytes": mem_spill,
        "disk_spill_bytes": disk_spill,
        "peak_stage_execution_memory_bytes": peak_exec,
        "shuffle_write_bytes": shuffle_write,
        "n_stages": len(stages),
    }


def run(n_docs: int, cpus: int, heap: str) -> None:
    from decisions_knowledge_graph_data_spark.session import get_spark
    from bench import kg_end_to_end

    spark = get_spark(
        # 32x shuffle partitions: at 20M docs a 64-partition mention
        # shuffle makes single tasks own GBs under a capped heap — more,
        # smaller partitions spill gracefully and AQE re-coalesces
        "kg-stress", parallelism=cpus, shuffle_partitions=max(cpus * 32, 64),
        extra_conf={
            # capped heap: the executor-memory analog for local mode —
            # shuffles must fit-or-spill inside it, as on a real executor
            "spark.driver.memory": heap,
            "spark.ui.enabled": "true",       # REST metrics source
            # corpus files are ~2-4 MB; default 128 MB bin-packing would
            # starve the extraction kernel of input parallelism
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    kg_end_to_end(spark, 200)  # warm codegen/JVM paths, untimed
    warmup_ids = {s.get("stageId") for s in _list_stages(spark)}
    phases: dict = {}
    t0 = time.time()
    n = kg_end_to_end(spark, n_docs, phase_times=phases, docs_path=docs_path(n_docs))
    dt = time.time() - t0
    out = {
        "n_docs": n_docs, "cpus": cpus, "heap": heap,
        "sec": round(dt, 2), "n_triples": n,
        "docs_per_sec": round(n_docs / dt, 1),
        "triples_per_sec": round(n / dt, 1),
        "phases": phases,
    }
    out.update(_rest_metrics(spark, warmup_ids))
    print(json.dumps(out))


if __name__ == "__main__":
    if sys.argv[1] == "setup":
        setup(int(sys.argv[2]))
    elif sys.argv[1] == "run":
        run(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        raise SystemExit(__doc__)
