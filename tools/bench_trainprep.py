"""Scale evidence for the training-data assembly family
(operators/trainprep.py): run chunk→pack, deterministic shuffle, and
split+mixture-sample over an N-million-doc synthetic corpus at two
parallelism levels (fresh JVM per leg, never concurrent — measurement
hygiene per CLAUDE.md) and report throughput + scaling efficiency.

The corpus is synthesized column-natively (spark.range + repeat/concat
expressions — no Python row loops, no external data): ~1 KB of text per
doc, a 5-language mixture, deterministic by construction.

Usage: python tools/bench_trainprep.py [n_docs] [n_low] [n_high]
       (defaults 2_000_000 2 8 — the box's honest N vs 4N pair)
Prints one JSON line per leg plus a summary block to paste into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def docs_path(n_docs: int) -> str:
    # Keyed by corpus size: a cached 2M-doc corpus must never serve a
    # 10M-doc leg (the RUN_SNIPPET rank assertion would fail and the
    # leg would silently bench stale data up to that point).
    return f"/tmp/trainprep_docs_{n_docs}.parquet"

SETUP_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from decisions_knowledge_graph_data_spark.session import get_spark

spark = get_spark("trainprep-setup", parallelism=16, shuffle_partitions=16)
langs = F.array(*[F.lit(x) for x in ("en", "fr", "de", "es", "zh")])
docs = (
    spark.range({n_docs})
    .select(
        F.col("id").alias("doc_id"),
        F.element_at(langs, (F.col("id") % 5 + 1).cast("int")).alias("lang"),
        # ~1 KB deterministic text, token length varying with the id
        F.concat(
            F.lit("doc "), F.col("id").cast("string"), F.lit(" "),
            F.repeat(
                F.concat(F.lit("tok"), (F.col("id") % 97).cast("string"), F.lit(" ")),
                (F.col("id") % 64 + 96).cast("int"),
            ),
        ).alias("text"),
    )
    .repartition(64)
)
docs.write.mode("overwrite").parquet({docs_path!r})
print("setup done")
"""

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from decisions_knowledge_graph_data_spark.session import get_spark
from decisions_knowledge_graph_data_spark.operators.textstats import token_count_ws
from decisions_knowledge_graph_data_spark.operators.trainprep import (
    chunk_text, deterministic_shuffle, pack_contiguous, split_assign,
    stratified_sample,
)

spark = get_spark(
    "trainprep-bench", parallelism={cpus}, shuffle_partitions={cpus},
    extra_conf={{"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)}},
)
docs = spark.read.parquet({docs_path!r})

out = {{"cpus": {cpus}, "n_docs": {n_docs}}}


def timed(key, fn):
    # steady-state measurement: first execution pays the one-time JVM
    # JIT / codegen / Python-worker spin-up (seconds, and NOT
    # parallelizable — it would poison a scaling comparison of
    # seconds-long jobs); the timed run measures the job itself
    fn()
    t0 = time.time()
    r = fn()
    out[key] = round(time.time() - t0, 2)
    return r


out["n_chunks"] = timed(
    "chunk_sec", lambda: chunk_text(docs, "text", 512, 64).count())

toks = docs.select("doc_id", token_count_ws(F.col("text")).alias("tok"))
out["n_bins"] = timed(
    "pack_sec",
    lambda: pack_contiguous(toks, "doc_id", "tok", 8192, seed=1)
    .agg(F.countDistinct("bin_id")).first()[0],
)

mx = timed(
    "shuffle_sec",
    lambda: deterministic_shuffle(docs.select("doc_id"), "doc_id", seed=2)
    .agg(F.max("shuffle_rank")).first()[0],
)
assert mx == {n_docs}

splits = timed(
    "split_sample_sec",
    lambda: stratified_sample(
        split_assign(docs.select("doc_id", "lang"), "doc_id",
                     {{"train": 0.9, "val": 0.05, "test": 0.05}}, seed=3),
        "doc_id", "lang", {{"en": 0.3, "zh": 0.5}}, seed=4,
        default_fraction=1.0)
    .groupBy("split").count().collect(),
)
out["split_counts"] = {{r["split"]: r["count"] for r in splits}}

out["total_sec"] = round(
    out["chunk_sec"] + out["pack_sec"] + out["shuffle_sec"]
    + out["split_sample_sec"], 2)
print(json.dumps(out))
"""


def run_leg(cpus: int, n_docs: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cpus=cpus, n_docs=n_docs,
                              docs_path=docs_path(n_docs))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    leg = json.loads(line)
    print(line, flush=True)
    return leg


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    if not os.path.exists(os.path.join(docs_path(n_docs), "_SUCCESS")):
        code = SETUP_SNIPPET.format(repo=REPO, n_docs=n_docs,
                                    docs_path=docs_path(n_docs))
        subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)
    lo = run_leg(n_low, n_docs)
    hi = run_leg(n_high, n_docs)
    ratio = n_high / n_low
    eff = {
        k: round((lo[k] / hi[k]) / ratio, 2)
        for k in ("chunk_sec", "pack_sec", "shuffle_sec",
                  "split_sample_sec", "total_sec")
    }
    # per-op identity across legs: same chunk/bin/split counts
    assert lo["n_chunks"] == hi["n_chunks"]
    assert lo["n_bins"] == hi["n_bins"]
    assert lo["split_counts"] == hi["split_counts"]
    print(json.dumps({
        "n_docs": n_docs, "pair": [n_low, n_high], "efficiency": eff,
        "low": lo, "high": hi,
    }))


if __name__ == "__main__":
    main()
