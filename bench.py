"""Benchmark runner. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the end-to-end KG
pipeline (distributed synthetic corpus → mentions → linking →
canonicalization → triples) whose triples/sec is the BASELINE.json metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_DOCS = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "60000"))

HEADLINE = [
    "pricing_summary", "top_orders", "top1_per_group", "dimension_lookup",
    "sessionize", "regex_scan", "token_counts", "quality_score",
    "exact_dedup", "minhash_dups", "simhash_pairs", "embedding_topk",
    "events_windowed", "md_blocks", "citation_snippets",
    # round-3 additions: the oracle-checked flagship twin and the
    # oracle-checked simhash banding (compare like-for-like vs r2 by
    # excluding these two)
    "kg_star_triples", "simhash_hamming_check",
]


def _simhash_prod(spark, sf_dir):
    """Bench override: the board query `simhash_pairs` switched to the
    md5-portable signature in round 4 (to gain a DuckDB oracle), but the
    BENCH entry keeps timing the PRODUCTION xxhash64 kernel — the same
    workload rounds 1-3 timed — so cross-round comparisons stay
    like-for-like and the production path does not go untimed."""
    from pyspark.sql import functions as F  # noqa: F401  (parity with queries)
    from decisions_knowledge_graph_data_spark.operators.dedup import simhash_dup_pairs
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return simhash_dup_pairs(d, "doc_id", "text", max_hamming=3)


# name → bench-specific callable overriding queries()[name]
BENCH_OVERRIDES = {"simhash_pairs": _simhash_prod}


def kg_end_to_end(spark, n_docs: int, phase_times: dict | None = None,
                  docs_path: str | None = None, shared_storage=None):
    """Full pipeline; returns n_triples. Pass phase_times={} to collect
    per-phase wall times. With ``docs_path`` the corpus is read from
    parquet (the north-rule shape: the job *reads a source table*);
    otherwise it is generated distributedly in-line.

    ``shared_storage``: StorageLevel for the two shared intermediates
    (mentions, matches). Default None → DISK_ONLY, the capped-heap-safe
    choice (see the comment below). Callers whose heap comfortably
    exceeds the intermediate size may pass a serialized memory level
    (``MEMORY_AND_DISK`` — PySpark levels are serialized) to skip the
    disk round-trip; ``main()`` below picks that automatically when the
    corpus is small relative to the driver heap (round-4 VERDICT item
    5), and the 16g stress leg keeps exercising the DISK_ONLY default."""
    from decisions_knowledge_graph_data_spark.operators.canonicalize import (
        apply_canonical, canonical_map,
    )
    from decisions_knowledge_graph_data_spark.operators.extract import (
        extract_mentions, filter_self_references,
    )
    from decisions_knowledge_graph_data_spark.operators.linking import (
        link_family_mentions, link_rule_mentions,
    )
    from decisions_knowledge_graph_data_spark.operators.triples import (
        applies_provision_triples, cites_triples, decided_by_triples, party_of_triples,
    )
    from decisions_knowledge_graph_data_spark.sources.corpus import (
        documents_df, gen_registry,
    )

    import time as _time

    t = _time.time()
    marks = phase_times if phase_times is not None else {}

    def mark(name):
        nonlocal t
        marks[name] = round(_time.time() - t, 2)
        t = _time.time()

    reg = gen_registry()
    if docs_path:
        docs = spark.read.parquet(docs_path)
    else:
        docs = documents_df(spark, n_docs).persist()
        docs.count()
    mark("gen")
    tables = {
        "entity_registry": spark.createDataFrame(reg.entity_registry),
        "popular_entities": spark.createDataFrame(reg.popular_entities),
        "alias_map": spark.createDataFrame(reg.alias_map),
        "known_missing": spark.createDataFrame(reg.known_missing),
        "family_map": spark.createDataFrame(reg.family_map),
    }
    # The shared intermediates (mentions → five branches, matches → two)
    # are persisted DISK_ONLY and materialized once by an explicit count.
    # The 20M-doc capped-heap legs showed the failure modes of the
    # alternatives at corpus scale: localCheckpoint unrolls DESERIALIZED
    # row partitions (8 concurrent ~100 MiB unrolls OOM a 16g heap —
    # broadcast-join branches inherit the scan's fine partitioning, so
    # BOTH intermediates live at corpus granularity), while default
    # MEMORY_AND_DISK persist EVICTS under pressure and trips Spark 4's
    # CacheManager.tryRebuildCacheEntry NPE via AQE's
    # TableCacheQueryStage. DISK_ONLY columnar blocks never evict and
    # never hold deserialized rows — memory stays bounded at any corpus
    # size, and the cached relation still serves every branch once.
    from pyspark import StorageLevel

    level = shared_storage or StorageLevel.DISK_ONLY
    mentions = filter_self_references(extract_mentions(docs)).persist(level)
    mentions.count()
    mark("extract")
    matches = (
        link_rule_mentions(
            mentions, tables["entity_registry"], tables["popular_entities"]
        )
        .unionByName(
            link_family_mentions(mentions, tables["family_map"], tables["entity_registry"])
        )
        .persist(level)
    )
    matches.count()
    mark("link")
    canon = canonical_map(tables["entity_registry"])
    mark("canon")
    # one global dedupe instead of four per-branch shuffles
    triples = (
        cites_triples(mentions, docs, dedupe=False)
        .unionByName(decided_by_triples(mentions, tables["alias_map"],
                                        tables["known_missing"], dedupe=False))
        .unionByName(party_of_triples(mentions, dedupe=False))
        .unionByName(applies_provision_triples(apply_canonical(matches, canon),
                                               dedupe=False))
        .dropDuplicates(["subj", "pred", "obj"])
    )
    n = triples.count()
    mark("triples")
    if not docs_path:
        docs.unpersist()
    mentions.unpersist()
    matches.unpersist()
    return n


def _parse_mem(s: str) -> int:
    s = s.strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    return int(float(s[:-1]) * mult[s[-1]]) if s[-1] in mult else int(s)


def main() -> None:
    from decisions_knowledge_graph_data_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("kg-bench", parallelism=CPUS, shuffle_partitions=CPUS)
    qs = entry_mod.queries()
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1

    # Repeats (round-5): this firecracker guest suffers intermittent
    # multi-second hypervisor stalls (see BENCH/BASELINE.md, round-5
    # host-degradation note: code-identical runs swing 2-4x while CPU
    # microbenchmarks stay flat). Each measurement therefore runs
    # SPARK_GRAFT_REPEATS times (default 2) and reports the MIN — the
    # standard noise-floor estimator — with every raw run disclosed in
    # query_runs / kg_runs so nothing is hidden.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "2")))
    timings: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            df = BENCH_OVERRIDES.get(name, qs[name])(spark, SF_DIR)
            n = df.count()
            runs.append(round(time.time() - t0, 3))
        dt = min(runs)
        timings[name] = dt
        query_runs[name] = runs
        total += dt
        print(f"# {name}: {n} rows in {dt}s (runs: {runs})", file=sys.stderr)

    # North-rule shape (BASELINE.json input_hint): the KG job READS a
    # source table; corpus synthesis is test scaffolding and is written
    # once, untimed — the same setup/leg protocol as
    # tools/bench_scaling.py. Small scan splits so the 32-thread
    # extraction kernel isn't starved by 128 MB bin-packing of a
    # ~160 MB corpus. The cache path is keyed by doc count AND a hash
    # of the generator source, so a corpus.py change (or a stale /tmp
    # leftover from an older build) regenerates instead of silently
    # benchmarking old data.
    import hashlib
    from decisions_knowledge_graph_data_spark.sources import corpus as _corpus_mod
    from decisions_knowledge_graph_data_spark.sources.corpus import documents_df
    gen_fp = hashlib.sha256(
        open(_corpus_mod.__file__, "rb").read()
    ).hexdigest()[:12]
    docs_path = f"/tmp/kg_bench_docs_{KG_DOCS}_{gen_fp}.parquet"
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        documents_df(spark, KG_DOCS).write.mode("overwrite").parquet(docs_path)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))
    # Shared-intermediate storage (round-4 VERDICT item 5): serialized
    # memory (with disk overflow) when the corpus is SMALL relative to
    # the heap — intermediates then never approach eviction, which is
    # the regime where Spark 4's CacheManager NPE lived — else the
    # never-evicting DISK_ONLY default. The guard is deliberately
    # conservative: it budgets 8x the corpus bytes (mentions + matches
    # + columnar cache overhead) against a QUARTER of the heap, i.e.
    # the memory level only engages when the corpus is under heap/32 —
    # the 16g / 20M stress leg stays on DISK_ONLY by construction.
    from pyspark import StorageLevel
    corpus_bytes = sum(
        os.path.getsize(os.path.join(docs_path, f))
        for f in os.listdir(docs_path) if f.endswith(".parquet")
    )
    heap_bytes = _parse_mem(os.environ.get("SPARK_DRIVER_MEM", "24g"))
    level = (
        StorageLevel.MEMORY_AND_DISK
        if corpus_bytes * 8 < heap_bytes // 4
        else StorageLevel.DISK_ONLY
    )
    print(f"# shared_storage: {level} (corpus {corpus_bytes >> 20} MiB, "
          f"heap {heap_bytes >> 30} GiB)", file=sys.stderr)
    kg_runs: list[float] = []
    for _ in range(repeats):
        t0 = time.time()
        n_triples = kg_end_to_end(spark, KG_DOCS, docs_path=docs_path,
                                  shared_storage=level)
        kg_runs.append(round(time.time() - t0, 3))
    kg_dt = min(kg_runs)
    timings["kg_end_to_end"] = kg_dt
    total += kg_dt
    triples_per_sec = round(n_triples / kg_dt, 1) if kg_dt else 0.0
    print(
        f"# kg_end_to_end: {n_triples} triples from {KG_DOCS} docs in {kg_dt}s "
        f"({triples_per_sec} triples/s; runs: {kg_runs})",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "kg_construct_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "timing": f"min of {repeats} runs per query (SPARK_GRAFT_REPEATS;"
                  " raw runs in query_runs/kg_runs — this host stalls in"
                  " waves, see BENCH/BASELINE.md round-5 notes)",
        "query_runs": query_runs,
        "kg_runs": kg_runs,
        "sf": sf,
        "kg_docs": KG_DOCS,
        "kg_triples": n_triples,
        "triples_per_sec": triples_per_sec,
        "docs_per_sec": round(KG_DOCS / kg_dt, 1) if kg_dt else 0.0,
        "cpus": CPUS,
        "scaling": "see BENCH/BASELINE.md: efficiency 1.03 at N=1 vs 4N=4 cores on 2M docs (round-5 final code: 1013.6s vs 245.4s, identical 10,899,153 triples; cross-round repeat band 0.91-1.03) + 10x stress RE-RUN on round-5 code: 20M docs / 54 GB under a 16g heap cap — local[8] 1072s ZERO spill, local[16] 582s (eff 0.92) graceful spill, identical 138,981,374 triples both legs and both rounds; linking skew audit: hub title = 23.4% of 26M RULE mentions, resolved via 104-distinct-name broadcast fan-back (never a shuffle hot spot); trainprep assembly family (tools/bench_trainprep.py, steady-state legs): eff 0.86 at 1v4 / 0.74 at 2v8 on 2M docs, HOLDS at 5x data (0.73 at 2v8 on 10M docs, per-op chunk 0.80 pack 0.71 shuffle 0.83 split 0.91, identical outputs every leg; runtimes linear in data)",
    }))


if __name__ == "__main__":
    main()
