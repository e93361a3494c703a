"""Skew evidence for the LINKING phase at stress scale (round-4 VERDICT
item 7): the 20M-doc leg proved link fits a capped heap with no spill,
but 133 s of wall deserves a key-distribution audit. This tool measures,
on the real extraction output of the stress corpus:

  1. ``name_norm`` — the fan-back join key. The north rule plants a hub
     title in ~30% of docs, so one key owns a constant fraction of all
     RULE mentions. The engine's contract: the similarity path scores
     DISTINCT surface forms (hub costs ONE scoring row) and fans back by
     BROADCAST whenever the name→candidates map is under the gate
     (operators/linking.py FANBACK_BROADCAST_THRESHOLD) — so the hot key
     never owns a shuffle reducer. This profile records the measured hot
     -key share plus whether the broadcast fan-back engaged, and the
     task-row bound salting(n_salts=32) would give IF the map ever
     outgrew the gate.
  2. the LSH ``(band_pos, band_hash)`` bucket sizes over the distinct
     surface forms + registry titles — the candidate-generation key of
     the 'lsh' strategy; its hottest bucket bounds the candidate-pair
     fanout per reducer.

Usage:  python tools/skew_profile_linking.py N_DOCS [CPUS]
(reads /tmp/kg_stress_docs_{N}.parquet — run bench_stress.py setup first)
Prints ONE JSON line; numbers are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(n_docs: int, cpus: int) -> None:
    from pyspark.sql import functions as F

    from bench import _parse_mem  # noqa: F401  (env parity with bench legs)
    from decisions_knowledge_graph_data_spark.functions.text import normalize_name
    from decisions_knowledge_graph_data_spark.operators.extract import (
        extract_mentions, filter_self_references,
    )
    from decisions_knowledge_graph_data_spark.operators.linking import (
        FANBACK_BROADCAST_PAIRS, FANBACK_BROADCAST_THRESHOLD, _with_lsh,
    )
    from decisions_knowledge_graph_data_spark.operators.skew import skew_profile
    from decisions_knowledge_graph_data_spark.session import get_spark
    from decisions_knowledge_graph_data_spark.sources.corpus import gen_registry

    path = f"/tmp/kg_stress_docs_{n_docs}.parquet"
    spark = get_spark(
        "skew-profile", parallelism=cpus, shuffle_partitions=cpus * 4,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    docs = spark.read.parquet(path)

    from pyspark import StorageLevel

    # one extraction pass feeds all three profiles (DISK_ONLY: the same
    # capped-heap-safe level the stress pipeline uses)
    rules = (
        filter_self_references(extract_mentions(docs))
        .filter(F.col("mention_kind") == "RULE")
        .select(
            normalize_name(
                F.regexp_extract("surface", r"rule \d{1,3} of (.*)$", 1)
            ).alias("name_norm")
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    n_rule = rules.count()
    top = skew_profile(rules, "name_norm", top_n=5).collect()
    top_keys = [
        {"name": r["name_norm"][:40], "n": r["n"], "share": r["share"]}
        for r in top
    ]

    distinct_names = rules.select("name_norm").distinct()
    n_names = distinct_names.count()

    # The fan-back gate in linking.py applies to the SIMILARITY-path
    # name→candidates map only (DICT and EXACT_ID names resolve on
    # broadcast fast paths and never reach it) and checks BOTH row
    # count and total candidate pairs (round-5 review: profiling all
    # distinct names against the row threshold alone misstated the
    # plan). Pairs are bounded above by n_sim_names × |registry|, so
    # `engaged` below is a sound (conservative) claim.
    reg_pdf = gen_registry()
    pop = spark.createDataFrame(reg_pdf.popular_entities).select("name_norm")
    sim_names = (
        distinct_names.join(F.broadcast(pop), "name_norm", "left_anti")
        .filter(~F.col("name_norm").rlike(r"^e\d{4}x{0,2}$"))
    )
    n_sim_names = sim_names.count()
    n_registry = len(reg_pdf.entity_registry)
    pairs_upper = n_sim_names * n_registry

    # LSH band-bucket profile over the similarity universe (distinct
    # sim-path surfaces + registry titles) — the candidate-generation
    # key of the 'lsh' strategy
    reg = spark.createDataFrame(reg_pdf.entity_registry).select(
        normalize_name(F.col("title")).alias("name_norm")
    )
    universe = sim_names.unionByName(reg).distinct()
    banded = _with_lsh(universe, "name_norm").select(
        F.concat_ws(":", "band_pos", "band_hash").alias("band_key")
    )
    band_top = skew_profile(banded, "band_key", top_n=3).collect()

    hot_share = top_keys[0]["share"] if top_keys else 0.0
    out = {
        "n_docs": n_docs,
        "n_rule_mentions": n_rule,
        "hot_name": top_keys,
        "n_distinct_names": n_names,
        "n_sim_path_names": n_sim_names,
        "sim_pairs_upper_bound": pairs_upper,
        "fanback_broadcast_engaged": (
            n_sim_names < FANBACK_BROADCAST_THRESHOLD
            and pairs_upper < FANBACK_BROADCAST_PAIRS
        ),
        "fanback_thresholds": {
            "rows": FANBACK_BROADCAST_THRESHOLD,
            "pairs": FANBACK_BROADCAST_PAIRS,
        },
        # if the fan-back ever became a shuffle, a salted join at 32
        # salts bounds the hot key's per-task rows to share*rows/32:
        "salted_task_rows_bound": int(hot_share * n_rule / 32) if top_keys else 0,
        "band_buckets_top": [
            {"key": r["band_key"], "n": r["n"], "share": r["share"]}
            for r in band_top
        ],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 32)
