"""spark-submit entry point: run the KG construction pipeline.

    spark-submit --py-files dist/decisions_kg_spark.zip \
        jobs/run_kg_pipeline.py --input <docs parquet> --workdir <dir>

Reads the source table in the input_hint shape
(repo, path, commit, lang, content[, content_sha256, doc_ident,
doc_date]), runs s0–s6 with checkpoint/resume, writes nodes/edges/
metrics/failures under --workdir, prints a one-line JSON summary.

On a cluster, spark-submit provides the master/executors; locally pass
e.g. ``--master local[8]`` to spark-submit itself.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--strict-invariant", action="store_true")
    ap.add_argument("--input-format", choices=["parquet", "versioned"],
                    default="parquet",
                    help="'versioned' reads a sources/versioned.py table "
                         "(the Iceberg-table analog) at --input-version "
                         "or its current pointer")
    ap.add_argument("--input-version", type=int, default=None)
    ap.add_argument("--publish-versioned", default=None, metavar="ROOT",
                    help="atomically commit s6 nodes/edges as versioned "
                         "snapshots under ROOT (time-travel-able graph)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kg-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from decisions_knowledge_graph_data_spark.plans.pipeline import run_pipeline
    from decisions_knowledge_graph_data_spark.sources.corpus import gen_registry

    if args.input_format == "versioned":
        from decisions_knowledge_graph_data_spark.sources.versioned import (
            read_snapshot,
        )
        docs = read_snapshot(spark, args.input, version=args.input_version)
    else:
        docs = spark.read.parquet(args.input)
    reg = gen_registry()
    dicts = {
        "entity_registry": spark.createDataFrame(reg.entity_registry),
        "popular_entities": spark.createDataFrame(reg.popular_entities),
        "alias_map": spark.createDataFrame(reg.alias_map),
        "known_missing": spark.createDataFrame(reg.known_missing),
        "family_map": spark.createDataFrame(reg.family_map),
    }
    out = run_pipeline(
        spark, docs, dicts, args.workdir,
        resume=args.resume, strict_invariant=args.strict_invariant,
    )
    summary = {
        "docs": out["s0_ingest"].count(),
        "mentions": out["s1_mentions"].count(),
        "matches": out["s3_matches"].count(),
        "triples": out["s5_triples"].count(),
        "nodes": out["s6_nodes"].count(),
    }
    if args.publish_versioned:
        from decisions_knowledge_graph_data_spark.plans.pipeline import publish_graph
        summary["published_versions"] = publish_graph(out, args.publish_versioned)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
