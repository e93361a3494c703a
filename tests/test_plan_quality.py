"""Physical-plan assertions: pushdown, pruning, codegen, broadcast.

These lock in the Catalyst behaviors the engine relies on at 100 TB —
a regression here is a performance bug even when results stay correct.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_parquet(spark, tmp_path_factory):
    from decisions_knowledge_graph_data_spark.sources.corpus import documents_df
    path = str(tmp_path_factory.mktemp("plan") / "docs.parquet")
    documents_df(spark, 300).write.parquet(path)
    return path


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, docs_parquet):
    df = spark.read.parquet(docs_parquet).filter(F.col("lang") == "py").select("repo")
    explained = df._jdf.queryExecution().toString()
    assert "PushedFilters" in explained
    assert "lang" in explained.split("PushedFilters")[1][:200]


def test_column_pruning(spark, docs_parquet):
    df = spark.read.parquet(docs_parquet).select("repo", "lang")
    explained = df._jdf.queryExecution().toString()
    read_schema = explained.split("ReadSchema:")[1].splitlines()[0]
    assert "repo" in read_schema and "lang" in read_schema
    assert "content" not in read_schema  # the wide column must not be read


def test_reference_extraction_stays_jvm_side_and_narrow(spark, docs_parquet):
    """The agent-2B path must be a single narrow JVM projection over the
    scan: no Python evaluation, no shuffle. (Higher-order array lambdas
    keep it out of whole-stage codegen, but it is still compiled JVM
    expression eval — the property that matters is zero Python and zero
    exchanges.)"""
    from decisions_knowledge_graph_data_spark.operators.references import (
        reference_counts,
    )
    df = reference_counts(spark.read.parquet(docs_parquet))
    plan = _plan(df)
    assert "PythonUDF" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan  # narrow: scan → filter → project only


def test_linking_fast_paths_are_broadcast(spark, corpus20):
    from decisions_knowledge_graph_data_spark.operators.extract import (
        extract_mentions, filter_self_references,
    )
    from decisions_knowledge_graph_data_spark.operators.linking import (
        link_rule_mentions,
    )
    tables, _, _ = corpus20
    mentions = filter_self_references(extract_mentions(tables["documents"]))
    df = link_rule_mentions(
        mentions, tables["entity_registry"], tables["popular_entities"]
    )
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # dict + exact-id (+ fan-back)
    assert "SortMergeJoin" not in plan  # nothing mention-sized gets shuffled to a join
    assert "CartesianProduct" not in plan


def test_exact_dedup_single_shuffle(spark, docs_parquet):
    from decisions_knowledge_graph_data_spark.operators.dedup import exact_dedup
    df = exact_dedup(spark.read.parquet(docs_parquet), "content", "path")
    plan = _plan(df)
    assert plan.count("Exchange") == 1  # one hash-partition shuffle, nothing more
