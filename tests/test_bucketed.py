"""Bucketed co-located join: zero exchanges on the join key."""

from pyspark.sql import functions as F

from decisions_knowledge_graph_data_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark, corpus20):
    tables, _, _ = corpus20
    docs = tables["documents"].select("repo", "path", "commit", "lang", "md_length")
    from decisions_knowledge_graph_data_spark.functions.ids import doc_uid
    keyed = docs.withColumn("doc_id", doc_uid(F.col("repo"), F.col("path"), F.col("commit")))

    import shutil
    for t in ("b_docs", "b_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_bucketed(keyed.select("doc_id", "lang", "md_length"), "b_docs", "doc_id", 8)
    write_bucketed(
        keyed.select("doc_id", F.col("repo").alias("repo2")), "b_meta", "doc_id", 8
    )
    # force the sort-merge path (at real scale neither side broadcasts);
    # bucket co-location must then eliminate the shuffle entirely
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_docs", "b_meta", "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert joined.count() == keyed.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_meta")
