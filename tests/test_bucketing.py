"""Bucketed co-located joins: the write-time shuffle must buy exchange-free
joins and aggregations at read time — asserted on the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from candia_spark.operators.bucketing import write_bucketed

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("feature")
    )
    labels = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("label")
    )
    write_bucketed(docs, "bt_docs", ["doc_id"], 8)
    write_bucketed(labels, "bt_labels", ["doc_id"], 8)
    yield "bt_docs", "bt_labels"
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_labels")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    from candia_spark.operators.bucketing import bucketed_equi_join

    lt, rt = bucketed_tables
    joined = bucketed_equi_join(spark, lt, rt, on=["doc_id"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    assert joined.count() == 1000
    # values survive the bucketed round trip
    row = joined.filter(F.col("doc_id") == 10).collect()[0]
    assert row.feature == 3 and row.label == 1


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("doc_id").agg(F.sum("feature").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 1000


def test_unbucketed_join_needs_exchange(spark, bucketed_tables):
    """Control: the same join on plain DataFrames shuffles (or broadcasts)
    — proving the bucketed plan's exchange-freedom comes from the bucket
    spec, not from the data size."""
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("feature")
    )
    labels = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("label")
    )
    plan = (
        docs.hint("shuffle_merge")
        .join(labels, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan
