"""Bucketed co-located joins: same-bucketed tables join without any
exchange (the recurring-shuffle eliminator for repeated corpus joins)."""

import re


def test_bucketed_join_has_no_exchange(spark):
    from pyspark.sql import functions as F

    from pdf_table_spark.spark.bucketing import bucketed, write_bucketed

    left = spark.range(10000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 97).alias("v"))
    right = spark.range(10000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).alias("w"))
    write_bucketed(left, "t_left", "doc_id", n_buckets=8)
    write_bucketed(right, "t_right", "doc_id", n_buckets=8)

    joined = bucketed(spark, "t_left").join(
        bucketed(spark, "t_right"), "doc_id")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    # no shuffle on either side — buckets zip directly
    assert not re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE), plan
    assert joined.count() == 10000
    spark.sql("drop table t_left")
    spark.sql("drop table t_right")
