"""Bucketed (pre-shuffled) tables for co-located joins.

A join that repeats every run (e.g. span fragments ⋈ per-document
metadata) should not pay its shuffle every run: write both sides
bucketed by the join key and Spark plans a shuffle-free sort-merge join
(zipping matching buckets). At 100 TB this turns the corpus's dominant
recurring shuffle into a one-time layout cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 64) -> None:
    """Persist ``df`` as a managed parquet table bucketed+sorted by
    ``key``. Joins between tables bucketed the same way skip the
    exchange on both sides."""
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, key).sortBy(key)
       .format("parquet").saveAsTable(table))


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
