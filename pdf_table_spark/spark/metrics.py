"""Extraction metrics — the A10 rollup (reference per-stage timing
dicts, ``ocr_system_task.py:646-660`` + percentile report
``benchmark_utils.py:13-49``) re-expressed as DataFrames.

Two layers:
  * content metrics  — per-doc / per-kind output statistics computed
    from the pipeline output itself (pure DataFrame aggs);
  * run lineage      — the checkpoint manifests (wall time, rows,
    fingerprints) loaded back as a DataFrame for percentile queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def content_metrics(flat_out: DataFrame) -> DataFrame:
    """Per-kind span statistics over flattened output."""
    return flat_out.groupBy("kind").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.avg(F.length("text")).alias("avg_chars"),
        F.expr("percentile_approx(length(text), 0.5)").alias("p50_chars"),
        F.expr("percentile_approx(length(text), 0.95)").alias("p95_chars"),
        F.max(F.length("text")).alias("max_chars"),
    )


def doc_metrics(flat_out: DataFrame) -> DataFrame:
    """Per-doc span counts (skew diagnosis: the F-G tail shows up
    here)."""
    return flat_out.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kind") == "table_html", 1).otherwise(0))
        .alias("n_tables"),
        F.sum(F.when(F.col("kind") == "paragraph", 1).otherwise(0))
        .alias("n_paragraphs"),
        F.sum(F.length("text")).alias("total_chars"),
    )


def lineage_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Checkpoint manifests → lineage DataFrame with latency stats."""
    from .checkpoint import read_manifests
    rows = read_manifests(out_dir)
    if not rows:
        return spark.createDataFrame(
            [], "run_id string, partition_id int, doc_count long, "
                "output_rows long, wall_sec double, status string")
    return spark.createDataFrame(rows).select(
        "run_id", "partition_id", "doc_count", "output_rows",
        "wall_sec", "status")


def lineage_rollup(lineage: DataFrame) -> DataFrame:
    return lineage.groupBy("run_id").agg(
        F.count("*").alias("n_partitions"),
        F.sum("doc_count").alias("docs"),
        F.sum("output_rows").alias("rows_out"),
        F.sum("wall_sec").alias("total_wall_sec"),
        F.expr("percentile_approx(wall_sec, 0.5)").alias("p50_wall_sec"),
        F.expr("percentile_approx(wall_sec, 0.95)").alias("p95_wall_sec"),
        F.max("wall_sec").alias("max_wall_sec"),
    )
