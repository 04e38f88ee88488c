"""SparkSession helpers tuned for the extraction workload.

Scale rationale (local[32] today, 1000 executors tomorrow):
  * AQE on — runtime coalescing + skew-join splitting for the ops
    queries; the extraction pipeline's skew is handled explicitly by
    page-explode + repartition (see pipeline.py).
  * Arrow batches capped: one batch must hold whole page payloads
    (a few KB each) without blowing the Python worker on a
    500-page-doc partition — 1024 rows/batch keeps batches ~2 MB
    while amortizing the per-batch Arrow/pandas overhead (measured:
    256-row batches spent ~5x the actual page-decode CPU on batch
    framing).
  * shuffle partitions default to 2x cores locally; on a real cluster
    AQE coalesces, so oversizing is safe, undersizing is not.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 1024


def build_session(app: str = "pdf_table_spark", master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # precedence: explicit arg > spark-submit --master > local[cpus].
    # Under spark-submit the PythonRunner pre-creates the JVM gateway
    # (PYSPARK_GATEWAY_PORT is set) and its conf already carries
    # --master; calling .master() here would silently discard it
    # (run_prepare/run_assemble ran at local[32] whatever was asked).
    submitted = master is None and "PYSPARK_GATEWAY_PORT" in os.environ
    if submitted:
        # the submitted conf owns master AND sizing knobs like
        # spark.sql.shuffle.partitions — only an EXPLICIT
        # shuffle_partitions argument overrides it (AQE coalesces the
        # 200 default anyway); inspecting the local fallback string
        # here would mis-size real clusters to cpus*2
        b = SparkSession.builder
        if shuffle_partitions is not None:
            b = b.config("spark.sql.shuffle.partitions",
                         str(shuffle_partitions))
    else:
        master = master or f"local[{cpus}]"
        n = (shuffle_partitions if shuffle_partitions is not None
             else (cpus * 2 if master.startswith("local") else 256))
        b = (SparkSession.builder.master(master)
             .config("spark.sql.shuffle.partitions", str(n)))
    return (
        b
        .appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # don't coalesce the reassembly/write stage below the core
        # count — the default 64 MB advisory serializes the output tail
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # let the planner pick shuffled-hash over sort-merge when its
        # size conditions hold (guide §3.1): the keyed joins here are
        # uniform small-key joins (hashes, doc ids) where the sort adds
        # nothing; sort-merge remains the fallback when sizes are
        # unknown. Scale-independent (a per-partition build-side
        # decision), not a local[32] tune.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
