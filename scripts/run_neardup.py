"""spark-submit entrypoint for the incremental near-dup ingest gate.

The streaming job a training-data ingest runs CONTINUOUSLY (or per
arrival wave, with ``availableNow`` draining whatever landed since the
last run):

    spark-submit --master local[32] --py-files dist/pdf_table_spark.zip \
        scripts/run_neardup.py --input /data/arrivals \
        --output /data/deduped --index /data/neardup_index \
        --checkpoint /data/neardup_ckpt

Watches ``--input`` for new parquet files of ``documents(doc_id,
text)``, MinHash-LSH-dedupes every micro-batch against the persistent
band index of everything ingested so far
(``streaming.neardup.run_neardup_stream``), appends survivors to
``--output`` and their band/signature rows to ``--index`` — all
exactly-once per file (source offset log + batch_id-partitioned
dynamic overwrite). Prints ONE JSON line with the wave's counts.

Re-running with no new files is a cheap no-op (trigger overhead only);
re-running after a kill replays at most one batch, which rewrites its
own partitions instead of appending duplicates.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--sim-threshold", type=float, default=0.8)
    ap.add_argument("--max-bucket", type=int, default=64)
    ap.add_argument("--max-files-per-trigger", type=int, default=64)
    args = ap.parse_args()

    from pdf_table_spark.spark.session import build_session
    from pdf_table_spark.streaming.neardup import run_neardup_stream

    spark = build_session("neardup_ingest")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()
    run_neardup_stream(
        spark, args.input, args.output, args.index, args.checkpoint,
        sim_threshold=args.sim_threshold, max_bucket=args.max_bucket,
        max_files_per_trigger=args.max_files_per_trigger)
    wall = time.monotonic() - t0

    out = spark.read.parquet(args.output)
    n_out = out.count()
    n_batches = out.select("batch_id").distinct().count()
    print(json.dumps({
        "survivors_total": n_out, "batches_total": n_batches,
        "wall_sec": round(wall, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
