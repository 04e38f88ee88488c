"""spark-submit entrypoint for the corpus-preparation program.

The batch job a training-data ingest schedules after extraction:

    spark-submit --master local[32] --py-files dist/pdf_table_spark.zip \
        scripts/run_prepare.py --input /data/documents.parquet \
        --output /data/prepared

Reads ``documents(doc_id, text)``, runs the composed gate
(``ops.prepare.prepare_corpus``: exact dedup + Gopher + C4 → capped
MinHash-LSH near-dedup among survivors → broadcast-weights quality
model), writes the provenance frame (doc_id, stage, kept, clean_fp)
partitioned by stage — so the kept set and every reject class are
separately scannable — and prints ONE JSON line with the stage
distribution and wall seconds.

``--text-col`` renames a differently-named text column;
``--weights`` loads a .npz quality head instead of the literal one.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--min-stopword-hits", type=int, default=2)
    ap.add_argument("--neardup-threshold", type=float, default=0.8)
    ap.add_argument("--max-df", type=int, default=10_000)
    ap.add_argument("--max-bucket", type=int, default=10_000)
    ap.add_argument("--hash-fn", default="xxhash64",
                    choices=("xxhash64", "md5"))
    ap.add_argument("--weights", default=None,
                    help=".npz quality-head artifact (see "
                         "spark.model_stage.save_weights)")
    ap.add_argument("--checkpointed", action="store_true",
                    help="resumable per-bucket run via manifest "
                         "checkpoints (near-dedup then applies WITHIN "
                         "each bucket)")
    ap.add_argument("--part-col", default=None,
                    help="input partition column for checkpointed "
                         "runs (metadata fingerprints, pruned scans)")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--snapshot-path", default=None,
                    help="Iceberg-layout table root: resume O(1) on "
                         "unchanged snapshot id (checkpointed runs)")
    args = ap.parse_args()

    from pdf_table_spark.ops import dedup
    from pdf_table_spark.ops.prepare import prepare_corpus
    from pdf_table_spark.spark.session import build_session

    spark = build_session("pdf_table_spark.prepare")
    docs = spark.read.parquet(args.input)
    if args.text_col != "text":
        docs = docs.withColumnRenamed(args.text_col, "text")
    # keep the partition column: checkpointed runs bucket on it
    keep_cols = ["doc_id", "text"] + (
        [args.part_col] if args.part_col else [])
    docs = docs.select(*keep_cols)

    def gate(d):
        return prepare_corpus(
            d, min_words=args.min_words,
            min_stopword_hits=args.min_stopword_hits,
            neardup_threshold=args.neardup_threshold,
            max_df=args.max_df, max_bucket=args.max_bucket,
            hash_fn=args.hash_fn, weights_path=args.weights)

    t0 = time.perf_counter()
    if args.checkpointed:
        from pdf_table_spark.spark.checkpoint import run_checkpointed
        summary = run_checkpointed(
            spark, docs, args.output, n_buckets=args.n_buckets,
            part_col=args.part_col, transform=gate,
            snapshot_path=args.snapshot_path)
        wall = time.perf_counter() - t0
        dedup.release_caches()
        print(json.dumps({
            "metric": "prepare_corpus_wall", "value": round(wall, 3),
            "unit": "sec", "checkpointed": True,
            "done": len(summary["done"]),
            "skipped": len(summary["skipped"]),
            "failed": len(summary["failed"]),
        }))
        spark.stop()
        return

    out = gate(docs)
    (out.write.mode("overwrite").partitionBy("stage")
     .parquet(args.output))
    wall = time.perf_counter() - t0

    stages = {r["stage"]: r["n"] for r in
              (spark.read.parquet(args.output)
               .groupBy("stage").agg(F.count("*").alias("n"))
               .collect())}
    dedup.release_caches()
    print(json.dumps({
        "metric": "prepare_corpus_wall", "value": round(wall, 3),
        "unit": "sec", "stages": stages,
        "n_docs": sum(stages.values()),
        "kept": stages.get("kept", 0),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
