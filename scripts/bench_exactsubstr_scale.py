"""Re-measure ExactSubstr dedup at 50M docs on the round-5 linear
cut path — and PIN output parity against the round-4 measurement.

The round-4 run (BENCH_prepare_scaling.json, wall 1,215.3 s) used the
quadratic formulations this round replaced (array_contains cut probe,
slice-inside-the-lambda windows). The corpus generator
(fixtures/text_gen.py) is deterministic, so the SAME aggregate
outputs — removed tokens, docs cut, docs fully cut — must come back
bit-identical from the rewritten operator; this script asserts all
three against the recorded round-4 numbers plus the planted ground
truth (1% exact-dup clusters of 100 → 99/100 of each cluster fully
cut). A faster wall with pinned outputs is the "docstring replaced by
the measurement" evidence VERDICT r4 task 3 asked for.

    spark-submit --master local[32] --driver-memory 48g \
        --py-files dist/pdf_table_spark.zip \
        scripts/bench_exactsubstr_scale.py

    SPARK_GRAFT_CORPUS  parquet dir (default .scale/assembly_corpus_50m/corpus)
    SPARK_GRAFT_ESD_N   window size in tokens (default 10, = round 4)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.environ.get(
    "SPARK_GRAFT_CORPUS",
    os.path.join(REPO, ".scale", "assembly_corpus_50m", "corpus"))
N = int(os.environ.get("SPARK_GRAFT_ESD_N", "10"))

# the round-4 measurement on the identical deterministic corpus
# (BENCH_prepare_scaling.json: exact_substring_dedup_50m) — the
# rewritten operator is output-identical, so these must match EXACTLY
R4 = {"docs": 50_000_000, "tokens": 895_250_000,
      "removed_tokens": 17_924_451, "docs_cut": 916_731,
      "fully_cut": 495_000, "wall_sec": 1215.3}


def main():
    from pyspark.sql import functions as F

    from pdf_table_spark.ops.dedup import exact_substring_dedup
    from pdf_table_spark.spark.session import build_session

    spark = build_session("esd_scale", master="local[32]",
                          shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS).select("doc_id", "text")

    t0 = time.monotonic()
    out = exact_substring_dedup(docs, n=N, hash_fn="xxhash64")
    agg = out.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_removed").alias("removed_tokens"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_cut"),
        F.sum((F.col("n_removed") == F.col("n_tokens")).cast("long"))
        .alias("fully_cut")).collect()[0]
    wall = time.monotonic() - t0

    result = {
        "metric": "exact_substring_dedup_50m_r5", "n": N, "cores": 32,
        "wall_sec": round(wall, 1), "docs": agg["docs"],
        "tokens": int(agg["tokens"]),
        "removed_tokens": int(agg["removed_tokens"]),
        "docs_cut": int(agg["docs_cut"]),
        "fully_cut": int(agg["fully_cut"]),
        "docs_per_sec": round(agg["docs"] / wall),
        "r4_wall_sec": R4["wall_sec"],
        "speedup_vs_r4": round(R4["wall_sec"] / wall, 2),
        "note": ("round-5 linear cut path (Arrow mask sweep + "
                 "arrays_zip windows); outputs pinned == round-4 "
                 "quadratic-path run on the identical deterministic "
                 "corpus"),
    }
    if agg["docs"] == R4["docs"]:
        for k in ("tokens", "removed_tokens", "docs_cut", "fully_cut"):
            assert int(agg[k]) == R4[k], (k, int(agg[k]), R4[k])
        result["parity_vs_r4"] = "exact"
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "BENCH_prepare_scaling.json"),
              "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
