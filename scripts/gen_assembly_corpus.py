"""Generate the ground-truth assembly-bench corpus + benchmark table
(fixtures/text_gen.py) at a given size.

    spark-submit --master local[32] --py-files dist/pdf_table_spark.zip \\
        scripts/gen_assembly_corpus.py --n-docs 50000000 \\
        --n-bench 400000 --out /root/assembly_corpus_50m

Writes ``<out>/corpus`` and ``<out>/bench``; prints one JSON line with
row counts, bytes, the predicted bench gram count (vs decontaminate's
5M broadcast limit) and the exact expected stage histogram.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _du(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, required=True)
    ap.add_argument("--n-bench", type=int, default=400_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-files", type=int, default=256)
    args = ap.parse_args()

    from pdf_table_spark.fixtures.text_gen import (
        bench_n_grams, expected_stages, generate_bench_table,
        generate_text_corpus)
    from pdf_table_spark.spark.session import build_session

    spark = build_session("gen_assembly_corpus")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    corpus = generate_text_corpus(
        spark, args.n_docs, os.path.join(args.out, "corpus"),
        args.n_bench, n_files=args.n_files)
    bench = generate_bench_table(
        spark, args.n_bench, os.path.join(args.out, "bench"))
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "gen_assembly_corpus", "n_docs": args.n_docs,
        "n_bench": args.n_bench, "wall_sec": round(wall, 1),
        "docs_per_sec": round(args.n_docs / wall),
        "corpus_bytes": _du(corpus), "bench_bytes": _du(bench),
        "bench_grams_predicted": bench_n_grams(args.n_bench),
        "expected_stages": expected_stages(args.n_docs)}))
    spark.stop()


if __name__ == "__main__":
    main()
