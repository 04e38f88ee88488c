"""CLI for the heavy scaling-bench corpus (see
pdf_table_spark.fixtures.spark_gen — the stage lives in the package so
executors can import it).

Usage: python scripts/gen_scaling_corpus.py [--docs 12000] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pdf_table_spark.fixtures.spark_gen import ensure_corpus  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=12000)
    ap.add_argument("--out", default="/tmp/pdf_table_scaling_corpus")
    args = ap.parse_args()
    print(ensure_corpus(args.docs, args.out))
