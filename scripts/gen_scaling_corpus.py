"""Generate the heavy (realistic page density) scaling-bench corpus,
Spark-parallel: spark.range(n) → mapInArrow(gen_doc(heavy)) → parquet.

Deterministic per (seed, doc_idx) — regenerating yields identical data,
so the corpus is cached on disk and never committed.

Usage: python scripts/gen_scaling_corpus.py [--docs 12000] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_OUT = "/tmp/pdf_table_scaling_corpus"

SPANS_SQL_SCHEMA = ("doc_id string, spans array<struct<kind:string,"
                    "text:string,media_ref:string,offset:int>>")


def _gen_batches(batches):
    import pyarrow as pa

    from pdf_table_spark.fixtures.generator import gen_doc

    span_type = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())])
    for batch in batches:
        ids = batch.column(0).to_pylist()
        doc_ids, span_lists = [], []
        for i in ids:
            doc_id, spans, _fam = gen_doc(int(i), heavy=True)
            doc_ids.append(doc_id)
            span_lists.append(spans)
        yield pa.RecordBatch.from_arrays(
            [pa.array(doc_ids, pa.string()),
             pa.array(span_lists, pa.list_(span_type))],
            names=["doc_id", "spans"])


def ensure_corpus(n_docs: int = 12000, out: str = DEFAULT_OUT,
                  n_files: int = 64) -> str:
    out_dir = f"{out}_{n_docs}"
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    from pdf_table_spark.spark.session import build_session
    spark = build_session("gen_scaling_corpus")
    spark.sparkContext.setLogLevel("ERROR")
    (spark.range(n_docs).repartition(n_files)
     .mapInArrow(_gen_batches, schema=SPANS_SQL_SCHEMA)
     .write.mode("overwrite").parquet(out_dir))
    spark.stop()
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=12000)
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()
    print(ensure_corpus(args.docs, args.out))
