"""End-to-end: Spark pipeline output == single-process golden oracle.

This is the BASELINE per-row invariant — span-sequence equality
(kind, text, media_ref, order) per document — exercised through the
full distributed plan (explode → repartition → Arrow stage →
reassembly), including the F-G skew document path.
"""

import os

from pdf_table_spark.spark.pipeline import extract_documents, flatten_output


def _golden(fixture_root, sf):
    import pyarrow.parquet as pq
    path = os.path.join(fixture_root, f"sf{sf}", "golden_flat.parquet")
    tbl = pq.read_table(path)
    rows = sorted(zip(*[tbl.column(c).to_pylist() for c in
                        ("doc_id", "offset", "kind", "text", "media_ref")]))
    return rows


def test_e2e_sf0001_matches_golden(spark, fixture_root):
    docs = spark.read.parquet(
        os.path.join(fixture_root, "sf0.001", "documents_spans.parquet"))
    out = flatten_output(extract_documents(docs))
    got = sorted(
        (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
        for r in out.collect())
    want = _golden(fixture_root, "0.001")
    assert len(got) == len(want)
    assert got == want


def test_e2e_no_rebalance_same_result(spark, fixture_root):
    """Partitioning must not affect results (order determinism)."""
    docs = spark.read.parquet(
        os.path.join(fixture_root, "sf0.001", "documents_spans.parquet"))
    a = sorted(map(tuple, flatten_output(
        extract_documents(docs, balance_partitions=0)).collect()))
    b = sorted(map(tuple, flatten_output(
        extract_documents(docs, balance_partitions=16)).collect()))
    assert a == b
