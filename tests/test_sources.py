"""Corpus sources: JSONL and parquet read into the identical DataFrame
and feed the identical extraction."""

import os

import pytest


def test_jsonl_roundtrip_equals_parquet(spark, fixture_root, tmp_path):
    from pdf_table_spark.sources import read_corpus, write_corpus
    from pdf_table_spark.spark.pipeline import (
        extract_documents, flatten_output)

    pq_path = os.path.join(fixture_root, "sf0.001",
                           "documents_spans.parquet")
    docs_pq = read_corpus(spark, pq_path)          # auto-sniffs parquet
    jl_path = str(tmp_path / "corpus_jsonl")
    write_corpus(docs_pq, jl_path, fmt="json")
    docs_jl = read_corpus(spark, jl_path)          # auto-sniffs json

    assert docs_jl.schema == docs_pq.schema
    a = sorted(map(tuple, flatten_output(
        extract_documents(docs_pq, balance_partitions=0)).collect()))
    b = sorted(map(tuple, flatten_output(
        extract_documents(docs_jl, balance_partitions=0)).collect()))
    assert a == b


def test_read_corpus_rejects_unknown_format(spark):
    from pdf_table_spark.sources import read_corpus
    with pytest.raises(ValueError, match="unknown corpus format"):
        read_corpus(spark, "/nonexistent", fmt="xml")


def test_sniff_remote_uri_by_extension():
    """Paths the local filesystem cannot see (s3://, hdfs://) sniff by
    the path string's extension instead of silently defaulting to
    parquet; extension-less remote paths refuse fmt='auto'."""
    from pdf_table_spark.sources.corpus import _sniff
    assert _sniff("s3://bucket/corpus/dump.jsonl") == "json"
    assert _sniff("hdfs://nn/corpus/part-0.parquet") == "parquet"
    with pytest.raises(ValueError, match="cannot sniff"):
        _sniff("s3://bucket/corpus/")
