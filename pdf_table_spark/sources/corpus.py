"""Corpus sources/sinks for the interleaved documents table.

The engine's canonical layout is parquet/Iceberg-style directories of
``(doc_id, spans array<struct<kind,text,media_ref,offset>>)``; real
corpora also arrive as JSONL dumps (one document object per line, the
common interchange format for web-scale text corpora). Both read into
the identical DataFrame, so every downstream operator is
format-agnostic.

The explicit schema matters at scale: schema inference on JSON is a
FULL extra pass over the data — at 100 TB that is a second read of the
corpus before the first real job. ``read_corpus`` always supplies the
schema, so the scan starts immediately and malformed lines land in
Spark's PERMISSIVE corrupt-record handling instead of failing the job
(the source-level analogue of the pipeline's poison containment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = ("doc_id string, spans array<struct<kind:string,"
                 "text:string,media_ref:string,offset:int>>")

_FORMATS = ("parquet", "json")


def _sniff(path: str) -> str:
    import os
    names = []
    if os.path.isdir(path):
        names = os.listdir(path)
    elif os.path.exists(path):
        names = [path]
    else:
        # remote URI (s3://, hdfs://, …) or not-yet-mounted path: the
        # local filesystem can't enumerate it, so sniff the path string
        # itself rather than silently defaulting to parquet
        names = [path.rstrip("/")]
    for n in names:
        if n.endswith((".json", ".jsonl", ".ndjson")):
            return "json"
        if n.endswith(".parquet"):
            return "parquet"
    if not os.path.exists(path):
        raise ValueError(
            f"fmt='auto' cannot sniff {path!r}: the local filesystem "
            "cannot see it and the path carries no format extension; "
            "pass fmt='parquet' or fmt='json' explicitly")
    return "parquet"


def read_corpus(spark: SparkSession, path: str,
                fmt: str = "auto") -> DataFrame:
    """Load an interleaved documents corpus (parquet or JSONL) with the
    canonical schema. ``fmt='auto'`` sniffs by file extension."""
    if fmt == "auto":
        fmt = _sniff(path)
    if fmt not in _FORMATS:
        raise ValueError(f"unknown corpus format {fmt!r}; one of "
                         f"{_FORMATS} or 'auto'")
    if fmt == "json":
        return spark.read.schema(CORPUS_SCHEMA).json(path)
    return spark.read.schema(CORPUS_SCHEMA).parquet(path)


def write_corpus(docs: DataFrame, path: str, fmt: str = "parquet",
                 mode: str = "overwrite") -> None:
    """Write a corpus back out in either format (JSONL for interchange,
    parquet for everything else)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown corpus format {fmt!r}")
    w = docs.write.mode(mode)
    if fmt == "json":
        w.json(path)
    else:
        w.parquet(path)
