"""pdf_table_spark — a PySpark-native interleaved-document extraction engine.

A from-scratch reimplementation of the *capabilities* of
CycloneBoy/pdf_table (arXiv 2409.05125) on Spark's execution model:

* input:  an Iceberg-style table ``(doc_id string,
  spans array<struct<kind,text,media_ref,offset>>)`` of interleaved
  text + media documents,
* output: per-document ordered span sequences
  ``(kind, text, media_ref, offset)`` holding merged paragraphs,
  reconstructed ``<table>`` HTML and passthrough media refs,
* engine: DataFrame ops + vectorized Arrow (``mapInArrow``) stages —
  no per-row Python UDFs, no RDDs.

Layout
------
``core``      pure numpy/python page decoders (no Spark import) — the same
              functions power the Spark stages and the single-process
              golden oracle, so span-sequence equality is exact.
``spark``     the distributed pipeline: page explode → Arrow stage →
              reassembly; checkpoint/resume; metrics.
``fixtures``  deterministic seed-42 corpus generator (interleaved spans)
              and golden builder.
``ops``       large-scale training-data ops over plain text/embedding
              tables: dedup (exact / MinHash-LSH / SimHash / n-gram
              Jaccard / the capped ``dedup_corpus`` entry point), ANN
              similarity search, corpus filter gates (Gopher / C4 /
              PII / repetition), the composed ``prepare_corpus``
              ingest program, text analysis, multimodal plumbing.
``streaming`` Structured Streaming: incremental ingest (exactly-once
              per corpus file), watermarked event-time windows,
              applyInPandasWithState sessionization, and the
              watermark-bounded streaming clean gate.
``sources``   corpus readers/writers (parquet + JSONL interchange).
``api``       the reference's user surface: read_documents /
              extract_tables / document_html with the page-spec string
              and the read_pdf flavor kwarg.
"""

__version__ = "0.3.0"
