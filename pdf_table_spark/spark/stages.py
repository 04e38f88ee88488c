"""Arrow (mapInArrow) stages — the Python compute islands.

One stage: per-span extraction. Batches arrive as raw
``pyarrow.RecordBatch`` (``mapInArrow``), NOT pandas — profiling showed
the pandas block-manager round trip (Arrow→pandas object columns →
pandas→Arrow) cost ~2-3x the actual page-decode CPU at 32 cores, and
was the scaling bottleneck between local[8] and local[32]. Inside a
batch we loop the documents' spans — the sanctioned vectorization
pattern (SURVEY §1.3); the per-span work (json decode, numpy sweeps) is
exactly ``pdf_table_spark.core.page.extract_span``, shared with the
golden oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ..core.page import extract_span

FRAG_SCHEMA = ("doc_id string, offset int, frag_idx int, "
               "kind string, text string, media_ref string")

ARROW_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("offset", pa.int32()),
    ("frag_idx", pa.int32()), ("kind", pa.string()),
    ("text", pa.string()), ("media_ref", pa.string())])

EMPTY_SENTINEL = "__empty__"


def _extract_batches(
        batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        cols = {name: batch.column(i).to_pylist()
                for i, name in enumerate(batch.schema.names)}
        doc_ids, offsets, frag_idxs = [], [], []
        kinds, texts, refs = [], [], []
        for doc_id, offset, kind, text, ref in zip(
                cols["doc_id"], cols["offset"], cols["kind"],
                cols["text"], cols["media_ref"]):
            frags = [] if kind is None else extract_span(
                kind, text or "", ref or "")
            if not frags:
                # sentinel keeps the doc alive through the groupBy —
                # covers zero-span docs (explode_outer null row),
                # unknown kinds, and pages that decode to nothing;
                # filtered out JVM-side during reassembly. Avoids the
                # alternative (a join back to all doc_ids) which would
                # broadcast/shuffle every doc_id at 10^12 scale.
                frags = [(EMPTY_SENTINEL, "", "")]
            for i, (k, t, r) in enumerate(frags):
                doc_ids.append(doc_id)
                offsets.append(-1 if offset is None else offset)
                frag_idxs.append(i)
                kinds.append(k)
                texts.append(t)
                refs.append(r)
        yield pa.RecordBatch.from_arrays(
            [pa.array(doc_ids, pa.string()),
             pa.array(offsets, pa.int32()),
             pa.array(frag_idxs, pa.int32()),
             pa.array(kinds, pa.string()),
             pa.array(texts, pa.string()),
             pa.array(refs, pa.string())],
            schema=ARROW_SCHEMA)


def run_extract_stage(span_rows: DataFrame) -> DataFrame:
    """span rows (doc_id, offset, kind, text, media_ref) → fragment rows
    (doc_id, offset, frag_idx, kind, text, media_ref)."""
    return span_rows.mapInArrow(_extract_batches, schema=FRAG_SCHEMA)
