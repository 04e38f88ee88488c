"""Arrow (mapInPandas) stages — the Python compute islands.

One stage: per-span extraction. Input batches arrive as pandas
DataFrames (Arrow transfer); inside a batch we loop *documents' spans*,
not Spark rows — the sanctioned vectorization pattern (SURVEY §1.3).
The per-span work itself (json decode, numpy sweeps) is exactly
``pdf_table_spark.core.page.extract_span``, shared with the golden
oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..core.page import extract_span

FRAG_SCHEMA = ("doc_id string, offset int, frag_idx int, "
               "kind string, text string, media_ref string")


EMPTY_SENTINEL = "__empty__"


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids, offsets, frag_idxs = [], [], []
        kinds, texts, refs = [], [], []
        for doc_id, offset, kind, text, ref in zip(
                pdf["doc_id"].values, pdf["offset"].values,
                pdf["kind"].values, pdf["text"].values,
                pdf["media_ref"].values):
            if kind is None or (isinstance(kind, float) and pd.isna(kind)):
                frags = []
            else:
                frags = extract_span(kind, text or "", ref or "")
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
                offsets.append(-1 if pd.isna(offset) else int(offset))
                frag_idxs.append(i)
                kinds.append(k)
                texts.append(t)
                refs.append(r)
        yield pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="object"),
            "offset": pd.Series(offsets, dtype="int32"),
            "frag_idx": pd.Series(frag_idxs, dtype="int32"),
            "kind": pd.Series(kinds, dtype="object"),
            "text": pd.Series(texts, dtype="object"),
            "media_ref": pd.Series(refs, dtype="object"),
        })


def run_extract_stage(span_rows: DataFrame) -> DataFrame:
    """span rows (doc_id, offset, kind, text, media_ref) → fragment rows
    (doc_id, offset, frag_idx, kind, text, media_ref)."""
    return span_rows.mapInPandas(_extract_batches, schema=FRAG_SCHEMA)
