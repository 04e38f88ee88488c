"""Page-range selection over interleaved documents — the reference's
``'1,3,4' | '1,4-end' | 'all'`` page spec (``build_pdf_pages_list``,
``utils/pdf_utils.py:598-632``) as a pure DataFrame transform.

Semantics: page k of a document is its k-th ``pdf_page`` span in offset
order (1-based, like the reference). Selected documents keep their
non-page spans plus only the chosen pages; everything stays an array
transform — no explode, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = 10 ** 9  # open-ended range sentinel ('4-end')


def parse_page_spec(spec: str) -> list[tuple[int, int]]:
    """'1,3,4' | '2-5' | '1,4-end' | 'all' → inclusive 1-based ranges."""
    spec = (spec or "all").strip().lower()
    if spec in ("all", ""):
        return [(1, END)]
    ranges = []
    for part in spec.split(","):
        part = part.strip()
        if "-" in part:
            lo, hi = part.split("-", 1)
            ranges.append((int(lo), END if hi.strip() == "end"
                           else int(hi)))
        else:
            ranges.append((int(part), int(part)))
    return ranges


def select_pages(docs: DataFrame, spec: str) -> DataFrame:
    """Keep only the spec'd pages (1-based per doc, counting pdf_page
    spans in offset order); non-page spans always survive. One
    whole-stage-codegen'd array expression per row."""
    ranges = parse_page_spec(spec)
    keep = " or ".join(
        f"(pg >= {lo} and pg <= {hi})" for lo, hi in ranges)
    # rank each span's page number: count of pdf_page spans at <= offset
    # NOT <=> (null-safe equality): a NULL kind is a non-page span and
    # must survive; plain != would evaluate to NULL → dropped
    expr = f"""
        filter(
          transform(spans, s -> struct(
            s as s,
            size(filter(spans, p -> p.kind = 'pdf_page'
                                 and p.offset <= s.offset)) as pg)),
          x -> not (x.s.kind <=> 'pdf_page')
               or ({keep.replace('pg', 'x.pg')})
        )
    """
    return docs.select(
        "doc_id",
        F.expr(f"transform({expr}, x -> x.s)").alias("spans"))
