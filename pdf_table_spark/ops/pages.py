"""Page-range selection over interleaved documents — the reference's
``'1,3,4' | '1,4-end' | 'all'`` page spec (``build_pdf_pages_list``,
``utils/pdf_utils.py:598-632``) as a pure DataFrame transform.

Semantics: page k of a document is its k-th ``pdf_page`` span in offset
order (1-based, like the reference). Selected documents keep their
non-page spans plus only the chosen pages; everything stays an array
transform — no explode, no shuffle, no Python.

Complexity: the page number of each span is looked up against the
(small) per-doc array of page offsets, so a row costs
O(n_spans × n_pages) instead of the previous O(n_spans²)
filter-inside-transform — a 500-page doc with ~100 spans/page does
~25M comparisons under the old expression vs ~250k here.
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
    whole-stage-codegen'd array expression per row.

    NOT <=> (null-safe equality): a NULL kind is a non-page span and
    must survive; plain != would evaluate to NULL → dropped.
    """
    ranges = parse_page_spec(spec)
    keep = " or ".join(
        f"(x.pg >= {lo} and x.pg <= {hi})" for lo, hi in ranges)
    # pg_offsets: offsets of the doc's pdf_page spans, computed once per
    # row; each span's page number = #page-offsets <= its offset.
    expr = f"""
        transform(
          filter(
            transform(spans, s -> struct(
              s as s,
              size(filter(pg_offsets, o -> o <= s.offset)) as pg)),
            x -> not (x.s.kind <=> 'pdf_page') or ({keep})),
          x -> x.s)
    """
    return (
        docs
        .withColumn("pg_offsets", F.expr(
            "transform(filter(spans, p -> p.kind <=> 'pdf_page'), "
            "p -> p.offset)"))
        .select("doc_id", F.expr(expr).alias("spans"))
    )
