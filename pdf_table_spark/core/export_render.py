"""Table-HTML → CSV / Markdown / JSON-rows rendering (pure python).

The single source of truth for the reference's export fan-out
(``TableList.export`` / ``Table.to_csv/to_markdown/to_json``,
``table_core.py:720-826``): the Spark stage (``ops.export``) and the
single-process golden builder (``fixtures.build``) both call
``render_table_html`` so the oracle parquet and the distributed output
are produced by literally the same function.
"""

from __future__ import annotations

import csv
import io
import json


def grid_matrix(cells):
    """LogicalCells → dense text matrix; spanned slots repeat the
    anchor text (reference copy-text semantics,
    ``table_extractor_lattice.py:366-397``)."""
    if not cells:
        return []
    nr = max(c.row + c.row_span for c in cells)
    nc = max(c.col + c.col_span for c in cells)
    m = [["" for _ in range(nc)] for _ in range(nr)]
    for c in cells:
        for r in range(c.row, c.row + c.row_span):
            for cc in range(c.col, c.col + c.col_span):
                m[r][cc] = c.text
    return m


def render_table_html(html: str) -> tuple[int, int, str, str, str]:
    """table HTML → (n_rows, n_cols, csv, markdown, json_rows)."""
    from .html import parse_table_html
    m = grid_matrix(parse_table_html(html))
    nr, nc = len(m), (len(m[0]) if m else 0)
    buf = io.StringIO()
    csv.writer(buf, lineterminator="\n").writerows(m)

    def md_cell(t: str) -> str:
        # pipes and newlines would corrupt the markdown grid
        return t.replace("|", "\\|").replace("\n", "<br/>")

    md_lines = []
    if m:
        md_lines.append("| " + " | ".join(map(md_cell, m[0])) + " |")
        md_lines.append("|" + "---|" * nc)
        for row in m[1:]:
            md_lines.append("| " + " | ".join(map(md_cell, row)) + " |")
    return (nr, nc, buf.getvalue(), "\n".join(md_lines),
            json.dumps(m, ensure_ascii=False))
