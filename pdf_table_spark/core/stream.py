"""Unruled ("stream"/whitespace) table detection and reconstruction.

Parity targets (semantics re-derived): row grouping by y-tolerance
(``table_extractor_stream.py:103-137`` _group_rows), column inference
from aligned x-positions (textedge accumulation ``table_core.py:123-164``
+ column merge ``table_extractor_stream.py:140-181``), column-count mode
(``:349-363``). A block of >= MIN_TABLE_ROWS consecutive multi-item rows
whose x-starts align across rows is a stream table; everything else
stays prose.
"""

from __future__ import annotations

from . import geometry as G
from .lattice import LogicalCell

MIN_TABLE_ROWS = 3          # consecutive multi-cell rows to call it a table
MIN_TABLE_COLS = 2
ALIGN_REQUIRED = 4          # rows sharing an x-edge to validate a column
                            # (TEXTEDGE_REQUIRED_ELEMENTS=4, table_core.py:17)


def group_rows(text_lines, row_tol: float = G.ROW_TOL):
    """Group text lines into visual rows by y-center proximity,
    top-down. Returns list of rows, each a list of line dicts sorted by
    x0."""
    if not text_lines:
        return []
    lines = sorted(
        text_lines,
        key=lambda t: (-(t["y0"] + t["y1"]) / 2.0, t["x0"]))
    rows = [[lines[0]]]
    # anchor on the row's FIRST line (reference _group_rows,
    # table_extractor_stream.py:119-131): updating per line would let
    # rows chain with unbounded drift and merge distinct rows
    last_yc = (lines[0]["y0"] + lines[0]["y1"]) / 2.0
    for t in lines[1:]:
        yc = (t["y0"] + t["y1"]) / 2.0
        if abs(yc - last_yc) <= row_tol:
            rows[-1].append(t)
        else:
            rows.append([t])
            last_yc = yc
    for r in rows:
        r.sort(key=lambda t: t["x0"])
    return rows


def detect_stream_blocks(rows):
    """Maximal runs of consecutive rows with >=MIN_TABLE_COLS items and
    mutually aligned column starts → stream-table blocks.

    Returns (blocks, prose_rows): blocks are lists of row indices;
    prose_rows the remaining row indices, both in top-down order.
    """
    n = len(rows)
    multi = [len(r) >= MIN_TABLE_COLS for r in rows]
    blocks, prose = [], []
    i = 0
    while i < n:
        if not multi[i]:
            prose.append(i)
            i += 1
            continue
        j = i
        while j + 1 < n and multi[j + 1]:
            j += 1
        run = list(range(i, j + 1))
        if len(run) >= MIN_TABLE_ROWS and _columns_align(rows, run):
            blocks.append(run)
        else:
            prose.extend(run)
        i = j + 1
    return blocks, prose


def _columns_align(rows, run, tol: float = G.LINE_TOL) -> bool:
    """Textedge validation: at least MIN_TABLE_COLS x-start clusters are
    each shared by >= min(ALIGN_REQUIRED, len(run)) rows."""
    need = min(ALIGN_REQUIRED, len(run))
    xs = sorted(t["x0"] for i in run for t in rows[i])
    clusters = G.merge_close_lines(xs, tol)
    valid = 0
    for cx in clusters:
        support = sum(
            1 for i in run if any(abs(t["x0"] - cx) <= tol + 1 for t in rows[i]))
        if support >= need:
            valid += 1
    return valid >= MIN_TABLE_COLS


def build_stream_table(rows, run, tol: float = G.LINE_TOL):
    """Reconstruct a stream table from a row run: columns = clustered
    x-starts of all items; cell (r, c) = items whose x0 falls in column
    cluster c (joined by newline, reading order preserved)."""
    xs = sorted(t["x0"] for i in run for t in rows[i])
    col_x = G.merge_close_lines(xs, tol)
    cells: list[LogicalCell] = []
    for r_out, i in enumerate(run):
        buckets: dict[int, list] = {}
        for t in rows[i]:
            c = min(range(len(col_x)), key=lambda k: abs(col_x[k] - t["x0"]))
            buckets.setdefault(c, []).append(t["text"].strip("\n"))
        for c in range(len(col_x)):
            texts = [x for x in buckets.get(c, []) if x]
            cells.append(LogicalCell(
                row=r_out, col=c, row_span=1, col_span=1,
                x0=0, y0=0, x1=0, y1=0, texts=texts))
    bbox = (
        min(t["x0"] for i in run for t in rows[i]),
        min(t["y0"] for i in run for t in rows[i]),
        max(t["x1"] for i in run for t in rows[i]),
        max(t["y1"] for i in run for t in rows[i]),
    )
    return cells, bbox
