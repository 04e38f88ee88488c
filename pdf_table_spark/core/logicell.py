"""Polygon + logical-axis TSR output contract (M6 CenterNet / M8 LORE /
M9 LGPMA-adjacency reduced to the same decode surface).

The reference's second structure-decoder family emits, per table, a
list of cell POLYGONS (8 coords, p1..p4 clockwise from top-left) plus a
LOGICAL AXIS per cell — float (col_start, col_end, row_start, row_end)
straight off the model head. The deterministic decode downstream:

  * axis rounding — ``process_logic_output``
    (reference ``model/lore/lineless_table_process.py:661-666``):
    floor, +1 only when the fractional part is STRICTLY > 0.5 — an
    exact .5 rounds DOWN (quirk pinned in tests).
  * unit ordering — ``TableEval.bubble_sort`` / ``is_priori``
    (``entity/table_entity.py:634-657``): stable sort by
    (top, left, bottom, right) logical indices.
  * axis → cell grid — ``build_table_cell_from_axis`` /
    ``build_table_cell_from_table_unit``
    (``model/pdf_table/table_common.py:1571-1614``): row = top index,
    col = left index, row_span = bottom-top+1, col_span = right-left+1,
    pixel bbox from the polygon's corner points.
  * cell-grid ↔ OCR text match — ``find_top1_mach_box`` +
    ``match_table_cell_and_text_cell``
    (``model/ocr_pdf/ocr_table_to_html_task.py:47-244``): a text box
    CONTAINED in a cell (±2 px, ``box_in_other_box``,
    ``table_common.py:138-160``) takes the first such cell; otherwise
    argmin of (1-IoU, corner-L1 distance), first occurrence on ties.
  * in-cell reading order — ``get_one_cell_text``
    (``ocr_table_to_html_task.py:299-330``): line-group the matched
    texts by top-y (``merge_close_lines``, tol = mean height / 3),
    sort (line, x), join with NO separator (the reference's
    ``''.join``), then X2 ocr_post_process.

The reference routes these cells through an image re-extraction pass
(boxes drawn onto the threshold bitmap, ``table_cell_extract.py:187-198``)
before matching; on the deterministic contract the redraw reproduces
exactly the decoded grid, so this module matches against the decoded
cells directly. Unmatched cells render empty (the reference's
"test_text" filler appears only in its debug structure dump, never in
the production match output).

Coordinates are IMAGE space (y down), like core.ocrmatch.
"""

from __future__ import annotations

import math

from .geometry import iou as rect_iou
from .geometry import merge_close_lines
from .lattice import LogicalCell
from .ocrmatch import corner_distance
from .textproc import ocr_post_process


def round_logi(axis) -> list[int]:
    """``process_logic_output`` rounding: floor each value, +1 only when
    the fractional part exceeds 0.5 — exactly .5 floors (the reference
    tests ``dev > 0.5`` strictly)."""
    out = []
    for v in axis:
        f = math.floor(v)
        out.append(int(f + 1) if v - f > 0.5 else int(f))
    return out


def _poly_rect(poly):
    """Axis-aligned pixel bbox of an 8-coord polygon. The reference
    keeps two opposite corners (p4 bottom-left, p2 top-right) which for
    the axis-aligned rectangles this contract carries is the same
    rectangle; the hull is the deterministic generalization."""
    xs = poly[0::2]
    ys = poly[1::2]
    return (min(xs), min(ys), max(xs), max(ys))


def cells_from_logi(polygons, logi) -> list[LogicalCell]:
    """Decode (polygons, logical axes) into the logical cell grid
    (``build_table_cell_from_axis``). Axis order follows the reference's
    ``TableUnit``: (left, right, top, bottom) logical indices; rows/cols
    come back 0-based (the reference's +1 is display-only)."""
    units = []
    for poly, axis in zip(polygons, logi):
        left, right, top, bottom = round_logi(axis)
        units.append((top, left, bottom, right, poly))
    units.sort(key=lambda u: u[:4])  # is_priori order, stable
    cells = []
    for top, left, bottom, right, poly in units:
        x0, y0, x1, y1 = _poly_rect(poly)
        cells.append(LogicalCell(
            row=top, col=left,
            row_span=max(1, bottom - top + 1),
            col_span=max(1, right - left + 1),
            x0=x0, y0=y0, x1=x1, y1=y1))
    return cells


def box_contains(outer, inner, diff: float = 2.0) -> bool:
    """``box_in_other_box``: inner inside outer with ±diff slack."""
    x1, y1, x2, y2 = outer
    x3, y3, x4, y4 = inner
    lo_o, hi_o = min(y1, y2), max(y1, y2)
    lo_i, hi_i = min(y3, y4), max(y3, y4)
    return (x3 >= x1 - diff and x4 <= x2 + diff
            and lo_o - diff <= lo_i <= hi_i <= hi_o + diff)


def find_top1_cell(text_box, cells) -> int:
    """``find_top1_mach_box``: first containing cell wins; otherwise
    argmin (1-IoU, corner distance), first occurrence on ties."""
    scored = []
    for j, c in enumerate(cells):
        pred = (c.x0, c.y0, c.x1, c.y1)
        if box_contains(pred, text_box):
            return j
        scored.append((1.0 - rect_iou(text_box, pred),
                       corner_distance(text_box, pred)))
    if not scored:
        return -1
    best = min(scored)
    return scored.index(best)


def cell_reading_text(boxes, post_process: bool) -> str:
    """``get_one_cell_text`` + the caller's join: line-group by top-y
    (tol = mean height / 3), order (line, x), join with NO separator,
    then X2 post-process."""
    heights = [b["y1"] - b["y0"] for b in boxes]
    mean_h = sum(heights) / len(heights)
    tol = mean_h / 3.0
    norm = merge_close_lines(
        sorted((float(round(b["y0"])) for b in boxes), reverse=True),
        line_tol=tol)

    def y_index(b):
        y = round(b["y0"])
        for n in norm:
            if math.isclose(y, n, abs_tol=tol):
                return n
        return float(y)

    ordered = sorted(boxes, key=lambda b: (y_index(b), b["x0"]))
    text = "".join(b["text"].strip("\n") for b in ordered)
    return ocr_post_process(text) if post_process else text


def match_cell_texts(cells, det_cells, post_process: bool = True) -> dict:
    """``match_table_cell_and_text_cell``'s matching half: assign every
    det box to its top-1 cell, then build per-cell reading-order text.
    Returns {cell_idx: text}; every det is consumed (the reference's
    cell-grid path never leaves a det unmatched when cells exist)."""
    matched: dict[int, list[int]] = {}
    for i, d in enumerate(det_cells):
        tb = (d["x0"], d["y0"], d["x1"], d["y1"])
        j = find_top1_cell(tb, cells)
        if j >= 0:
            matched.setdefault(j, []).append(i)
    return {
        j: cell_reading_text([det_cells[i] for i in idxs], post_process)
        for j, idxs in matched.items()
    }


def extract_logi_table(table: dict, det_cells: list[dict],
                       post_process: bool = True):
    """One polygon/logi-contract table end-to-end: decode the grid,
    match det texts, serialize. Returns (html, used_ids) like
    ``ocrmatch.extract_table`` — used_ids covers every det passed in
    when any cell exists (this path consumes its whole region)."""
    from .html import cells_to_html

    cells = cells_from_logi(table["polygons"], table["logi"])
    if not cells:
        return None, set()
    texts = match_cell_texts(cells, det_cells, post_process)
    for j, text in texts.items():
        cells[j].texts = [text] if text else []
    xs0 = min(c.x0 for c in cells)
    xs1 = max(c.x1 for c in cells)
    html = cells_to_html(
        sorted(cells, key=lambda c: (c.row, c.col)),
        table_width=(xs1 - xs0) if xs1 > xs0 else None)
    return html, set(range(len(det_cells)))
