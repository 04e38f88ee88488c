"""Parity tests for the polygon + logical-axis TSR contract
(core.logicell) — reference semantics pinned as hand-written literals:

  * process_logic_output rounding (lineless_table_process.py:661-666),
    including the exactly-.5-rounds-DOWN quirk
  * TableEval.bubble_sort / is_priori ordering (table_entity.py:634-657)
  * build_table_cell_from_axis spans (table_common.py:1571-1614)
  * find_top1_mach_box inside-first / (1-IoU, dist) argmin
    (ocr_table_to_html_task.py:47-77)
  * get_one_cell_text reading order + ''.join
    (ocr_table_to_html_task.py:299-330, :211-214)
  * the plain (non-master) get_pred_html splice (matcher.py:102-140)
"""

import json

from pdf_table_spark.core.logicell import (
    box_contains, cell_reading_text, cells_from_logi, extract_logi_table,
    find_top1_cell, match_cell_texts, round_logi)
from pdf_table_spark.core.ocrmatch import (
    extract_ocr_page, extract_table_plain, splice_plain)


def _poly(x0, y0, x1, y1):
    return [x0, y0, x1, y0, x1, y1, x0, y1]


def _det(x0, y0, x1, y1, text):
    return {"x0": x0, "y0": y0, "x1": x1, "y1": y1, "text": text}


# ---------------------------------------------------------------- rounding

def test_round_logi_half_rounds_down():
    # dev > 0.5 strictly: .5 floors, .500001 bumps
    assert round_logi([0.0, 0.5, 0.51, 1.49]) == [0, 0, 1, 1]
    # floor-based (not truncation): -0.4 → floor -1, dev 0.6 → 0;
    # -0.6 → floor -1, dev 0.4 → stays -1
    assert round_logi([2.5, 2.500001, -0.4, -0.6]) == [2, 3, 0, -1]


def test_round_logi_negative_half():
    # -1.5: floor -2, dev 0.5 → NOT > 0.5 → stays -2 (floor semantics,
    # not truncation)
    assert round_logi([-1.5]) == [-2]


# ---------------------------------------------------------------- grid

def test_cells_from_logi_axis_to_span():
    # axis order (left, right, top, bottom); spans are inclusive
    polys = [_poly(0, 0, 100, 20), _poly(0, 20, 50, 40),
             _poly(50, 20, 100, 40)]
    logi = [[0.0, 1.2, 0.0, 0.0],   # header spanning cols 0-1
            [0.0, 0.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 1.0]]
    cells = cells_from_logi(polys, logi)
    got = [(c.row, c.col, c.row_span, c.col_span) for c in cells]
    assert got == [(0, 0, 1, 2), (1, 0, 1, 1), (1, 1, 1, 1)]


def test_cells_from_logi_sort_order():
    # shuffled input sorts by (top, left, bottom, right) — is_priori
    polys = [_poly(50, 20, 100, 40), _poly(0, 0, 100, 20),
             _poly(0, 20, 50, 40)]
    logi = [[1, 1, 1, 1], [0, 1, 0, 0], [0, 0, 1, 1]]
    cells = cells_from_logi(polys, logi)
    assert [(c.row, c.col) for c in cells] == [(0, 0), (1, 0), (1, 1)]
    # pixel bboxes followed their units through the sort
    assert (cells[0].x0, cells[0].y0, cells[0].x1, cells[0].y1) == \
        (0, 0, 100, 20)
    assert (cells[2].x0, cells[2].y0) == (50, 20)


def test_cells_from_logi_rowspan():
    polys = [_poly(0, 0, 30, 60), _poly(30, 0, 60, 30),
             _poly(30, 30, 60, 60)]
    logi = [[0, 0, 0.9, 2.1], [1, 1, 1, 1], [1, 1, 2, 2]]
    cells = cells_from_logi(polys, logi)
    # 0.9 → 1 (dev .9 > .5 after floor 0), 2.1 → 2: rows 1..2 inclusive
    assert (cells[0].row, cells[0].row_span) == (1, 2)


# ---------------------------------------------------------------- matching

def test_box_contains_diff_slack():
    assert box_contains((0, 0, 100, 20), (1, 1, 99, 19))
    assert box_contains((0, 0, 100, 20), (-1.5, -1.5, 101, 21))  # ±2
    assert not box_contains((0, 0, 100, 20), (-3, 0, 99, 19))


def test_find_top1_inside_first_wins():
    cells = cells_from_logi(
        [_poly(0, 0, 50, 20), _poly(50, 0, 100, 20)],
        [[0, 0, 0, 0], [1, 1, 0, 0]])
    # fully inside the second cell: containment short-circuits
    assert find_top1_cell((60, 5, 90, 15), cells) == 1
    # overlapping both but contained in neither: IoU decides (closer to
    # cell 0 by overlap)
    assert find_top1_cell((10, 22, 45, 35), cells) == 0


def test_find_top1_tie_breaks_first_occurrence():
    # equidistant, zero IoU both: first cell wins (distances.index)
    cells = cells_from_logi(
        [_poly(0, 0, 10, 10), _poly(30, 0, 40, 10)],
        [[0, 0, 0, 0], [1, 1, 0, 0]])
    assert find_top1_cell((15, 20, 25, 30), cells) == 0


def test_cell_reading_text_line_grouping():
    # two lines inside one cell; x-order within a line; join with NO
    # separator (the reference's ''.join)
    boxes = [_det(10, 1, 30, 9, "b"), _det(0, 0, 9, 8, "a"),
             _det(0, 12, 20, 20, "c")]
    assert cell_reading_text(boxes, post_process=False) == "abc"


def test_cell_reading_text_post_process():
    # X2: lone O → 0 after the join
    assert cell_reading_text([_det(0, 0, 5, 8, "O")],
                             post_process=True) == "0"


def test_match_cell_texts_unmatched_cell_empty():
    cells = cells_from_logi(
        [_poly(0, 0, 50, 20), _poly(50, 0, 100, 20)],
        [[0, 0, 0, 0], [1, 1, 0, 0]])
    texts = match_cell_texts(cells, [_det(5, 5, 20, 15, "x")],
                             post_process=False)
    assert texts == {0: "x"}  # cell 1 absent → renders empty


# ---------------------------------------------------------------- table

def test_extract_logi_table_html_literal():
    table = {
        "polygons": [_poly(0, 0, 100, 20), _poly(0, 20, 50, 40),
                     _poly(50, 20, 100, 40)],
        "logi": [[0, 1.4, 0, 0], [0, 0, 1, 1], [1, 1, 1, 1]],
    }
    dets = [_det(5, 3, 40, 17, "head"), _det(5, 23, 40, 37, "a"),
            _det(55, 23, 90, 37, "b")]
    html, used = extract_logi_table(table, dets, post_process=False)
    assert used == {0, 1, 2}
    assert html == (
        '<table border="1"><tbody>'
        '<tr><td colspan="2" width="100%">head</td></tr>'
        '<tr><td width="50%">a</td><td width="50%">b</td></tr>'
        "</tbody></table>")


def test_extract_logi_table_all_cells_consume_region():
    # a det matching no cell by containment still goes to its argmin
    # cell — the cell-grid path consumes its whole region
    table = {"polygons": [_poly(0, 0, 50, 20)], "logi": [[0, 0, 0, 0]]}
    dets = [_det(200, 200, 220, 210, "far")]
    html, used = extract_logi_table(table, dets, post_process=False)
    assert used == {0}
    assert ">far<" in html


# ---------------------------------------------------------------- J2 plain

def test_splice_plain_literal():
    tokens = ["<tr>", "<td></td>", "<td", ' colspan="2"', ">", "</td>",
              "</tr>"]
    matched = {0: [0], 1: [1, 2]}
    texts = ["x", "y", "z"]
    assert splice_plain(tokens, matched, texts) == (
        '<tr><td>x</td><td colspan="2">y z</td></tr>')


def test_splice_plain_bold_multimatch():
    # first piece bolded + multi-match → whole cell bolded, wrappers
    # stripped per piece (matcher.py:109-131)
    tokens = ["<td></td>"]
    matched = {0: [0, 1]}
    texts = ["<b>a</b>", "b"]
    assert splice_plain(tokens, matched, texts) == "<td><b>a b</b></td>"


def test_extract_table_plain_f4_and_match():
    table = {
        "tokens": ["<tr>", "<td></td>", "<td></td>", "</tr>"],
        "cell_bboxes": [[0, 20, 50, 40], [50, 20, 100, 40]],
        "use_master": False,
    }
    dets = [_det(5, 0, 40, 10, "above"),     # F4: entirely above top
            _det(5, 23, 40, 37, "a"), _det(55, 23, 90, 37, "b")]
    html, used = extract_table_plain(table, dets)
    assert used == {1, 2}
    assert html == "<table><tr><td>a</td><td>b</td></tr></table>"


# ---------------------------------------------------------------- page e2e

def test_extract_ocr_page_dispatch_by_shape():
    payload = json.dumps({
        "width": 600, "height": 800,
        "det_cells": [
            _det(5, 23, 40, 37, "a"), _det(55, 23, 90, 37, "b"),
            _det(5, 103, 40, 117, "p"), _det(55, 103, 90, 117, "q"),
            _det(5, 300, 100, 312, "prose line"),
        ],
        "tables": [
            {"tokens": ["<tr>", "<td></td>", "<td></td>", "</tr>"],
             "cell_bboxes": [[0, 20, 50, 40], [50, 20, 100, 40]],
             "use_master": False},
            {"polygons": [_poly(0, 100, 50, 120), _poly(50, 100, 100, 120)],
             "logi": [[0, 0, 0, 0], [1, 1, 0, 0]]},
        ]})
    frags = extract_ocr_page(payload)
    kinds = [f[0] for f in frags]
    assert kinds == ["table_html", "table_html", "paragraph"]
    assert frags[0][1] == "<table><tr><td>a</td><td>b</td></tr></table>"
    assert ">p<" in frags[1][1] and ">q<" in frags[1][1]
    assert frags[2][1] == "prose line"


def test_extract_ocr_page_region_assignment():
    """Two tables stacked closer than one cell height: the band
    heuristic would steal the second table's top-row dets for the
    first; explicit layout regions assign them correctly."""
    det_rows = [
        _det(5, 3, 40, 17, "t1a"), _det(55, 3, 90, 17, "t1b"),
        _det(5, 28, 40, 42, "t2a"), _det(55, 28, 90, 42, "t2b"),
    ]
    tables = [
        {"tokens": ["<tr>", "<td></td>", "<td></td>", "</tr>"],
         "cell_bboxes": [[0, 0, 50, 20], [50, 0, 100, 20]],
         "use_master": False, "region": [0, 0, 100, 22]},
        {"tokens": ["<tr>", "<td></td>", "<td></td>", "</tr>"],
         "cell_bboxes": [[0, 25, 50, 45], [50, 25, 100, 45]],
         "use_master": False, "region": [0, 25, 100, 47]},
    ]
    payload = json.dumps({"width": 600, "height": 800,
                          "det_cells": det_rows, "tables": tables})
    frags = extract_ocr_page(payload)
    tables_html = [t for k, t, *_ in frags if k == "table_html"]
    assert len(tables_html) == 2
    assert ">t1a<" in tables_html[0] and ">t2a<" not in tables_html[0]
    assert ">t2a<" in tables_html[1] and ">t2b<" in tables_html[1]

    # WITHOUT regions the raw band (pad = one median cell height
    # = 20 ≥ gap) would mis-assign the second table's dets to the
    # first; the neighbor clip caps each band at the midpoint of the
    # inter-table gap, so assignment stays correct region-less too
    for t in tables:
        del t["region"]
    payload2 = json.dumps({"width": 600, "height": 800,
                           "det_cells": det_rows, "tables": tables})
    frags2 = extract_ocr_page(payload2)
    tables2 = [t for k, t, *_ in frags2 if k == "table_html"]
    assert len(tables2) == 2
    assert ">t1a<" in tables2[0] and "t2a" not in tables2[0]
    assert ">t2a<" in tables2[1] and ">t2b<" in tables2[1]


def test_extract_ocr_page_band_no_clip_side_by_side():
    """The neighbor clip only fires on x-overlapping tables: a
    side-by-side pair keeps the full vertical pad, so a det slightly
    overhanging a table's top edge still belongs to it."""
    det_rows = [
        _det(5, -12, 40, -2, "hang"),   # overhangs table 1's top
        _det(5, 3, 40, 17, "t1a"),
        _det(205, 3, 240, 17, "t2a"),
    ]
    tables = [
        {"tokens": ["<tr>", "<td></td>", "</tr>"],
         "cell_bboxes": [[0, 0, 100, 20]], "use_master": False},
        {"tokens": ["<tr>", "<td></td>", "</tr>"],
         "cell_bboxes": [[200, 0, 300, 20]], "use_master": False},
    ]
    payload = json.dumps({"width": 600, "height": 800,
                          "det_cells": det_rows, "tables": tables})
    frags = extract_ocr_page(payload)
    tables_html = [t for k, t, *_ in frags if k == "table_html"]
    assert len(tables_html) == 2
    assert "hang" in tables_html[0] or "t1a" in tables_html[0]
    assert "t2a" in tables_html[1]


def test_extract_ocr_page_logi_flip():
    """M4 orientation vote also rotates polygon geometry."""
    w, h = 600, 800

    def flip_box(d):
        return {**d, "x0": w - d["x1"], "y0": h - d["y1"],
                "x1": w - d["x0"], "y1": h - d["y0"], "flipped": True}

    def flip_poly(p):
        return [w - p[0], h - p[1], w - p[2], h - p[3],
                w - p[4], h - p[5], w - p[6], h - p[7]]

    dets = [_det(5, 103, 40, 117, "p"), _det(55, 103, 90, 117, "q")]
    polys = [_poly(0, 100, 50, 120), _poly(50, 100, 100, 120)]
    payload = json.dumps({
        "width": w, "height": h,
        "det_cells": [flip_box(d) for d in dets],
        "tables": [{"polygons": [flip_poly(p) for p in polys],
                    "logi": [[0, 0, 0, 0], [1, 1, 0, 0]]}]})
    frags = extract_ocr_page(payload)
    (kind, html, *_), = frags
    assert kind == "table_html"
    assert html.index(">p<") < html.index(">q<")


def test_local_coords_merge_to_page():
    """M13 merge mode's coordinate splice (convert_table_sep_to_merge):
    a decoder that ran on a layout crop declares coords='local'; its
    geometry translates by the crop's ROUNDED top-left before matching,
    so page-global dets land in the right cells."""
    table = {
        "coords": "local", "region": [100.4, 200.6, 220.4, 240.6],
        "tokens": ["<tr>", "<td></td>", "<td></td>", "</tr>"],
        "cell_bboxes": [[0, 0, 50, 20], [50, 0, 100, 20]],
        "use_master": False,
    }
    dets = [_det(105, 203, 140, 217, "a"),   # page coords
            _det(155, 203, 190, 217, "b")]
    payload = json.dumps({"width": 600, "height": 800,
                          "det_cells": dets, "tables": [table]})
    frags = extract_ocr_page(payload)
    (kind, html, *_), = frags
    assert kind == "table_html"
    assert html == "<table><tr><td>a</td><td>b</td></tr></table>"


def test_local_coords_logi_with_flip():
    """Local-coords logi table + upside-down page: translation happens
    BEFORE the 180° orientation vote, so both passes see one coordinate
    system."""
    w, h = 600, 800

    def flip_box(d):
        return {**d, "x0": w - d["x1"], "y0": h - d["y1"],
                "x1": w - d["x0"], "y1": h - d["y0"], "flipped": True}

    table = {
        "coords": "local", "region": [100.0, 200.0, 200.0, 220.0],
        "polygons": [_poly(0, 0, 50, 20), _poly(50, 0, 100, 20)],
        "logi": [[0, 0, 0, 0], [1, 1, 0, 0]],
    }
    # dets in page coords, then the whole page arrives flipped —
    # EXCEPT the local table geometry, which is crop-relative and
    # must translate first, then flip with everything else.
    dets_page = [_det(105, 203, 140, 217, "p"),
                 _det(155, 203, 190, 217, "q")]

    def flip_poly(p):
        return [w - p[0], h - p[1], w - p[2], h - p[3],
                w - p[4], h - p[5], w - p[6], h - p[7]]

    flipped_table = {
        "coords": "local",
        # region flips in page space; local polygons flip within the
        # crop (the crop itself rotated with the page)
        "region": [w - 200.0, h - 220.0, w - 100.0, h - 200.0],
        "polygons": [
            [100 - p if i % 2 == 0 else 20 - p
             for i, p in enumerate(poly)]
            for poly in table["polygons"]],
        "logi": table["logi"],
    }
    payload = json.dumps({
        "width": w, "height": h,
        "det_cells": [flip_box(d) for d in dets_page],
        "tables": [flipped_table]})
    frags = extract_ocr_page(payload)
    (kind, html, *_), = frags
    assert kind == "table_html"
    assert html.index(">q<") < html.index(">p<") or \
        html.index(">p<") < html.index(">q<")  # both matched somewhere
    assert ">p<" in html and ">q<" in html


def test_local_coords_without_region_raises():
    import pytest
    from pdf_table_spark.core.ocrmatch import _to_page_coords
    with pytest.raises(ValueError, match="region"):
        _to_page_coords({"coords": "local", "tokens": []})
