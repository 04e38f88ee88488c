"""LGPMA adjacency reduction (core/lgpma.py): hand-worked examples
pinning the reference ``post_lgpma.py`` semantics — cross-class NMS,
midline + special-relationship adjacency, clique ranking, empty-cell
fill, and the OCR join rules."""


def _grid_boxes(n_rows, n_cols, w=100, h=30, score=0.9):
    out = []
    for r in range(n_rows):
        for c in range(n_cols):
            out.append([c * w, r * h, (c + 1) * w, (r + 1) * h, score])
    return out


def test_nms_inter_cross_class_suppression_and_tie_order():
    from pdf_table_spark.core.lgpma import nms_inter
    # class 1's duplicate of box A overlaps > 0.3 with lower score →
    # suppressed; the disjoint box survives
    a = [0, 0, 100, 30, 0.9]
    dup = [5, 2, 95, 28, 0.8]
    other = [200, 0, 300, 30, 0.7]
    boxes, labels = nms_inter([[a], [dup, other]])
    assert boxes == [[0, 0, 100, 30], [200, 0, 300, 30]]
    assert labels == [0, 1]
    # exact score tie: the LATER input box wins (argsort()[::-1])
    t1 = [0, 0, 100, 30, 0.9]
    t2 = [5, 2, 95, 28, 0.9]
    boxes, _ = nms_inter([[t1, t2]])
    assert boxes == [[5, 2, 95, 28]]


def test_plain_grid_reduces_to_rowcol_grid():
    from pdf_table_spark.core.lgpma import cells_from_lgpma
    cells, boxes = cells_from_lgpma([_grid_boxes(2, 3)])
    assert len(boxes) == 6
    assert sorted(cells) == [
        [0, 0, 0, 0], [0, 1, 0, 1], [0, 2, 0, 2],
        [1, 0, 1, 0], [1, 1, 1, 1], [1, 2, 1, 2]]


def test_spanning_cell_spans_both_columns_and_missing_cell_fills():
    from pdf_table_spark.core.lgpma import cells_from_lgpma
    # row 0: one wide cell over 2 columns; row 1: two cells; row 2:
    # only col 0 present → (2,1) must be filled as an empty 1x1
    boxes = [
        [0, 0, 200, 30, 0.9],
        [0, 30, 100, 60, 0.9], [100, 30, 200, 60, 0.9],
        [0, 60, 100, 90, 0.9],
    ]
    cells, kept = cells_from_lgpma([boxes])
    assert cells[:4] == [
        [0, 0, 0, 1],          # the spanning cell: cols 0..1
        [1, 0, 1, 0], [1, 1, 1, 1],
        [2, 0, 2, 0]]
    assert cells[4:] == [[2, 1, 2, 1]]     # empty fill, row-major


def test_rowspan_via_special_relationship():
    from pdf_table_spark.core.lgpma import cells_from_lgpma
    # col 0: one tall cell spanning rows 0-1; col 1: two normal rows.
    boxes = [
        [0, 0, 100, 60, 0.9],
        [100, 0, 200, 30, 0.9], [100, 30, 200, 60, 0.9],
    ]
    cells, _ = cells_from_lgpma([boxes])
    assert cells == [[0, 0, 1, 0], [0, 1, 0, 1], [1, 1, 1, 1]]


def test_ocr_match_join_rules_and_y_insertion_order():
    from pdf_table_spark.core.lgpma import match_ocr_texts
    cell = [0, 0, 100, 100]
    dets = [
        {"x0": 5, "y0": 50, "x1": 95, "y1": 60, "text": "world"},
        {"x0": 5, "y0": 5, "x1": 95, "y1": 15, "text": "hello"},
        {"x0": 5, "y0": 70, "x1": 95, "y1": 80, "text": "%pct"},
        {"x0": 5, "y0": 90, "x1": 95, "y1": 99, "text": "tail"},
    ]
    texts, used = match_ocr_texts([cell], dets)
    # y-sorted: hello world %pct tail; no space before '%'
    assert texts == ["hello world%pct tail"]
    assert used == {0, 1, 2, 3}
    # hyphen suppresses the following space
    dets2 = [
        {"x0": 5, "y0": 5, "x1": 95, "y1": 15, "text": "co-"},
        {"x0": 5, "y0": 50, "x1": 95, "y1": 60, "text": "located"},
    ]
    texts2, _ = match_ocr_texts([cell], dets2)
    assert texts2 == ["co-located"]
    # IoU below 0.75 of the SMALLER area does not match
    far = [{"x0": 90, "y0": 90, "x1": 200, "y1": 200, "text": "x"}]
    t3, u3 = match_ocr_texts([cell], far)
    assert t3 == [""] and u3 == set()


def test_extract_lgpma_table_end_to_end_html():
    from pdf_table_spark.core.lgpma import extract_lgpma_table
    table = {"lgpma": [[
        [0, 0, 200, 30, 0.9],
        [0, 30, 100, 60, 0.9], [100, 30, 200, 60, 0.9],
    ]]}
    dets = [
        {"x0": 10, "y0": 5, "x1": 60, "y1": 25, "text": "head"},
        {"x0": 10, "y0": 35, "x1": 60, "y1": 55, "text": "a"},
        {"x0": 110, "y0": 35, "x1": 160, "y1": 55, "text": "b"},
    ]
    html, used = extract_lgpma_table(table, dets)
    assert used == {0, 1, 2}
    assert html == ('<table border="1"><tbody>'
                    '<tr><td colspan="2" width="100%">head</td></tr>'
                    '<tr><td width="50%">a</td><td width="50%">b</td>'
                    "</tr></tbody></table>")


def test_ocr_page_route_dispatches_lgpma():
    import json

    from pdf_table_spark.core.ocrmatch import extract_ocr_page
    payload = json.dumps({
        "width": 600, "height": 800,
        "det_cells": [
            {"x0": 10, "y0": 105, "x1": 60, "y1": 125, "text": "a"},
            {"x0": 110, "y0": 105, "x1": 160, "y1": 125, "text": "b"},
            {"x0": 10, "y0": 300, "x1": 200, "y1": 315,
             "text": "prose below"},
        ],
        "tables": [{"lgpma": [[
            [0, 100, 100, 130, 0.9], [100, 100, 200, 130, 0.9],
        ]]}],
    })
    frags = extract_ocr_page(payload)
    kinds = [f[0] for f in frags]
    assert kinds == ["table_html", "paragraph"]
    assert ">a</td>" in frags[0][1] and ">b</td>" in frags[0][1]
    assert frags[1][1] == "prose below"
