"""TEDS-style diagnostics: identity, structural deltas, text deltas."""

from pdf_table_spark.core.teds import grid_f1, teds_like

T = ('<table border="1"><tbody>'
     '<tr><td>a</td><td>b</td></tr>'
     '<tr><td>c</td><td>d</td></tr>'
     '</tbody></table>')
T_TEXT_DIFF = T.replace(">d<", ">dx<")
T_SPAN = ('<table border="1"><tbody>'
          '<tr><td colspan="2">a</td></tr>'
          '<tr><td>c</td><td>d</td></tr>'
          '</tbody></table>')


def test_identical_tables_score_one():
    assert teds_like(T, T) == 1.0
    f = grid_f1(T, T)
    assert f["f1"] == 1.0 and f["n_pred"] == f["n_gold"] == 4


def test_text_difference_partial_credit():
    s = teds_like(T_TEXT_DIFF, T)
    assert 0.75 < s < 1.0          # 3 exact + 1 similar of 4
    f = grid_f1(T_TEXT_DIFF, T)
    assert f["f1"] == 0.75         # 3 of 4 exact


def test_structural_difference_penalized():
    s = teds_like(T_SPAN, T)
    assert s < 0.75                # colspan cell matches nothing
    f = grid_f1(T_SPAN, T)
    assert f["n_pred"] == 3 and f["recall"] == 0.5


def test_empty_vs_nonempty():
    assert teds_like("<table></table>", T) == 0.0
    assert teds_like("<table></table>", "<table></table>") == 1.0


def test_pair_tables_iou_and_axis():
    from pdf_table_spark.core.teds import pair_tables
    gt = [{"bbox": (0, 0, 50, 30), "axis": (0, 0, 0, 0)},
          {"bbox": (50, 0, 100, 30), "axis": (1, 1, 0, 0)}]
    # pred 0 matches gt 0 exactly; pred 1 overlaps gt 1 but has a
    # wrong logical axis; a third pred matches nothing
    pred = [{"bbox": (1, 1, 49, 29), "axis": (0, 0, 0, 0)},
            {"bbox": (52, 2, 98, 28), "axis": (1, 2, 0, 0)},
            {"bbox": (200, 200, 260, 230), "axis": (5, 5, 5, 5)}]
    out = pair_tables(pred, gt)
    assert out["recall"] == 1.0
    assert abs(out["precision"] - 2 / 3) < 1e-9
    assert out["false_pos"] == 1 and out["false_neg"] == 0
    assert out["axis_accuracy"] == 0.5
    # empty denominators report None like the reference's 'null'
    assert pair_tables([], gt)["precision"] is None
    assert pair_tables(pred, [])["recall"] is None


def test_pair_tables_from_logical_cells():
    from pdf_table_spark.core.lattice import LogicalCell
    from pdf_table_spark.core.teds import pair_tables, table_units
    cells = [LogicalCell(row=0, col=0, row_span=1, col_span=2,
                         x0=0, y0=70, x1=100, y1=100),
             LogicalCell(row=1, col=0, row_span=1, col_span=1,
                         x0=0, y0=40, x1=50, y1=70)]
    units = table_units(cells)
    assert units[0]["axis"] == (0, 1, 0, 0)
    out = pair_tables(units, units)
    assert out["precision"] == out["recall"] == 1.0
    assert out["axis_accuracy"] == 1.0


def test_teds_tree_edit_distance_grading():
    """Real TEDS (Zhang-Shasha): graded cell-text substitution beats a
    full replacement, which beats structural damage."""
    from pdf_table_spark.core.teds import teds
    A = ('<table border="1"><tbody><tr><td>alpha</td><td>bravo</td></tr>'
         '<tr><td>charlie</td><td>deltax</td></tr></tbody></table>')
    assert teds(A, A) == 1.0
    graded = teds(A.replace("deltax", "deltay"), A)   # 1/6 chars
    replaced = teds(A.replace("deltax", "zzzzzz"), A)
    row_gone = teds(
        '<table border="1"><tbody><tr><td>alpha</td><td>bravo</td>'
        "</tr></tbody></table>", A)
    span_changed = teds(A.replace(
        "<td>alpha</td><td>bravo</td>", '<td colspan="2">alpha</td>'), A)
    assert 1.0 > graded > replaced > row_gone > 0.0
    assert span_changed < 1.0                # structural rename costs 1
    assert teds(A, A.replace("deltax", "deltay")) == graded  # symmetric
    # degenerate inputs: the reference scores empty/table-less input
    # 0.0 (table_metric.py:146-149 `if (not pred) or (not true)`)
    assert teds("", "") == 0.0
    assert teds("<p>no table</p>", A) == 0.0


def test_teds_reference_cost_model():
    """Parity details of the reference cost model: thead/tbody count in
    the denominator, in-cell markup rides in the token stream, and
    structure_only ignores text entirely."""
    from pdf_table_spark.core.teds import teds
    A = ("<table><thead><tr><td>h1</td><td>h2</td></tr></thead>"
         "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>")
    assert teds(A, A) == 1.0
    # bolding one header cell is a graded (token-level) change, not a
    # structural one; dropping tbody IS structural
    bolded = teds(A.replace("<td>h1</td>", "<td><b>h1</b></td>"), A)
    assert 0.0 < bolded < 1.0
    assert teds(A, A, structure_only=True) == 1.0
    assert teds(A.replace("h1", "zz"), A, structure_only=True) == 1.0
    # denominator = max element count (.//* under table): A has
    # thead+tbody+2*tr+4*td = 8; removing the thead row deletes
    # thead+tr+2td = 4 nodes -> similarity 1 - 4/8
    import pytest as _pytest
    no_head = teds("<table><tbody><tr><td>a</td><td>b</td></tr>"
                   "</tbody></table>", A)
    assert no_head == _pytest.approx(1 - 4 / 8)


def test_teds_hand_computed_distances():
    """Exact TED values walked by hand against the reference cost
    model (table_metric.py:41-51,143-167): unit insert/delete, unit
    rename on tag/colspan/rowspan change, normalized-Levenshtein
    rename on td content; similarity = 1 - TED / max node count."""
    from pdf_table_spark.core.teds import teds
    A = "<table><tr><td>ab</td></tr></table>"
    # one inserted td: TED=1, nodes max(2,3)=3
    B = "<table><tr><td>ab</td><td>cd</td></tr></table>"
    assert teds(A, B) == round(1 - 1 / 3, 6)
    # one-char text edit: rename cost lev(ab,az)=1/2, nodes 2
    C = "<table><tr><td>az</td></tr></table>"
    assert teds(A, C) == 1 - 0.5 / 2
    # colspan change: full unit rename
    D = '<table><tr><td colspan="2">ab</td></tr></table>'
    assert teds(A, D) == 1 - 1 / 2
    # tag rename (thead vs tbody), content untouched
    E = "<table><thead><tr><td>x</td></tr></thead></table>"
    F = "<table><tbody><tr><td>x</td></tr></tbody></table>"
    assert teds(E, F) == round(1 - 1 / 3, 6)
