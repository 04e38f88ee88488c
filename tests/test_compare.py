"""Diff-classification categories (reference TableResultCompare)."""

from pdf_table_spark.core.compare import classify_table_diff

BASE = ('<table border="1"><tbody>'
        '<tr><td>a</td><td>b</td></tr>'
        '<tr><td>c</td><td>d</td></tr></tbody></table>')


def test_same_and_width_only():
    assert classify_table_diff(BASE, BASE) == "SAME"
    widthy = BASE.replace("<td>a</td>", '<td width="50%">a</td>')
    assert classify_table_diff(widthy, BASE) == "REMOVE_WIDTH_SAME"


def test_span_differences():
    # same anchors/texts, pred adds a rowspan on (0,0)... build a gold
    # where (0,0) spans 2 rows vs pred where it doesn't requires same
    # anchor sets; use colspan variant: (0,0) text 'a' colspan 2 vs 1
    pred = ('<table border="1"><tbody>'
            '<tr><td colspan="2">a</td></tr>'
            '<tr><td>c</td><td>d</td></tr></tbody></table>')
    gold = ('<table border="1"><tbody>'
            '<tr><td colspan="2" rowspan="1">a</td></tr>'
            '<tr><td>c</td><td>d</td></tr></tbody></table>')
    assert classify_table_diff(pred, gold) == "REMOVE_WIDTH_SAME"

    gold2 = pred.replace('colspan="2"', 'colspan="2" rowspan="2"') \
        .replace("<tr><td>c</td><td>d</td></tr>", "<tr><td>c</td></tr>")
    # differing anchor sets → falls through to text comparison
    out = classify_table_diff(pred, gold2)
    assert out in ("DIFF_CELL_DIFF_ROW", "DIFF_TEXT_PREDICT_LESS_WORDS",
                   "DIFF_TEXT_LABEL_LESS_WORDS")


def test_placement_and_text_differences():
    moved = ('<table border="1"><tbody>'
             '<tr><td>b</td><td>a</td></tr>'
             '<tr><td>c</td><td>d</td></tr></tbody></table>')
    assert classify_table_diff(moved, BASE) == "DIFF_CELL_DIFF_ROW"

    less = BASE.replace("<td>d</td>", "<td></td>")
    assert classify_table_diff(less, BASE) == "DIFF_TEXT_PREDICT_LESS_WORDS"
    assert classify_table_diff(BASE, less) == "DIFF_TEXT_LABEL_LESS_WORDS"

    other = BASE.replace("<td>d</td>", "<td>zzz</td>")
    assert classify_table_diff(other, BASE) == "DIFF_TEXT_INCONSISTENT"


def test_word_level_containment_not_char_subsequence():
    """pred 'bc' vs gold 'ab cd': no shared word → INCONSISTENT, even
    though 'bc' is a char-subsequence of 'abcd' (the old misfire)."""
    pred = '<table border="1"><tbody><tr><td>bc</td></tr></tbody></table>'
    gold = ('<table border="1"><tbody>'
            '<tr><td>ab cd</td></tr></tbody></table>')
    assert classify_table_diff(pred, gold) == "DIFF_TEXT_INCONSISTENT"

    # true word subset still classifies: 'ab' ⊂ {'ab','cd'}
    sub = '<table border="1"><tbody><tr><td>ab</td></tr></tbody></table>'
    assert classify_table_diff(sub, gold) == "DIFF_TEXT_PREDICT_LESS_WORDS"
