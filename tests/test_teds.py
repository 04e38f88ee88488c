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
