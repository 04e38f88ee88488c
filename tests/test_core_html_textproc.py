"""HTML parse/serialize round-trips (X9, X10) and text post-processing
(X2) unit tests."""

from pdf_table_spark.core.html import (
    canonicalize_table_html, cells_to_html, parse_table_html)
from pdf_table_spark.core.textproc import ocr_post_process, text_strip


def test_parse_simple_table():
    cells = parse_table_html(
        "<table><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table>")
    assert [(c.row, c.col, c.text) for c in cells] == [
        (0, 0, "a"), (0, 1, "b"), (1, 0, "c"), (1, 1, "d")]


def test_parse_spans_occupancy():
    cells = parse_table_html(
        '<table><tr><td rowspan="2">tall</td><td>b</td></tr>'
        "<tr><td>c</td></tr></table>")
    pos = {(c.row, c.col): c.text for c in cells}
    assert pos[(0, 0)] == "tall"
    assert pos[(1, 1)] == "c"  # shifted right past the occupied cell


def test_canonicalize_round_trip_stable():
    src = ('<table><tr><td colspan="2">h</td></tr>'
           "<tr><td>a</td><td>b</td></tr></table>")
    once = canonicalize_table_html(src)
    twice = canonicalize_table_html(once)
    assert once == twice
    assert '<td colspan="2">h</td>' in once
    assert once.startswith('<table border="1"><tbody>')


def test_eb_token_and_th_handling():
    cells = parse_table_html(
        "<table><tr><th>H</th><eb></eb></tr></table>")
    assert [(c.text) for c in cells] == ["H", ""]


def test_br_to_newline_and_back():
    cells = parse_table_html("<table><tr><td>x<br/>y</td></tr></table>")
    assert cells[0].text == "x\ny"
    assert "x<br/>y" in cells_to_html(cells)


def test_all_rowspan_equal_fix():
    from pdf_table_spark.core.lattice import LogicalCell
    row = [LogicalCell(row=0, col=c, row_span=2, col_span=1,
                       x0=0, y0=0, x1=0, y1=0, texts=[f"c{c}"])
           for c in range(2)]
    html = cells_to_html(row)
    assert "rowspan" not in html  # the reference's all-equal fix


def test_ocr_post_process():
    assert ocr_post_process("O") == "0"
    assert ocr_post_process("o") == "0"
    assert ocr_post_process("1.234.56") == "1,234.56"
    assert ocr_post_process("1.234.567.89") == "1,234,567.89"
    assert ocr_post_process("12.34") == "12.34"
    assert ocr_post_process("hello") == "hello"


def test_text_strip():
    assert text_strip("a-b_c", "-_") == "abc"
    assert text_strip("abc", "") == "abc"


def test_flag_font_size():
    from pdf_table_spark.core.textproc import flag_font_size
    # trailing superscript: minority-height run wrapped
    assert flag_font_size("ab2", [10.0, 10.0, 6.0]) == "ab<s>2</s>"
    # uniform heights: unchanged
    assert flag_font_size("abc", [10.0, 10.0, 10.0]) == "abc"
    # blank minority run: dropped, not flagged
    assert flag_font_size("ab ", [10.0, 10.0, 6.0]) == "ab"
    # interior subscript run
    assert flag_font_size("H2O", [10.0, 6.0, 10.0]) == "H<s>2</s>O"
    # missing/mismatched heights: passthrough
    assert flag_font_size("abc", None) == "abc"
    assert flag_font_size("abc", [10.0]) == "abc"


def test_tiny_image_filtered_from_page():
    import json

    from pdf_table_spark.core.page import extract_pdf_page
    page = {"width": 612.0, "height": 792.0,
            "text_lines": [], "rects": [],
            "images": [
                {"x0": 10, "y0": 10, "x1": 14, "y1": 14,
                 "name": "img://tiny"},            # area 16 < 20 → drop
                {"x0": 100, "y0": 100, "x1": 200, "y1": 180,
                 "name": "img://real"}]}
    frags = extract_pdf_page(json.dumps(page), "m")
    refs = [f[2] for f in frags if f[0] == "image"]
    assert refs == ["img://real"]
