"""Stream-table detection and paragraph sessionization unit tests
(SURVEY §2 A2-A7, W1)."""

from pdf_table_spark.core import paragraph as P
from pdf_table_spark.core import stream as S
from pdf_table_spark.core.html import cells_to_html


def line(x, y, s, w=None):
    w = w if w is not None else 6.0 * len(s)
    return {"x0": x, "y0": y, "x1": x + w, "y1": y + 10.0,
            "text": s, "dir": "h"}


def test_group_rows_by_y_tolerance():
    rows = S.group_rows([
        line(10, 100, "a"), line(80, 101, "b"),   # same row (tol 2)
        line(10, 80, "c")])
    assert len(rows) == 2
    assert [t["text"] for t in rows[0]] == ["a", "b"]


def test_stream_table_detected_and_built():
    """A6/A7/A4: six aligned rows clear the textedge validity gate
    (intersections > 4) and reconstruct a 6x2 grid."""
    lines = []
    for r in range(6):
        y = 700 - r * 14
        lines.append(line(100, y, f"k{r}"))
        lines.append(line(210, y, f"v{r}"))
    tables, consumed = S.extract_stream_tables(lines)
    assert len(tables) == 1 and len(consumed) == len(lines)
    cells, bbox, acc, ws = tables[0]
    assert max(c.row for c in cells) == 5
    assert max(c.col for c in cells) == 1
    assert acc > 99.0 and ws == 0.0  # clean placement, no empty cells
    html = cells_to_html(cells)
    assert "<td>k0</td><td>v0</td>" in html


def test_textedge_validity_gate():
    """A 5-row column gives intersections=4, NOT > 4 → no valid edge →
    no table (the reference's TEXTEDGE_REQUIRED_ELEMENTS gate)."""
    lines = []
    for r in range(5):
        y = 700 - r * 14
        lines.append(line(100, y, f"k{r}"))
        lines.append(line(210, y, f"v{r}"))
    tables, consumed = S.extract_stream_tables(lines)
    assert tables == [] and consumed == set()


def test_short_multi_runs_stay_prose():
    lines = [line(100, 700, "ab"), line(210, 700, "bc"),
             line(100, 686, "cd"), line(210, 686, "de")]  # only 2 rows
    tables, consumed = S.extract_stream_tables(lines)
    assert tables == [] and consumed == set()


def test_prose_single_column_rejected():
    """One-column areas (mode of row lengths == 1 after the drop-1s
    fallback) are not tables — prose pages stay prose."""
    lines = [line(72, 700 - r * 14, f"full width prose line {r} ", w=440)
             for r in range(8)]
    tables, consumed = S.extract_stream_tables(lines)
    assert tables == [] and consumed == set()


def test_spanning_header_interleaved_table():
    """F-I shape: a full-width 1-item header row inside an aligned run
    must NOT break the table (the old consecutive-run detector split
    here); mode-of-row-lengths keeps ncols=2."""
    lines = []
    y = 700.0
    for r in range(8):
        if r == 4:
            lines.append(line(100, y, "section header spanning", w=280))
            y -= 14
        lines.append(line(100, y, f"k{r}"))
        lines.append(line(210, y, f"v{r}"))
        y -= 14
    tables, consumed = S.extract_stream_tables(lines)
    assert len(tables) == 1 and len(consumed) == len(lines)
    cells, bbox, acc, ws = tables[0]
    assert max(c.col for c in cells) == 1
    assert max(c.row for c in cells) == 8  # 8 data rows + header row
    texts = {c.text for c in cells}
    assert "section header spanning" in texts


def test_ragged_rows_mode_column_count():
    """A4: rows missing one cell don't change the inferred ncols."""
    lines = []
    for r in range(8):
        y = 700 - r * 14
        lines.append(line(100, y, f"k{r}"))
        if r not in (2, 5):  # two ragged rows
            lines.append(line(210, y, f"v{r}"))
        lines.append(line(320, y, f"w{r}"))
    tables, _ = S.extract_stream_tables(lines)
    assert len(tables) == 1
    cells, _, _, ws = tables[0]
    assert max(c.col for c in cells) == 2
    assert ws > 0.0  # the two missing cells are empty → whitespace


def test_paragraph_sessionization_indent_starts():
    # margins: most lines start at 72; indented starts at 92 (=2 fonts)
    lines = [
        line(92, 700, "One "), line(72, 686, "two ", w=440),
        line(72, 672, "three.", w=200),
        line(92, 650, "Four "), line(72, 636, "five.", w=300),
    ]
    paras = P.merge_paragraphs(lines)
    assert [p["text"] for p in paras] == ["One two three.", "Four five."]
    assert paras[0]["y1"] > paras[1]["y1"]


def test_paragraph_single_line_doc():
    paras = P.merge_paragraphs([line(72, 700, "only")])
    assert len(paras) == 1 and paras[0]["text"] == "only"


def test_classify_line_types():
    min_x, max_x, font = 72.0, 512.0, 10.0
    start = {"x0": 92.0, "x1": 512.0}
    mid = {"x0": 72.0, "x1": 512.0}
    end = {"x0": 72.0, "x1": 300.0}
    assert P.classify_line(start, min_x, max_x, font) == P.START
    assert P.classify_line(mid, min_x, max_x, font) == P.MIDDLE
    assert P.classify_line(end, min_x, max_x, font) == P.END
