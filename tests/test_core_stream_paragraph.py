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
    lines = []
    for r in range(5):
        y = 700 - r * 14
        lines.append(line(100, y, f"k{r}"))
        lines.append(line(210, y, f"v{r}"))
    rows = S.group_rows(lines)
    blocks, prose = S.detect_stream_blocks(rows)
    assert len(blocks) == 1 and prose == []
    cells, bbox = S.build_stream_table(rows, blocks[0])
    assert max(c.row for c in cells) == 4
    assert max(c.col for c in cells) == 1
    html = cells_to_html(cells)
    assert "<td>k0</td><td>v0</td>" in html


def test_short_multi_runs_stay_prose():
    lines = [line(100, 700, "a"), line(210, 700, "b"),
             line(100, 686, "c"), line(210, 686, "d")]  # only 2 rows
    rows = S.group_rows(lines)
    blocks, prose = S.detect_stream_blocks(rows)
    assert blocks == [] and len(prose) == 2


def test_unaligned_columns_stay_prose():
    lines = []
    for r in range(5):
        y = 700 - r * 14
        lines.append(line(100, y, "x"))
        lines.append(line(200 + 17 * r, y, "y"))  # second col drifts
    rows = S.group_rows(lines)
    blocks, _ = S.detect_stream_blocks(rows)
    assert blocks == []


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
