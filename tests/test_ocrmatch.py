"""OCR-path dataflow unit tests: F4 filter, J2 top-1 match, J3 3-tier
match composition, X10 token splice (merge spans, eb expansion, thead
bolding, virtual rows)."""

import json
import random

from pdf_table_spark.core import ocrmatch as M

CELL = lambda x0, y0, x1, y1, t: {  # noqa: E731
    "x0": x0, "y0": y0, "x1": x1, "y1": y1, "text": t}


def test_f4_filter_above_table():
    preds = [(0, 100, 50, 130), (0, 130, 50, 160)]
    dets = [CELL(0, 10, 40, 30, "title"),     # fully above → dropped
            CELL(0, 90, 40, 110, "overhang"),  # crosses top → kept
            CELL(5, 105, 45, 125, "in")]
    kept = M.filter_ocr_cells(preds, dets)
    assert [c["text"] for c in kept] == ["overhang", "in"]


def test_j2_match_result_iou_then_distance():
    preds = [(0, 0, 50, 30), (60, 0, 110, 30)]
    dets = [(5, 5, 45, 25),    # inside pred 0
            (62, 4, 100, 26),  # inside pred 1
            (48, 2, 70, 28)]   # straddles: higher overlap with pred 1
    m = M.match_result(dets, preds)
    assert m[0] == [0]
    assert sorted(m[1]) == [1, 2]


def test_3tier_center_iou_distance_extra():
    masters = [(0, 0, 50, 30), (60, 0, 110, 30)]
    dets = [
        (10, 10, 40, 20),      # tier 1: center in master 0
        (58, -12, 100, 6),     # tier 2: center above, IoU>0 w/ master 1
        (130, 5, 160, 25),     # tier 3/extra: no overlap at all
        (200, 100, 230, 120),  # extra: far away row
    ]
    match, extra = M.match_3tier(dets, masters)
    d = dict()
    for i, j in match:
        d.setdefault(j, []).append(i)
    assert d[0] == [0]
    assert 1 in d[1]
    # all dets matched somewhere (extra_match virtualizes leftovers)
    assert {i for i, _ in match} == {0, 1, 2, 3}


def test_3tier_distance_rule_for_unmatched_master():
    masters = [(0, 0, 50, 30), (60, 0, 110, 30)]
    dets = [(10, 10, 40, 20),     # center in master 0
            (70, 40, 100, 55)]    # below master 1, no overlap
    match, extra = M.match_3tier(dets, masters)
    assert (1, 1) in match  # distance rule pairs det 1 to master 1
    assert extra == []


def test_merge_span_tokens():
    toks = ["<tr>", "<td", ' colspan="2"', ">", "</td>", "<td></td>",
            "</tr>", "</tbody>"]
    merged = M.merge_span_tokens(toks)
    assert '<td colspan="2"></td>' in merged
    assert merged[-1] == "</tbody>"
    both = ["<td", ' rowspan="2"', ' colspan="3"', ">", "</td>",
            "</tbody>"]
    assert '<td rowspan="2" colspan="3"></td>' in M.merge_span_tokens(both)


def test_insert_and_eb_expansion():
    toks = ["<tbody>", "<tr>", "<td></td>", "<eb></eb>", "<td></td>",
            "</tr>", "</tbody>"]
    html = M.insert_text_to_tokens(toks, {0: "a", 1: "b"})
    # eb is NOT a td token: indexes skip it; eb expands to empty td
    assert html == "<tbody><tr><td>a</td><td></td><td>b</td></tr></tbody>"


def test_deal_bb_bolds_thead():
    html = ("<thead><tr><td>h1</td><td>h2</td></tr></thead>"
            "<tbody><tr><td>x</td></tr></tbody>")
    out = M.deal_bb(html)
    assert "<td><b>h1</b></td>" in out and "<td><b>h2</b></td>" in out
    assert "<td>x</td>" in out  # body untouched
    spanned = ('<thead><tr><td colspan="2">h</td></tr></thead>'
               "<tbody></tbody>")
    assert '<td colspan="2"><b>h</b></td>' in M.deal_bb(spanned)


def test_reduce_repeat_bold_and_multimatch_join():
    texts = ["<b>Local</b>", "<b>government</b>"]
    assert M.reduce_repeat_bold(texts, " ") == ["<b>Local government</b>"]
    mixed = ["<b>a</b>", "plain"]
    assert M.reduce_repeat_bold(mixed, " ") == mixed
    joined = M.match_texts([(0, 0), (1, 0)], ["alpha", "beta"])
    assert joined == {0: "alpha beta"}


def test_virtual_rows_only_on_truncated_stream():
    complete = ["<tbody>", "<tr>", "<td></td>", "</tr>", "</tbody>"]
    assert M.extend_virtual_rows(complete, [[5], [6, 7]]) == complete
    cut = ["<tbody>", "<tr>", "<td></td>"]
    out = M.extend_virtual_rows(cut, [[5, 6]])
    assert out == ["<tbody>", "<tr>", "<td></td>", "</tr>", "<tr>",
                   "<td></td>", "<td></td>", "</tr>", "</tbody>"]


def test_extract_ocr_page_fixture_roundtrip():
    """Every det text lands in the output; tables + remainder text in
    reading order; deterministic."""
    from pdf_table_spark.fixtures.generator import _ocr_page
    for s in range(10):
        payload = _ocr_page(random.Random(s))
        p = json.loads(payload)
        frags = M.extract_ocr_page(payload)
        assert frags == M.extract_ocr_page(payload)
        html = "".join(f[1] for f in frags)
        for c in p["det_cells"]:
            assert c["text"].split()[0] in html, (s, c["text"])
        tables = [f for f in frags if f[0] == "table_html"]
        assert len(tables) == 1
        assert "<thead>" in tables[0][1] and "<b>" in tables[0][1]


def test_ocr_page_remainder_becomes_paragraphs():
    payload = json.dumps({
        "width": 600, "height": 800,
        "det_cells": [
            CELL(10, 300, 80, 320, "caption"),
            CELL(90, 301, 150, 321, "below table"),
            CELL(10, 50, 60, 70, "in"),
        ],
        "tables": [{"tokens": ["<tbody>", "<tr>", "<td></td>", "</tr>",
                               "</tbody>"],
                    "cell_bboxes": [[0, 40, 100, 80]]}]})
    frags = M.extract_ocr_page(payload)
    assert frags[0][0] == "table_html" and ">in<" in frags[0][1]
    assert frags[1][0] == "paragraph"
    assert frags[1][1] == "caption below table"  # row-joined, x order


def test_orientation_vote_flip():
    """M4: strict majority of flipped det lines rotates the page 180°;
    minority flags are ignored."""
    page = {"width": 100.0, "height": 200.0,
            "det_cells": [
                {"x0": 10, "y0": 20, "x1": 30, "y1": 40, "text": "a",
                 "flipped": True},
                {"x0": 50, "y0": 20, "x1": 70, "y1": 40, "text": "b",
                 "flipped": True},
                {"x0": 10, "y0": 60, "x1": 30, "y1": 80, "text": "c",
                 "flipped": False}],
            "tables": [{"tokens": ["<td></td>"],
                        "cell_bboxes": [[0, 0, 100, 100]]}]}
    out = M.orientation_vote_flip(page)
    assert out["det_cells"][0]["x0"] == 70 and out["det_cells"][0]["y0"] == 160
    assert out["tables"][0]["cell_bboxes"][0] == [0, 100, 100, 200]
    # 1 of 3 flipped: no rotation
    page["det_cells"][1]["flipped"] = False
    same = M.orientation_vote_flip(page)
    assert same["det_cells"][0]["x0"] == 10
    # exactly half: no rotation (strict majority required)
    two = {**page, "det_cells": page["det_cells"][:2]}
    two["det_cells"][0]["flipped"] = True
    two["det_cells"][1]["flipped"] = False
    assert M.orientation_vote_flip(two)["det_cells"][0]["x0"] == 10


def test_upside_down_page_extracts_all_text():
    import random

    from pdf_table_spark.fixtures.generator import _ocr_page
    flipped_seen = 0
    for s in range(40):
        payload = _ocr_page(random.Random(s))
        p = json.loads(payload)
        if any(c.get("flipped") for c in p["det_cells"]):
            flipped_seen += 1
            frags = M.extract_ocr_page(payload)
            html = "".join(f[1] for f in frags)
            for c in p["det_cells"]:
                assert c["text"].split()[0] in html, (s, c["text"])
    assert flipped_seen >= 3  # the variant actually occurs


def test_unconsumed_dets_survive_as_page_text():
    """Review regression: a det fully above the table (F4-dropped) and
    a stray det near a COMPLETE prediction (extra_match not rendered)
    must fall through to page text, never vanish."""
    payload = json.dumps({
        "width": 600, "height": 800,
        "det_cells": [
            CELL(10, 12, 80, 28, "caption_above"),  # fully above table
            CELL(10, 50, 60, 70, "in_cell"),
            CELL(200, 52, 240, 68, "stray_no_overlap"),
        ],
        "tables": [{"tokens": ["<tbody>", "<tr>", "<td></td>", "</tr>",
                               "</tbody>"],            # COMPLETE stream
                    "cell_bboxes": [[0, 40, 100, 80]]}]})
    frags = M.extract_ocr_page(payload)
    all_text = " ".join(f[1] for f in frags)
    assert "caption_above" in all_text
    assert "in_cell" in all_text
    assert "stray_no_overlap" in all_text
    paras = " ".join(f[1] for f in frags if f[0] == "paragraph")
    assert "caption_above" in paras  # specifically as page prose
