"""TableMaster/MtlTabNet decode (M10) — hand-computed parity pins
against ``model/table/mtl_tabnet/master_convertor.py`` +
``master_post_processor.py`` semantics."""

import pdf_table_spark.core.masterhead as MH
from pdf_table_spark.core.ocrmatch import deal_bb

D = MH.master_dict()
TD = D.index("<td></td>")          # 2
TR = D.index("<tr>")               # 1
THEAD = D.index("<thead>")         # 0
EOS, PAD, SOS, UKN = 41, 42, 40, 39


def test_dict_layout():
    assert len(D) == 43
    assert D[39:] == ["<UKN>", "<SOS>", "<EOS>", "<PAD>"]


def test_decode_skips_pad_breaks_eos_keeps_specials():
    ids = [THEAD, PAD, TR, UKN, TD, EOS, TR, TR]
    s, score = MH.master_decode_ids(ids, [0.5] * len(ids))
    assert s == "<thead>,<tr>,<UKN>,<td></td>"
    assert score == 0.5
    # empty decode scores 0.0 (reference _get_strings_scores)
    s2, sc2 = MH.master_decode_ids([EOS], [0.9])
    assert s2 == "" and sc2 == 0.0


def test_midstream_pad_shifts_bbox_alignment():
    # the reference computes the mask over the DECODED tokens but
    # multiplies it into the RAW per-step rows — a mid-stream PAD
    # shifts alignment by one. Pin that quirk.
    ids = [TR, PAD, TD, EOS]
    tok, _ = MH.master_decode_ids(ids, [0.5] * 4)
    assert tok == "<tr>,<td></td>"
    rows = [[0.5, 0.5, 0.25, 0.25]] * 4
    out = MH.decode_master_bboxes(rows, tok, (100.0, 100.0),
                                  (1.0, 1.0))
    # mask = [0, 1] applied to rows 0,1 — row 1 is the PAD step's
    # row, not the td's. Truncated to 2 tokens.
    assert out == [[0.0, 0.0, 0.0, 0.0], [50.0, 50.0, 25.0, 25.0]]


def test_bbox_filter_denorm_truncate():
    tok = "<thead>,<td></td>,<td,<td></td>"
    rows = [
        [0.5, 0.5, 0.25, 0.25],     # masked (not td)
        [0.5, 0.25, 0.25, 0.125],   # td, valid
        [1.5, 0.5, 0.25, 0.25],     # td ('<td'), out of [0,1] → zero
        [0.25, 0.5, 0.125, 0.25],   # td, valid
        [0.5, 0.5, 0.5, 0.5],       # beyond tokens → truncated
    ]
    out = MH.decode_master_bboxes(rows, tok, (512.0, 1024.0),
                                  (0.5, 1.0))
    # pad = (h 512, w 1024); x,w ·1024/1.0, y,h ·512/0.5
    assert out == [
        [0.0, 0.0, 0.0, 0.0],
        [512.0, 256.0, 256.0, 128.0],
        [0.0, 0.0, 0.0, 0.0],
        [256.0, 512.0, 128.0, 256.0],
    ]


def test_kept_boxes_sum_filter_and_int_transform():
    rows = [[0.0, 0.0, 0.0, 0.0],          # zeroed → dropped
            [0.25, 0.25, 0.25, 0.25],      # sum 1.0 ≤ 1 → dropped
            [512.0, 256.0, 256.5, 128.0]]  # kept, trunc toward zero
    assert MH.kept_master_boxes(rows) == [(383, 192, 640, 320)]


def test_text_to_list_virtual_closes():
    assert MH.text_to_list("<tr>,<td></td>")[-3:] == [
        "<td></td>", "</tr>", "</tbody>"]
    assert MH.text_to_list("<tr>,</tr>") == [
        "<tr>", "</tr>", "</tbody>"]
    # missing penultimate </tr> spliced in
    assert MH.text_to_list("<tr>,<td></td>,</tbody>") == [
        "<tr>", "<td></td>", "</tr>", "</tbody>"]
    # complete stream untouched
    assert MH.text_to_list("<tr>,</tr>,</tbody>") == [
        "<tr>", "</tr>", "</tbody>"]


def test_insert_drops_td_beyond_cell_list():
    toks = ["<thead>", "<tr>", "<td></td>", "<td></td>", "</tr>",
            "</thead>", "<tbody>", "</tbody>"]
    html = MH.insert_cells_to_tokens(toks, ["a"])
    # the second td vanishes entirely (reference continue-skip)
    assert html == ("<thead><tr><td>a</td></tr></thead>"
                    "<tbody></tbody>")


def test_master_html_bolds_both_sections_and_reverts_empty():
    tok = ",".join(["<thead>", "<tr>", "<td></td>", "<td></td>",
                    "</tr>", "</thead>", "<tbody>", "<tr>",
                    "<td", ' colspan="2"', ">", "</td>", "</tr>",
                    "</tbody>"])
    html = MH.master_html(tok, ["h", "", "v"])
    assert html == (
        "<thead><tr><td><b>h</b></td><td></td></tr></thead>"
        '<tbody><tr><td colspan="2"><b>v</b></td></tr></tbody>')


def test_deal_bb_span_branch_bolds_plain_cells_too():
    part = ('<thead><tr><td colspan="2">h</td><td>x</td>'
            "<td></td></tr></thead>")
    out = deal_bb(part)
    assert '<td colspan="2"><b>h</b></td>' in out
    assert "<td><b>x</b></td>" in out
    assert "<td></td>" in out              # empty revert


def test_deal_bb_tbody_arm():
    html = "<tbody><tr><td>v</td></tr></tbody>"
    assert deal_bb(html, "tbody") == (
        "<tbody><tr><td><b>v</b></td></tr></tbody>")
    # thead arm is a no-op on it
    assert deal_bb(html, "thead") == html


def test_cell_branch_roundtrip_multichar_entry():
    cdict = [" ", "a", "b", "<i>"]
    ids, cell_ids = MH.master_encode(
        ["<td></td>"], ["a<i>b ab"], cdict)
    assert ids[-1] == EOS
    assert MH.decode_cell_ids(cell_ids[0], cdict) == "a<i>b ab"
    # PAD skipped, EOS breaks in the cell walk
    n = len(cdict)
    assert MH.decode_cell_ids(
        [1, n + 3, 2, n + 2, 1], cdict) == "ab"


def test_master_output_end_to_end():
    cdict = ["a", "h", "v"]
    toks = ["<thead>", "<tr>", "<td></td>", "</tr>", "</thead>",
            "<tbody>", "<tr>", "<td></td>", "</tr>", "</tbody>"]
    ids, cell_ids = MH.master_encode(toks, ["h", "v"], cdict)
    rows = [[0.25, 0.25, 0.0, 0.0]] * len(toks) + [[0.0] * 4]
    rows[2] = [0.5, 0.125, 0.25, 0.125]
    rows[7] = [0.5, 0.5, 0.25, 0.125]
    payload = {"ids": ids, "scores": [0.75] * len(ids),
               "bboxes": rows, "pad_shape": [512.0, 512.0],
               "scale_factor": [1.0, 1.0],
               "cells": [{"ids": p} for p in cell_ids],
               "cell_dict": cdict}
    html_wire, boxes = MH.master_output(payload)
    assert html_wire == (
        "<thead><tr><td><b>h</b></td></tr></thead>"
        "<tbody><tr><td><b>v</b></td></tr></tbody>|0.7500")
    assert boxes == ["192,32,320,96", "192,224,320,288"]


def test_deal_isolate_span_repair():
    from pdf_table_spark.core.ocrmatch import deal_isolate_span
    # the reference docstring's own example: a split span prediction
    bad = '<thead><tr><td></td> rowspan="2"></b></td><td>x</td></tr></thead>'
    assert deal_isolate_span(bad) == (
        '<thead><tr><td rowspan="2"></td><td>x</td></tr></thead>')
    both = '<td></td> colspan="3" rowspan="2"></b></td>'
    assert deal_isolate_span(both) == '<td colspan="3" rowspan="2"></td>'


def test_deal_duplicate_bb_collapse():
    from pdf_table_spark.core.ocrmatch import deal_duplicate_bb
    part = "<td><b>a</b> <b>b</b></td>"
    assert deal_duplicate_bb(part) == "<td><b>a b</b></td>"
    # span cell: b's stripped, the '<td>'-only re-wrap never opens a
    # new <b> but the '</td>' replace still closes one — the
    # reference emits this unbalanced '</b>' (a pinned quirk)
    sp = '<td colspan="2"><b>a</b><b>b</b></td>'
    assert deal_duplicate_bb(sp) == '<td colspan="2">ab</b></td>'
    # single pair untouched
    ok = "<td><b>a</b></td>"
    assert deal_duplicate_bb(ok) == ok


def test_deal_bb_runs_repairs():
    from pdf_table_spark.core.ocrmatch import deal_bb
    html = "<thead><tr><td><b>a</b> <b>b</b></td></tr></thead>"
    # bold pass dedupes the cell-edge b's; repair collapses the inner
    assert deal_bb(html) == (
        "<thead><tr><td><b>a b</b></td></tr></thead>")


def test_master_structure_views():
    tok = ",".join(["<thead>", "<tr>", "<td></td>", "</tr>",
                    "</thead>", "<tbody>", "<tr>", "<td",
                    ' colspan="2"', ">", "</td>", "<eb></eb>",
                    "</tr>", "</tbody>"])
    s, lst = MH.master_structure(tok)
    # text-free: no eb expansion (get_table_structure never splices),
    # spans merged, both sections bolded, empty plain td reverted
    assert s == ('<html><body><table border="1">'
                 "<thead><tr><td></td></tr></thead>"
                 '<tbody><tr><td colspan="2"><b></b></td>'
                 "<eb></eb></tr></tbody>"
                 "</table></body></html>")
    assert lst[:4] == ["<html>", "<body>", "<table>", "<thead>"]
    assert '<td colspan="2"></td>' in lst
    assert lst[-3:] == ["</table>", "</body>", "</html>"]


def test_master_roundtrip_property():
    # encode → decode inverts for arbitrary well-formed streams and
    # arbitrary cell texts over an arbitrary dictionary
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = MH.master_dict()[:39]
    texts = st.lists(
        st.text(alphabet="abc <i>", min_size=0, max_size=12),
        min_size=0, max_size=4)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.sampled_from(alphabet), min_size=1,
                    max_size=30), texts)
    def rt(tokens, cell_texts):
        cdict = sorted({c for t in cell_texts for c in t} | {"<i>"})
        # multi-char entry <i> must win the greedy longest match
        ids, cell_ids = MH.master_encode(tokens, cell_texts, cdict)
        tok_str, score = MH.master_decode_ids(
            ids, [0.5] * len(ids))
        assert tok_str == ",".join(tokens)
        for path, text in zip(cell_ids, cell_texts):
            assert MH.decode_cell_ids(path, cdict) == text

    rt()
