"""Round-5 deterministic neural-postprocess halves: DBNet
probability-map → boxes (core.dbnet), CTC greedy decode
(core.ctchead), SLANet structure-token decode (core.slanethead) —
hand-computed cases, reference-semantics pins, and the distributed
arm through the model seam."""

import math

import numpy as np
import pytest

from pdf_table_spark.core import dbnet
from pdf_table_spark.core.ctchead import (CTC_CHARSET, ctc_decode,
                                          ctc_encode, format_rec)
from pdf_table_spark.core.slanethead import (format_slanet,
                                             slanet_decode,
                                             slanet_dict,
                                             slanet_encode)

# ------------------------------------------------------------------ db


def test_db_axis_blob_hand_computed():
    # 8x4 blob at (10,5) on a 40x30 map, dest 160x120 (scale 4):
    # d = w*h*2/(2(w+h)) = 64/24 = 8/3; box = blob grown by d, x4
    m = dbnet.prob_map_from_payload(
        {"h": 30, "w": 40, "base": 0.05,
         "blobs": [[10, 5, 18, 9, 0.9]]})
    boxes, scores = dbnet.db_postprocess(m, 160, 120)
    d = 8.0 / 3.0
    exp = [round((10 - d) * 4), round((5 - d) * 4),
           round((18 + d) * 4), round((5 - d) * 4),
           round((18 + d) * 4), round((9 + d) * 4),
           round((10 - d) * 4), round((9 + d) * 4)]
    assert boxes == [exp]
    assert scores[0] == pytest.approx(0.9)


def test_db_gates():
    # sub-threshold score (0.5 < box_thresh 0.7) and tiny (sside < 3)
    # blobs are rejected; separated blobs stay separate boxes
    m = dbnet.prob_map_from_payload(
        {"h": 64, "w": 64, "blobs": [
            [4, 4, 14, 10, 0.9], [20, 4, 30, 10, 0.9],
            [4, 20, 14, 26, 0.5], [40, 40, 42, 42, 0.9]]})
    boxes, _ = dbnet.db_postprocess(m, 256, 256)
    assert len(boxes) == 2
    # everything below the binarize threshold yields no regions
    m2 = dbnet.prob_map_from_payload(
        {"h": 16, "w": 16, "blobs": [[2, 2, 12, 10, 0.2]]})
    assert dbnet.db_postprocess(m2, 64, 64) == ([], [])


def test_db_eight_connectivity_merges_diagonal():
    # two rects touching only at a corner: 8-connectivity makes ONE
    # region (cv2.findContours outlines them as one outer contour)
    m = np.zeros((20, 20))
    m[2:6, 2:6] = 0.9
    m[6:10, 6:10] = 0.9
    bitmap = (m > 0.3).astype(np.uint8)
    assert len(dbnet.connected_regions(bitmap)) == 1


def test_min_area_rect_rotated_square():
    # diamond (2,0),(4,2),(2,4),(0,2): min rect is the rotated square
    # itself, side 2*sqrt(2)
    pts = np.array([[2, 0], [4, 2], [2, 4], [0, 2]], float)
    box, sside = dbnet.min_area_rect(pts)
    assert sside == pytest.approx(2 * math.sqrt(2))
    # corners are the diamond's vertices (in get_mini_boxes order)
    got = sorted(map(tuple, np.round(box, 9).tolist()))
    assert got == [(0.0, 2.0), (2.0, 0.0), (2.0, 4.0), (4.0, 2.0)]


def test_min_area_rect_l_shape_is_bounding_of_hull():
    # an axis-aligned L: the min-area rect equals the bounding box
    pts = [(x, y) for x in range(7) for y in range(3)]
    pts += [(x, y) for x in range(3) for y in range(3, 9)]
    box, sside = dbnet.min_area_rect(np.array(pts, float))
    assert sside == pytest.approx(6.0)
    assert sorted(map(tuple, np.round(box, 9).tolist())) == [
        (0.0, 0.0), (0.0, 8.0), (6.0, 0.0), (6.0, 8.0)]


def test_unclip_rect_grows_by_d_each_side():
    box = np.array([[10, 5], [18, 5], [18, 9], [10, 9]], float)
    d = (8 * 4 * 1.5) / (2 * (8 + 4))            # ratio 1.5 -> 2.0
    grown, sside = dbnet.min_area_rect(dbnet.unclip(box, 1.5))
    assert sside == pytest.approx(4 + 2 * d)
    assert grown[:, 0].min() == pytest.approx(10 - d)
    assert grown[:, 0].max() == pytest.approx(18 + d)
    assert grown[:, 1].min() == pytest.approx(5 - d)
    assert grown[:, 1].max() == pytest.approx(9 + d)


def test_box_score_fast_center_in_mean():
    m = np.full((10, 10), 0.1)
    m[2:6, 3:8] = 0.8
    box = np.array([[3, 2], [8, 2], [8, 6], [3, 6]], float)
    assert dbnet.box_score_fast(m, box) == pytest.approx(0.8)
    # half-covering box averages the two values
    box2 = np.array([[3, 2], [8, 2], [8, 10], [3, 10]], float)
    exp = (0.8 * 20 + 0.1 * 20) / 40
    assert dbnet.box_score_fast(m, box2) == pytest.approx(exp)


# ----------------------------------------------------------------- ctc


def test_ctc_decode_reference_semantics():
    # path [a a blank a b b] -> dedup keeps (a, blank, a, b), blanks
    # dropped -> "aab"... hand-walk: kept steps = 0 (a), 2 (blank),
    # 3 (a), 4 (b) -> minus blank -> a, a, b
    a = CTC_CHARSET.index("a")
    b = CTC_CHARSET.index("b")
    text, conf = ctc_decode([a, a, 0, a, b, b],
                            [0.9, 0.8, 0.7, 0.6, 0.5, 0.4])
    assert text == "aab"
    assert conf == pytest.approx((0.9 + 0.6 + 0.5) / 3)
    # all-blank path -> empty with conf 0 (the reference's [0])
    assert ctc_decode([0, 0, 0]) == ("", 0.0)
    # probs default to 1.0
    assert ctc_decode([a, b]) == ("ab", 1.0)


def test_ctc_encode_roundtrip():
    for s in ("hello world", "12.5%", "aa bb", "x", "total sum 99"):
        text, conf = ctc_decode(ctc_encode(s))
        assert text == s, s
    assert format_rec("ab", 0.9000000000000001) == "ab|0.9000"


# -------------------------------------------------------------- slanet


def test_slanet_decode_hand_computed():
    chars = slanet_dict()
    td = chars.index("<td></td>")
    tr, trc = chars.index("<tr>"), chars.index("</tr>")
    eos = len(chars) - 1
    ids = [tr, td, td, trc, eos, td]           # stops AT eos
    bb = [[0, 0, 0, 0], [0.25, 0.5, 0.5, 0.75],
          [0.5, 0.5, 0.75, 0.75], [0, 0, 0, 0], [0, 0, 0, 0],
          [0.1, 0.1, 0.2, 0.2]]
    tokens, cells = slanet_decode(ids, bb, (100, 200))
    assert tokens == ["<tr>", "<td></td>", "<td></td>", "</tr>"]
    assert cells == [[50.0, 50.0, 100.0, 75.0],
                     [100.0, 50.0, 150.0, 75.0]]
    # sos (index 0) is skipped, not a stop; eos at step 0 is skipped
    tokens2, _ = slanet_decode([eos, 0, tr, trc], bb[:4], (10, 10))
    assert tokens2 == ["<tr>", "</tr>"]


def test_slanet_encode_roundtrip_and_spans():
    tokens = ["<thead>", "<tr>", "<td></td>", "</tr>", "</thead>",
              "<tbody>", "<tr>", "<td", ' colspan="2"', ">", "</td>",
              "</tr>", "</tbody>"]
    cells = [[32.0, 32.0, 120.0, 88.0], [32.0, 96.0, 208.0, 152.0]]
    ids, rows = slanet_encode(tokens, cells, (512, 512))
    got_t, got_c = slanet_decode(ids, rows, (512, 512))
    assert got_t == tokens
    assert got_c == cells                      # exact: /512 then *512
    wire = format_slanet(got_t, got_c)
    assert wire.startswith("<thead><tr><td></td></tr></thead>")
    assert "|32.0,32.0,120.0,88.0;32.0,96.0,208.0,152.0" in wire


def test_slanet_merge_no_span_structure():
    merged = slanet_dict(merge_no_span_structure=True)
    assert "<td></td>" in merged
    # bare '<td>' never in the pubtabnet alphabet; '<td' (attr form)
    # must survive the merge switch
    assert "<td" in merged


# -------------------------------------------------- distributed arm


def test_score_neural_decoders_matches_plants(spark, fixture_root):
    import json
    import os

    import duckdb

    from pdf_table_spark.spark.model_stage import score_neural_decoders
    fx = os.path.join(fixture_root, "sf0.001")
    docs = spark.read.parquet(
        os.path.join(fx, "documents_spans.parquet"))
    got = score_neural_decoders(
        docs, weights_path=os.path.join(fx, "neural_head.npz")
    ).collect()
    assert got, "fixtures carry no neural contracts?"
    by_kind = {}
    for r in got:
        by_kind.setdefault(r.kind, []).append(r)
    assert {"db_box", "rec_text", "slanet", "cn_poly"} <= set(by_kind)
    assert set(by_kind) <= {"db_box", "rec_text", "slanet", "cn_poly",
                            "layout_box"}
    # rec/slanet: every planted gt decoded verbatim
    rows = duckdb.sql(f"""
        select doc_id, s."offset" as off, s.text as text
        from (select doc_id, unnest(spans) as s from
              read_parquet('{fx}/documents_spans.parquet/*.parquet'))
        where s.kind = 'ocr_page'""").fetchall()
    want_rec, want_sl = [], []
    for did, off, text in rows:
        p = json.loads(text)
        for ln in p.get("rec_lines") or ():
            want_rec.append((did, off, ln["gt"] + "|0.9000"))
        if p.get("slanet"):
            want_sl.append((did, off, p["slanet"]["gt"]))
    assert sorted((r.doc_id, r.offset, r.text)
                  for r in by_kind["rec_text"]) == sorted(want_rec)
    assert sorted((r.doc_id, r.offset, r.text)
                  for r in by_kind["slanet"]) == sorted(want_sl)
    # centernet: one polygon per planted above-threshold center
    want_cn = {}
    for did, off, text in rows:
        cnp = json.loads(text).get("centernet")
        if cnp:
            want_cn[(did, off)] = sum(
                1 for c in cnp["centers"] if c[2] > 0.3)
    got_cn = {}
    for r in by_kind["cn_poly"]:
        got_cn[(r.doc_id, r.offset)] = \
            got_cn.get((r.doc_id, r.offset), 0) + 1
    assert got_cn == want_cn


def test_db_score_mode_slow_vs_fast_on_L_blob():
    import numpy as np

    from pdf_table_spark.core.dbnet import db_postprocess
    # L-shaped region: ink 0.9 on the L, the bbox's empty corner
    # dilutes the FAST mean below box_thresh while SLOW (region-pixel
    # mean) stays at 0.9 — reference box_score_slow semantics
    pred = np.zeros((64, 64))
    pred[10:30, 10:18] = 0.9     # vertical bar of the L
    pred[22:30, 10:34] = 0.9     # foot of the L
    fast = db_postprocess(pred, 64, 64, {"box_thresh": 0.7})
    slow = db_postprocess(pred, 64, 64, {"box_thresh": 0.7,
                                         "score_mode": "slow"})
    assert fast[0] == []         # bbox mean ≈ 0.52 < 0.7 → dropped
    assert len(slow[0]) == 1 and abs(slow[1][0] - 0.9) < 1e-9
    # bad mode rejected
    import pytest
    with pytest.raises(ValueError):
        db_postprocess(pred, 64, 64, {"score_mode": "best"})


def test_db_score_slow_fills_holes_like_fillpoly():
    import numpy as np

    from pdf_table_spark.core.dbnet import box_score_slow
    # ring of 0.9 around a 0.0 hole: the reference fillPoly's the
    # OUTER contour, averaging the hole pixels in; member-pixel-only
    # scoring would read 0.9
    pred = np.zeros((20, 20))
    pred[4:12, 4:12] = 0.9
    pred[6:10, 6:10] = 0.0       # the hole
    mask = (pred > 0.3).astype(np.uint8)
    ys, xs = np.nonzero(mask)
    n_ring, n_hole = len(ys), 16
    want = 0.9 * n_ring / (n_ring + n_hole)
    assert abs(box_score_slow(pred, ys, xs) - want) < 1e-12
    # concave notch touching the bbox border stays OUT (reachable
    # background, not a hole)
    pred2 = np.zeros((20, 20))
    pred2[2:10, 2:6] = 0.8       # vertical bar
    pred2[6:10, 2:14] = 0.8      # foot -> L shape
    ys2, xs2 = np.nonzero(pred2 > 0.3)
    assert abs(box_score_slow(pred2, ys2, xs2) - 0.8) < 1e-12
