"""PicoDet layout postprocess (core.picodet, M2's model-output half):
DFL integral, multi-scale decode, hard-NMS, warp/scale semantics vs
the reference's processor_picodet.py."""

import numpy as np
import pytest

from pdf_table_spark.core import picodet as pico


def test_iou_and_area():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[5.0, 0.0, 15.0, 10.0]])
    assert pico.area_of(a[:, :2], a[:, 2:])[0] == 100.0
    assert pico.iou_of(a, b)[0] == pytest.approx(50 / 150, rel=1e-4)


def test_hard_nms_keeps_best_of_overlapping():
    rows = np.array([
        [0, 0, 10, 10, 0.9],
        [0, 0, 10, 10, 0.7],      # exact duplicate: suppressed
        [100, 100, 110, 110, 0.8],
    ])
    kept = pico.hard_nms(rows, iou_threshold=0.5)
    assert len(kept) == 2
    assert sorted(kept[:, 4].tolist()) == [0.8, 0.9]


def test_warp_boxes_clips_to_ori_shape():
    # processor_picodet.py:136-158 clips input-space boxes against the
    # ORIGINAL shape (the affine is commented out upstream) — the
    # clip-before-scale quirk
    boxes = np.array([[-5.0, 10.0, 300.0, 400.0]])
    out = pico.warp_boxes(boxes, (256, 256))
    assert out[0].tolist() == [0.0, 10.0, 256.0, 256.0]


def _payload(levels, org=(1024.0, 1024.0), sf=(0.5, 0.5)):
    return {"input_shape": [512, 512], "org_shape": list(org),
            "scale_factor": list(sf), "reg_max": 7, "n_classes": 10,
            "levels": levels}


def _anchor(r, c, cls, score, bl, bt, br, bb):
    return {"r": r, "c": c, "cls": cls, "score": score,
            "bl": bl, "bt": bt, "br": br, "bb": bb}


def test_decode_exact_dfl_integral():
    # stride 16 anchor at (r=4, c=8): center (136, 72); bins [2] and
    # [2, 3] → distances 32 and 40 (exact dyadic mean × stride)
    lv = [{"stride": 8, "anchors": []},
          {"stride": 16, "anchors": [
              _anchor(4, 8, 4, 0.8125, [2], [2, 3], [2], [2])]},
          {"stride": 32, "anchors": []},
          {"stride": 64, "anchors": []}]
    out = pico.decode_payload(_payload(lv))
    assert len(out) == 1
    label, clsid, score, box = out[0]
    assert (label, clsid) == ("table", 4)
    assert score == 0.8125
    # x0 = 136-32, y0 = 72-40, x1 = 136+32, y1 = 72+32, then /0.5
    assert box == [208.0, 64.0, 336.0, 208.0]


def test_score_gate_and_nms_duplicate():
    lv = [{"stride": 8, "anchors": [
        _anchor(8, 8, 0, 0.875, [2], [2], [2], [2]),
        # neighbouring cell decoding to the IDENTICAL box, lower score
        _anchor(8, 9, 0, 0.84375, [3], [2], [1], [2]),
        # sub-threshold
        _anchor(40, 40, 1, 0.375, [1], [1], [1], [1]),
    ]}, {"stride": 16, "anchors": []},
        {"stride": 32, "anchors": []},
        {"stride": 64, "anchors": []}]
    out = pico.decode_payload(_payload(lv))
    assert len(out) == 1
    assert out[0][2] == 0.875


def test_per_class_nms_keeps_same_box_across_classes():
    lv = [{"stride": 8, "anchors": [
        _anchor(8, 8, 0, 0.875, [2], [2], [2], [2]),
        _anchor(8, 9, 3, 0.8125, [3], [2], [1], [2]),  # same box, cls 3
    ]}, {"stride": 16, "anchors": []},
        {"stride": 32, "anchors": []},
        {"stride": 64, "anchors": []}]
    out = pico.decode_payload(_payload(lv))
    assert len(out) == 2          # NMS is per class


def test_generator_payload_roundtrip():
    import random

    from pdf_table_spark.fixtures.generator import _plant_picodet
    rng = random.Random(11)
    payload = {}
    _plant_picodet(rng, payload)
    pd = payload["picodet"]
    out = pico.decode_payload(pd)
    # expected: every >0.5 anchor, minus NMS-suppressed duplicates —
    # recomputed here via the independent exact-mean arithmetic
    sy, sx = pd["scale_factor"]
    oh, ow = pd["org_shape"]
    exp = {}
    for lv in pd["levels"]:
        s = lv["stride"]
        for a in lv["anchors"]:
            if a["score"] <= 0.5:
                continue
            cx, cy = (a["c"] + 0.5) * s, (a["r"] + 0.5) * s
            def mean(b):
                return sum(b) / len(b)
            box = (min(max(cx - mean(a["bl"]) * s, 0), ow) / sx,
                   min(max(cy - mean(a["bt"]) * s, 0), oh) / sy,
                   min(max(cx + mean(a["br"]) * s, 0), ow) / sx,
                   min(max(cy + mean(a["bb"]) * s, 0), oh) / sy)
            key = (a["cls"],) + box
            exp[key] = max(exp.get(key, 0.0), a["score"])
    got = {(clsid,) + tuple(box): score
           for _lbl, clsid, score, box in out}
    assert got == exp
