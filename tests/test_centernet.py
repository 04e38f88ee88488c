"""Cycle-CenterNet TSR postprocess (core.centernet, M6's model-output
half): decode semantics vs the reference's table_process.py /
processer_centernet.py, quirks pinned."""

import math

import numpy as np
import pytest

from pdf_table_spark.core import centernet as cn


def _payload(centers, corners, c=(256.0, 300.0), s=512.0, out=128):
    return {"out_h": out, "out_w": out, "base": 0.01,
            "c": list(c), "s": s,
            "centers": centers, "corners": corners}


def _center(cx, cy, verts, score=0.9, perturb_j=-1):
    offs = []
    for j, (vx, vy) in enumerate(verts):
        dx, dy = cx - vx, cy - vy
        if j == perturb_j:
            dx -= 0.5
            dy -= 0.5
        offs += [dx, dy]
    return [int(cx), int(cy), score, cx - int(cx), cy - int(cy)] + offs


def _corner(vx, vy, links, score=0.8):
    offs = []
    for lx, ly in links:
        offs += [vx - lx, vy - ly]
    while len(offs) < 8:
        offs += [0.0, 0.0]
    return [int(vx), int(vy), score, vx - int(vx), vy - int(vy)] + offs


# CCW vertex order (tl, bl, br, tr) — see core.centernet module doc
def _verts(x0, y0, x1, y1):
    return [(x0, y0), (x0, y1), (x1, y1), (x1, y0)]


def test_affine_inverse_is_similarity():
    # (v - out/2) * (s/out) + c — table_process.py:27-90 for rot=0
    pts = cn.transform_preds(
        np.array([[10.0, 10.0], [64.0, 64.0]]), (256.0, 300.0),
        512.0, (128.0, 128.0))
    assert pts[0].tolist() == [(10 - 64) * 4 + 256, (10 - 64) * 4 + 300]
    assert pts[1].tolist() == [256.0, 300.0]


def test_affine_forward_inverse_roundtrip():
    fwd = cn.get_affine_transform((300.0, 200.0), 640.0, 0.0,
                                  (128, 128))
    inv = cn.get_affine_transform((300.0, 200.0), 640.0, 0.0,
                                  (128, 128), inv=True)
    p = np.array([123.0, 77.0, 1.0])
    q = fwd @ p
    back = inv @ np.array([q[0], q[1], 1.0])
    assert np.allclose(back, p[:2])


def test_peak_keep_and_topk():
    heat = np.full((16, 16), 0.1)
    heat[4, 4] = 0.9
    heat[4, 6] = 0.8          # 2 px away: survives the 3x3 NMS
    heat[4, 5] = 0.7          # adjacent to a larger peak: suppressed
    kept = cn.peak_keep(heat)
    assert kept[4, 4] == 0.9 and kept[4, 6] == 0.8
    assert kept[4, 5] == 0.0
    scores, ys, xs = cn.topk_peaks(kept, 3)
    assert scores[0] == 0.9 and (ys[0], xs[0]) == (4, 4)
    assert scores[1] == 0.8 and (ys[1], xs[1]) == (4, 6)


def test_bbox_decode_subpixel():
    heat = np.full((32, 32), 1e-4)
    heat[10, 20] = 0.9
    reg = np.zeros((2, 32, 32))
    reg[0, 10, 20] = 0.25
    reg[1, 10, 20] = 0.5
    c2v = np.zeros((8, 32, 32))
    c2v[:, 10, 20] = [5, 3, 5, -3, -5, -3, -5, 3]
    out = cn.bbox_decode(heat, c2v, reg, 4)
    # top row: center (20.25, 10.5) minus offsets
    assert out[0, 0:2].tolist() == [15.25, 7.5]
    assert out[0, 4:6].tolist() == [25.25, 13.5]
    assert out[0, 8] == 0.9 and out[0, 9] == 0.0


def test_center_in_nms_batched_noop_quirk():
    """processer_centernet.py:185 passes the BATCHED (1, K, 10) array,
    so len(dets) < 2 short-circuits — the suppression never runs in
    the live path. And unbatched, the guard reads box[-1] (the CLASS
    column, always 0 for the single-category heatmap), so it breaks
    on the first row and returns empty: the batching accident is what
    keeps the decode alive. Both faces pinned here."""
    dets = np.zeros((5, 10))
    dets[:, 8] = 0.9                      # real scores
    batched = cn.center_in_nms(dets[None], 0.3)
    assert batched.shape == (1, 5, 10)
    assert np.array_equal(batched[0], dets)
    unbatched = cn.center_in_nms(dets, 0.3)
    assert len(unbatched) == 0


def test_decode_exact_grid():
    verts_a = _verts(10, 10, 30, 20)
    verts_b = _verts(30, 10, 50, 20)
    centers = [_center(20, 15, verts_a), _center(40, 15, verts_b)]
    shared = {}
    for v in verts_a + verts_b:
        shared.setdefault(v, [])
    for cxy, vs in (((20, 15), verts_a), ((40, 15), verts_b)):
        for v in vs:
            shared[v].append(cxy)
    corners = [_corner(v[0], v[1], links)
               for v, links in sorted(shared.items())]
    res = cn.decode_payload(_payload(centers, corners))
    assert len(res) == 2
    # map → image: x*4 + 0, y*4 + 44 (c=(256,300), s=512, out 128)
    poly_a, score_a = res[0]
    assert poly_a == [40.0, 84.0, 40.0, 124.0, 120.0, 124.0,
                      120.0, 84.0]
    assert score_a == pytest.approx(0.9, abs=1e-9)


def test_snap_pulls_perturbed_vertex_to_corner_peak():
    verts = _verts(10, 10, 30, 20)
    centers = [_center(20, 15, verts, perturb_j=0)]
    corners = [_corner(10, 10, [(20, 15)])]
    res = cn.decode_payload(_payload(centers, corners))
    poly, _ = res[0]
    assert poly[0:2] == [40.0, 84.0]      # snapped, not 42/86
    # without the corner peak the perturbation stays
    res2 = cn.decode_payload(_payload(centers, []))
    assert res2[0][0][0:2] == [42.0, 86.0]


def test_score_gates_drop_distractors():
    verts = _verts(10, 10, 30, 20)
    centers = [_center(20, 15, verts),
               _center(100, 100, _verts(95, 95, 105, 105),
                       score=0.25)]
    res = cn.decode_payload(_payload(centers, []))
    assert len(res) == 1


def test_reading_order_sort():
    a = _verts(10, 30, 30, 40)    # lower row
    b = _verts(10, 10, 30, 20)    # upper row
    centers = [_center(20, 35, a, score=0.9),
               _center(20, 15, b, score=0.5)]
    res = cn.decode_payload(_payload(centers, []))
    # sorted by 0.01*mean_x + mean_y → upper row first despite lower
    # score (processer_centernet.py:197)
    assert res[0][0][1] < res[1][0][1]


def test_generator_payload_decodes_to_grid():
    """The fixture plant round-trips: every planted real center comes
    back as one polygon whose vertices are the affine-transformed
    TRUE grid corners (perturbations snapped away), distractors
    dropped."""
    import random

    from pdf_table_spark.fixtures.generator import _plant_centernet
    rng = random.Random(7)
    payload = {}
    _plant_centernet(rng, payload)
    cnp = payload["centernet"]
    res = cn.decode_payload(cnp)
    real = [r for r in cnp["centers"] if r[2] > 0.3]
    assert len(res) == len(real)
    sc = cnp["s"] / cnp["out_w"]
    cx, cy = cnp["c"]
    # expected vertices from the planted corner peaks (= true grid)
    true_corners = {
        (round((r[0] + r[3] - cnp["out_w"] / 2) * sc + cx, 2),
         round((r[1] + r[4] - cnp["out_h"] / 2) * sc + cy, 2))
        for r in cnp["corners"] if r[2] > 0.3}
    for poly, score in res:
        assert score > 0.3
        for j in range(4):
            v = (round(poly[2 * j], 2), round(poly[2 * j + 1], 2))
            assert v in true_corners, (v, sorted(true_corners)[:4])
