"""Hand-computed parity cases for the geometry core (SURVEY §2 A1, F2,
X6, A3/U4, J5)."""

from pdf_table_spark.core import geometry as G


def test_merge_close_lines_moving_mean():
    # the moving mean drifts: 0, 1.5 merge to 0.75; 3.0 is within 2 of
    # 0.75+... sequential semantics, mirroring the reference sweep
    assert G.merge_close_lines([0.0, 1.5, 10.0]) == [0.75, 10.0]
    # moving-mean drift blocks the chain: 0,2 → mean 1.0; |1-4|=3 > tol
    assert G.merge_close_lines([0.0, 2.0, 4.0]) == [1.0, 4.0]
    # but 0,2,3 chains: mean 1.0, then |1-3|=2 <= tol → (1+3)/2
    assert G.merge_close_lines([0.0, 2.0, 3.0]) == [2.0]
    # far-apart values stay separate
    assert G.merge_close_lines([0.0, 5.0, 10.0]) == [0.0, 5.0, 10.0]
    assert G.merge_close_lines([]) == []


def test_rects_to_segments_classification():
    rects = [
        {"x0": 0, "y0": 10, "x1": 100, "y1": 11},    # thin horizontal
        {"x0": 50, "y0": 0, "x1": 51, "y1": 80},     # thin vertical
        {"x0": 0, "y0": 0, "x1": 30, "y1": 30},      # fat box → 4 lines
    ]
    h, v = G.rects_to_segments(rects)
    assert (0.0, 10.5, 100.0, 10.5) in h
    assert (50.5, 0.0, 50.5, 80.0) in v
    assert len(h) == 3 and len(v) == 3  # box adds 2 h + 2 v


def test_segment_intersection_with_tip_tolerance():
    h = (0.0, 10.0, 100.0, 10.0)
    v = (100.5, 0.0, 100.5, 50.0)  # just past the h tip, within tol 2
    assert G.segment_intersection(h, v) == (100.5, 10.0)
    v_far = (104.0, 0.0, 104.0, 50.0)
    assert G.segment_intersection(h, v_far) is None


def test_iou_and_distance():
    a = (0, 0, 10, 10)
    b = (5, 5, 15, 15)
    assert abs(G.iou(a, b) - (25 / 175)) < 1e-12
    assert G.iou(a, (20, 20, 30, 30)) == 0.0
    assert G.l1_center_distance(a, b) == 10.0


def test_merge_intervals_with_gap():
    ivs = [(0, 5), (6, 10), (20, 25)]
    assert G.merge_intervals(ivs, gap=2) == [(0.0, 10.0), (20.0, 25.0)]
    assert G.merge_intervals(ivs, gap=0) == [(0.0, 5.0), (6.0, 10.0),
                                             (20.0, 25.0)]


def test_connected_components_smallest_id():
    comp = G.connected_components(5, [(0, 1), (1, 2), (3, 4)])
    assert comp == [0, 0, 0, 3, 3]


def test_merge_close_lines_thin_edge_drop():
    """A1 last_merge_threshold: hairline first/last axis gaps (< thr
    AND < 20% of avg gap) are dropped; interior gaps never are."""
    axis = [0.0, 5.0, 60.0, 120.0, 180.0]
    # avg gap = 180/5 = 36 → 0.2*avg = 7.2; first gap 5 < 10 and < 7.2
    out = G.merge_close_lines(axis, 2.0, last_merge_threshold=10.0)
    assert out == [5.0, 60.0, 120.0, 180.0]
    # disabled by default
    assert G.merge_close_lines(axis, 2.0) == axis
    # a wide first gap survives
    axis2 = [0.0, 50.0, 100.0, 150.0]
    assert G.merge_close_lines(
        axis2, 2.0, last_merge_threshold=10.0) == axis2
    # thin LAST gap drops symmetrically
    axis3 = [0.0, 60.0, 120.0, 180.0, 185.0]
    assert G.merge_close_lines(
        axis3, 2.0, last_merge_threshold=10.0) == [0.0, 60.0, 120.0, 180.0]


def test_dedup_overlapping_boxes():
    """U3: a box >80%-covered by a wider box is a duplicate."""
    big = {"x0": 0.0, "y0": 0.0, "x1": 100.0, "y1": 10.0, "text": "full"}
    dup = {"x0": 0.0, "y0": 0.0, "x1": 40.0, "y1": 10.0, "text": "fu"}
    other = {"x0": 0.0, "y0": 50.0, "x1": 40.0, "y1": 60.0, "text": "b"}
    out = G.dedup_overlapping_boxes([big, dup, other])
    assert [t["text"] for t in out] == ["full", "b"]
    # identical twins: exactly one survives
    twin = dict(big)
    out2 = G.dedup_overlapping_boxes([big, twin])
    assert len(out2) == 1
    # partial (<80%) overlap keeps both
    part = {"x0": 60.0, "y0": 0.0, "x1": 160.0, "y1": 10.0, "text": "p"}
    assert len(G.dedup_overlapping_boxes([big, part])) == 2


def test_box_contains():
    outer = (0.0, 0.0, 100.0, 50.0)
    assert G.box_contains(outer, (10, 10, 90, 40))
    assert G.box_contains(outer, (-1.5, 0, 101.5, 51.5))  # within diff
    assert not G.box_contains(outer, (10, 10, 110, 40))


def test_placement_error_reference_quirks():
    """A9 placement error mirrors the reference exactly: x-side counts
    partial overflow, y-side only fully-outside boxes."""
    from pdf_table_spark.core.quality import placement_error
    row, col = (100.0, 80.0), (0.0, 50.0)  # cell: y 80..100, x 0..50
    inside = {"x0": 5, "y0": 85, "x1": 45, "y1": 95}
    assert placement_error(inside, row, col) == 0.0
    # partially overflows right: x-side triggers
    xover = {"x0": 40, "y0": 85, "x1": 60, "y1": 95}
    assert placement_error(xover, row, col) > 0.0
    # partially overflows the top (box top above row top, bottom
    # inside): the reference's y-rule does NOT trigger
    ypart = {"x0": 5, "y0": 95, "x1": 45, "y1": 110}
    assert placement_error(ypart, row, col) == 0.0
    # entirely above the row: triggers
    yfull = {"x0": 5, "y0": 105, "x1": 45, "y1": 115}
    assert placement_error(yfull, row, col) > 0.0
