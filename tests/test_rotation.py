"""M1 orientation normalization: a rotated page must extract to
exactly the fragments of its unrotated original."""

import json

from pdf_table_spark.core.page import (
    extract_pdf_page, normalize_rotation, rotate_page_90cw)
from pdf_table_spark.fixtures.generator import _rotate_payload, gen_page


def test_rotate_round_trip_identity():
    import random
    page = json.loads(gen_page(random.Random(7), "F-A"))
    rotated = page
    for _ in range(4):
        rotated = rotate_page_90cw(rotated)
    assert rotated == page


def test_rotation_flips_dims_and_dir():
    import random
    page = json.loads(gen_page(random.Random(7), "F-D"))
    r1 = rotate_page_90cw(page)
    assert (r1["width"], r1["height"]) == (page["height"], page["width"])
    assert all(t["dir"] == "v" for t in r1["text_lines"])
    assert normalize_rotation({**r1, "rotation": 90}) == page


def test_rotated_pages_extract_identically():
    import random
    for fam in ("F-A", "F-B", "F-C", "F-D", "F-E", "F-H"):
        base = gen_page(random.Random(11), fam)
        expected = extract_pdf_page(base, "m")
        assert expected, fam
        for k in (1, 2, 3):
            got = extract_pdf_page(_rotate_payload(base, k), "m")
            assert got == expected, (fam, k)


def test_vertical_caption_is_own_paragraph():
    """O2: a dir='v' margin caption becomes its own paragraph fragment,
    never merged into prose or tables, and survives page rotation."""
    import json as _json

    from pdf_table_spark.core.page import extract_pdf_page
    page = {
        "width": 612.0, "height": 792.0,
        "text_lines": [
            {"x0": 72.0, "y0": 706.0, "x1": 400.0, "y1": 716.0,
             "text": "normal prose line one ", "dir": "h"},
            {"x0": 40.0, "y0": 500.0, "x1": 50.0, "y1": 700.0,
             "text": "side caption", "dir": "v"},
        ], "rects": [], "images": []}
    frags = extract_pdf_page(_json.dumps(page), "m")
    kinds_texts = [(k, t) for k, t, _, _, _ in frags]
    assert ("paragraph", "side caption") in kinds_texts
    assert ("paragraph", "normal prose line one ") in kinds_texts
    assert len(frags) == 2

    from pdf_table_spark.fixtures.generator import _rotate_payload
    rotated = _rotate_payload(_json.dumps(page), 1)
    assert extract_pdf_page(rotated, "m") == frags


def test_estimate_skew_median():
    from pdf_table_spark.core.page import estimate_skew_deg
    import math
    # three horizontal-ish segs at +1.2°, one vertical at the same skew
    def hseg(x0, y0, length, deg):
        return {"x0": x0, "y0": y0,
                "x1": x0 + length * math.cos(math.radians(deg)),
                "y1": y0 + length * math.sin(math.radians(deg))}
    segs = [hseg(0, 100, 200, 1.2), hseg(0, 50, 200, 1.2),
            hseg(0, 10, 200, 1.2),
            {"x0": 50, "y0": 0, "x1": 50 - 100 * math.sin(
                math.radians(1.2)), "y1": 100 * math.cos(
                math.radians(1.2))}]
    assert abs(estimate_skew_deg(segs) - 1.2) < 1e-6
    # steep diagonals are content, not skew
    assert estimate_skew_deg(
        [{"x0": 0, "y0": 0, "x1": 100, "y1": 100}]) == 0.0
    assert estimate_skew_deg([]) == 0.0


def test_skewed_page_extracts_like_unskewed():
    """M1 small-angle deskew: an F-K page (segs + rotated box centers)
    must extract the same fragment texts as its unskewed original,
    also under a composed 90° page rotation."""
    import random

    from pdf_table_spark.core.page import extract_pdf_page
    from pdf_table_spark.fixtures.generator import (
        _page_json, _rotate_payload, _ruled_table, _skewed_page)
    for s in (3, 7, 19):
        rng = random.Random(s)
        r, c = rng.randint(3, 6), rng.randint(2, 5)
        rects, texts, _ = _ruled_table(rng, 100.0, 650.0, r, c)
        base = [(k, t) for k, t, *_ in
                extract_pdf_page(_page_json(texts, rects), "m")]
        skewed = _skewed_page(random.Random(s))
        got = [(k, t) for k, t, *_ in extract_pdf_page(skewed, "m")]
        assert got == base, s
        got_rot = [(k, t) for k, t, *_ in
                   extract_pdf_page(_rotate_payload(skewed, 3), "m")]
        assert got_rot == base, s
