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
