"""Full imaged-page OCR: font invariants, the recognition forward
pass + CTC decode, ruling detection, and the end-to-end scan →
tables/lines pipeline against encode-side planted truth.

Reference parity targets: detection/recognition dispatch
``model/ocr_pdf/base_infer_task.py:317-381``, lattice structure +
placement ``table/table_extractor_lattice.py`` — here driven entirely
from pixels (no planted model output, no planted det_cells).
"""

import numpy as np
import pytest

from pdf_table_spark.core import codecs, font, nn
from pdf_table_spark.core.ctchead import CTC_CHARSET
from pdf_table_spark.core.ocrpage import ocr_scan_page
from pdf_table_spark.fixtures import media_gen as mg

# ---------------------------------------------------------- font


def test_font_structural_invariants():
    """The three properties that make the matched-filter CTC decode
    unambiguous (see core/font.py docstring)."""
    stack = {ch: font.glyph(ch) for ch in font.FONT_CHARS}
    seen = {}
    for ch, g in stack.items():
        assert g.shape == (7, 5)
        assert g[:, 0].any(), f"{ch!r}: no ink in column 0"
        assert g[:, 4].any(), f"{ch!r}: no ink in column 4"
        blank = [not g[:, c].any() for c in range(5)]
        for c in range(1, 3):
            assert not (blank[c] and blank[c + 1]), \
                f"{ch!r}: adjacent blank interior columns {c},{c + 1}"
        key = g.tobytes()
        assert key not in seen, f"{ch!r} duplicates {seen[key]!r}"
        seen[key] = ch
    # one flipped pixel must break the 0.95 correlation threshold
    assert 1.0 - 2.0 / 35.0 < nn.REC_THRESH


def test_font_render_width_agrees():
    for text in ("a", "ab", "a b", "hello world", ""):
        assert font.render_text(text).shape[1] == font.text_width(text)


# ------------------------------------------------- rec forward+CTC


REC_TEXTS = [
    "hello world", "abc 012", "mm rn", "xx oo", "9 9", "a",
    "the quick brown fox jumps over the lazy dog 0123456789",
    "", "zz", "0o 0o", "il1 il1",
]


@pytest.mark.parametrize("text", REC_TEXTS)
def test_rec_roundtrip_exact(text):
    ink = font.render_text(text).astype(np.float64)
    got, conf = nn.rec_text(ink)
    assert got == text
    if text:
        # clean-scan confidence is the constant sigmoid(gain*(1-th))
        want = 1.0 / (1.0 + np.exp(-nn.REC_GAIN * (1 - nn.REC_THRESH)))
        assert conf == pytest.approx(want)


def test_rec_roundtrip_random_texts():
    rng = np.random.default_rng(7)
    alphabet = list(font.FONT_CHARS)
    for _ in range(40):
        words = [
            "".join(rng.choice(alphabet, size=rng.integers(1, 7)))
            for _ in range(rng.integers(1, 4))]
        text = " ".join(words)
        got, _ = nn.rec_text(font.render_text(text).astype(np.float64))
        assert got == text


def test_rec_vertical_offset_and_margins():
    """The y-locating height collapse reads the line wherever it sits
    in the crop; paper margins decode to stripped edge spaces."""
    text = "offset test 42"
    ink = font.render_text(text)
    crop = np.zeros((26, ink.shape[1] + 30))
    crop[13:20, 9:9 + ink.shape[1]] = ink
    got, _ = nn.rec_text(crop)
    assert got == text


def test_rec_charset_is_ctc_charset():
    """Template tensor rows index the CTC charset (blank = 0); font
    coverage is the renderable subset, dead classes can never fire."""
    w = nn.REC_CNN
    assert w["templates"].shape[0] == len(CTC_CHARSET)
    live = w["live"].astype(bool)
    assert not live[0]
    for i, ch in enumerate(CTC_CHARSET):
        if i == 0:
            continue
        assert live[i] == (ch == " " or ch in font._RAW)


# -------------------------------------------------- ruling detect


def test_detect_rulings_grid_exact():
    img = np.zeros((70, 160))
    for y in (10, 30, 50):
        img[y, 20:141] = 1.0
    for x in (20, 80, 140):
        img[10:51, x] = 1.0
    h, v, mask = nn.detect_rulings(img)
    assert h == [(20.0, 10.0, 140.0, 10.0), (20.0, 30.0, 140.0, 30.0),
                 (20.0, 50.0, 140.0, 50.0)]
    assert v == [(20.0, 10.0, 20.0, 50.0), (80.0, 10.0, 80.0, 50.0),
                 (140.0, 10.0, 140.0, 50.0)]
    assert mask.sum() == img.sum()  # every ruling pixel recovered


def test_detect_rulings_ignores_glyph_ink():
    img = np.zeros((70, 160))
    img[10, 20:141] = 1.0
    ink = font.render_text("noise here and more").astype(np.float64)
    img[40:47, 5:5 + ink.shape[1]] = ink
    h, v, mask = nn.detect_rulings(img)
    assert h == [(20.0, 10.0, 140.0, 10.0)]
    assert v == []
    assert not mask[35:, :].any()  # no glyph pixel in the mask


def test_merge_axis_segments_thick_strokes():
    img = np.zeros((40, 100))
    img[10:12, 5:96] = 1.0      # 2-px-thick horizontal stroke
    h, _v, _m = nn.detect_rulings(img)
    assert nn.merge_axis_segments(h, "h") == [(5.0, 10.0, 95.0, 10.0)]


# ----------------------------------------------- end-to-end pages


def _wire_rows(out: dict) -> list[tuple]:
    rows, off = [], 0
    for t in out["tables"]:
        rows.append((off, "ocr_shape", f"{t['n_rows']}x{t['n_cols']}"))
        off += 1
        for (r, c, _rs, _cs, text) in t["cells"]:
            rows.append((off, "ocr_cell", f"{r},{c}|{text}"))
            off += 1
        rows.append((off, "ocr_html", t["html"]))
        off += 1
    for ln in out["remainder"]:
        rows.append((off, "ocr_line", ln["text"]))
        off += 1
    return rows


def test_ocr_scan_pages_match_planted_truth():
    """Every fixture page round-trips: render → PNG → decode → rulings
    → det CNN → rec CNN → lattice reproduces the PLANTED structure,
    cell texts, merged spans, HTML and free lines exactly. The truth
    is computed from the plants alone (encode-side), so this is an
    independent-inverse check of the whole pixel pipeline."""
    truth: dict[str, list] = {}
    for r in mg.ocr_scan_truth():
        truth.setdefault(r["media_ref"], []).append(
            (r["offset"], r["kind"], r["text"]))
    payloads = mg.ocr_scan_payloads()
    assert len(payloads) == mg.N_OCR_SCANS
    for row in payloads:
        img, _fmt = codecs.decode_image(row["payload"])
        out = ocr_scan_page(codecs.to_gray(img))
        assert _wire_rows(out) == sorted(truth.get(row["media_ref"], [])), \
            row["media_ref"]


def test_ocr_scan_fixture_variety():
    """The corpus actually exercises the hard arms: at least one page
    with no table, one with a merged (col-span) cell, one with 2-px
    rulings, and one with an empty cell."""
    layouts = [mg._ocr_layout_for(i) for i in range(mg.N_OCR_SCANS)]
    assert any(lo["table"] is None for lo in layouts)
    assert any(lo["table"] and lo["table"]["merged"] for lo in layouts)
    assert any(lo["table"] and lo["table"]["thick"] == 2
               for lo in layouts)
    assert any(lo["table"] and any(
        t == "" for row in lo["table"]["texts"] for t in row)
        for lo in layouts)


def test_ocr_page_without_rulings_or_text():
    blank = np.full((60, 80), 255, dtype=np.uint8)
    out = ocr_scan_page(blank)
    assert out == {"lines": [], "tables": [], "remainder": []}


def test_orientation_vote_matches_planted_angles():
    """Rotate-and-read orientation (M1): on every planted rotation the
    argmax vote is the planted correction angle, and the winning vote
    strictly dominates the runner-up (the decision has margin, it is
    not a tie-break artifact)."""
    from pdf_table_spark.core.ocrpage import orient_scan_page
    truth = {r["media_ref"]: r["angle"] for r in mg.orient_scan_truth()}
    for row in mg.orient_scan_payloads():
        img, _fmt = codecs.decode_image(row["payload"])
        pred, votes = orient_scan_page(codecs.to_gray(img))
        assert pred == truth[row["media_ref"]], row["media_ref"]
        ranked = sorted(votes, reverse=True)
        assert ranked[0] > ranked[1], row["media_ref"]


def test_layout_regions_match_planted_truth():
    """Layout analysis from pixels (M2): on every fixture page the
    region proposals recover each planted object with its exact tight
    ink bbox and the linear head classifies it correctly — truth is
    encode-side (class + geometry from the plants)."""
    from pdf_table_spark.core.ocrpage import layout_regions
    truth: dict[str, list] = {}
    for r in mg.layout_scan_truth():
        truth.setdefault(r["media_ref"], []).append(
            (r["offset"], r["label"]))
    for row in mg.layout_scan_payloads():
        img, _fmt = codecs.decode_image(row["payload"])
        regs = layout_regions(codecs.to_gray(img))
        got = [(j, f"{r['label']}|{r['x0']},{r['y0']},"
                   f"{r['x1']},{r['y1']}")
               for j, r in enumerate(regs)]
        assert got == sorted(truth.get(row["media_ref"], [])), \
            row["media_ref"]


def test_layout_fixture_covers_all_classes():
    labels = {r["label"].split("|")[0] for r in mg.layout_scan_truth()}
    assert labels == {"table", "text", "figure"}


def test_layout_solid_block_is_figure_not_table():
    """The thin-ruling XOR feature: a solid block survives both the
    horizontal and vertical opening (so its ruling fraction is ~0),
    while a real ruled grid survives exactly one per stroke."""
    from pdf_table_spark.core.ocrpage import layout_regions
    page = np.full((120, 200), 255, dtype=np.uint8)
    page[20:70, 30:110] = 0  # solid block, no rulings
    for y in (20, 45, 70):
        page[y, 130:190] = 0
    for x in (130, 160, 190):
        page[20:71, x] = 0   # a 2x2 ruled grid (empty cells)
    regs = layout_regions(page)
    assert [r["label"] for r in regs] == ["figure", "table"]


def test_ocr_page_det_boxes_contain_plants():
    """Detected line boxes must contain their planted glyph extents
    (unclip grows boxes, never shrinks them)."""
    layout = {"table": None,
              "lines": [{"x0": 20, "y0": 15, "text": "check me"},
                        {"x0": 30, "y0": 50, "text": "and me 2"}]}
    page = mg._render_ocr_page(layout)
    out = ocr_scan_page(page)
    assert [ln["text"] for ln in out["lines"]] == ["check me", "and me 2"]
    for plant, got in zip(layout["lines"], out["lines"]):
        w = font.text_width(plant["text"])
        assert got["x0"] <= plant["x0"] and got["x1"] >= plant["x0"] + w - 1
        assert got["y0"] <= plant["y0"] and got["y1"] >= plant["y0"] + 7 - 1
