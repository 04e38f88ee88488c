"""Deterministic generator for the interleaved documents table.

Implements FIXTURES.md §3's families (seed 42, no I/O):
  F-A ruled table page        F-B spanning-cell table
  F-C unruled aligned table   F-D prose page
  F-E mixed page (+false table)  F-F html_table doc
  F-G skew doc (many pages)   F-H multi-table page
  F-I ragged stream table w/ spanning header (Nurminen stress)

Geometry: PDF space, page 612x792, origin bottom-left. Rulings are thin
rects (thickness 1) emitted per cell edge so spanning-cell merges (F-B)
are representable by *omitting* individual edge segments.

The generator is pure: ``gen_corpus(n_docs)`` returns plain python
rows; writers live in ``build.py``. Seeded ``random.Random`` only — no
global state, stable across runs and machines.
"""

from __future__ import annotations

import json
import random

PAGE_W, PAGE_H = 612.0, 792.0
FONT = 10.0
LINE_H = 14.0

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "total", "sum",
    "rate", "count",
]

FAMILIES = ["F-A", "F-B", "F-C", "F-D", "F-E", "F-F", "F-G", "F-H",
            "F-I", "F-J", "F-K", "F-L"]
# giant-doc family is rare: one heavy doc among many small ones
WEIGHTS = [15, 13, 12, 13, 10, 10, 2, 8, 6, 8, 5, 6]


def _words(rng, lo=1, hi=3):
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(lo, hi)))


def _num(rng):
    return f"{rng.randint(0, 9999)}.{rng.randint(0, 99):02d}"


def _ruled_table(rng, x0, y_top, n_rows, n_cols, drop_edges=0,
                 straddle=False, hairline=False, superscript=False,
                 overrun=False, col_w=None, row_h=None):
    """Emit (rects, text_lines) for a ruled table with per-cell-edge
    rulings; ``drop_edges`` interior edges are omitted → merged cells.
    ``straddle`` sometimes adds a line crossing a column boundary —
    exercises X4 char-splitting. ``hairline`` adds a 6pt decorative
    edge column left of the table (A1 thin-axis drop target).
    ``superscript`` gives one cell a minority-height char run (X3)."""
    col_w = col_w or rng.choice([70.0, 80.0, 90.0])
    row_h = row_h or rng.choice([22.0, 26.0])
    xs = [x0 + i * col_w for i in range(n_cols + 1)]
    ys = [y_top - i * row_h for i in range(n_rows + 1)]

    h_edges = {(r, c): True for r in range(n_rows + 1) for c in range(n_cols)}
    v_edges = {(r, c): True for r in range(n_rows) for c in range(n_cols + 1)}
    interior = (
        [("h", r, c) for r in range(1, n_rows) for c in range(n_cols)]
        + [("v", r, c) for r in range(n_rows) for c in range(1, n_cols)]
    )
    rng.shuffle(interior)
    for kind, r, c in interior[:drop_edges]:
        if kind == "h":
            h_edges[(r, c)] = False
        else:
            v_edges[(r, c)] = False

    rects = []
    for (r, c), on in sorted(h_edges.items()):
        if on:
            rects.append({"x0": xs[c], "y0": ys[r] - 0.5,
                          "x1": xs[c + 1], "y1": ys[r] + 0.5})
    for (r, c), on in sorted(v_edges.items()):
        if on:
            rects.append({"x0": xs[c] - 0.5, "y0": ys[r + 1],
                          "x1": xs[c] + 0.5, "y1": ys[r]})

    if hairline:
        # decorative double-border strip: a vertical ruling 6pt left of
        # the table plus per-row stubs connecting it — the A1 thin-axis
        # drop must erase this phantom column from the grid
        rects.append({"x0": x0 - 6.5, "y0": ys[-1],
                      "x1": x0 - 5.5, "y1": ys[0]})
        for yv in ys:
            rects.append({"x0": x0 - 6.5, "y0": yv - 0.5,
                          "x1": x0 + 0.5, "y1": yv + 0.5})

    sup_at = (rng.randrange(n_rows * n_cols)
              if superscript and n_rows * n_cols > 0 else -1)
    texts = []
    for r in range(n_rows):
        for c in range(n_cols):
            # skip text in cells hidden behind a dropped edge sometimes;
            # keep most so merged cells accumulate multi-texts
            content = _num(rng) if rng.random() < 0.5 else _words(rng, 1, 2)
            tx = xs[c] + 4.0
            ty = ys[r] - row_h / 2.0 - FONT / 2.0
            line = {"x0": tx, "y0": ty, "x1": tx + 6.0 * len(content),
                    "y1": ty + FONT, "text": content, "dir": "h"}
            if r * n_cols + c == sup_at:
                # X3: trailing superscript digit at 60% char height
                sup = str(rng.randint(2, 9))
                line["text"] = content + sup
                line["x1"] = tx + 6.0 * len(line["text"])
                line["char_heights"] = ([FONT] * len(content)
                                        + [FONT * 0.6] * len(sup))
            texts.append(line)
    if overrun:
        # F1 boundary-split target: a line starting in the last column
        # whose tail extends far beyond the table's right border (its
        # center lies OUTSIDE) — the inside chars land in the cell, the
        # outside chars are released back to page prose
        r = rng.randint(0, n_rows - 1)
        content = rng.choice(VOCAB)
        tx0 = xs[-2] + 4.0
        # grow until the 6pt/char line's center clears the right border
        while tx0 + 3.0 * len(content) <= xs[-1] + 6.0:
            content += " " + rng.choice(VOCAB)
        ty = ys[r] - row_h / 2.0 - FONT / 2.0 + 3.0
        texts.append({"x0": tx0, "y0": ty,
                      "x1": tx0 + 6.0 * len(content),
                      "y1": ty + FONT, "text": content, "dir": "h"})
    if straddle and n_cols >= 2 and rng.random() < 0.5:
        # a wide line crossing one column boundary (X4 split target)
        r = rng.randint(0, n_rows - 1)
        c = rng.randint(0, n_cols - 2)
        content = rng.choice(VOCAB) + " " + rng.choice(VOCAB)
        tx0 = xs[c] + 8.0
        tx1 = xs[c + 2] - 8.0
        ty = ys[r] - row_h / 2.0 - FONT / 2.0 + 2.0
        texts.append({"x0": tx0, "y0": ty, "x1": tx1,
                      "y1": ty + FONT, "text": content, "dir": "h"})
    bbox = (xs[0], ys[-1], xs[-1], ys[0])
    return rects, texts, bbox


def _stream_table(rng, x0, y_top, n_rows, n_cols):
    """Aligned whitespace table: no rects, fixed column x-starts.
    Needs >= 6 rows for a left textedge to reach the Nurminen validity
    gate (intersections > TEXTEDGE_REQUIRED_ELEMENTS=4)."""
    col_w = 110.0
    texts = []
    for r in range(n_rows):
        ty = y_top - r * LINE_H - FONT
        for c in range(n_cols):
            content = _num(rng) if c > 0 else rng.choice(VOCAB)
            tx = x0 + c * col_w
            texts.append({"x0": tx, "y0": ty, "x1": tx + 6.0 * len(content),
                          "y1": ty + FONT, "text": content, "dir": "h"})
    return texts


def _ragged_stream_table(rng, x0, y_top, n_rows, n_cols):
    """F-I: whitespace table with a full-width spanning header line in
    the middle and ragged rows (an occasional missing non-first cell) —
    the shapes the pre-Nurminen consecutive-run detector mis-segmented
    (splitting the run at the 1-item header row)."""
    col_w = 110.0
    texts = []
    header_at = n_rows // 2
    y = y_top
    for r in range(n_rows):
        if r == header_at:
            content = _words(rng, 3, 5)
            texts.append({"x0": x0, "y0": y - FONT,
                          "x1": x0 + 6.0 * len(content), "y1": y,
                          "text": content, "dir": "h"})
            y -= LINE_H
        skip_c = rng.randint(1, n_cols - 1) if rng.random() < 0.3 else -1
        for c in range(n_cols):
            if c == skip_c:
                continue
            content = _num(rng) if c > 0 else rng.choice(VOCAB)
            tx = x0 + c * col_w
            texts.append({"x0": tx, "y0": y - FONT,
                          "x1": tx + 6.0 * len(content),
                          "y1": y, "text": content, "dir": "h"})
        y -= LINE_H
    return texts


def _prose(rng, x0, y_top, n_paras, width=440.0):
    """Paragraph lines: first line indented by 2*FONT, full-width
    middles, short last line — exercises the line-type classifier.
    ~10% of paragraphs carry a U3 trigger: a shorter duplicate box
    over the first line (a double-rendered glyph run) that the
    >80%-overlap dedup must discard."""
    texts = []
    y = y_top
    for _ in range(n_paras):
        n_lines = rng.randint(2, 4)
        for li in range(n_lines):
            indent = 2.0 * FONT if li == 0 else 0.0
            last = li == n_lines - 1
            w = width * rng.uniform(0.45, 0.7) if last else width
            line = _words(rng, 4, 7) + " "
            texts.append({
                "x0": x0 + indent, "y0": y - FONT, "x1": x0 + indent + w,
                "y1": y, "text": line, "dir": "h"})
            if li == 0 and rng.random() < 0.1:
                dup = dict(texts[-1])
                dup["text"] = " ".join(line.split()[:2])
                dup["x1"] = dup["x0"] + w * 0.4
                texts.append(dup)
            y -= LINE_H
        y -= LINE_H  # blank line between paragraphs
    return texts, y


def _ocr_page(rng):
    """F-J: imaged-page payload — det/rec/TSR stand-in outputs in IMAGE
    coords (y down). Exercises every tier of the J3 match:
      tier 1 (center) — dets centered in their cell
      tier 2 (IoU)    — a thead det overhanging above the table top
      tier 3 (dist)   — a det in the tall row's lower band + its
                        det-less master cell
      extra_match     — truncated token stream + dets below the table
    plus <eb> empty-cell tokens, split colspan tokens, multi-det cells,
    and a <thead> for deal_bb."""
    n_rows = rng.randint(3, 5)
    n_cols = rng.randint(3, 4)
    x0, y0 = 50.0, 60.0
    col_w, row_h = 120.0, 30.0
    truncated = rng.random() < 0.25
    tier3_row = (rng.randint(1, n_rows - 1)
                 if not truncated and rng.random() < 0.4 else -1)
    tier3_col = rng.randint(0, n_cols - 1)

    cut_col = rng.randint(1, n_cols - 1) if truncated else n_cols
    tokens = ["<thead>"]
    cell_bboxes, det_cells = [], []
    y = y0
    for r in range(n_rows):
        last_row = r == n_rows - 1
        tall = r == tier3_row
        h = row_h * 1.8 if tall else row_h
        tokens.append("<tr>")
        c = 0
        while c < n_cols:
            cx0 = x0 + c * col_w
            cy0, cy1 = y, y + row_h  # master covers the top band only
            if truncated and last_row and c >= cut_col:
                # the model's prediction was cut here: no token, no
                # master — the det below becomes an extra_match row
                txt = rng.choice(VOCAB)
                det_cells.append({
                    "x0": cx0 + 6.0, "y0": cy0 + 6.0,
                    "x1": cx0 + 6.0 + 7.0 * len(txt),
                    "y1": cy1 - 6.0, "text": txt})
                c += 1
                continue
            span = 2 if (0 < r < n_rows - 1 and c + 1 < n_cols
                         and rng.random() < 0.15) else 1
            cx1 = x0 + (c + span) * col_w
            if r > 0 and not last_row and span == 1 \
                    and rng.random() < 0.12:
                tokens.append("<eb></eb>")  # empty cell: no bbox
                c += span
                continue
            if span == 2:
                tokens.extend(["<td", ' colspan="2"', ">", "</td>"])
            else:
                tokens.append("<td></td>")
            cell_bboxes.append([cx0, cy0, cx1, cy1])
            txt = _words(rng, 1, 2)
            if tall and c == tier3_col and span == 1:
                # tier 3: master stays det-less; det sits in the lower
                # band of the tall row (inside table extent, IoU 0)
                det_cells.append({
                    "x0": cx0 + 6.0, "y0": cy1 + 2.0,
                    "x1": cx0 + 6.0 + 7.0 * len(txt),
                    "y1": y + h - 2.0, "text": txt})
            elif r == 0 and c == 0:
                # tier 2: overhangs above the table top; center above
                # every master, IoU > 0 with this head cell; F4 keeps it
                det_cells.append({
                    "x0": cx0 + 6.0, "y0": cy0 - 10.0,
                    "x1": cx0 + 6.0 + 7.0 * len(txt),
                    "y1": cy0 + 8.0, "text": txt})
            else:
                det_cells.append({
                    "x0": cx0 + 6.0, "y0": cy0 + 6.0,
                    "x1": cx0 + 6.0 + 7.0 * len(txt),
                    "y1": cy1 - 6.0, "text": txt})
                if rng.random() < 0.15:  # multi-det cell: joined by ' '
                    extra = rng.choice(VOCAB)
                    # glyph evidence is physical: the second det starts
                    # clear of the first (never overlapping boxes) and
                    # must still fit inside the cell, else it's skipped
                    ex0 = max(cx0 + 60.0,
                              det_cells[-1]["x1"] + 8.0)
                    if ex0 + 7.0 * len(extra) <= cx1 - 2.0:
                        det_cells.append({
                            "x0": ex0, "y0": cy0 + 6.0,
                            "x1": ex0 + 7.0 * len(extra),
                            "y1": cy1 - 6.0, "text": extra})
            c += span
        if not (truncated and last_row):
            tokens.append("</tr>")
        # truncated last row: every emitted cell is a plain '<td></td>'
        # (no spans/ebs drawn there), so the stream already ends on the
        # bare td token — the reference's cut-by-max-length shape
        if r == 0:
            tokens.extend(["</thead>", "<tbody>"])
        y += h
    if not truncated:
        tokens.append("</tbody>")
    if not truncated and rng.random() < 0.2:
        # M4: the page arrives upside down — all geometry rotated 180°,
        # most (not all) det lines flagged flipped by the cls stand-in;
        # the orientation vote must rotate everything back
        def flip(b):
            return {**b, "x0": PAGE_W - b["x1"], "y0": PAGE_H - b["y1"],
                    "x1": PAGE_W - b["x0"], "y1": PAGE_H - b["y0"]}
        det_cells = [
            {**flip(c), "flipped": rng.random() < 0.9}
            for c in det_cells]
        cell_bboxes = [
            [PAGE_W - b[2], PAGE_H - b[3], PAGE_W - b[0], PAGE_H - b[1]]
            for b in cell_bboxes]
    return _dump_ocr(rng, {
        "width": PAGE_W, "height": PAGE_H,
        "det_cells": det_cells,
        "tables": [{"tokens": tokens, "cell_bboxes": cell_bboxes}]})


def _plant_glyphs(rng, det_cells):
    """Per-character glyph boxes — the PHYSICAL evidence a det model
    detects from. Each det's chars tile its x-extent uniformly (char
    width = width / len(text)); space slots stay empty, so word gaps
    are exactly one char wide and inter-det gaps are whatever the
    layout leaves. Emitted in SHUFFLED order: the det/rec head must
    recover reading order itself. On 180-flipped pages glyphs tile in
    text order within the flipped box (the in-box orientation recovery
    is the rec model's internal job in the reference; here M4's
    orientation vote handles it downstream)."""
    glyphs = []
    for d in det_cells:
        txt = d["text"]
        cw = (d["x1"] - d["x0"]) / len(txt)
        for i, ch in enumerate(txt):
            if ch == " ":
                continue
            glyphs.append({
                "c": ch,
                "x0": round(d["x0"] + cw * i, 3),
                "x1": round(d["x0"] + cw * (i + 1), 3),
                "y0": d["y0"], "y1": d["y1"]})
    rng.shuffle(glyphs)
    return glyphs


def _plant_db_prob(rng, payload):
    """Plant a DBNet probability-map contract (M3's model-output
    half): a sparse blob encoding of the dense per-pixel text map a
    trained DBNet would emit (``core.dbnet.prob_map_from_payload``
    re-densifies it executor-side). Map and dest dims are powers of
    two so the map→dest rescale divides exactly in float64 — the
    DuckDB oracle twin recomputes the expected boxes from the blob
    coords alone (d = w·h·ratio / (2(w+h)), grow, scale, round_even)
    with no shared code."""
    n_blobs = rng.randint(1, 4)
    blobs = []
    for i in range(n_blobs):
        w = rng.randint(6, 20)
        h = rng.randint(4, 14)
        x0 = 6 + (i % 2) * 60 + rng.randint(0, 30)
        y0 = 6 + (i // 2) * 40 + rng.randint(0, 16)
        blobs.append([x0, y0, x0 + w, y0 + h, 0.9])
    # one sub-threshold blob (score 0.5 < box_thresh 0.7) and one
    # tiny blob (sside < min_size) that the postprocess must reject
    if rng.random() < 0.5:
        blobs.append([4, 110, 14, 116, 0.5])
    if rng.random() < 0.5:
        blobs.append([120, 116, 122, 118, 0.9])
    payload["db_prob"] = {"h": 128, "w": 128, "base": 0.05,
                          "dest_w": 512, "dest_h": 512,
                          "blobs": blobs}


def _plant_rec_lines(rng, payload):
    """Plant CTC recognition contracts (M5's model-output half): per
    line the greedy index PATH a CTC recognizer's argmax would emit
    (``core.ctchead.ctc_encode``), plus the ground-truth string the
    oracle reads directly — the engine must invert the path."""
    from ..core.ctchead import ctc_encode
    lines = []
    for _ in range(rng.randint(1, 4)):
        if rng.random() < 0.3:
            gt = f"{rng.randint(0, 99)}.{rng.randint(0, 9)}%"
        else:
            gt = " ".join(rng.sample(VOCAB, rng.randint(1, 3)))
        if rng.random() < 0.3:
            gt += f" {rng.choice(VOCAB)[0] * 2}"   # double letter
        lines.append({"gt": gt, "path": ctc_encode(gt)})
    payload["rec_lines"] = lines


def _plant_slanet(rng, payload):
    """Plant a SLANet structure contract (M7's model-output half):
    the per-step argmax id path + normalized bbox rows
    (``core.slanethead.slanet_encode``) and the ground-truth wire
    string. Page shape 512x512 (powers of two) so normalize →
    denormalize round-trips exactly in float64."""
    from ..core.slanethead import format_slanet, slanet_encode
    n_rows, n_cols = rng.randint(1, 3), rng.randint(2, 4)
    tokens = ["<thead>", "<tr>"]
    cells = []

    def cell_bbox(r, c, span=1):
        x0, y0 = 32.0 + c * 96.0, 32.0 + r * 64.0
        return [x0, y0, x0 + 88.0 * span, y0 + 56.0]

    for c in range(n_cols):
        tokens.append("<td></td>")
        cells.append(cell_bbox(0, c))
    tokens += ["</tr>", "</thead>", "<tbody>"]
    for r in range(1, n_rows + 1):
        tokens.append("<tr>")
        c = 0
        while c < n_cols:
            if c + 1 < n_cols and rng.random() < 0.25:
                tokens += ["<td", ' colspan="2"', ">", "</td>"]
                cells.append(cell_bbox(r, c, span=2))
                c += 2
            else:
                tokens.append("<td></td>")
                cells.append(cell_bbox(r, c))
                c += 1
        tokens.append("</tr>")
    tokens.append("</tbody>")
    shape = (512, 512)
    ids, rows = slanet_encode(tokens, cells, shape)
    payload["slanet"] = {"ids": ids, "bboxes": rows,
                         "shape": list(shape),
                         "gt": format_slanet(tokens, cells)}


def _plant_centernet(rng, payload):
    """Plant a Cycle-CenterNet TSR contract (M6's model-output half):
    the sparse peak encoding of the paired keypoint tensors a trained
    DLA-34 would emit (``core.centernet.tensors_from_payload``
    re-densifies it executor-side) — center peaks carrying the 8
    center→vertex offsets (CCW: tl, bl, br, tr), shared corner peaks
    carrying the vertex→center links, sub-pixel reg, sigmoid scores as
    planted probabilities. Map 128x128, scale 512 (×4, power of two)
    and quarter-integer geometry so the affine map→image transform is
    exact in float64 — the DuckDB twin recomputes the polygons (and
    the corner SNAPS: some cells get one c2v offset perturbed by
    (+0.5, +0.5), which the group step must pull back onto the exact
    corner peak) from the planted arrays alone.

    Distractors the decode must reject: one sub-threshold center
    (score < 0.3 → dropped by the final gate) and one sub-threshold
    corner (score-sorted after every real peak → the group step's
    early break never reads it)."""
    n_rows, n_cols = rng.randint(1, 3), rng.randint(2, 4)
    gx0 = 8 + 4 * rng.randint(0, 4)
    gy0 = 8 + 4 * rng.randint(0, 4)
    cw = 4 * rng.randint(4, 6)       # cell size in map px, ≥16
    chh = 4 * rng.randint(3, 4)
    cx_img = 256.0 + rng.randint(-8, 8)
    cy_img = 256.0 + rng.randint(-8, 8)
    # sub-pixel shift of the whole grid: peaks stay at the integer
    # lattice, reg carries the fraction (exact dyadics, so the float
    # path through the decode and the SQL twin is bit-identical)
    dx_sub = rng.choice([0.0, 0.25, 0.5])
    dy_sub = rng.choice([0.0, 0.25, 0.5])
    centers, corners = [], []
    corner_links: dict = {}
    for r in range(n_rows):
        for c in range(n_cols):
            x0, y0 = gx0 + c * cw + dx_sub, gy0 + r * chh + dy_sub
            x1, y1 = x0 + cw, y0 + chh
            ccx, ccy = x0 + cw / 2, y0 + chh / 2
            verts = [(x0, y0), (x0, y1), (x1, y1), (x1, y0)]  # CCW
            offs = []
            perturb = rng.random() < 0.4
            pj = rng.randint(0, 3) if perturb else -1
            for j, (vx, vy) in enumerate(verts):
                dx, dy = ccx - vx, ccy - vy
                if j == pj:
                    dx -= 0.5
                    dy -= 0.5
                offs += [dx, dy]
            centers.append([int(ccx), int(ccy),
                            round(0.5 + 0.1 * ((r + c) % 5), 4),
                            ccx - int(ccx), ccy - int(ccy)] + offs)
            for vx, vy in verts:
                corner_links.setdefault((vx, vy), []).append(
                    (ccx, ccy))
    for (vx, vy), links in sorted(corner_links.items()):
        offs = []
        for lx, ly in links[:4]:
            offs += [vx - lx, vy - ly]
        while len(offs) < 8:
            offs += [0.0, 0.0]       # sentinel: link == vertex
        corners.append([int(vx), int(vy), 0.8,
                        vx - int(vx), vy - int(vy)] + offs)
    # distractors (kept clear of the grid; map is 128x128)
    centers.append([120, 120, 0.25, 0.0, 0.0,
                    4.0, 4.0, 4.0, -4.0, -4.0, -4.0, -4.0, 4.0])
    corners.append([124, 2, 0.2, 0.0, 0.0] + [0.0] * 8)
    payload["centernet"] = {
        "out_h": 128, "out_w": 128, "base": 0.01,
        "c": [cx_img, cy_img], "s": 512.0,
        "centers": centers, "corners": corners}


def _plant_picodet(rng, payload):
    """Plant a PicoDet layout-detection contract (M2's model-output
    half): per-FPN-stride sparse anchors carrying post-sigmoid class
    scores and DFL bin SETS (equal logit 0 on the set, −1e30 off it,
    so the softmax integral is the set's exact mean — every decoded
    coordinate is an exact dyadic both engines compute bit-equally).
    Boxes live in disjoint 128-px tiles of the 512x512 input so the
    only NMS interactions are the planted ones: one pair of anchors
    in different grid cells that decode to the IDENTICAL box (shifted
    center, counter-shifted bins) of which hard-NMS must keep the
    higher score, plus one sub-threshold distractor the class gate
    drops. scale_factor is a power of two so the resize-back division
    is exact; one variant plants org < input to exercise the
    clip-before-scale quirk of warp_boxes."""
    strides = [8, 16, 32, 64]
    sy, sx, oh, ow = rng.choice([
        (0.5, 0.5, 1024.0, 1024.0),
        (0.25, 0.5, 2048.0, 1024.0),
        (2.0, 2.0, 256.0, 256.0),      # clip exercised
        (1.0, 0.5, 512.0, 1024.0),
    ])
    clip_case = oh == 256.0
    if clip_case:
        # org < input: only the top-left 2x2 tile quadrant survives
        # the clip non-degenerately — boxes planted further right/down
        # would ALL collapse onto the org corner (identical degenerate
        # boxes across tiles broke the NMS == group-max invariant the
        # DuckDB twin relies on; found by review at sf0.1). The clip
        # itself is exercised by a dedicated wide-box anchor below.
        tiles = [(tx, ty) for tx in range(2) for ty in range(2)]
    else:
        tiles = [(tx, ty) for tx in range(4) for ty in range(4)]
    rng.shuffle(tiles)
    levels = {s: [] for s in strides}
    scores_pool = [0.5625, 0.625, 0.6875, 0.75, 0.8125, 0.875, 0.9375]
    rng.shuffle(scores_pool)
    if clip_case:
        # the clip exerciser: a stride-32 anchor whose right DFL bin
        # is maxed (br=[7] → 224 px) so x1 crosses org and clips to
        # ow — POSITIVE width retained (x0 stays mid-tile). Its own
        # tile AND its horizontal neighbor are reserved so the wide
        # box overlaps no other planted box.
        tx, ty = tiles.pop()
        if (1 - tx, ty) in tiles:
            tiles.remove((1 - tx, ty))
        c32 = (tx * 128 + 64) // 32
        r32 = (ty * 128 + 64) // 32
        levels[32].append({"r": r32, "c": c32,
                           "cls": rng.randint(0, 9),
                           "score": 0.90625,
                           "bl": [1], "bt": [1], "br": [7],
                           "bb": [1]})
    n_boxes = rng.randint(2, min(5, len(tiles)))
    made_dup = False
    for b in range(n_boxes):
        tx, ty = tiles.pop()
        # anchors only on the finer levels: the 64-stride grid is
        # coarser than the tile isolation (its centers sit 32 px off
        # the tile centers), so that level ships empty anchors — the
        # multi-scale concat still runs over it
        s = rng.choice(strides[:3])
        # anchor cell whose center lands mid-tile; the in-tile margin
        # bounds the bin mean so the box cannot cross tiles (the only
        # planted NMS interaction is the deliberate duplicate below)
        c = (tx * 128 + 64) // s
        r = (ty * 128 + 64) // s
        cx, cy = (c + 0.5) * s, (r + 0.5) * s
        margin = min(cx - tx * 128, (tx + 1) * 128 - cx,
                     cy - ty * 128, (ty + 1) * 128 - cy)
        kmax = max(1, min(7, int((margin - 4) // s)))

        def bins():
            # k >= 1 always: a zero-bin pair on one axis would decode
            # a ZERO-AREA box, whose IoU with its planted duplicate is
            # 0 — hard-NMS would keep both while the twin's group-max
            # merges them (found by review at sf0.1)
            k = rng.randint(1, kmax)
            # two-bin sets add 0.5 to the mean — only when that still
            # fits both the bin range and the tile margin
            if rng.random() < 0.5 or k + 1 > kmax or k >= 7:
                return [k]
            return [k, k + 1]
        bl, bt, br, bb = bins(), bins(), bins(), bins()
        score = scores_pool[b % len(scores_pool)]
        cls = rng.randint(0, 9)
        levels[s].append({"r": r, "c": c, "cls": cls, "score": score,
                          "bl": bl, "bt": bt, "br": br, "bb": bb})
        if (not made_dup and rng.random() < 0.5 and max(bl) <= 6
                and min(br) >= 1 and c + 1 < 512 // s):
            # same box decoded from the neighbouring cell: center
            # +s in x, left bins +1, right bins −1 → identical
            # coordinates, lower score → hard-NMS keeps the original
            levels[s].append({"r": r, "c": c + 1, "cls": cls,
                              "score": score - 0.03125,  # above the
                              # 0.5 gate, below the original: the
                              # pair reaches hard-NMS and loses there
                              "bl": [v + 1 for v in bl], "bt": bt,
                              "br": [v - 1 for v in br], "bb": bb})
            made_dup = True
    if tiles and rng.random() < 0.7:     # sub-threshold distractor
        tx, ty = tiles.pop()
        s = rng.choice(strides)
        levels[s].append({"r": (ty * 128 + 64) // s,
                          "c": (tx * 128 + 64) // s,
                          "cls": rng.randint(0, 9), "score": 0.375,
                          "bl": [1], "bt": [1], "br": [1], "bb": [1]})
    payload["picodet"] = {
        "input_shape": [512, 512], "org_shape": [oh, ow],
        "scale_factor": [sy, sx], "reg_max": 7, "n_classes": 10,
        "levels": [{"stride": s, "anchors": levels[s]}
                   for s in strides]}


def _plant_master(rng, payload):
    """Plant an MtlTabNet/TableMaster output contract (M10's
    model-output half): the per-step structure-id argmax path (junk
    steps after EOS + trailing PADs the decode must skip), the
    per-step normalized (cx, cy, w, h) regression rows (noise rows on
    non-td steps the bbox mask must zero, optionally one out-of-[0,1]
    td row the value filter must zero, extra rows past the token
    count the length-adjust must truncate), and the MTL cell branch:
    per-td character-id paths over a planted cell dictionary.
    Variants: a truncated stream ending on a bare '<td></td>' (the
    virtual '</tr></tbody>' close), a cell list one SHORT of the td
    count (the reference drops that td from the html entirely —
    insert_text_to_token's continue-skip), an empty thead cell (the
    '<td><b></b></td>' → '<td></td>' revert).

    All geometry is dyadic and pad_shape/scale_factor are powers of
    two, so decode → denormalize → truncate is exact in float64 and
    the DuckDB twin recomputes the boxes bit-equally from the planted
    rows + decoded token string alone. The html ground truth is
    CONSTRUCTED FORWARD here from the table spec (per-cell bold /
    expansion rules), never by calling the engine's decoder."""
    pad_h, pad_w = rng.choice([(512.0, 512.0), (1024.0, 512.0)])
    sy, sx = rng.choice([(0.5, 0.5), (1.0, 1.0), (2.0, 1.0),
                         (1.0, 0.5)])
    score = rng.choice([0.625, 0.6875, 0.75, 0.8125, 0.875])
    n_cols = rng.randint(2, 4)
    n_body = rng.randint(1, 3)
    truncated = rng.random() < 0.25
    drop_last = rng.random() < 0.3
    invalid_first_body = rng.random() < 0.3

    # eb token → its post-bold html (expansion then the deal_bb pass:
    # plain empties revert, space/line-separator payloads stay bolded)
    eb_html = {"<eb></eb>": "<td></td>",
               "<eb1></eb1>": "<td><b> </b></td>",
               "<eb2></eb2>": "<td><b> </b></td>",
               "<eb3></eb3>": "<td><b>\u2028\u2028</b></td>"}

    def noise():
        return [0.25, 0.25, 0.0, 0.0]     # masked by non-td steps

    def td_bbox(r, c, span):
        return [c * 0.25 + span * 0.125, r * 0.125 + 0.0625,
                span * 0.25 - 0.0625, 0.09375]

    tokens, rows_norm = [], []
    cell_texts = []                        # stream order, per td
    td_specs = []                          # (r, c, span) per td
    html_rows = []                         # forward gt, per table row

    def push(tok, row=None):
        tokens.append(tok)
        rows_norm.append(row if row is not None else noise())

    push("<thead>")
    push("<tr>")
    head_cells = []
    for c in range(n_cols):
        text = "" if (c == 0 and rng.random() < 0.3) \
            else _words(rng, 1, 2)
        push("<td></td>", td_bbox(0, c, 1))
        cell_texts.append(text)
        td_specs.append((0, c, 1))
        head_cells.append(("td", text, 1))
    push("</tr>")
    push("</thead>")
    push("<tbody>")
    html_rows.append(("thead", head_cells))
    for r in range(1, n_body + 1):
        last = r == n_body
        push("<tr>")
        body_cells = []
        c = 0
        while c < n_cols:
            plain_only = truncated and last
            if (not plain_only and c + 1 < n_cols
                    and rng.random() < 0.2):
                push("<td", td_bbox(r, c, 2))
                push(' colspan="2"')
                push(">")
                push("</td>")
                cell_texts.append(_words(rng, 1, 2))
                td_specs.append((r, c, 2))
                body_cells.append(("td", cell_texts[-1], 2))
                c += 2
            elif not plain_only and rng.random() < 0.2:
                eb = rng.choice(sorted(eb_html))
                push(eb)
                body_cells.append(("eb", eb, 1))
                c += 1
            else:
                push("<td></td>", td_bbox(r, c, 1))
                cell_texts.append(_words(rng, 1, 2))
                td_specs.append((r, c, 1))
                body_cells.append(("td", cell_texts[-1], 1))
                c += 1
        html_rows.append(("tbody", body_cells))
        if truncated and last:
            break                          # stream cut mid-row
        push("</tr>")
    if not truncated:
        push("</tbody>")

    if invalid_first_body and len(td_specs) > n_cols:
        # first BODY td: out-of-range coord → zeroed → no box row
        bad = next(i for i, t in enumerate(tokens)
                   if t.startswith("<td") and
                   rows_norm[i][1] > 0.125)
        rows_norm[bad] = [1.5, 0.5, 0.25, 0.25]

    used_texts = cell_texts[:-1] if drop_last else cell_texts
    cell_dict = sorted(set("".join(used_texts)) or {"a"})
    from ..core.masterhead import master_dict, master_encode
    ids, cell_ids = master_encode(tokens, used_texts, cell_dict)
    bboxes = list(rows_norm)
    bboxes.append(noise())                 # the EOS step's row
    pad_id = len(master_dict()) - 1
    ids += [1, pad_id, pad_id]             # junk '<tr>' + PADs
    bboxes += [noise(), noise(), [0.5, 0.5, 0.5, 0.5]]

    # ---- forward ground truth ----
    def fcell(text, span):
        open_ = "<td>" if span == 1 else '<td colspan="2">'
        if not text:
            return ("<td></td>" if span == 1
                    else '<td colspan="2"><b></b></td>')
        return open_[:-1] + "><b>" + text + "</b></td>"

    n_drop = len(cell_texts) - len(used_texts)
    seen_td = 0
    parts = []
    for sec, cells in html_rows:
        row = []
        for kind, val, span in cells:
            if kind == "eb":
                row.append(eb_html[val])
                continue
            seen_td += 1
            if seen_td > len(used_texts):
                continue                   # reference drops the td
            row.append(fcell(val, span))
        parts.append((sec, "<tr>" + "".join(row) + "</tr>"))
    gt_html = (
        "<thead>"
        + "".join(h for s, h in parts if s == "thead")
        + "</thead><tbody>"
        + "".join(h for s, h in parts if s == "tbody")
        + "</tbody>")
    assert n_drop in (0, 1) and seen_td == len(cell_texts)

    gt_boxes = []
    for (r, c, span), ti in zip(
            td_specs,
            (i for i, t in enumerate(tokens)
             if t in ("<td></td>", "<td"))):
        row = rows_norm[ti]
        if not all(0.0 <= v <= 1.0 for v in row):
            continue
        cx, cy, w, h = row
        x_, y_ = cx * pad_w / sx, cy * pad_h / sy
        w_, h_ = w * pad_w / sx, h * pad_h / sy
        gt_boxes.append(f"{int(x_ - w_ / 2)},{int(y_ - h_ / 2)},"
                        f"{int(x_ + w_ / 2)},{int(y_ + h_ / 2)}")

    payload["master"] = {
        "ids": ids, "scores": [score] * len(ids), "bboxes": bboxes,
        "pad_shape": [pad_h, pad_w], "scale_factor": [sy, sx],
        "cells": [{"ids": p} for p in cell_ids],
        "cell_dict": cell_dict,
        "gt_tokens": ",".join(tokens),
        "gt_html": f"{gt_html}|{score:.4f}",
        "gt_boxes": gt_boxes}


def _dump_ocr(rng, payload):
    """Finalize an ocr_page payload: plant the glyph evidence for its
    det_cells plus the five model-output contracts (DBNet prob map,
    CTC rec paths, SLANet structure path, Cycle-CenterNet keypoint
    peaks, PicoDet layout anchors), then dump with sorted keys
    (byte-stable fixtures).

    The CenterNet and PicoDet plants (added round 5) each use their
    OWN rng derived from the page's det_cells so the draw sequence of
    the pre-existing plants — and with it every previously frozen
    fixture value — is untouched."""
    payload["glyphs"] = _plant_glyphs(rng, payload["det_cells"])
    if rng.random() < 0.7:
        _plant_db_prob(rng, payload)
    if rng.random() < 0.7:
        _plant_rec_lines(rng, payload)
    if rng.random() < 0.6:
        _plant_slanet(rng, payload)
    seed = json.dumps(payload["det_cells"], sort_keys=True)
    rng_cn = random.Random(seed + "|centernet")
    if rng_cn.random() < 0.6:
        _plant_centernet(rng_cn, payload)
    rng_pd = random.Random(seed + "|picodet")
    if rng_pd.random() < 0.5:
        _plant_picodet(rng_pd, payload)
    rng_ms = random.Random(seed + "|master")
    if rng_ms.random() < 0.5:
        _plant_master(rng_ms, payload)
    return json.dumps(payload, sort_keys=True)


def _grid_dets(rng, x0, y0, n_rows, n_cols, col_w, row_h,
               skip=(), multiline_p=0.15):
    """Det cells for a plain grid: one text per cell, occasionally two
    stacked lines (exercises the in-cell line grouping)."""
    dets = []
    for r in range(n_rows):
        for c in range(n_cols):
            if (r, c) in skip:
                continue
            cx0, cy0 = x0 + c * col_w, y0 + r * row_h
            txt = _words(rng, 1, 2)
            if rng.random() < multiline_p and row_h >= 24.0:
                # two lines inside one cell: line-grouped by top-y,
                # joined with NO separator (the reference's ''.join)
                h2 = row_h / 2.0
                dets.append({"x0": cx0 + 4.0, "y0": cy0 + 2.0,
                             "x1": cx0 + 4.0 + 6.0 * len(txt),
                             "y1": cy0 + h2 - 2.0, "text": txt})
                txt2 = rng.choice(VOCAB)
                dets.append({"x0": cx0 + 4.0, "y0": cy0 + h2 + 2.0,
                             "x1": cx0 + 4.0 + 6.0 * len(txt2),
                             "y1": cy0 + row_h - 2.0, "text": txt2})
            else:
                dets.append({"x0": cx0 + 4.0, "y0": cy0 + 4.0,
                             "x1": cx0 + 4.0 + 6.0 * len(txt),
                             "y1": cy0 + row_h - 4.0, "text": txt})
    return dets


def _ocr_page_logi(rng):
    """F-J variant: the polygon + logical-axis TSR contract (LORE /
    CenterNet / LGPMA family). The model emits float logical axes with
    jitter and the cell polygons in MODEL order (not reading order) —
    the decode must round (process_logic_output), sort (is_priori), and
    build the spanning grid (build_table_cell_from_axis)."""
    n_rows, n_cols = rng.randint(3, 5), rng.randint(2, 4)
    x0, y0 = 60.0, 80.0
    col_w, row_h = 130.0, 28.0
    span_row = rng.randint(0, n_rows - 1) if rng.random() < 0.5 else -1

    units = []  # (left, right, top, bottom, poly)
    skip = set()
    for r in range(n_rows):
        c = 0
        while c < n_cols:
            if r == span_row and c == 0:
                w = 2 if n_cols >= 2 else 1
                units.append((0, w - 1, r, r, (
                    x0, y0 + r * row_h, x0 + w * col_w, y0 + (r + 1) * row_h)))
                for cc in range(w):
                    skip.add((r, cc))
                # the spanning cell still gets ONE det (in its middle)
                c += w
                continue
            units.append((c, c, r, r, (
                x0 + c * col_w, y0 + r * row_h,
                x0 + (c + 1) * col_w, y0 + (r + 1) * row_h)))
            c += 1
    rng.shuffle(units)  # model order ≠ reading order

    polygons, logi = [], []
    for left, right, top, bottom, (bx0, by0, bx1, by1) in units:
        polygons.append([bx0, by0, bx1, by0, bx1, by1, bx0, by1])
        # float axes with jitter the rounding must undo; strictly
        # inside (-0.5, 0.5) so the rounded value is unambiguous
        logi.append([v + rng.uniform(-0.45, 0.45)
                     for v in (left, right, top, bottom)])

    dets = _grid_dets(rng, x0, y0, n_rows, n_cols, col_w, row_h,
                      skip=skip)
    if span_row >= 0:
        txt = _words(rng, 1, 2)
        dets.append({"x0": x0 + 8.0, "y0": y0 + span_row * row_h + 4.0,
                     "x1": x0 + 8.0 + 6.0 * len(txt),
                     "y1": y0 + (span_row + 1) * row_h - 4.0,
                     "text": txt})
    if rng.random() < 0.3 and dets:
        # drop one det → its cell renders EMPTY (unmatched-cell path)
        dets.pop(rng.randrange(len(dets)))

    # prose below the table, beyond the band pad, → paragraphs
    py = y0 + n_rows * row_h + 3.0 * row_h
    for _ in range(rng.randint(0, 2)):
        line = _words(rng, 4, 8)
        dets.append({"x0": x0, "y0": py, "x1": x0 + 6.0 * len(line),
                     "y1": py + 12.0, "text": line})
        py += 22.0

    table = {"polygons": polygons, "logi": logi}
    if rng.random() < 0.5:
        # layout-crop region (S-task table crop) — preferred over the
        # band heuristic when present
        region = [x0 - 4.0, y0 - 4.0,
                  x0 + n_cols * col_w + 4.0,
                  y0 + n_rows * row_h + 4.0]
        table["region"] = region
        if rng.random() < 0.5:
            # M13 merge mode: the decoder ran on the crop, so its
            # polygons are CROP-LOCAL (translated back by the rounded
            # crop origin at extraction — convert_table_sep_to_merge)
            dx, dy = round(region[0]), round(region[1])
            table["coords"] = "local"
            table["polygons"] = [
                [p[0] - dx, p[1] - dy, p[2] - dx, p[3] - dy,
                 p[4] - dx, p[5] - dy, p[6] - dx, p[7] - dy]
                for p in polygons]
    return _dump_ocr(rng, {
        "width": PAGE_W, "height": PAGE_H,
        "det_cells": dets, "tables": [table]})


def _ocr_page_plain(rng):
    """F-J variant: the SLANet-type NON-master route (use_master=false):
    J2 match_result argmin + plain get_pred_html splice. Includes an F4
    casualty above the table and a multi-det cell (space-joined with
    the plain path's stripping semantics)."""
    n_rows, n_cols = rng.randint(2, 4), rng.randint(2, 4)
    x0, y0 = 70.0, 90.0
    col_w, row_h = 120.0, 26.0
    tokens, cell_bboxes = [], []
    for r in range(n_rows):
        tokens.append("<tr>")
        for c in range(n_cols):
            tokens.append("<td></td>")
            cell_bboxes.append([x0 + c * col_w, y0 + r * row_h,
                                x0 + (c + 1) * col_w,
                                y0 + (r + 1) * row_h])
        tokens.append("</tr>")
    dets = _grid_dets(rng, x0, y0, n_rows, n_cols, col_w, row_h,
                      multiline_p=0.0)
    if rng.random() < 0.5:
        # multi-det cell: second det right of the first in cell (0,0);
        # placed clear of the first det (glyph evidence never
        # overlaps) and only if it still fits inside the cell
        extra = rng.choice(VOCAB)
        ex0 = max(x0 + 62.0, dets[0]["x1"] + 8.0)
        if ex0 + 6.0 * len(extra) <= x0 + col_w - 2.0:
            dets.append({"x0": ex0, "y0": y0 + 4.0,
                         "x1": ex0 + 6.0 * len(extra),
                         "y1": y0 + row_h - 4.0, "text": extra})
    if rng.random() < 0.5:
        # F4: entirely above the table top → dropped, lands in prose
        cap = _words(rng, 2, 4)
        dets.append({"x0": x0, "y0": y0 - 30.0,
                     "x1": x0 + 6.0 * len(cap), "y1": y0 - 16.0,
                     "text": cap})
    return _dump_ocr(rng, {
        "width": PAGE_W, "height": PAGE_H,
        "det_cells": dets,
        "tables": [{"tokens": tokens, "cell_bboxes": cell_bboxes,
                    "use_master": False}]})


def _ocr_page_lgpma(rng):
    """F-J variant: the LGPMA contract (M9) — per-class ALIGNED CELL
    boxes with scores, no axis head. Exercises the full adjacency
    reduction: a 2-col spanning header cell (clique spans), a
    lower-scored duplicate box (cross-class NMS kill), an occasionally
    MISSING cell (empty-cell fill), multi-det cells with the '%'/'-'
    join rules, prose below."""
    n_rows, n_cols = rng.randint(2, 4), rng.randint(2, 3)
    x0, y0 = 65.0, 85.0
    col_w, row_h = 125.0, 27.0
    span_head = rng.random() < 0.6 and n_cols >= 2
    drop_cell = (rng.randint(1, n_rows - 1), rng.randint(0, n_cols - 1)) \
        if rng.random() < 0.4 and n_rows > 1 else None

    head_boxes, body_boxes = [], []
    skip = set()
    for r in range(n_rows):
        c = 0
        while c < n_cols:
            if span_head and r == 0 and c == 0:
                head_boxes.append([x0, y0, x0 + 2 * col_w, y0 + row_h,
                                   round(rng.uniform(0.8, 0.99), 3)])
                skip.add((0, 1))
                c += 2
                continue
            if drop_cell == (r, c):
                skip.add((r, c))
                c += 1
                continue
            box = [x0 + c * col_w, y0 + r * row_h,
                   x0 + (c + 1) * col_w, y0 + (r + 1) * row_h,
                   round(rng.uniform(0.8, 0.99), 3)]
            (head_boxes if r == 0 else body_boxes).append(box)
            c += 1
    if rng.random() < 0.5 and body_boxes:
        # cross-class duplicate of a body box at a LOWER score: the
        # NMS pass must suppress it
        b = body_boxes[rng.randrange(len(body_boxes))]
        head_boxes.append([b[0] + 3.0, b[1] + 2.0, b[2] - 3.0,
                           b[3] - 2.0, round(b[4] - 0.3, 3)])

    dets = _grid_dets(rng, x0, y0, n_rows, n_cols, col_w, row_h,
                      skip=skip, multiline_p=0.0)
    if rng.random() < 0.5:
        # second det in a surviving cell, '%'-prefixed half the time:
        # the join must skip the space before '%'
        txt = ("%" if rng.random() < 0.5 else "") + rng.choice(VOCAB)
        rr = n_rows - 1
        # clear of the cell's first det — glyph evidence never overlaps
        first = next((d for d in dets
                      if d["y0"] == y0 + rr * row_h + 4.0
                      and d["x0"] == x0 + 4.0), None)
        ex0 = max(x0 + 60.0, (first["x1"] + 8.0) if first else 0.0)
        if ex0 + 6.0 * len(txt) <= x0 + col_w - 2.0:
            dets.append({"x0": ex0, "y0": y0 + rr * row_h + 4.0,
                         "x1": ex0 + 6.0 * len(txt),
                         "y1": y0 + (rr + 1) * row_h - 4.0, "text": txt})

    py = y0 + n_rows * row_h + 3.0 * row_h
    for _ in range(rng.randint(0, 2)):
        line = _words(rng, 4, 8)
        dets.append({"x0": x0, "y0": py, "x1": x0 + 6.0 * len(line),
                     "y1": py + 12.0, "text": line})
        py += 22.0

    table = {"lgpma": [head_boxes, body_boxes]}
    if rng.random() < 0.4:
        region = [x0 - 4.0, y0 - 4.0,
                  x0 + n_cols * col_w + 4.0,
                  y0 + n_rows * row_h + 4.0]
        table["region"] = region
        if rng.random() < 0.5:
            dx, dy = round(region[0]), round(region[1])
            table["coords"] = "local"
            table["lgpma"] = [
                [[b[0] - dx, b[1] - dy, b[2] - dx, b[3] - dy, b[4]]
                 for b in cls]
                for cls in table["lgpma"]]
    return _dump_ocr(rng, {
        "width": PAGE_W, "height": PAGE_H,
        "det_cells": dets, "tables": [table]})


def _ocr_page_stacked(rng):
    """F-J variant: two tables stacked closer than one cell height,
    each with an explicit layout-crop region — the case the band
    heuristic mis-assigns (tests pin that failure; regions fix it)."""
    x0 = 70.0
    col_w, row_h = 120.0, 26.0
    gap = row_h * 0.6  # < one cell height
    pages = []
    y = 90.0
    for _ in range(2):
        n_rows, n_cols = rng.randint(2, 3), rng.randint(2, 3)
        tokens, cell_bboxes = [], []
        for r in range(n_rows):
            tokens.append("<tr>")
            for c in range(n_cols):
                tokens.append("<td></td>")
                cell_bboxes.append([x0 + c * col_w, y + r * row_h,
                                    x0 + (c + 1) * col_w,
                                    y + (r + 1) * row_h])
            tokens.append("</tr>")
        dets = _grid_dets(rng, x0, y, n_rows, n_cols, col_w, row_h,
                          multiline_p=0.0)
        pages.append((tokens, cell_bboxes, dets,
                      [x0 - 4.0, y - gap / 2.0,
                       x0 + n_cols * col_w + 4.0,
                       y + n_rows * row_h + gap / 2.0]))
        y += n_rows * row_h + gap
    det_cells = [d for _, _, ds, _ in pages for d in ds]
    tables = [{"tokens": t, "cell_bboxes": b, "use_master": False,
               "region": rg} for t, b, _, rg in pages]
    return _dump_ocr(rng, {
        "width": PAGE_W, "height": PAGE_H,
        "det_cells": det_cells, "tables": tables})


def _skewed_page(rng):
    """F-K: a ruled-table page 'scanned' at a small skew angle — ruling
    lines become explicit (slightly diagonal) ``segs`` and every text
    box center rotates with them. The M1 deskew (``core.page.
    deskew_page``) must estimate the angle from the segments and
    recover the unskewed extraction."""
    import math
    r, c = rng.randint(3, 6), rng.randint(2, 5)
    rects, texts, _ = _ruled_table(rng, 100.0, 650.0, r, c)
    theta = rng.choice([-1.0, 1.0]) * rng.uniform(0.4, 1.8)
    cx, cy = PAGE_W / 2.0, PAGE_H / 2.0
    cos_t = math.cos(math.radians(theta))
    sin_t = math.sin(math.radians(theta))

    def rot(x, y):
        dx, dy = x - cx, y - cy
        return cx + dx * cos_t - dy * sin_t, cy + dx * sin_t + dy * cos_t

    segs = []
    for rc in rects:  # thin rects → centerline segments, skewed
        if rc["x1"] - rc["x0"] >= rc["y1"] - rc["y0"]:
            yc = (rc["y0"] + rc["y1"]) / 2.0
            p0, p1 = rot(rc["x0"], yc), rot(rc["x1"], yc)
        else:
            xc = (rc["x0"] + rc["x1"]) / 2.0
            p0, p1 = rot(xc, rc["y0"]), rot(xc, rc["y1"])
        segs.append({"x0": p0[0], "y0": p0[1], "x1": p1[0], "y1": p1[1]})

    sk_texts = []
    for t in texts:
        bx, by = rot((t["x0"] + t["x1"]) / 2.0, (t["y0"] + t["y1"]) / 2.0)
        w = (t["x1"] - t["x0"]) / 2.0
        h = (t["y1"] - t["y0"]) / 2.0
        sk_texts.append({**t, "x0": bx - w, "y0": by - h,
                         "x1": bx + w, "y1": by + h})
    return json.dumps({
        "width": PAGE_W, "height": PAGE_H,
        "text_lines": sk_texts, "rects": [], "images": [],
        "segs": segs}, sort_keys=True)


def _page_json(text_lines, rects=None, images=None):
    return json.dumps({
        "width": PAGE_W, "height": PAGE_H,
        "text_lines": text_lines, "rects": rects or [],
        "images": images or []}, sort_keys=True)


def _rotate_payload(page_json: str, k: int) -> str:
    """Rotate a page payload 90°·k clockwise and declare it (M1
    orientation fixture): extraction must normalize back and emit the
    same fragments as the unrotated page."""
    from ..core.page import rotate_page_90cw
    page = json.loads(page_json)
    for _ in range(k):
        page = rotate_page_90cw(page)
    page["rotation"] = 90 * k
    return json.dumps(page, sort_keys=True)


def _html_table_fragment(rng):
    n_rows, n_cols = rng.randint(2, 4), rng.randint(2, 4)
    parts = ["<table>"]
    r = 0
    while r < n_rows:
        parts.append("<tr>")
        c = 0
        while c < n_cols:
            span = 1
            if c + 1 < n_cols and rng.random() < 0.2:
                span = 2
            attr = f' colspan="{span}"' if span > 1 else ""
            body = _words(rng, 1, 2) if rng.random() < 0.8 else ""
            parts.append(f"<td{attr}>{body}</td>")
            c += span
        parts.append("</tr>")
        r += 1
    parts.append("</table>")
    return "".join(parts)


def _html_page(rng):
    """Full web page (family F-L): nav/header/footer/script
    boilerplate around main-content paragraphs, with optional embedded
    tables, images, and link-farm blocks (dropped by the link-density
    gate). Exercises core.htmlpage's DOM-heuristic extraction."""
    def links(n):
        return "".join(f'<a href="/{w}">{w}</a> '
                       for w in rng.sample(VOCAB, n))
    parts = [
        "<html><head><title>", _words(rng, 2, 4), "</title>",
        f"<script>var t={rng.randint(0, 99)};</script></head><body>",
        f"<nav>{links(3)}</nav>",
        f"<header><h1>{_words(rng, 2, 4)}</h1></header><main>",
    ]
    for _ in range(rng.randint(1, 3)):
        parts.append(f"<p>{_words(rng, 8, 25)}.</p>")
        if rng.random() < 0.3:
            parts.append(f'<img src="blob://web/{rng.randint(0, 1 << 30)}">')
        if rng.random() < 0.4:
            parts.append(_html_table_fragment(rng))
        if rng.random() < 0.3:
            parts.append(f"<p>{links(4)}</p>")   # link farm
    parts.append("</main><footer>")
    parts.append(f"{_words(rng, 2, 5)} <a href=\"/legal\">legal</a>")
    parts.append("</footer></body></html>")
    return "".join(parts)


def gen_page(rng, family, heavy=False):
    """One pdf_page span payload (JSON string) plus any sibling spans.

    ``heavy`` = realistic page density (the scaling-bench corpus):
    dense multi-table pages approximating real document pages, so the
    compute-per-byte ratio matches production rather than the tiny
    correctness fixtures."""
    if family == "F-A":
        r, c = ((rng.randint(10, 18), rng.randint(4, 8)) if heavy
                else (rng.randint(2, 8), rng.randint(2, 6)))
        rects, texts, _ = _ruled_table(
            rng, 80.0, 700.0, r, c, straddle=True,
            hairline=rng.random() < 0.25,
            superscript=rng.random() < 0.3,
            overrun=rng.random() < 0.25)
        return _page_json(texts, rects)
    if family == "F-B":
        r, c, d = ((rng.randint(8, 14), rng.randint(4, 7),
                    rng.randint(4, 10)) if heavy
                   else (rng.randint(3, 6), rng.randint(3, 5),
                         rng.randint(1, 3)))
        rects, texts, _ = _ruled_table(rng, 80.0, 700.0, r, c, drop_edges=d,
                                       straddle=True)
        return _page_json(texts, rects)
    if family == "F-C":
        r, c = ((rng.randint(14, 24), rng.randint(3, 6)) if heavy
                else (rng.randint(6, 12), rng.randint(2, 4)))
        texts = _stream_table(rng, 90.0, 680.0, r, c)
        return _page_json(texts)
    if family == "F-I":
        r, c = ((rng.randint(14, 22), rng.randint(3, 5)) if heavy
                else (rng.randint(8, 12), rng.randint(3, 4)))
        texts = _ragged_stream_table(rng, 90.0, 680.0, r, c)
        return _page_json(texts)
    if family == "F-K":
        return _skewed_page(rng)
    if family == "F-D":
        texts, _ = _prose(rng, 72.0, 720.0,
                          rng.randint(6, 10) if heavy
                          else rng.randint(2, 6))
        if rng.random() < 0.2:
            # vertical margin caption (O2: vertical reading order)
            cap = _words(rng, 2, 4)
            y_top = 700.0 - rng.uniform(0, 40)
            texts.append({
                "x0": 40.0, "y0": y_top - 7.0 * len(cap), "x1": 50.0,
                "y1": y_top, "text": cap, "dir": "v"})
        return _page_json(texts)
    if family == "F-E":
        rects, ttexts, _ = _ruled_table(rng, 80.0, 720.0, 3, 3)
        # a fake table (rulings) drawn over a figure → suppressed;
        # the figure is either an embedded image (F6) or an M2-layout
        # region labeled 'figure' (J4/F5 path)
        fx0, fy_top = 360.0, 720.0
        frects, ftexts, fbbox = _ruled_table(rng, fx0, fy_top, 2, 2)
        layout = []
        images = []
        if rng.random() < 0.5:
            images.append({
                "x0": fbbox[0], "y0": fbbox[1], "x1": fbbox[2],
                "y1": fbbox[3], "name": f"img://{rng.randint(0, 1 << 30)}"})
        else:
            layout.append({
                "x0": fbbox[0] - 4.0, "y0": fbbox[1] - 4.0,
                "x1": fbbox[2] + 4.0, "y1": fbbox[3] + 4.0,
                "label": "figure",
                "score": round(rng.uniform(0.85, 0.99), 3)})
            # a low-score figure box over the REAL table must not
            # suppress it (F5 score threshold)
            if rng.random() < 0.5:
                layout.append({
                    "x0": 70.0, "y0": 560.0, "x1": 380.0, "y1": 730.0,
                    "label": "figure", "score": 0.4})
        if rng.random() < 0.4:
            # F3: a tiny decorative bullet image (area 16 < 20) that
            # must neither emit a fragment nor suppress anything
            bx = 72.0 + rng.uniform(0, 400)
            images.append({"x0": bx, "y0": 90.0, "x1": bx + 4.0,
                           "y1": 94.0,
                           "name": f"img://tiny{rng.randint(0, 999)}"})
        prose, _ = _prose(rng, 72.0, 560.0, rng.randint(1, 3))
        pj = json.loads(_page_json(
            ttexts + ftexts + prose, rects + frects, images))
        pj["layout"] = layout
        return json.dumps(pj, sort_keys=True)
    if family == "F-H":
        if rng.random() < 0.35:
            # U4: one table split into two stacked halves by a
            # detection artifact (5pt gap — beyond joint_tol, so the
            # halves are DISCONNECTED regions; same columns) — the
            # stacked-region merge must stitch them back together
            c = rng.randint(2, 4)
            r1, r2 = rng.randint(2, 3), rng.randint(2, 3)
            cw, rh = 80.0, 24.0
            rectsA, tA, _ = _ruled_table(rng, 80.0, 720.0, r1, c,
                                         col_w=cw, row_h=rh)
            y2 = 720.0 - r1 * rh - 5.0
            rectsB, tB, _ = _ruled_table(rng, 80.0, y2, r2, c,
                                         col_w=cw, row_h=rh)
            return _page_json(tA + tB, rectsA + rectsB)
        rects1, t1, b1 = _ruled_table(rng, 80.0, 720.0,
                                      rng.randint(2, 4), rng.randint(2, 4))
        rects2, t2, b2 = _ruled_table(rng, 80.0, 430.0,
                                      rng.randint(2, 4), rng.randint(2, 4))
        extra = []
        if rng.random() < 0.5:
            rects3, t3, _ = _ruled_table(rng, 360.0, 430.0, 2, 2)
            rects2 += rects3
            t2 += t3
        return _page_json(t1 + t2 + extra, rects1 + rects2)
    raise ValueError(family)


def gen_doc(doc_idx: int, seed: int = 42, heavy: bool = False):
    """Generate one document: (doc_id, spans). Deterministic per
    (seed, doc_idx) so generation parallelizes / resumes trivially.

    ``heavy`` = scaling-bench profile: 6-10 dense pages per doc (see
    gen_page). Default draws are byte-identical to the original
    fixtures."""
    rng = random.Random((seed << 20) ^ doc_idx)
    family = rng.choices(FAMILIES, weights=WEIGHTS, k=1)[0]
    doc_id = f"doc_{doc_idx:07d}"
    spans = []

    def add(kind, text="", media_ref=""):
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": len(spans)})

    if heavy:
        for p in range(rng.randint(6, 10)):
            fam = rng.choice(["F-A", "F-B", "F-C", "F-D"])
            add("pdf_page", gen_page(rng, fam, heavy=True),
                f"page://{doc_id}/{p}")
        return doc_id, spans, "heavy"

    if family == "F-F":
        for _ in range(rng.randint(1, 3)):
            if rng.random() < 0.4:
                add("text", _words(rng, 8, 20))
            add("html_table", _html_table_fragment(rng))
        return doc_id, spans, family

    if family == "F-L":
        # web document: full HTML pages — boilerplate stripped and
        # main content extracted by core.htmlpage (north rule's 'HTML
        # boilerplate strip … DOM heuristics' clause)
        for p in range(rng.randint(1, 2)):
            add("html_page", _html_page(rng), f"web://{doc_id}/{p}")
        return doc_id, spans, family

    if family == "F-J":
        # imaged document: page image blobs + OCR-path payloads, no
        # digital text at all (S6 classifies it imaged; the OCR
        # dataflow extracts it anyway). Pages mix the decoder output
        # contracts: master token stream (TableMaster/MtlTabNet),
        # plain token stream (SLANet, use_master=false), polygon +
        # logical axis (LORE/CenterNet/LGPMA), and stacked tables
        # with layout-crop regions.
        for p in range(rng.randint(1, 2)):
            add("image", "", f"blob://{doc_id}/page{p}")
            draw = rng.random()
            if draw < 0.45:
                payload = _ocr_page(rng)
            elif draw < 0.62:
                payload = _ocr_page_logi(rng)
            elif draw < 0.78:
                payload = _ocr_page_plain(rng)
            elif draw < 0.9:
                payload = _ocr_page_lgpma(rng)
            else:
                payload = _ocr_page_stacked(rng)
            add("ocr_page", payload, f"page://{doc_id}/{p}")
        return doc_id, spans, family

    n_pages = rng.randint(200, 500) if family == "F-G" else rng.randint(1, 3)
    page_families = (
        [rng.choice(["F-A", "F-B", "F-C", "F-D"]) for _ in range(n_pages)]
        if family == "F-G" else [family] * n_pages)
    for p, fam in enumerate(page_families):
        if rng.random() < 0.2:
            add("text", _words(rng, 8, 20))
        payload = gen_page(rng, fam)
        if rng.random() < 0.15:  # M1: some pages arrive rotated
            payload = _rotate_payload(payload, rng.randint(1, 3))
        if rng.random() < 0.02:
            # poison: a malformed payload (real corpora always have
            # some) — must quarantine to an 'error' span, never kill
            # the job; which failure mode alternates deterministically
            payload = (payload[: len(payload) // 2]  # truncated JSON
                       if rng.random() < 0.5 else
                       json.dumps({"width": PAGE_W, "height": PAGE_H,
                                   "text_lines": [{"text": "broken"}],
                                   "rects": [], "images": []}))
        add("pdf_page", payload, f"page://{doc_id}/{p}")
        if rng.random() < 0.15:
            add("image", "", f"blob://{doc_id}/{rng.randint(0, 1 << 30)}")
    return doc_id, spans, family


def gen_corpus(n_docs: int, seed: int = 42, skew_doc: bool = True):
    """Yield (doc_id, spans, family) rows. When ``skew_doc`` and the
    weighted draw never produced an F-G, force doc 0 to be one at
    n_docs >= 200 so partition-skew handling is always exercised."""
    got_skew = False
    for i in range(n_docs):
        doc_id, spans, family = gen_doc(i, seed)
        if family == "F-G":
            if got_skew or n_docs < 200:
                # cap corpus weight: regenerate as a small doc variant
                doc_id, spans, family = gen_doc(i, seed ^ 0x5F5E100)
                if family == "F-G":
                    _, spans, family = gen_doc(i, seed ^ 0x3ADE68B1)
                    if family == "F-G":
                        spans = spans[:4]
            else:
                got_skew = True
        yield doc_id, spans, family
