"""TEDS-style table-similarity diagnostics (reference §5 secondary
metric: tree-edit-distance similarity on table HTML,
``table_metric/table_metric.py:93-201``; cell-pair P/R/F1,
``utils/eval/eval_utils.py:23-114``).

The primary correctness gate of this repo is exact span-sequence
equality; these scores exist for *diagnostics* — when an output table
differs from an expectation, they say how much and where, instead of
just "not equal". Deterministic, dependency-free (difflib, no APTED):

  * ``grid_f1``   — precision/recall/F1 over structurally-matched cells
                    (same row/col/row_span/col_span, exact text)
  * ``teds_like`` — [0, 1] similarity: structural match weighted by
                    per-cell text similarity (difflib ratio), averaged
                    over the larger grid — 1.0 iff grids are identical
  * ``pair_tables`` — J6: physical-bbox IoU≥0.5 pred↔gt cell pairing
                    with bbox precision/recall and logical-axis
                    accuracy (reference ``PairTable``,
                    ``eval_utils.py:23-114``)
"""

from __future__ import annotations

import difflib

from .geometry import iou as _rect_iou
from .html import parse_table_html


def _keyed(cells):
    return {(c.row, c.col, c.row_span, c.col_span): c.text for c in cells}


def grid_f1(html_pred: str, html_gold: str) -> dict:
    """Cell-level precision/recall/F1: a predicted cell counts iff a
    gold cell has identical (row, col, row_span, col_span) AND text."""
    pred = _keyed(parse_table_html(html_pred))
    gold = _keyed(parse_table_html(html_gold))
    hits = sum(1 for k, t in pred.items() if gold.get(k) == t)
    p = hits / len(pred) if pred else (1.0 if not gold else 0.0)
    r = hits / len(gold) if gold else (1.0 if not pred else 0.0)
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": round(p, 6), "recall": round(r, 6),
            "f1": round(f1, 6), "n_pred": len(pred), "n_gold": len(gold)}


def table_units(cells) -> list[dict]:
    """LogicalCells → eval units: physical bbox + logical axis
    (left, right, top, bottom) indices, the reference's TableUnit
    shape (``table_entity.py:512-656``)."""
    return [{"bbox": (c.x0, c.y0, c.x1, c.y1),
             "axis": (c.col, c.col + c.col_span - 1,
                      c.row, c.row + c.row_span - 1)}
            for c in cells]


def pair_tables(pred_units, gt_units, iou_threshold: float = 0.5) -> dict:
    """J6 pred↔gt cell pairing: each gt unit takes the FIRST pred unit
    with bbox IoU ≥ threshold (reference ``PairTable.matching`` —
    greedy in list order, preds not consumed). Returns bbox
    precision/recall, false positives/negatives, and axis accuracy
    (all four logical indices equal) over the matched pairs; None where
    the reference reports 'null' (empty denominators)."""
    matches = []
    for gt in gt_units:
        hit = None
        for pred in pred_units:
            if _rect_iou(gt["bbox"], pred["bbox"]) >= iou_threshold:
                hit = pred
                break
        matches.append(hit)
    tp = sum(1 for m in matches if m is not None)
    ap, at = len(pred_units), len(gt_units)
    axis_hits = sum(
        1 for gt, m in zip(gt_units, matches)
        if m is not None and tuple(m["axis"]) == tuple(gt["axis"]))
    return {
        "precision": (tp / ap) if ap else None,
        "recall": (tp / at) if at else None,
        "false_pos": ap - tp,
        "false_neg": at - tp,
        "axis_accuracy": (axis_hits / tp) if tp else None,
    }


def teds_like(html_pred: str, html_gold: str) -> float:
    """Structure-weighted text similarity in [0, 1].

    Each gold cell contributes its best score: 1.0 only when a
    structurally-identical predicted cell exists, scaled by the text
    similarity ratio; unmatched cells (either side) contribute 0 via
    the max-cardinality denominator. Equals 1.0 iff the grids are
    identical, like TEDS; unlike TEDS it does not model subtree moves
    (we have a grid, not an arbitrary tree — cheaper and adequate for
    cell-grid diagnostics)."""
    pred = _keyed(parse_table_html(html_pred))
    gold = _keyed(parse_table_html(html_gold))
    if not pred and not gold:
        return 1.0
    denom = max(len(pred), len(gold))
    score = 0.0
    for k, gtext in gold.items():
        ptext = pred.get(k)
        if ptext is None:
            continue
        if ptext == gtext:
            score += 1.0
        else:
            score += difflib.SequenceMatcher(
                None, ptext, gtext).ratio()
    return round(score / denom, 6)
