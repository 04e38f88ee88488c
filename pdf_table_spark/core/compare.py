"""Table-diff classification — the reference's self-verification
(``TableResultCompare.check_pred_table_html``,
``table_result_compare.py:33-106``; category enum
``entity/enum_entity.py:46-124``) re-derived for this engine's cell
grids.

Classifies WHY a predicted table differs from an expected one, instead
of a bare not-equal — the diagnostic the reference attaches to every
extraction. Categories (a deterministic subset of the reference's 14,
ordered most-specific first):

  SAME                     byte-identical HTML
  REMOVE_WIDTH_SAME        identical once width="..%" attrs are dropped
  DIFF_CELL_SPAN_SAME      same texts per (row, col) anchor, only
                           row/col spans differ → both subtypes below
  DIFF_CELL_ROW_SPAN       only row_span values differ
  DIFF_CELL_COL_SPAN       only col_span values differ
  DIFF_CELL_ROW_COL_SPAN   both span kinds differ
  DIFF_CELL_DIFF_ROW       same multiset of cell texts, different
                           (row, col) placement
  DIFF_TEXT_PREDICT_LESS_WORDS / DIFF_TEXT_LABEL_LESS_WORDS
                           one side's word multiset is a strict subset
                           of the other's (word-level, like the
                           reference's table_result_compare)
  DIFF_TEXT_INCONSISTENT   anything else
"""

from __future__ import annotations

import re
from collections import Counter

from .html import parse_table_html

_WIDTH_RE = re.compile(r'\s*width="\d+%"')


def _strip_width(html: str) -> str:
    return _WIDTH_RE.sub("", html)


def _anchors(cells):
    return {(c.row, c.col): (c.row_span, c.col_span, c.text)
            for c in cells}


def _word_subset(a: Counter, b: Counter) -> bool:
    """every word of a occurs in b at least as often (multiset ⊆)."""
    return all(b[w] >= n for w, n in a.items())


def classify_table_diff(pred_html: str, gold_html: str) -> str:
    if pred_html == gold_html:
        return "SAME"
    if _strip_width(pred_html) == _strip_width(gold_html):
        return "REMOVE_WIDTH_SAME"

    pred = _anchors(parse_table_html(pred_html))
    gold = _anchors(parse_table_html(gold_html))

    if set(pred) == set(gold) and all(
            pred[k][2] == gold[k][2] for k in pred):
        row_diff = any(pred[k][0] != gold[k][0] for k in pred)
        col_diff = any(pred[k][1] != gold[k][1] for k in pred)
        if row_diff and col_diff:
            return "DIFF_CELL_ROW_COL_SPAN"
        if row_diff:
            return "DIFF_CELL_ROW_SPAN"
        if col_diff:
            return "DIFF_CELL_COL_SPAN"
        return "REMOVE_WIDTH_SAME"  # anchors+texts+spans equal: attrs only

    pred_texts = sorted(v[2] for v in pred.values())
    gold_texts = sorted(v[2] for v in gold.values())
    if pred_texts == gold_texts:
        return "DIFF_CELL_DIFF_ROW"

    # word-level multiset containment (reference compares word lists,
    # not characters: char-subsequence misfires on e.g. 'bc' vs 'ab cd')
    p_words = Counter(" ".join(pred_texts).split())
    g_words = Counter(" ".join(gold_texts).split())
    if p_words != g_words:
        if _word_subset(p_words, g_words):
            return "DIFF_TEXT_PREDICT_LESS_WORDS"
        if _word_subset(g_words, p_words):
            return "DIFF_TEXT_LABEL_LESS_WORDS"
    return "DIFF_TEXT_INCONSISTENT"
