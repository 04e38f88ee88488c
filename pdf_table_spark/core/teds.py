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
    """J6 pred↔gt cell pairing: each gt unit takes the first unmatched
    pred unit with bbox IoU ≥ threshold (greedy in list order, like the
    reference ``PairTable.matching`` — but each pred is consumed once;
    the reference lets one pred match several gts, which can report
    precision > 1 and negative false positives). Returns bbox
    precision/recall, false positives/negatives, and axis accuracy
    (all four logical indices equal) over the matched pairs; None where
    the reference reports 'null' (empty denominators)."""
    matches = []
    taken: set[int] = set()
    for gt in gt_units:
        hit = None
        for k, pred in enumerate(pred_units):
            if k in taken:
                continue
            if _rect_iou(gt["bbox"], pred["bbox"]) >= iou_threshold:
                hit = pred
                taken.add(k)
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


class _Node:
    __slots__ = ("label", "content", "children")

    def __init__(self, label, content=None, children=None):
        self.label = label
        self.content = content or []
        self.children = children or []


class _Elem:
    """Raw HTML element: ordered children interleave text strings and
    child elements (covers lxml's text/tail without two slots)."""
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children = []


def _find_table(html: str):
    """Parse with the stdlib HTMLParser and return the first <table>
    element (the reference's ``html.fromstring(...).xpath('body/table')``)."""
    from html.parser import HTMLParser

    root = _Elem("__root__", {})
    stack = [root]

    class P(HTMLParser):
        def handle_starttag(self, tag, attrs):
            e = _Elem(tag, attrs)
            stack[-1].children.append(e)
            stack.append(e)

        def handle_startendtag(self, tag, attrs):
            stack[-1].children.append(_Elem(tag, attrs))

        def handle_endtag(self, tag):
            for k in range(len(stack) - 1, 0, -1):
                if stack[k].tag == tag:
                    del stack[k:]
                    break

        def handle_data(self, data):
            if data:
                stack[-1].children.append(data)

    P(convert_charrefs=True).feed(html or "")

    def find(e):
        for ch in e.children:
            if isinstance(ch, _Elem):
                if ch.tag == "table":
                    return ch
                hit = find(ch)
                if hit is not None:
                    return hit
        return None

    return find(root)


def _count_elements(e: _Elem) -> int:
    """Element descendants of ``e`` (the reference's ``.//*`` count —
    includes thead/tbody/tr/td AND in-cell markup elements)."""
    n = 0
    for ch in e.children:
        if isinstance(ch, _Elem):
            n += 1 + _count_elements(ch)
    return n


def _tokenize(e: _Elem, out: list) -> None:
    """The reference's td tokenizer (``table_metric.py:105-116``):
    '<tag>' markers, text exploded into single chars, '</tag>' closers."""
    out.append(f"<{e.tag}>")
    for ch in e.children:
        if isinstance(ch, _Elem):
            _tokenize(ch, out)
        else:
            out.extend(ch)
    out.append(f"</{e.tag}>")


def _load_tree(e: _Elem, structure_only: bool = False) -> _Node:
    """The reference's ``load_html_tree``: td becomes a LEAF labeled
    (td, colspan, rowspan) whose content is its tokenized subtree
    (stripped of the outer td markers); other elements keep their
    element children."""
    if e.tag == "td":
        if structure_only:
            cell = []
        else:
            toks: list = []
            _tokenize(e, toks)
            cell = toks[1:-1]
        return _Node(("td", int(e.attrs.get("colspan", "1") or 1),
                      int(e.attrs.get("rowspan", "1") or 1)), cell)
    return _Node((e.tag,), children=[
        _load_tree(ch, structure_only) for ch in e.children
        if isinstance(ch, _Elem)])


def _postorder(root: _Node):
    """Zhang-Shasha scaffolding: postorder nodes, leftmost-leaf index
    per node, keyroots."""
    nodes, lml = [], []

    def walk(n):
        first = None
        for ch in n.children:
            f = walk(ch)
            if first is None:
                first = f
        idx = len(nodes)
        nodes.append(n)
        lml.append(first if first is not None else idx)
        return lml[idx]

    walk(root)
    # keyroot: i such that no j>i shares its leftmost leaf
    seen = set()
    keyroots = []
    for i in range(len(nodes) - 1, -1, -1):
        if lml[i] not in seen:
            keyroots.append(i)
            seen.add(lml[i])
    return nodes, lml, sorted(keyroots)


def _levenshtein_ratio(a, b) -> float:
    """Normalized edit distance in [0, 1] over two sequences (token
    lists or strings); 0 = identical."""
    if a == b:
        return 0.0
    if not a or not b:
        return 1.0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1] / max(len(a), len(b))


def _rename_cost(a: _Node, b: _Node) -> float:
    """The reference's CustomConfig.rename (``table_metric.py:41-51``):
    1 when tag/colspan/rowspan differ; graded token-sequence
    Levenshtein for td content; 0 otherwise."""
    if a.label != b.label:
        return 1.0
    if a.label[0] == "td" and (a.content or b.content):
        return _levenshtein_ratio(a.content, b.content)
    return 0.0


def tree_edit_distance(ra: _Node, rb: _Node) -> float:
    """Zhang-Shasha ordered tree edit distance; unit insert/delete,
    graded td-text rename (the TEDS cost model,
    ``table_metric.py:93-201``)."""
    an, al, ak = _postorder(ra)
    bn, bl, bk = _postorder(rb)
    td = [[0.0] * len(bn) for _ in range(len(an))]

    for i in ak:
        for j in bk:
            m, n = i - al[i] + 2, j - bl[j] + 2
            fd = [[0.0] * n for _ in range(m)]
            ioff, joff = al[i] - 1, bl[j] - 1
            for x in range(1, m):
                fd[x][0] = fd[x - 1][0] + 1
            for y in range(1, n):
                fd[0][y] = fd[0][y - 1] + 1
            for x in range(1, m):
                for y in range(1, n):
                    if al[x + ioff] == al[i] and bl[y + joff] == bl[j]:
                        fd[x][y] = min(
                            fd[x - 1][y] + 1, fd[x][y - 1] + 1,
                            fd[x - 1][y - 1] + _rename_cost(
                                an[x + ioff], bn[y + joff]))
                        td[x + ioff][y + joff] = fd[x][y]
                    else:
                        p = al[x + ioff] - 1 - ioff
                        q = bl[y + joff] - 1 - joff
                        fd[x][y] = min(
                            fd[x - 1][y] + 1, fd[x][y - 1] + 1,
                            fd[p][q] + td[x + ioff][y + joff])
    return td[-1][-1]


def teds(html_pred: str, html_gold: str,
         structure_only: bool = False) -> float:
    """Tree-Edit-Distance Similarity on table HTML — the reference's §5
    metric (``table_metric.py:93-201``) made dependency-free: the exact
    ordered tree edit distance (Zhang-Shasha computes the same distance
    APTED does) over the raw element tree (thead/tbody/tr and td
    leaves), td content tokenized into markup markers + single chars,
    normalized by max element count: 1 - TED / max(|Ta|, |Tb|).
    Reference semantics pinned: empty/table-less inputs score 0.0;
    ``structure_only`` ignores cell content."""
    if not html_pred or not html_gold:
        return 0.0
    ea = _find_table(html_pred)
    eb = _find_table(html_gold)
    if ea is None or eb is None:
        return 0.0
    n = max(_count_elements(ea), _count_elements(eb))
    ta = _load_tree(ea, structure_only)
    tb = _load_tree(eb, structure_only)
    dist = tree_edit_distance(ta, tb)
    if n == 0:
        return 1.0 if dist == 0 else 0.0
    return round(max(0.0, 1.0 - dist / n), 6)


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
