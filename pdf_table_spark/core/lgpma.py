"""LGPMA adjacency reduction (M9): aligned-cell boxes → logical grid.

The reference's LGPMA decoder (``model/table/lgpma/post_lgpma.py``)
takes the model's ALIGNED CELL bboxes (per class, with scores) and
reduces them to the logical table without any axis head:

  * cross-class NMS (``nms_inter_classes:57-89``) on max-IoU =
    intersection / min(area) ≥ 0.3, score-descending (ties: later
    box first, matching ``argsort()[::-1]``);
  * row/col adjacency (``bbox2adj:146-181``): boxes sharing a y/x
    midline are row/col-adjacent, plus the "special relationship"
    pass — overlapping intervals (+4 px slack on rows, 0 on cols)
    containing some box's midpoint;
  * maximal cliques of each adjacency graph ARE the rows/cols
    (``adj_to_cell:93-144``); cliques are ranked by the truncated
    mean coordinate of their exclusive members (all members when none
    is exclusive), and a cell's span = min..max clique rank;
  * empty-cell fill (``post_processing:478-489``): scan the occupancy
    grid row-major, append a 1x1 cell per uncovered slot;
  * OCR assignment (``ocr_result_matching:350-396``): det→cell on
    max-IoU ≥ 0.75, insertion-sorted by top-y, joined with a space
    unless the next text starts '%' or the previous ends '-'.

Everything here is re-derived from those published semantics (the
clique step uses Bron–Kerbosch with pivoting instead of networkx);
serialization goes through the repo's own ``cells_to_html``.
Coordinates are image space (y down), like core.ocrmatch.
"""

from __future__ import annotations

from .lattice import LogicalCell


def rect_max_iou(a, b) -> float:
    """Intersection over the SMALLER box's area (``rect_max_iou``,
    addone=0)."""
    xs, ys = max(a[0], b[0]), max(a[1], b[1])
    xe, ye = min(a[2], b[2]), min(a[3], b[3])
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    inter = max(xe - xs, 0.0) * max(ye - ys, 0.0)
    denom = min(area_a, area_b)
    return inter / denom if denom > 0 else 0.0


def nms_inter(class_boxes, iou_thres: float = 0.3):
    """Cross-class NMS over [[x0,y0,x1,y1,score], …] per class.
    Returns (kept boxes as [x0,y0,x1,y1], kept class labels). Order of
    survivors follows the concatenated input (mark array), score order
    is descending with LATER input index first on ties — the exact
    ``argsort()[::-1]`` behaviour."""
    boxes, labels = [], []
    for cls, bs in enumerate(class_boxes):
        for b in bs:
            boxes.append(list(b))
            labels.append(cls)
    n = len(boxes)
    order = sorted(range(n), key=lambda i: (boxes[i][4], i),
                   reverse=True)
    mark = [True] * n
    for pos, cur in enumerate(order):
        if not mark[cur]:
            continue
        for ind in order[pos + 1:]:
            if mark[ind] and rect_max_iou(boxes[cur], boxes[ind]) \
                    >= iou_thres:
                mark[ind] = False
    kept = [boxes[i][:4] for i in range(n) if mark[i]]
    kept_labels = [labels[i] for i in range(n) if mark[i]]
    return kept, kept_labels


def bbox2adj(boxes):
    """Row and column adjacency matrices (sets of neighbour indices,
    self included — ``bbox2adj``)."""
    n = len(boxes)
    xm = [(b[0] + b[2]) / 2.0 for b in boxes]
    ym = [(b[1] + b[3]) / 2.0 for b in boxes]
    adjr = [set() for _ in range(n)]
    adjc = [set() for _ in range(n)]
    for i, box in enumerate(boxes):
        for j, b2 in enumerate(boxes):
            if b2[1] < ym[i] < b2[3]:
                adjr[j].add(i); adjr[i].add(j)
            if b2[0] < xm[i] < b2[2]:
                adjc[j].add(i); adjc[i].add(j)
        for j, b2 in enumerate(boxes):
            # special row relationship: y-overlap (+4 slack) holding
            # some box's midpoint
            if not (b2[1] + 4 >= box[3] or box[1] + 4 >= b2[3]):
                lo, hi = max(box[1], b2[1]), min(box[3], b2[3])
                if any(lo < y < hi for y in ym):
                    adjr[j].add(i); adjr[i].add(j)
            # special column relationship (slack 0)
            if not (b2[0] >= box[2] or box[0] >= b2[2]):
                lo, hi = max(box[0], b2[0]), min(box[2], b2[2])
                if any(lo < x < hi for x in xm):
                    adjc[j].add(i); adjc[i].add(j)
    return adjr, adjc


def _max_cliques(adj) -> list[list[int]]:
    """Maximal cliques via Bron–Kerbosch with pivoting (self-loops
    ignored, like networkx ``find_cliques``)."""
    n = len(adj)
    nbr = [set(a) - {i} for i, a in enumerate(adj)]
    out: list[list[int]] = []

    def bk(r: list[int], p: set, x: set):
        if not p and not x:
            out.append(list(r))
            return
        pivot = max(p | x, key=lambda u: len(nbr[u] & p))
        for v in list(p - nbr[pivot]):
            bk(r + [v], p & nbr[v], x & nbr[v])
            p.discard(v)
            x.add(v)

    bk([], set(range(n)), set())
    return out


def adj_to_cell(adj, boxes, mod: str) -> list[list[int]]:
    """Clique ranks per node (``adj_to_cell``): cliques ordered by the
    TRUNCATED mean of (lo+hi) coordinates over their exclusive members
    (whole clique when every member is shared); each node's list is
    the sorted ranks of the cliques containing it."""
    assert mod in ("row", "col")
    cliques = _max_cliques(adj)
    times = [0] * len(adj)
    for cl in cliques:
        for node in cl:
            times[node] += 1
    coord = []
    for ind, cl in enumerate(cliques):
        nospan = [u for u in cl if times[u] == 1]
        sel = nospan if nospan else cl
        if mod == "row":
            mean = sum(boxes[u][1] + boxes[u][3] for u in sel) / len(sel)
        else:
            mean = sum(boxes[u][0] + boxes[u][2] for u in sel) / len(sel)
        coord.append((ind, int(mean)))
    coord.sort(key=lambda c: c[1])  # stable: enumeration order on ties
    listcell: list[list[int]] = [[] for _ in range(len(adj))]
    for rank, (ind, _mean) in enumerate(coord):
        for node in cliques[ind]:
            listcell[node].append(rank)
    return listcell


def cells_from_lgpma(class_boxes, nms_threshold: float = 0.3):
    """Full reduction: per-class scored aligned boxes → (cells, boxes)
    where cells = [srow, scol, erow, ecol] per kept box plus the
    appended empty 1x1 cells (row-major scan), and boxes aligns with
    the non-empty prefix."""
    boxes, _labels = nms_inter(class_boxes, nms_threshold)
    if not boxes:
        return [], []
    boxes = [[round(v) for v in b] for b in boxes]
    adjr, adjc = bbox2adj(boxes)
    colspan = adj_to_cell(adjc, boxes, "col")
    rowspan = adj_to_cell(adjr, boxes, "row")
    cells = [[min(r), min(c), max(r), max(c)]
             for r, c in zip(rowspan, colspan)]
    n_rows = max(c[2] for c in cells) + 1
    n_cols = max(c[3] for c in cells) + 1
    covered = [[False] * n_cols for _ in range(n_rows)]
    for srow, scol, erow, ecol in cells:
        for r in range(srow, erow + 1):
            for c in range(scol, ecol + 1):
                covered[r][c] = True
    for r in range(n_rows):
        for c in range(n_cols):
            if not covered[r][c]:
                cells.append([r, c, r, c])
    return cells, boxes


def match_ocr_texts(cell_boxes, det_cells,
                    iou_thres: float = 0.75):
    """``ocr_result_matching``: per aligned cell box, collect dets at
    max-IoU ≥ threshold insertion-sorted by top-y; join with ' '
    except before a '%' text or after a '-'. Returns (texts per cell,
    used det indices)."""
    texts, used = [], set()
    for box in cell_boxes:
        matched: list[tuple[float, int]] = []
        for j, d in enumerate(det_cells):
            db = (d["x0"], d["y0"], d["x1"], d["y1"])
            if rect_max_iou(box, db) >= iou_thres:
                pos = len(matched)
                for k, (y, _i) in enumerate(matched):
                    if db[1] < y:
                        pos = k
                        break
                matched.insert(pos, (db[1], j))
                used.add(j)
        parts = [det_cells[i]["text"] for _y, i in matched
                 if det_cells[i]["text"]]
        if not parts:
            texts.append("")
            continue
        merge = parts[0]
        for txt in parts[1:]:
            if txt[0] != "%" and merge[-1] != "-":
                merge += " "
            merge += txt
        texts.append(merge)
    return texts, used


def extract_lgpma_table(table: dict, det_cells: list[dict]):
    """One LGPMA-contract table end-to-end: NMS → adjacency → cliques
    → grid (+ empty fill) → OCR match → HTML. Returns (html,
    used_ids) like the sibling routes; None when no boxes survive."""
    from .html import cells_to_html

    cells, boxes = cells_from_lgpma(table["lgpma"])
    if not cells:
        return None, set()
    texts, used = match_ocr_texts(boxes, det_cells)
    logical = []
    for idx, (srow, scol, erow, ecol) in enumerate(cells):
        if idx < len(boxes):
            x0, y0, x1, y1 = boxes[idx]
            text = texts[idx]
        else:
            x0 = y0 = x1 = y1 = 0.0
            text = ""
        logical.append(LogicalCell(
            row=srow, col=scol,
            row_span=erow - srow + 1, col_span=ecol - scol + 1,
            x0=x0, y0=y0, x1=x1, y1=y1,
            texts=[text] if text else []))
    logical.sort(key=lambda c: (c.row, c.col))
    xs0 = min((c.x0 for c in logical if c.x1 > c.x0), default=0.0)
    xs1 = max((c.x1 for c in logical if c.x1 > c.x0), default=0.0)
    html = cells_to_html(
        logical, table_width=(xs1 - xs0) if xs1 > xs0 else None)
    return html, used
