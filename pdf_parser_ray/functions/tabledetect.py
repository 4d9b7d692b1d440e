"""Native ruled-line table DETECTION for real PDF pages.

The reference delegates table detection to pdfplumber's lines strategy
(/root/reference/src/pdf_parser/tables/detector.py:119-163:
``find_tables({"vertical_strategy": "lines", "horizontal_strategy":
"lines", "snap_tolerance": 3})``) and then converts through its pure
path (detector.py:183-379), which this engine replicates in
``functions.tables.table_from_payload``.  pdfplumber is unavailable in
this sandbox, so this module closes the remaining gap with a
from-scratch ruled-line detector over the page-dict ``drawings``
payload: snap line segments into horizontal/vertical rules (3 pt, the
pdfplumber default), group intersecting rules into grid components,
synthesize the cell matrix, and fill cells from the page's text spans.
The output is the SAME ``{"bbox_topleft", "data"}`` payload shape the
fixture tables use, fed through the SAME ``table_from_payload``
validation/rendering path — detection is the only new code.

Drawings payload shape (mirrors PyMuPDF ``page.get_drawings()`` items,
JSON-serialized; top-left-origin points):

    "drawings": [
        {"type": "line", "p0": [x, y], "p1": [x, y]},
        {"type": "rect", "bbox": [x0, top, x1, bottom]},   # 4 border rules
    ]
"""

from __future__ import annotations

from bisect import bisect_right

SNAP_TOLERANCE_PT = 3.0   # pdfplumber TableSettings.snap_tolerance analog
MIN_RULE_LEN_PT = 4.0     # ignore decorative dashes shorter than this


def _segments(drawings: list) -> tuple[list, list]:
    """drawings -> (horizontal, vertical) segments.

    horizontal: (y, x_lo, x_hi); vertical: (x, y_lo, y_hi).
    Rects contribute their four border rules (pdfplumber's lines
    strategy treats rect edges as lines). Diagonals are ignored —
    the lines strategy only consumes axis-aligned rules.
    """
    hs: list[tuple[float, float, float]] = []
    vs: list[tuple[float, float, float]] = []

    def add_line(x0, y0, x1, y1):
        if abs(y1 - y0) <= SNAP_TOLERANCE_PT:       # horizontal
            lo, hi = sorted((x0, x1))
            if hi - lo >= MIN_RULE_LEN_PT:
                hs.append(((y0 + y1) / 2.0, lo, hi))
        elif abs(x1 - x0) <= SNAP_TOLERANCE_PT:     # vertical
            lo, hi = sorted((y0, y1))
            if hi - lo >= MIN_RULE_LEN_PT:
                vs.append(((x0 + x1) / 2.0, lo, hi))

    for d in drawings or []:
        try:
            kind = d.get("type")
            if kind == "line":
                (x0, y0), (x1, y1) = d["p0"], d["p1"]
                add_line(float(x0), float(y0), float(x1), float(y1))
            elif kind == "rect":
                x0, top, x1, bottom = (float(v) for v in d["bbox"])
                add_line(x0, top, x1, top)
                add_line(x0, bottom, x1, bottom)
                add_line(x0, top, x0, bottom)
                add_line(x1, top, x1, bottom)
        except Exception:
            continue  # one malformed drawing never kills the page
    return hs, vs


def _snap_rules(segs: list[tuple[float, float, float]]
                ) -> list[tuple[float, float, float]]:
    """Cluster segments whose primary coordinate sits within the snap
    tolerance and MERGE their extents (pdfplumber's snap + join): the
    cluster's rule coordinate is the mean, its extent the union of
    member extents (members within one table frame overlap or abut)."""
    if not segs:
        return []
    segs = sorted(segs)
    out: list[tuple[float, float, float]] = []
    cur = [segs[0]]
    for s in segs[1:]:
        if s[0] - cur[-1][0] <= SNAP_TOLERANCE_PT:
            cur.append(s)
        else:
            out.append(_merge_cluster(cur))
            cur = [s]
    out.append(_merge_cluster(cur))
    return out


def _merge_cluster(cluster: list[tuple[float, float, float]]
                   ) -> tuple[float, float, float]:
    coord = sum(c[0] for c in cluster) / len(cluster)
    return (coord, min(c[1] for c in cluster), max(c[2] for c in cluster))


def _crosses(h: tuple[float, float, float],
             v: tuple[float, float, float]) -> bool:
    """Does horizontal rule h intersect vertical rule v (snap-tolerant)?"""
    t = SNAP_TOLERANCE_PT
    y, x_lo, x_hi = h
    x, y_lo, y_hi = v
    return (x_lo - t <= x <= x_hi + t) and (y_lo - t <= y <= y_hi + t)


def _components(hs: list, vs: list) -> list[tuple[list, list]]:
    """Connected components over the rule-intersection graph, each
    returned as (horizontal rules, vertical rules). Union-find over
    n_h + n_v nodes; edge = a crossing. Rule counts per page are tiny
    (a frame is rows+cols+2 rules), so the quadratic crossing scan is
    irrelevant next to span processing."""
    n_h, n_v = len(hs), len(vs)
    parent = list(range(n_h + n_v))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for i, h in enumerate(hs):
        for j, v in enumerate(vs):
            if _crosses(h, v):
                union(i, n_h + j)
    groups: dict[int, tuple[list, list]] = {}
    for i, h in enumerate(hs):
        groups.setdefault(find(i), ([], []))[0].append(h)
    for j, v in enumerate(vs):
        groups.setdefault(find(n_h + j), ([], []))[1].append(v)
    return [g for g in groups.values() if len(g[0]) >= 3 and len(g[1]) >= 3]


def _page_spans(pdict: dict) -> list[tuple[float, float, str]]:
    """(center_x, center_y, text) of every text span on the page."""
    spans = []
    for block in pdict.get("blocks", []):
        if block.get("type", 0) != 0:
            continue
        for line in block.get("lines", []):
            for sp in line.get("spans", []):
                try:
                    x0, y0, x1, y1 = (float(v) for v in sp["bbox"])
                    text = str(sp.get("text", ""))
                except Exception:
                    continue
                if text:
                    spans.append(((x0 + x1) / 2.0, (y0 + y1) / 2.0, text))
    return spans


def detect_ruled_tables(pdict: dict) -> list[dict]:
    """Page dict -> table payload specs ``{"bbox_topleft", "data"}``.

    A grid component's sorted vertical-rule xs and horizontal-rule ys
    define the cell lattice ((len(ys)-1) x (len(xs)-1) cells); cell
    text is the concatenation (reading order: y then x) of the spans
    whose center falls inside the cell. Validation (min rows/cols,
    min size, fill ratio, header heuristics) is NOT re-implemented —
    the specs feed ``tables.table_from_payload`` exactly like fixture
    payload tables, so both arrival paths share one contract."""
    drawings = pdict.get("drawings")
    if not drawings:
        return []
    hs, vs = _segments(drawings)
    hs, vs = _snap_rules(hs), _snap_rules(vs)
    comps = _components(hs, vs)
    if not comps:
        return []
    spans = _page_spans(pdict)
    specs: list[dict] = []
    for comp_h, comp_v in comps:
        ys = sorted(h[0] for h in comp_h)
        xs = sorted(v[0] for v in comp_v)
        n_rows, n_cols = len(ys) - 1, len(xs) - 1
        grid: list[list[list[tuple[float, float, str]]]] = [
            [[] for _ in range(n_cols)] for _ in range(n_rows)]
        for cx, cy, text in spans:
            r = bisect_right(ys, cy) - 1
            c = bisect_right(xs, cx) - 1
            if 0 <= r < n_rows and 0 <= c < n_cols:
                grid[r][c].append((cy, cx, text))
        data = [[" ".join(t for _, _, t in sorted(cell))
                 for cell in row] for row in grid]
        specs.append({
            "bbox_topleft": [xs[0], ys[0], xs[-1], ys[-1]],
            "data": data,
        })
    # deterministic order: top-to-bottom, left-to-right
    specs.sort(key=lambda s: (s["bbox_topleft"][1], s["bbox_topleft"][0]))
    return specs
