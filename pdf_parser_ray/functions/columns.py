"""Column detection over raw blocks (reference semantics:
/root/reference/src/pdf_parser/layout/columns.py:60-286, SURVEY.md §2.4
L6-L9).  A detected column is ``{"box", "index", "blocks"}``; a page with
one (or zero) columns yields ``[]``.
"""

from __future__ import annotations

from pdf_parser_ray.functions import geometry as g

# Default minimum horizontal gap (pt) separating columns (analyzer.py:49).
DEFAULT_GAP_PT = 20.0
# Assumed page margin when synthesising two-column bboxes (columns.py:119).
# Int on purpose: the reference uses a bare ``50`` literal and the value
# surfaces verbatim in JSON output.
SIDE_MARGIN_PT = 50
# Center-straddle tolerance for title detection (columns.py:130).
STRADDLE_PT = 30.0
# Minimum clear gap between the two column masses (columns.py:150).
MIN_TWO_COL_GAP_PT = 10.0


def detect_columns(blocks: list[dict], page_width: float,
                   gap_threshold: float = DEFAULT_GAP_PT) -> list[dict]:
    """Try the center-split two-column test first, then the horizontal-gap
    projection; single-column pages return [] (columns.py:60-99)."""
    if not blocks:
        return []
    pair = _center_split(blocks, page_width, gap_threshold)
    if pair is not None:
        return pair
    gaps = _projection_gaps(blocks, gap_threshold)
    if not gaps:
        return []
    cols = _columns_between_gaps(gaps, blocks, page_width)
    if len(cols) <= 1:
        return []
    return cols


def _center_split(blocks: list[dict], page_width: float,
                  gap_threshold: float) -> list[dict] | None:
    """Two-column detection around the page center (columns.py:101-191).
    Gates: >=4 blocks, >=2 per side, >=10 pt clear gap between the sides.
    Center-straddling blocks (titles) are prepended to the LEFT column
    (quirk Q8)."""
    if len(blocks) < 4:
        return None
    mid = page_width / 2

    left: list[dict] = []
    right: list[dict] = []
    straddle: list[dict] = []
    for b in blocks:
        x0, _, x1, _ = b["box"]
        if x0 < mid - STRADDLE_PT and x1 > mid + STRADDLE_PT:
            straddle.append(b)
        elif g.center_x(b["box"]) < mid:
            left.append(b)
        else:
            right.append(b)

    if len(left) < 2 or len(right) < 2:
        return None
    if min(b["box"][0] for b in right) - max(b["box"][2] for b in left) < MIN_TWO_COL_GAP_PT:
        return None

    def column(side_blocks: list[dict], x_lo: float, x_hi: float, idx: int) -> dict:
        ys = [b["box"][1] for b in side_blocks] + [b["box"][3] for b in side_blocks]
        return {"box": (x_lo, min(ys), x_hi, max(ys)), "index": idx, "blocks": side_blocks}

    cols = [
        column(left, SIDE_MARGIN_PT, mid - gap_threshold / 2, 0),
        column(right, mid + gap_threshold / 2, page_width - SIDE_MARGIN_PT, 1),
    ]
    if straddle:
        cols[0]["blocks"] = straddle + cols[0]["blocks"]
    return cols


def _projection_gaps(blocks: list[dict], gap_threshold: float) -> list[tuple[float, float]]:
    """Project block x-intervals, merge with ``gap_threshold`` slack, report
    gaps at least ``gap_threshold`` wide (columns.py:193-234)."""
    spans = sorted((b["box"][0], b["box"][2]) for b in blocks)
    merged: list[list[float]] = []
    for lo, hi in spans:
        if merged and lo <= merged[-1][1] + gap_threshold:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [
        (merged[i][1], merged[i + 1][0])
        for i in range(len(merged) - 1)
        if merged[i + 1][0] - merged[i][1] >= gap_threshold
    ]


def _columns_between_gaps(gaps: list[tuple[float, float]], blocks: list[dict],
                          page_width: float) -> list[dict]:
    """Column strips between gaps; blocks assigned by center-x; empty strips
    are dropped and surviving strips keep their positional index order
    (columns.py:236-286)."""
    edges = [(0, gaps[0][0])]  # bare 0 like the reference (columns.py:252)
    edges += [(gaps[i][1], gaps[i + 1][0]) for i in range(len(gaps) - 1)]
    edges.append((gaps[-1][1], page_width))

    cols = []
    for idx, (lo, hi) in enumerate(edges):
        mine = [b for b in blocks if lo <= g.center_x(b["box"]) <= hi]
        if not mine:
            continue
        ys = [y for b in mine for y in (b["box"][1], b["box"][3])]
        cols.append({"box": (lo, min(ys), hi, max(ys)), "index": idx, "blocks": mine})
    return cols
