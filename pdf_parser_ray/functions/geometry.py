"""Axis-aligned box math over plain ``(x0, y0, x1, y1)`` float tuples.

Semantics match the reference's BoundingBox value object
(/root/reference/src/pdf_parser/output/models.py:39-136): coordinates are
validated (``x0 <= x1`` and ``y0 <= y1`` -> ValueError otherwise) and at
runtime follow the PyMuPDF top-left-origin convention (SURVEY.md quirk Q1:
the reference docstring claims bottom-left but all live data is top-left).

We keep boxes as bare tuples instead of objects: the kernels operate on
thousands of boxes per Arrow batch and tuples are both cheaper and
trivially serialisable into ``fixed_size_list<double, 4>`` columns.
"""

from __future__ import annotations

Box = tuple[float, float, float, float]


def box(x0: float, y0: float, x1: float, y1: float) -> Box:
    """Validated box constructor. Raises ValueError exactly like the
    reference's BoundingBox.__post_init__ (models.py:59-64)."""
    fx0, fy0, fx1, fy1 = float(x0), float(y0), float(x1), float(y1)
    if fx0 > fx1:
        raise ValueError(f"x0 ({fx0}) must be <= x1 ({fx1})")
    if fy0 > fy1:
        raise ValueError(f"y0 ({fy0}) must be <= y1 ({fy1})")
    return (fx0, fy0, fx1, fy1)


def width(b: Box) -> float:
    return b[2] - b[0]


def height(b: Box) -> float:
    return b[3] - b[1]


def center_x(b: Box) -> float:
    return (b[0] + b[2]) / 2


def center_y(b: Box) -> float:
    return (b[1] + b[3]) / 2


def intersects(a: Box, b: Box) -> bool:
    """Closed-interval overlap test (models.py:86-93: touching edges count)."""
    return not (a[2] < b[0] or a[0] > b[2] or a[3] < b[1] or a[1] > b[3])


def union(boxes) -> Box:
    """Smallest box covering all inputs (min/max per edge)."""
    xs0 = [b[0] for b in boxes]
    ys0 = [b[1] for b in boxes]
    xs1 = [b[2] for b in boxes]
    ys1 = [b[3] for b in boxes]
    return (min(xs0), min(ys0), max(xs1), max(ys1))


def h_overlap_frac(a: Box, b: Box) -> float:
    """Horizontal overlap as a fraction of the narrower box
    (models.py:117-136). 0.0 when disjoint or degenerate."""
    left = max(a[0], b[0])
    right = min(a[2], b[2])
    if left >= right:
        return 0.0
    narrower = min(a[2] - a[0], b[2] - b[0])
    if narrower == 0:
        return 0.0
    return (right - left) / narrower


def v_aligned(a: Box, b: Box) -> bool:
    """True when two boxes overlap vertically "enough" to sit on one visual
    row: shared span exceeds 20% of the shorter height, or the vertical
    centers are within 5 pt (page.py:213-235)."""
    overlap = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    shorter = min(a[3] - a[1], b[3] - b[1])
    if shorter <= 0:
        return False
    if overlap > shorter * 0.2:
        return True
    return abs((a[1] + a[3]) / 2 - (b[1] + b[3]) / 2) < 5
