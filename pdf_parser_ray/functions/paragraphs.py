"""Paragraph construction: raw blocks -> typed text blocks.

Reference semantics: /root/reference/src/pdf_parser/layout/paragraphs.py
(SURVEY.md §2.4 L10-L17).  Notable replicated quirks:

* Q3 — the cross-block merge test computes ``prev.y0 - curr.y1`` on
  top-left-origin data sorted ascending by y0, which is negative for
  non-overlapping neighbours, so distinct raw blocks essentially never
  merge.  Replicated verbatim: it is part of the byte-identical contract.
* Q9 — the "variance" used by alignment detection is actually a standard
  deviation.

A produced text block is a dict:
    {"text", "box", "type", "spans", "alignment", "indentation",
     "line_spacing", "column_index"}
with ``type`` in {"PARAGRAPH", "HEADING", "LIST_ITEM", "UNKNOWN"} and
``alignment`` in {"LEFT", "RIGHT", "JUSTIFY"}.
"""

from __future__ import annotations

import re

from pdf_parser_ray.functions import geometry as g
from pdf_parser_ray.functions.pagedict import SP_BOLD, SP_SIZE, block_text

# Leading bullet / enumerator marker (paragraphs.py:319).
_LIST_MARK = re.compile(r"^[\•\-\*\d]+[\.\)]\s")

PARAGRAPH = "PARAGRAPH"
HEADING = "HEADING"
LIST_ITEM = "LIST_ITEM"
UNKNOWN = "UNKNOWN"

LEFT = "LEFT"
RIGHT = "RIGHT"
JUSTIFY = "JUSTIFY"


def build_paragraphs(blocks: list[dict], column_index: int = 0) -> list[dict]:
    """Group y-sorted raw blocks into paragraphs and emit text blocks
    (paragraphs.py:56-109)."""
    if not blocks:
        return []
    ordered = sorted(blocks, key=lambda b: b["box"][1])

    groups: list[list[dict]] = []
    run: list[dict] = []
    for b in ordered:
        if run and not _continues(run[-1], b):
            groups.append(run)
            run = []
        run.append(b)
    if run:
        groups.append(run)

    out = []
    for grp in groups:
        tb = _emit(grp, column_index)
        if tb is not None:
            out.append(tb)
    return out


def _continues(prev: dict, curr: dict) -> bool:
    """Conservative same-paragraph test (paragraphs.py:111-161): >=80%
    horizontal overlap, width ratio >=0.7, vertical gap in [0, 1.2 x font],
    indent delta < 1.5 x font. Kept verbatim including the sign quirk Q3."""
    if g.h_overlap_frac(prev["box"], curr["box"]) < 0.8:
        return False
    pw, cw = g.width(prev["box"]), g.width(curr["box"])
    if pw > 0 and cw > 0 and min(pw, cw) / max(pw, cw) < 0.7:
        return False
    font = mean_span_size(prev)
    gap = prev["box"][1] - curr["box"][3]
    if gap > font * 1.2 or gap < 0:
        return False
    if abs(prev["box"][0] - curr["box"][0]) > font * 1.5:
        return False
    return True


def mean_span_size(block: dict) -> float:
    """Mean positive span font size, defaulting to 12.0
    (paragraphs.py:163-173)."""
    sizes = [s[SP_SIZE] for s in block["spans"] if s[SP_SIZE] > 0]
    if not sizes:
        return 12.0
    return sum(sizes) / len(sizes)


def _emit(group: list[dict], column_index: int) -> dict | None:
    """One paragraph group -> text block dict (paragraphs.py:175-231).
    ``block_text`` is computed once per member and shared by the stitch
    and classify passes (the reference recomputes it; same bytes)."""
    spans = [s for b in group for s in b["spans"]]
    if not spans:
        return None
    member_texts = [block_text(b) for b in group]
    bb = g.union([b["box"] for b in group])
    text = _stitch(member_texts)
    if not text.strip():
        return None
    indent = group[0]["box"][0] - bb[0] if len(group) > 1 else 0
    return {
        "text": text,
        "box": bb,
        "type": _classify(member_texts, spans),
        "spans": spans,
        "alignment": _alignment(group, bb),
        "indentation": max(0, indent),
        "line_spacing": _line_spacing(group),
        "column_index": column_index,
    }


def _stitch(member_texts: list[str]) -> str:
    """Join member texts; a trailing hyphen glues without a space
    (paragraphs.py:245-283). Single-member groups keep their internal
    newlines from block_text."""
    texts = [t for t in (mt.strip() for mt in member_texts) if t]
    if not texts:
        return ""
    parts = [texts[0]]
    for t in texts[1:]:
        if parts[-1].endswith("-"):
            parts[-1] = parts[-1][:-1]
            parts.append(t)
        else:
            parts.append(" " + t)
    return "".join(parts)


def _classify(member_texts: list[str], spans: list[dict]) -> str:
    """HEADING / LIST_ITEM / PARAGRAPH heuristics (paragraphs.py:285-323)."""
    if not spans:
        return UNKNOWN
    avg_size = sum(s[SP_SIZE] for s in spans) / len(spans)
    any_bold = any(s[SP_BOLD] for s in spans)
    full = " ".join(member_texts).strip()
    if len(full) < 100 and (
        any_bold or avg_size >= 14 or (full.isupper() and len(full) > 3)
    ):
        return HEADING
    if _LIST_MARK.match(full):
        return LIST_ITEM
    return PARAGRAPH


def _alignment(group: list[dict], container: g.Box) -> str:
    """Margin-spread alignment test; the spread measure is a standard
    deviation despite the reference naming (Q9; paragraphs.py:325-372)."""
    if len(group) < 2:
        return LEFT
    lefts = [b["box"][0] - container[0] for b in group]
    rights = [container[2] - b["box"][2] for b in group]
    tight_left = _spread(lefts) < 5.0
    tight_right = _spread(rights) < 5.0
    if tight_left and tight_right:
        return JUSTIFY
    if tight_right:
        return RIGHT
    return LEFT


def _spread(values: list[float]) -> float:
    if len(values) < 2:
        return 0.0
    mean = sum(values) / len(values)
    return (sum((v - mean) ** 2 for v in values) / len(values)) ** 0.5


def _line_spacing(group: list[dict]) -> float:
    """Mean positive inter-member gap over members sorted by descending y1
    (paragraphs.py:374-398)."""
    if len(group) < 2:
        return 0.0
    ordered = sorted(group, key=lambda b: -b["box"][3])
    gaps = []
    for a, b in zip(ordered, ordered[1:]):
        gap = a["box"][1] - b["box"][3]
        if gap > 0:
            gaps.append(gap)
    if not gaps:
        return 0.0
    return sum(gaps) / len(gaps)
