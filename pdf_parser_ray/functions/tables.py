"""Table materialisation and rendering.

In this engine tables arrive as fixture payloads
``{"bbox_topleft": [x0, top, x1, bottom], "data": [[cell, ...], ...]}``
(the sandbox has no pdfplumber; see FIXTURES.md).  Conversion reproduces the
reference's pure pdfplumber-conversion path byte-for-byte:
/root/reference/src/pdf_parser/tables/detector.py:183-379 — including quirk
Q5, the y-flip to a bottom-left convention that deliberately disagrees with
the top-left text-block coordinates — and the ASCII / markdown rendering of
tables/ascii_converter.py:72-375 (quirk Q11: long words wrap as
``word[:w-1] + "-"``; markdown cells are padded then truncated).

A table dict:
    {"cells": [...], "box", "num_rows", "num_cols", "has_header", "ascii"}
A cell dict:
    {"text", "box", "row", "col", "is_header"}
"""

from __future__ import annotations

import re
from dataclasses import dataclass

MIN_ROWS = 2
MIN_COLS = 2
MIN_CELL_W_PT = 10.0
MIN_CELL_H_PT = 5.0

CELL_W_MIN = 3
CELL_W_MAX = 40
PAD = 1


@dataclass
class ASCIITableStyle:
    """User-facing style plug-point for ASCII/markdown table rendering
    (reference analog: tables/ascii_converter.py:20-40). The defaults ARE
    the byte contract — every pipeline-rendered table uses them; a custom
    style is an explicit caller choice via ``render_ascii(t, style=...)``
    or ``extract_document``-level wiring."""

    horizontal: str = "-"
    vertical: str = "|"
    corner: str = "+"
    header_separator: bool = True
    padding: int = PAD
    max_cell_width: int = CELL_W_MAX
    min_cell_width: int = CELL_W_MIN


_DEFAULT_STYLE = ASCIITableStyle()

_NUMBERISH = re.compile(r"\d+\.?\d*")


def table_from_payload(spec: dict, page_height: float) -> dict | None:
    """Payload -> validated table dict with pre-rendered ASCII, or None.
    Mirrors detector.py:198-241 + 352-379 and the analyzer's ASCII prefill
    (analyzer.py:246-255)."""
    data = spec.get("data")
    if not data or len(data) < MIN_ROWS:
        return None
    x0, top, x1, bottom = spec["bbox_topleft"]
    # Q5: flip to bottom-left-origin y while text blocks stay top-left.
    # No float coercion: the reference passes payload values through as-is
    # and they surface verbatim in JSON output.
    bb = (x0, page_height - bottom, x1, page_height - top)
    if x0 > x1 or bb[1] > bb[3]:
        return None  # BoundingBox validation error -> per-table catch
    cells = _grid_cells(data, bb)
    if not cells:
        return None
    num_rows = len(data)
    num_cols = max(len(r) for r in data)
    if num_cols < MIN_COLS:
        return None
    table = {
        "cells": cells,
        "box": bb,
        "num_rows": num_rows,
        "num_cols": num_cols,
        "has_header": _looks_like_header(data),
        "ascii": "",
    }
    if not _plausible(table):
        return None
    table["ascii"] = render_ascii(table)
    return table


def _grid_cells(data: list[list], bb) -> list[dict]:
    """Uniform-grid cell synthesis (detector.py:243-296): cell extents are
    table extent divided evenly; row 0 is flagged as header; None -> ""."""
    if not data:
        return []
    num_rows = len(data)
    num_cols = max(len(r) for r in data)
    if num_rows == 0 or num_cols == 0:
        return []
    cw = (bb[2] - bb[0]) / num_cols
    ch = (bb[3] - bb[1]) / num_rows
    cells = []
    for r, row in enumerate(data):
        for c, value in enumerate(row):
            if value is None:
                value = ""
            left = bb[0] + (c * cw)
            top_y = bb[3] - (r * ch)
            cells.append({
                "text": str(value).strip(),
                "box": (left, top_y - ch, left + cw, top_y),
                "row": r,
                "col": c,
                "is_header": r == 0,
            })
    return cells


def _looks_like_header(data: list[list]) -> bool:
    """First-row header heuristics (detector.py:298-350): all-caps, or
    0.7x-shorter average length, or numbers only below the first row."""
    if len(data) < 2:
        return False
    head = data[0]
    if not head:
        return False
    joined = " ".join(str(c or "") for c in head)
    if joined.isupper() and len(joined) > 3:
        return True
    head_avg = sum(len(str(c or "")) for c in head) / len(head)
    body_avgs = [
        sum(len(str(c or "")) for c in row) / len(row)
        for row in data[1:]
        if row
    ]
    if body_avgs and head_avg < (sum(body_avgs) / len(body_avgs)) * 0.7:
        return True
    head_numbers = any(_NUMBERISH.search(str(c or "")) for c in head if c)
    body_numbers = any(
        any(_NUMBERISH.search(str(c or "")) for c in row if c) for row in data[1:]
    )
    return not head_numbers and body_numbers


def _plausible(table: dict) -> bool:
    """Reject degenerate detections (detector.py:352-379): too few
    rows/cols, too small, or <30% populated cells."""
    if table["num_rows"] < MIN_ROWS or table["num_cols"] < MIN_COLS:
        return False
    bb = table["box"]
    if bb[2] - bb[0] < MIN_CELL_W_PT * 2:
        return False
    if bb[3] - bb[1] < MIN_CELL_H_PT * 2:
        return False
    cells = table["cells"]
    if cells:
        filled = sum(1 for c in cells if c["text"].strip())
        if filled / len(cells) < 0.3:
            return False
    return True


# ---------------------------------------------------------------------------
# Rendering (ascii_converter.py)
# ---------------------------------------------------------------------------


def _text_grid(table: dict) -> list[list[str]]:
    """num_rows x num_cols grid of cell texts; absent cells are ""."""
    grid = [[""] * table["num_cols"] for _ in range(table["num_rows"])]
    for cell in table["cells"]:
        if cell["row"] < table["num_rows"] and cell["col"] < table["num_cols"]:
            grid[cell["row"]][cell["col"]] = cell["text"]
    return grid


def _column_widths(grid: list[list[str]], num_cols: int,
                   style: ASCIITableStyle = _DEFAULT_STYLE) -> list[int]:
    """Per-column width: longest content line, clamped to
    [min_cell_width, max_cell_width] (ascii_converter.py:121-152)."""
    widths = []
    for c in range(num_cols):
        w = style.min_cell_width
        for row in grid:
            if c < len(row):
                for line in row[c].split("\n"):
                    w = max(w, len(line))
        widths.append(min(w, style.max_cell_width))
    return widths


def _rule(widths: list[int],
          style: ASCIITableStyle = _DEFAULT_STYLE) -> str:
    """``+---+---+`` separator (ascii_converter.py:188-202)."""
    return (style.corner
            + style.corner.join(
                style.horizontal * (w + 2 * style.padding) for w in widths)
            + style.corner)


def _wrap_one(chunk: str, w: int) -> list[str]:
    """Word-wrap one newline-free chunk; words longer than the column split
    as ``word[:w-1] + "-"`` (Q11; ascii_converter.py:277-316)."""
    if len(chunk) <= w:
        return [chunk]
    out: list[str] = []
    line: list[str] = []
    used = 0
    for word in chunk.split():
        if used + len(word) + len(line) <= w:
            line.append(word)
            used += len(word)
        else:
            if line:
                out.append(" ".join(line))
            if len(word) > w:
                while len(word) > w:
                    out.append(word[: w - 1] + "-")
                    word = word[w - 1:]
                line = [word] if word else []
                used = len(word)
            else:
                line = [word]
                used = len(word)
    if line:
        out.append(" ".join(line))
    return out if out else [""]


def _wrap_cell(text: str, w: int) -> list[str]:
    """Width-constrained wrap preserving explicit newlines
    (ascii_converter.py:255-275)."""
    if not text:
        return [""]
    out: list[str] = []
    for chunk in text.split("\n"):
        out.extend(_wrap_one(chunk, w))
    return out if out else [""]


def render_ascii(table: dict,
                 style: ASCIITableStyle = _DEFAULT_STYLE) -> str:
    """Bordered ASCII rendering (ascii_converter.py:72-253): top rule, rows
    (multi-line when wrapped), a rule after the header row (when
    ``style.header_separator``), bottom rule. The default style is the
    byte contract; pass a custom ``ASCIITableStyle`` to restyle."""
    if not table["cells"] or table["num_rows"] == 0 or table["num_cols"] == 0:
        return ""
    grid = _text_grid(table)
    widths = _column_widths(grid, table["num_cols"], style)
    pad = " " * style.padding

    lines = [_rule(widths, style)]
    for r, row in enumerate(grid):
        wrapped = [_wrap_cell(row[c] if c < len(row) else "", widths[c])
                   for c in range(len(widths))]
        depth = max(len(w) for w in wrapped) if wrapped else 1
        for level in range(depth):
            cells = []
            for c, w in enumerate(widths):
                chunk = wrapped[c][level] if level < len(wrapped[c]) else ""
                cells.append(f"{pad}{chunk.ljust(w)}{pad}")
            lines.append(style.vertical + style.vertical.join(cells)
                         + style.vertical)
        if table["has_header"] and r == 0 and style.header_separator:
            lines.append(_rule(widths, style))
    lines.append(_rule(widths, style))
    return "\n".join(lines)


def render_markdown(table: dict,
                    style: ASCIITableStyle = _DEFAULT_STYLE) -> str:
    """``| a | b |`` markdown rendering with a dash rule after row 0; cells
    padded then TRUNCATED to the column width, newlines become spaces
    (ascii_converter.py:333-375). Markdown syntax is fixed (``|`` and
    ``-`` are the markdown table grammar — the reference's converter
    likewise hardcodes them); the style contributes the width clamps."""
    if not table["cells"] or table["num_rows"] == 0 or table["num_cols"] == 0:
        return ""
    grid = _text_grid(table)
    widths = _column_widths(grid, table["num_cols"], style)
    lines = []
    for r, row in enumerate(grid):
        cells = [
            (row[c] if c < len(row) else "").replace("\n", " ").ljust(widths[c])[: widths[c]]
            for c in range(len(widths))
        ]
        lines.append("| " + " | ".join(cells) + " |")
        if r == 0:
            lines.append("| " + " | ".join("-" * w for w in widths) + " |")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Cell lookup helpers (reference analog: output/models.py:263-320)
# ---------------------------------------------------------------------------


def cell_at(table: dict, row: int, col: int) -> dict | None:
    """Cell covering (row, col), honouring row/col spans when present."""
    for cell in table["cells"]:
        if cell["row"] == row and cell["col"] == col:
            return cell
        rs = cell.get("rowspan", 1)
        cs = cell.get("colspan", 1)
        if (cell["row"] <= row < cell["row"] + rs
                and cell["col"] <= col < cell["col"] + cs):
            return cell
    return None


def row_cells(table: dict, row: int) -> list[dict]:
    """All cells intersecting ``row``, sorted by column."""
    hits = [c for c in table["cells"]
            if c["row"] <= row < c["row"] + c.get("rowspan", 1)]
    return sorted(hits, key=lambda c: c["col"])


def column_cells(table: dict, col: int) -> list[dict]:
    """All cells intersecting ``col``, sorted by row."""
    hits = [c for c in table["cells"]
            if c["col"] <= col < c["col"] + c.get("colspan", 1)]
    return sorted(hits, key=lambda c: c["row"])


def iter_rows(table: dict):
    """Yield each row's cells in order."""
    for row in range(table["num_rows"]):
        yield row_cells(table, row)
