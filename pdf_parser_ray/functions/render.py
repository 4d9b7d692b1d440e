"""Document renderers: plain text, markdown, JSON.

Byte-identical to the reference's OutputFormatter
(/root/reference/src/pdf_parser/output/formatter.py:60-364; SURVEY.md §2.2,
quirks Q2/Q5/Q7/Q10).  Renderers are written per page so the Ray pipeline
can format exploded giant documents page-by-page and reassemble with a
simple join: for every page the emitted chunk is exactly the slice of the
whole-document line list belonging to that page.

The documented contract (the driver's byte-identical check) is the plain
renderer; markdown/JSON ride along for API completeness.
"""

from __future__ import annotations

import json

from pdf_parser_ray.functions import tables as tabmod
from pdf_parser_ray.functions.pagedict import SP_SIZE
from pdf_parser_ray.functions.paragraphs import HEADING, LIST_ITEM


def plain_page_lines(page: dict) -> list[str]:
    """Plain-text lines for one page (formatter.py:84-127): banner, optional
    [Header: ...], content sorted by (column, y1) ascending, blank-line
    separated, optional [Footer: ...]. Headings render upper-cased between
    newlines; list items get a two-space indent (Q7)."""
    lines = ["", "=" * 80, f"{'PAGE ' + str(page['page_number']):^80}", "=" * 80, ""]
    if page["header"]:
        lines.append(f"[Header: {page['header']}]")
        lines.append("")
    for content in _ordered_content(page, _plain_block):
        lines.append(content)
        lines.append("")
    if page["footer"]:
        lines.append("")
        lines.append(f"[Footer: {page['footer']}]")
    return lines


def _ordered_content(page: dict, block_fn) -> list[str]:
    """(column, y1)-ascending content strings: text blocks rendered by
    ``block_fn`` plus table renderings in column 0 (formatter.py:129-156;
    Q5: table y1 lives in the flipped bottom-left convention)."""
    items: list[tuple[int, float, str]] = []
    for b in page["blocks"]:
        content = block_fn(b)
        if content.strip():
            items.append((b["column_index"], b["box"][3], content))
    for t in page["tables"]:
        if block_fn is _plain_block:
            # plain: only non-empty pre-rendered ASCII (formatter.py:148-150)
            if t["ascii"]:
                items.append((0, t["box"][3], t["ascii"]))
        else:
            # markdown: rendered at format time, appended unconditionally
            # (formatter.py:221-223)
            items.append((0, t["box"][3], tabmod.render_markdown(t)))
    items.sort(key=lambda it: (it[0], it[1]))
    return [it[2] for it in items]


def _plain_block(b: dict) -> str:
    text = b["text"].strip()
    if b["type"] == HEADING:
        return f"\n{text.upper()}\n"
    if b["type"] == LIST_ITEM:
        return f"  {text}"
    return text


def render_plain(pages: list[dict]) -> str:
    return "\n".join(ln for page in pages for ln in plain_page_lines(page))


# ---------------------------------------------------------------------------
# Markdown (formatter.py:170-248)
# ---------------------------------------------------------------------------


def markdown_meta_lines(metadata: dict) -> list[str]:
    lines: list[str] = []
    if metadata:
        if "title" in metadata:
            lines.append(f"# {metadata['title']}")
            lines.append("")
        if "author" in metadata:
            lines.append(f"*Author: {metadata['author']}*")
            lines.append("")
    return lines


def markdown_page_lines(page: dict) -> list[str]:
    lines: list[str] = []
    if page["page_number"] > 1:
        lines.extend(["", "---", "", f"*Page {page['page_number']}*", ""])
    for content in _ordered_content(page, _markdown_block):
        lines.append(content)
        lines.append("")
    return lines


def _markdown_block(b: dict) -> str:
    """Heading level by mean span size (>=18 -> ##, >=14 -> ###, else ####);
    list bullets stripped to ``- `` (formatter.py:227-248)."""
    text = b["text"].strip()
    if b["type"] == HEADING:
        if b["spans"]:
            avg = sum(s[SP_SIZE] for s in b["spans"]) / len(b["spans"])
            if avg >= 18:
                return f"## {text}"
            if avg >= 14:
                return f"### {text}"
            return f"#### {text}"
        return f"### {text}"
    if b["type"] == LIST_ITEM:
        return f"- {text.lstrip('•·-* ')}"
    return text


def render_markdown(pages: list[dict], metadata: dict) -> str:
    lines = markdown_meta_lines(metadata)
    for page in pages:
        lines.extend(markdown_page_lines(page))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# JSON (formatter.py:250-364)
# ---------------------------------------------------------------------------


def _box_dict(bb) -> dict:
    return {
        "x0": bb[0], "y0": bb[1], "x1": bb[2], "y1": bb[3],
        "width": bb[2] - bb[0], "height": bb[3] - bb[1],
    }


def json_document(pages: list[dict], metadata: dict, source: str,
                  include_coordinates: bool = False) -> dict:
    doc = {
        "source_path": source,
        "page_count": len(pages),
        "metadata": metadata,
        "pages": [_json_page(p, include_coordinates) for p in pages],
    }
    return doc


def _json_page(page: dict, coords: bool) -> dict:
    out = {
        "page_number": page["page_number"],
        "width": page["width"],
        "height": page["height"],
        "block_count": len(page["blocks"]),
        "table_count": len(page["tables"]),
        "header": page["header"],
        "footer": page["footer"],
        "blocks": [_json_block(b, coords) for b in page["blocks"]],
        "tables": [_json_table(t, coords) for t in page["tables"]],
    }
    if coords:
        out["columns"] = [
            {"index": c["index"], "bbox": _box_dict(c["box"])} for c in page["columns"]
        ]
    return out


def _json_block(b: dict, coords: bool) -> dict:
    out = {"text": b["text"], "type": b["type"], "column_index": b["column_index"]}
    if coords:
        out["bbox"] = _box_dict(b["box"])
        out["indentation"] = b["indentation"]
        out["line_spacing"] = b["line_spacing"]
    return out


def _json_table(t: dict, coords: bool) -> dict:
    out = {
        "num_rows": t["num_rows"],
        "num_cols": t["num_cols"],
        "has_header": t["has_header"],
        "ascii_representation": t["ascii"],
        "cells": [_json_cell(c, coords) for c in t["cells"]],
    }
    if coords:
        out["bbox"] = _box_dict(t["box"])
    return out


def _json_cell(c: dict, coords: bool) -> dict:
    out = {
        "text": c["text"],
        "row": c["row"],
        "col": c["col"],
        "rowspan": 1,
        "colspan": 1,
        "is_header": c["is_header"],
    }
    if coords:
        out["bbox"] = _box_dict(c["box"])
    return out


def render_json(pages: list[dict], metadata: dict, source: str,
                include_coordinates: bool = False) -> str:
    return json.dumps(
        json_document(pages, metadata, source, include_coordinates),
        indent=2,
        ensure_ascii=False,
    )


# ---------------------------------------------------------------------------
# Model-property text variants (output/models.py:364-385, 418-433)
#
# The reference exposes a SECOND text rendering via StructuredPage.text /
# StructuredDocument.text that differs from the canonical formatter path:
# content sorts by descending y1 only (bottom-up on top-left data — quirk
# Q2, no column grouping), blocks join with blank lines, and the document
# variant uses a slightly different banner discipline. Provided for API
# parity; the formatter path above is the byte-identical contract the
# pipeline emits.
# ---------------------------------------------------------------------------


def page_text_property(page: dict) -> str:
    """StructuredPage.text analog (models.py:364-385)."""
    items: list[tuple[float, str]] = []
    for b in page["blocks"]:
        items.append((b["box"][3], b["text"]))
    for t in page["tables"]:
        items.append((t["box"][3], t["ascii"]))
    items.sort(key=lambda it: -it[0])
    return "\n\n".join(text for _, text in items if text.strip())


def document_text_property(pages: list[dict]) -> str:
    """StructuredDocument.text analog (models.py:418-433)."""
    parts: list[str] = []
    for page in pages:
        parts.append(f"\n{'=' * 80}")
        parts.append(f"{'PAGE ' + str(page['page_number']):^80}")
        parts.append(f"{'=' * 80}\n")
        parts.append(page_text_property(page))
    return "\n".join(parts)
