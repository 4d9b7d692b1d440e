"""Decode a PyMuPDF-style ``get_text("dict")`` page payload into raw text
blocks, and run the page-level column pre-pass.

This is the parse kernel of the engine (reference semantics:
/root/reference/src/pdf_parser/core/page.py:96-531 and 159-470, see
SURVEY.md §2.3).  Representation is deliberately different from the
reference: spans/lines/blocks are plain dicts so whole batches of pages can
be decoded inside one ``map_batches`` call without object-tree overhead.

    span : {"text", "box", "font", "size", "bold", "italic", "color"}
    line : {"box", "text", "spans"}
    block: {"box", "lines", "spans"}

Error tolerance mirrors the reference precisely: malformed bboxes raising
KeyError/IndexError/ValueError drop the single item; any other exception
(e.g. TypeError from a null bbox) propagates so the per-page fallback
(document.py:276-321, quirk Q12) can take over.

Spans are lean tuples ``(text, box, size, bold)`` (constants SP_*): no
downstream consumer reads font name / italic / colour (the reference never
emits them either — formatter.py outputs no span fields), and span decode
is the single hottest kernel loop.
"""

from __future__ import annotations

from pdf_parser_ray.functions import geometry as g

# Inter-span gap wider than this fraction of the previous span's font size
# inserts a space into the line text (page.py:79,681).
SPACE_RATIO = 0.3
# Adjacent merged-line fragments further apart than this many points get a
# space between them (page.py:349).
SEGMENT_GAP_PT = 5.0
# A block overhanging the column boundary by more than this on both sides is
# "wide" (page.py:183 / columns.py:130).
WIDE_OVERHANG_PT = 30.0
# One-line wide blocks centered within this distance of the boundary are
# kept whole as titles (page.py:373).
TITLE_CENTER_PT = 50.0


# span tuple slots
SP_TEXT = 0
SP_BOX = 1
SP_SIZE = 2
SP_BOLD = 3


def rgb_of(color_int: int) -> tuple[int, int, int]:
    """Integer colour -> (r, g, b), black for 0 (page.py:746-755)."""
    if color_int == 0:
        return (0, 0, 0)
    return ((color_int >> 16) & 0xFF, (color_int >> 8) & 0xFF, color_int & 0xFF)


def _take_box(raw) -> g.Box | None:
    """4-float bbox from a raw payload entry; None when the payload is
    malformed in one of the tolerated ways (KeyError/IndexError/ValueError
    only — anything else propagates, matching page.py:508-517). The
    validation comparisons are inlined (identical semantics to
    geometry.box's ValueError) — this runs once per span/line/block."""
    try:
        bb = raw["bbox"]
        x0 = float(bb[0]); y0 = float(bb[1]); x1 = float(bb[2]); y1 = float(bb[3])
    except (KeyError, IndexError, ValueError):
        return None
    if x0 > x1 or y0 > y1:
        return None
    return (x0, y0, x1, y1)


def decode_span(sd: dict, _get=dict.get):
    """Span payload -> span tuple, or None (page.py:698-744).
    Whitespace-only text is kept (it still drives spacing); empty text is
    dropped. Bold detection matches page.py:729 (flag bit 16 or "bold" in
    the lowered font name)."""
    text = _get(sd, "text", "")
    if not text:
        return None
    bb = _take_box(sd)
    if bb is None:
        return None
    flags = _get(sd, "flags", 0)
    return (
        text,
        bb,
        float(_get(sd, "size", 12.0)),
        bool(flags & 16) or "bold" in _get(sd, "font", "unknown").lower(),
    )


def decode_line(ld: dict, _get=dict.get) -> dict | None:
    """Line payload -> line dict with gap-aware text, or None
    (page.py:636-696). The span decode is inlined (identical semantics
    to ``decode_span``, which remains the unit-tested single-span API)
    — this loop runs once per span of every line in the corpus."""
    bb = _take_box(ld)
    if bb is None:
        return None
    raw_spans = _get(ld, "spans", ())
    if not raw_spans:
        return None

    spans: list = []
    pieces: list[str] = []
    prev_end: float | None = None
    prev_size = 12.0
    _append_span = spans.append
    _append_piece = pieces.append
    for sd in raw_spans:
        text = _get(sd, "text", "")
        if not text:
            continue
        try:
            sb = sd["bbox"]
            x0 = float(sb[0]); y0 = float(sb[1])
            x1 = float(sb[2]); y1 = float(sb[3])
        except (KeyError, IndexError, ValueError):
            continue
        if x0 > x1 or y0 > y1:
            continue
        flags = _get(sd, "flags", 0)
        size = float(_get(sd, "size", 12.0))
        _append_span((
            text,
            (x0, y0, x1, y1),
            size,
            bool(flags & 16) or "bold" in _get(sd, "font", "unknown").lower(),
        ))
        if prev_end is not None and x0 - prev_end > prev_size * SPACE_RATIO:
            _append_piece(" ")
        _append_piece(text)
        prev_end = x1
        prev_size = size

    text = "".join(pieces).strip()
    if not text:
        return None
    return {"box": bb, "text": text, "spans": spans}


def decode_block(bd: dict) -> dict | None:
    """Text-block payload -> block dict, or None (page.py:498-531)."""
    bb = _take_box(bd)
    if bb is None:
        return None
    lines = []
    spans = []
    for ld in bd.get("lines", []):
        line = decode_line(ld)
        if line is not None:
            lines.append(line)
            spans.extend(line["spans"])
    if not lines:
        return None
    return {"box": bb, "lines": lines, "spans": spans}


def block_text(block: dict) -> str:
    """Newline-joined non-blank line texts (page.py:55-57)."""
    return "\n".join(ln["text"] for ln in block["lines"] if ln["text"].strip())


def decode_page_blocks(pdict: dict) -> list[dict]:
    """All type-0 blocks of a raw page dict (page.py:472-496)."""
    out = []
    for bd in pdict.get("blocks", []):
        if bd.get("type") != 0:
            continue
        block = decode_block(bd)
        if block is not None:
            out.append(block)
    return out


def simple_text(pdict: dict) -> str:
    """Plain-text fallback emulating PyMuPDF ``get_text("text")``: every line
    of every text block, spans concatenated, one line per row, trailing
    newline per line. Used for the whole-page fallback block (quirk Q12)."""
    rows = []
    for bd in pdict.get("blocks", []):
        if bd.get("type") != 0:
            continue
        for ld in bd.get("lines", []):
            rows.append("".join(sd.get("text", "") for sd in ld.get("spans", [])))
    return "".join(r + "\n" for r in rows)


# ---------------------------------------------------------------------------
# Page-level column pre-pass (page.py:159-470)
# ---------------------------------------------------------------------------


def _line_rows(lines: list[dict]) -> list[dict]:
    """Group y-sorted lines into visual rows and fuse each row left-to-right
    (page.py:304-359). The input order is replaced by the y0-sort — callers
    rely on this exactly like the reference's in-place ``list.sort``."""
    if not lines:
        return []
    ordered = sorted(lines, key=lambda ln: ln["box"][1])
    fused: list[dict] = []
    row = [ordered[0]]
    for ln in ordered[1:]:
        if g.v_aligned(row[-1]["box"], ln["box"]):
            row.append(ln)
        else:
            fused.append(_fuse_row(row))
            row = [ln]
    fused.append(_fuse_row(row))
    return fused


def _fuse_row(row: list[dict]) -> dict:
    """One visual row of line fragments -> a single line; fragments separated
    by > 5 pt get a space (page.py:326-359)."""
    if len(row) == 1:
        return row[0]
    row = sorted(row, key=lambda ln: ln["box"][0])
    spans: list[dict] = []
    pieces: list[str] = []
    prev_right: float | None = None
    for ln in row:
        spans.extend(ln["spans"])
        if prev_right is not None and ln["box"][0] - prev_right > SEGMENT_GAP_PT:
            pieces.append(" ")
        pieces.append(ln["text"])
        prev_right = ln["box"][2]
    return {"box": g.union([ln["box"] for ln in row]), "text": "".join(pieces), "spans": spans}


def _fuse_block_group(group: list[dict]) -> dict:
    """Merge horizontally-adjacent blocks of one visual row into a single
    block (page.py:278-302)."""
    group = sorted(group, key=lambda b: b["box"][0])
    lines = []
    for b in group:
        lines.extend(b["lines"])
    merged_lines = _line_rows(lines)
    spans = []
    for ln in merged_lines:
        spans.extend(ln["spans"])
    return {"box": g.union([b["box"] for b in group]), "lines": merged_lines, "spans": spans}


def _consolidate_column(blocks: list[dict]) -> list[dict]:
    """Row-merge pass over one column's y-sorted blocks (page.py:237-276):
    first each multi-line block gets its internal rows fused, then runs of
    vertically-aligned neighbouring blocks are merged into one."""
    if not blocks:
        return []
    staged = []
    for b in blocks:
        if len(b["lines"]) > 1:
            rows = _line_rows(b["lines"])
            # shorter -> real merge happened: rebuild with original box/spans;
            # otherwise keep the block but with its lines now row-ordered
            # (the reference sorts the list in place either way).
            b = {"box": b["box"], "lines": rows, "spans": b["spans"]}
        staged.append(b)

    out: list[dict] = []
    group = [staged[0]]
    for b in staged[1:]:
        if g.v_aligned(group[-1]["box"], b["box"]):
            group.append(b)
        else:
            out.append(group[0] if len(group) == 1 else _fuse_block_group(group))
            group = [b]
    out.append(group[0] if len(group) == 1 else _fuse_block_group(group))
    return out


def _spans_straddle(block: dict, boundary: float) -> bool:
    """Should a wide block be split? Single centered lines stay whole
    (titles); otherwise split when spans sit on both sides (page.py:361-391)."""
    if len(block["lines"]) <= 1:
        if abs(g.center_x(block["box"]) - boundary) < TITLE_CENTER_PT:
            return False
    left = right = False
    for span in block["spans"]:
        if g.center_x(span[SP_BOX]) < boundary:
            left = True
        else:
            right = True
        if left and right:
            return True
    return False


def _halve_block(block: dict, boundary: float) -> tuple[dict | None, dict | None]:
    """Span-level left/right split of a wide block (page.py:393-470). Within
    each half, line text becomes a plain space-join of its span texts."""
    sides: dict[str, list[dict]] = {"L": [], "R": []}
    for ln in block["lines"]:
        for key, side_spans in (
            ("L", [s for s in ln["spans"] if g.center_x(s[SP_BOX]) < boundary]),
            ("R", [s for s in ln["spans"] if g.center_x(s[SP_BOX]) >= boundary]),
        ):
            if not side_spans:
                continue
            sides[key].append({
                "box": (
                    min(s[SP_BOX][0] for s in side_spans),
                    ln["box"][1],
                    max(s[SP_BOX][2] for s in side_spans),
                    ln["box"][3],
                ),
                "text": " ".join(s[SP_TEXT] for s in side_spans),
                "spans": side_spans,
            })

    def build(lines: list[dict]) -> dict | None:
        if not lines:
            return None
        return {
            "box": g.union([ln["box"] for ln in lines]),
            "lines": lines,
            "spans": [s for ln in lines for s in ln["spans"]],
        }

    return build(sides["L"]), build(sides["R"])


def arrange_columns(blocks: list[dict], boundary: float) -> list[dict]:
    """The page-level pre-pass (page.py:159-211): route blocks into
    center / left / right bins around ``boundary`` (splitting wide
    non-title blocks at the span level), y-sort and row-merge each bin,
    and emit center + left + right (quirk Q8: centered titles lead)."""
    bins: dict[str, list[dict]] = {"C": [], "L": [], "R": []}
    for b in blocks:
        x0, _, x1, _ = b["box"]
        if x0 < boundary - WIDE_OVERHANG_PT and x1 > boundary + WIDE_OVERHANG_PT:
            if _spans_straddle(b, boundary):
                left_half, right_half = _halve_block(b, boundary)
                if left_half:
                    bins["L"].append(left_half)
                if right_half:
                    bins["R"].append(right_half)
            else:
                bins["C"].append(b)
        elif g.center_x(b["box"]) < boundary:
            bins["L"].append(b)
        else:
            bins["R"].append(b)

    for key in bins:
        bins[key] = _consolidate_column(sorted(bins[key], key=lambda b: b["box"][1]))
    return bins["C"] + bins["L"] + bins["R"]


def extract_raw_blocks(pdict: dict, page_width: float) -> list[dict]:
    """Decode + column pre-pass for one page (page.py:96-118)."""
    blocks = decode_page_blocks(pdict)
    if not blocks:
        return blocks
    return arrange_columns(blocks, page_width / 2)
