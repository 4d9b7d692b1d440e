"""Per-page layout analysis and per-document parsing.

This is the engine's equivalent of the reference's LayoutAnalyzer +
PDFDocument.parse loop (/root/reference/src/pdf_parser/layout/analyzer.py:89-300,
core/document.py:218-321), operating on the JSON "page-dict bundle" carried
in the ``html`` binary column (FIXTURES.md §1).  All functions are pure; the
Ray actor stage in ``stages/extract.py`` simply maps them over batches.

A structured page is a dict:
    {"page_number", "width", "height", "blocks", "tables", "columns",
     "header", "footer"}
"""

from __future__ import annotations

import json

from pdf_parser_ray.functions import columns as colmod
from pdf_parser_ray.functions import geometry as g
from pdf_parser_ray.functions import paragraphs as paramod
from pdf_parser_ray.functions import tables as tabmod
from pdf_parser_ray.functions.pagedict import extract_raw_blocks, simple_text

# Header / footer bands: 72 pt (1 inch) from the page edges (analyzer.py:51-52).
HEADER_MARGIN_PT = 72.0
FOOTER_MARGIN_PT = 72.0


def _empty_page(page_number: int, width: float, height: float) -> dict:
    return {
        "page_number": page_number,
        "width": width,
        "height": height,
        "blocks": [],
        "tables": [],
        "columns": [],
        "header": "",
        "footer": "",
    }


def analyze_page(page_number: int, pdict: dict,
                 detect_tables: bool = True) -> dict:
    """Full per-page analysis chain (analyzer.py:89-180): raw blocks ->
    header/footer bands -> tables (from the page payload's ``tables`` key)
    -> column detection -> paragraphs -> reading order."""
    width = float(pdict.get("width", 0.0))
    height = float(pdict.get("height", 0.0))

    raw = extract_raw_blocks(pdict, width)
    if not raw:
        return _empty_page(page_number, width, height)

    header, footer, content = _band_split(raw, height)

    tables: list[dict] = []
    if detect_tables:
        tables, content = _claim_table_regions(pdict, content, height)

    try:
        cols = colmod.detect_columns(content, width)
    except Exception:
        cols = []

    blocks: list[dict] = []
    col_structs: list[dict] = []
    if cols:
        for col in cols:
            built = paramod.build_paragraphs(col["blocks"], col["index"])
            blocks.extend(built)
            col_structs.append({"box": col["box"], "index": col["index"], "blocks": built})
    else:
        blocks = paramod.build_paragraphs(content, 0)
        if blocks:
            col_structs.append({
                "box": g.union([b["box"] for b in blocks]),
                "index": 0,
                "blocks": blocks,
            })

    return {
        "page_number": page_number,
        "width": width,
        "height": height,
        "blocks": _reading_order(blocks, col_structs),
        "tables": tables,
        "columns": col_structs,
        "header": header,
        "footer": footer,
    }


def _band_split(blocks: list[dict], page_height: float) -> tuple[str, str, list[dict]]:
    """Split off header (block bottom above the 72 pt band) and footer
    (block top below height-72) text (analyzer.py:182-216)."""
    head, foot, body = [], [], []
    for b in blocks:
        if b["box"][3] < HEADER_MARGIN_PT:
            head.append(b)
        elif b["box"][1] > page_height - FOOTER_MARGIN_PT:
            foot.append(b)
        else:
            body.append(b)
    from pdf_parser_ray.functions.pagedict import block_text
    header = " ".join(block_text(b) for b in head).strip()
    footer = " ".join(block_text(b) for b in foot).strip()
    return header, footer, body


def _claim_table_regions(pdict: dict, blocks: list[dict],
                         page_height: float) -> tuple[list[dict], list[dict]]:
    """Materialise payload tables and drop text blocks overlapping any table
    bbox (analyzer.py:218-268). Per the reference, a failure in table
    handling degrades to "no tables" rather than failing the page.

    Real-PDF seam: a page carrying a ``drawings`` payload (drawn rule
    lines, the PyMuPDF get_drawings shape) additionally runs the native
    ruled-line detector (functions/tabledetect.py — the from-scratch
    analog of pdfplumber's lines strategy, detector.py:119-163); its
    specs feed the SAME conversion/validation path as fixture tables."""
    try:
        specs = list(pdict.get("tables", []))
        if pdict.get("drawings"):
            from pdf_parser_ray.functions.tabledetect import (
                detect_ruled_tables)
            try:
                specs.extend(detect_ruled_tables(pdict))
            except Exception:
                pass  # detection degrades to "no detected tables"
        tables = []
        for spec in specs:
            # per-table tolerance, like detector.py:198-241's inner catch
            try:
                t = tabmod.table_from_payload(spec, page_height)
            except Exception:
                t = None
            if t is not None:
                tables.append(t)
    except Exception:
        return [], blocks
    if not tables:
        return [], blocks
    boxes = [t["box"] for t in tables]
    kept = [b for b in blocks if not any(g.intersects(b["box"], tb) for tb in boxes)]
    return tables, kept


def _reading_order(blocks: list[dict], cols: list[dict]) -> list[dict]:
    """Q2: the stored block order sorts by descending y1 (bottom-up on
    top-left-origin data) — the formatter re-sorts top-down later
    (analyzer.py:282-300)."""
    if not blocks:
        return []
    if len(cols) <= 1:
        return sorted(blocks, key=lambda b: -b["box"][3])
    return sorted(blocks, key=lambda b: (b["column_index"], -b["box"][3]))


def fallback_page(page_number: int, pdict: dict) -> dict:
    """Whole-page single-paragraph fallback when analysis raises (quirk Q12;
    document.py:291-321)."""
    width = float(pdict.get("width", 0.0))
    height = float(pdict.get("height", 0.0))
    page = _empty_page(page_number, width, height)
    text = simple_text(pdict)
    if text.strip():
        page["blocks"] = [{
            "text": text,
            "box": (0, 0, width, height),  # int zeros as in document.py:309
            "type": paramod.PARAGRAPH,
            "spans": [],
            "alignment": paramod.LEFT,
            "indentation": 0.0,
            "line_spacing": 0.0,
            "column_index": 0,
        }]
    return page


def parse_bundle(bundle: dict, detect_tables: bool = True,
                 start_page: int = 1,
                 end_page: int | None = None) -> tuple[list[dict], dict]:
    """Parse a decoded page-dict bundle into structured pages + filtered
    metadata. Per-page failures degrade to the fallback page; pages are
    numbered by absolute position (document.py:268-289).

    Page-range semantics mirror the reference (document.py:241-261):
    1-indexed inclusive; ``end_page`` past the document clamps; a start
    before 1 or after the end raises ValueError (PDFPageError analog).
    """
    from pdf_parser_ray.functions.errors import PageRangeError

    all_pages = bundle.get("pages", [])
    if start_page < 1:
        raise PageRangeError(f"start page must be >= 1, got {start_page}",
                             page_number=start_page)
    if end_page is None or end_page > len(all_pages):
        end_page = len(all_pages)
    if start_page > end_page and all_pages:
        raise PageRangeError(
            f"start page ({start_page}) cannot be greater than "
            f"end page ({end_page})", page_number=start_page)

    pages = []
    for i in range(start_page - 1, end_page):
        number = i + 1
        pdict = all_pages[i]
        try:
            pages.append(analyze_page(number, pdict, detect_tables))
        except Exception:
            pages.append(fallback_page(number, pdict))
    meta = bundle.get("metadata") or {}
    meta = {k: v for k, v in meta.items() if v}
    return pages, meta


def load_bundle(payload: bytes) -> dict:
    """Decode the ``html`` binary cell into a bundle dict; raises
    DocumentLoadError on malformed payloads (the engine's analog of
    PDFLoadError, document.py:132-162)."""
    from pdf_parser_ray.functions.errors import DocumentLoadError

    if not payload:
        raise DocumentLoadError("empty document payload")
    try:
        bundle = json.loads(payload.decode("utf-8"))
    except Exception as e:
        raise DocumentLoadError(f"undecodable document payload: {e}") from e
    if not isinstance(bundle, dict) or "pages" not in bundle:
        raise DocumentLoadError("payload is not a page-dict bundle")
    if not isinstance(bundle["pages"], list):
        raise DocumentLoadError("bundle 'pages' is not a list")
    return bundle
