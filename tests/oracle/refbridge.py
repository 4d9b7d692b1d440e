"""Golden-oracle bridge: run the REFERENCE code (read-only at
/root/reference) over synthetic page-dict bundles to produce expected
output bytes.

The reference hard-imports ``fitz`` (PyMuPDF), which is absent here, so we
stub the module before import — everything downstream of the fitz calls is
pure Python (verified in SURVEY.md: environment facts).  A FakeFitzPage
emulates the two fitz calls the reference makes (``.rect`` and
``.get_text("dict"/"text")``), and a payload-driven TableDetector subclass
replaces the pdfplumber step with the reference's own pure conversion
methods (_create_cells_from_data/_detect_header/_validate_table), fed from
the fixture's ``tables`` payload.

This module is TEST-ONLY. The engine never imports it.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

from pdf_parser_ray.functions.pagedict import simple_text

_REF_SRC = "/root/reference/src"


def _ensure_reference_importable():
    if "fitz" not in sys.modules:
        sys.modules["fitz"] = types.ModuleType("fitz")
    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)


_ensure_reference_importable()

from pdf_parser.core.page import Page  # noqa: E402
from pdf_parser.layout.analyzer import LayoutAnalyzer  # noqa: E402
from pdf_parser.output.formatter import OutputFormat, OutputFormatter  # noqa: E402
from pdf_parser.output.models import (  # noqa: E402
    BoundingBox,
    StructuredDocument,
    Table,
)
from pdf_parser.tables.detector import TableDetector  # noqa: E402


class FakeFitzPage:
    """Emulates the slice of fitz.Page the reference touches."""

    def __init__(self, pdict: dict):
        self._pdict = pdict

    @property
    def rect(self):
        return SimpleNamespace(
            width=float(self._pdict.get("width", 0.0)),
            height=float(self._pdict.get("height", 0.0)),
        )

    def get_text(self, kind: str):
        if kind == "dict":
            return self._pdict
        if kind == "text":
            return simple_text(self._pdict)
        raise ValueError(f"unsupported get_text kind: {kind}")


class PayloadTableDetector(TableDetector):
    """detect_tables driven by the fixture payload instead of pdfplumber,
    delegating to the reference's pure conversion/validation methods so the
    oracle's table path is still reference code."""

    def detect_tables(self, page):
        out = []
        for spec in page._page._pdict.get("tables", []):
            table = self._from_payload(spec, page.height)
            if table is not None and self._validate_table(table):
                out.append(table)
        return out

    def _from_payload(self, spec, page_height):
        # mirrors detector.py:198-237 with plumber_table.bbox/extract()
        # replaced by the payload fields
        try:
            data = spec["data"]
            if not data or len(data) < self.settings.min_rows:
                return None
            x0, top, x1, bottom = spec["bbox_topleft"]
            bbox = BoundingBox(
                x0=x0,
                y0=page_height - bottom,
                x1=x1,
                y1=page_height - top,
            )
            cells = self._create_cells_from_data(data, bbox)
            if not cells:
                return None
            num_rows = len(data)
            num_cols = max(len(row) for row in data)
            if num_cols < self.settings.min_cols:
                return None
            return Table(
                cells=tuple(cells),
                bbox=bbox,
                num_rows=num_rows,
                num_cols=num_cols,
                has_header=self._detect_header(data),
            )
        except Exception:
            return None


def reference_parse_bundle(bundle: dict, url: str = "") -> StructuredDocument:
    """The reference's document parse loop (document.py:268-289) over a
    decoded bundle, including the per-page fallback (document.py:276-283)."""
    from pdf_parser.output.models import BlockType, TextBlock, StructuredPage

    analyzer = LayoutAnalyzer()
    analyzer._table_detector = PayloadTableDetector()

    pages = []
    for i, pdict in enumerate(bundle.get("pages", [])):
        page = Page(FakeFitzPage(pdict), i + 1)
        try:
            pages.append(analyzer.analyze_page(page))
        except Exception:
            text = page.get_text_simple()
            if text.strip():
                blocks = (TextBlock(
                    text=text,
                    bbox=BoundingBox(0, 0, page.width, page.height),
                    block_type=BlockType.PARAGRAPH,
                ),)
            else:
                blocks = ()
            pages.append(StructuredPage(
                page_number=page.page_number,
                width=page.width,
                height=page.height,
                blocks=blocks,
            ))

    meta = {k: v for k, v in (bundle.get("metadata") or {}).items() if v}
    return StructuredDocument(pages=tuple(pages), metadata=meta, source_path=url)


def reference_outputs(bundle: dict, url: str = "",
                      include_coordinates: bool = False) -> dict:
    """Golden outputs for one bundle: plain text, markdown, JSON, counters."""
    doc = reference_parse_bundle(bundle, url)
    fmt = OutputFormatter(include_coordinates=include_coordinates)
    return {
        "text": fmt.format(doc, OutputFormat.PLAIN_TEXT),
        "markdown": fmt.format(doc, OutputFormat.MARKDOWN),
        "json": fmt.format(doc, OutputFormat.JSON),
        "n_pages": doc.page_count,
        "n_blocks": sum(p.block_count for p in doc.pages),
        "n_tables": sum(p.table_count for p in doc.pages),
    }
