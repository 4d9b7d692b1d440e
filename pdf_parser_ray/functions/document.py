"""Per-document extraction: one input row -> one output row.

Routes on the url suffix (FIXTURES.md §1): ``.pdf`` rows carry a page-dict
bundle parsed through the layout kernels; ``.html`` rows go through the
boilerplate stripper.  Never raises — malformed payloads yield an ``error``
string and empty text, so one poisoned document cannot fail a Ray task
(reference analog: per-page degradation, document.py:276-283).
"""

from __future__ import annotations

from pdf_parser_ray.functions import layout, render
from pdf_parser_ray.functions.htmlstrip import strip_html

PDF_KIND = "pdf"
HTML_KIND = "html"


def doc_kind(url: str) -> str:
    return HTML_KIND if url.endswith(".html") else PDF_KIND


def extract_document(url: str, payload: bytes,
                     want_markdown: bool = True,
                     want_json: bool = False,
                     start_page: int = 1,
                     end_page: int | None = None,
                     json_coordinates: bool = False,
                     want_structured: bool = False) -> dict:
    """Full extraction for one document.

    Returns a flat dict:
        url, kind, text, markdown, json, n_pages, n_blocks, n_tables, error
    plus (``want_structured``) nested ``blocks``/``tables`` lists in the
    functions/schema.py shape.
    """
    out = {
        "url": url,
        "kind": doc_kind(url),
        "text": "",
        "markdown": "",
        "json": "",
        "n_pages": 0,
        "n_blocks": 0,
        "n_tables": 0,
        "error": "",
        "blocks": [],
        "tables": [],
    }
    try:
        if out["kind"] == HTML_KIND:
            text, n_blocks = strip_html(payload)
            out["text"] = text
            out["markdown"] = text if want_markdown else ""
            out["n_pages"] = 1
            out["n_blocks"] = n_blocks
            if want_structured and n_blocks:
                from pdf_parser_ray.functions.htmlstrip import strip_html_parts

                out["blocks"] = [{
                    "page_number": 1,
                    "text": part,
                    "block_type": "PARAGRAPH",
                    "column_index": 0,
                    "bbox": [0.0, 0.0, 0.0, 0.0],
                } for part in strip_html_parts(payload)]
        else:
            bundle = layout.load_bundle(payload)
            pages, meta = layout.parse_bundle(bundle, start_page=start_page,
                                              end_page=end_page)
            out["text"] = render.render_plain(pages)
            if want_markdown:
                out["markdown"] = render.render_markdown(pages, meta)
            if want_json:
                out["json"] = render.render_json(
                    pages, meta, url, include_coordinates=json_coordinates)
            out["n_pages"] = len(pages)
            out["n_blocks"] = sum(len(p["blocks"]) for p in pages)
            out["n_tables"] = sum(len(p["tables"]) for p in pages)
            if want_structured:
                from pdf_parser_ray.functions import schema

                out["blocks"] = schema.doc_blocks(pages)
                out["tables"] = schema.doc_tables(pages)
    except Exception as e:  # noqa: BLE001 — per-row degradation by design
        out["error"] = f"{type(e).__name__}: {e}"
    return out
