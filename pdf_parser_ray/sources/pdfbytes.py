"""Real-PDF ingestion seam: PDF bytes -> page-dict bundle via PyMuPDF.

Mirrors the reference entry points ``PDFDocument.load`` / ``from_bytes``
(/root/reference/src/pdf_parser/core/document.py:57-162): ``fitz.open``
on a byte stream, password authentication for encrypted files (raising
the engine's ``DocumentLoadError`` — the ``PDFLoadError`` analog — on a
missing or wrong password), then one ``page.get_text("dict")`` per page
plus empty-value-filtered metadata (document.py:171-178). The resulting
bundle is exactly the engine's native payload, so everything downstream
(layout kernels, explode path, checkpointing) is unchanged.

PyMuPDF is NOT installed in this sandbox, so the import is optional and
probed once per worker (the actor-pool pattern); the seam is exercised
in tests through a stub fitz module, like the multimodal codec stubs.
"""

from __future__ import annotations

import json

import pyarrow as pa

from pdf_parser_ray.functions.errors import DocumentLoadError

_FITZ = None
_FITZ_PROBED = False


def _fitz():
    """Probe for PyMuPDF once per process; raise DocumentLoadError when
    absent (callers degrade per-row like every other load failure)."""
    global _FITZ, _FITZ_PROBED
    if not _FITZ_PROBED:
        _FITZ_PROBED = True
        try:
            import fitz  # type: ignore

            _FITZ = fitz
        except ImportError:
            _FITZ = None
    if _FITZ is None:
        raise DocumentLoadError(
            "PyMuPDF (fitz) is not available: cannot decode raw PDF bytes")
    return _FITZ


def reset_fitz_probe() -> None:  # test hook
    global _FITZ, _FITZ_PROBED
    _FITZ = None
    _FITZ_PROBED = False


def pdf_bytes_to_bundle(data: bytes, password: str | None = None,
                        filename: str = "document.pdf") -> dict:
    """PDF bytes -> {"pages": [get_text('dict') ...], "metadata": {...}}.

    Load/auth semantics follow core/document.py:104-119,132-162: empty
    data, undecodable streams, missing or wrong passwords all raise
    DocumentLoadError."""
    fitz = _fitz()
    if not data:
        raise DocumentLoadError(f"cannot load PDF from empty data: {filename}")
    try:
        doc = fitz.open(stream=data, filetype="pdf")
    except Exception as e:
        raise DocumentLoadError(
            f"failed to load PDF from bytes ({filename}): {e}") from e
    try:
        if getattr(doc, "is_encrypted", False):
            if password is None:
                raise DocumentLoadError(
                    f"PDF is encrypted and no password was provided: {filename}")
            if not doc.authenticate(password):
                raise DocumentLoadError(
                    f"invalid password for encrypted PDF: {filename}")
        try:
            pages = [_sanitize(doc[i].get_text("dict"))
                     for i in range(len(doc))]
        except Exception as e:  # mupdf RuntimeError on corrupt pages etc.
            raise DocumentLoadError(
                f"failed to extract pages ({filename}): {e}") from e
        meta = {k: v for k, v in (doc.metadata or {}).items() if v}
        return {"pages": pages, "metadata": meta}
    finally:
        doc.close()  # the seam must not leak native handles per document


def _sanitize(obj):
    """Make a get_text('dict') payload JSON-serializable: PyMuPDF embeds
    raw image bytes in type-1 blocks ({"type": 1, "image": <bytes>});
    the layout engine only consumes text (type-0) content, so binary
    values are dropped, not encoded."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()
                if not isinstance(v, (bytes, bytearray, memoryview))}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    return obj


class PdfToBundle:
    """Actor-pool adapter stage: (url, pdf) rows -> (url, html) rows in
    the engine's native bundle encoding. Per-row failures (bad bytes,
    wrong password) degrade to an empty payload; the downstream parse
    stage then emits the standard error row — the never-raises invariant.

    Usage:
        ds.map_batches(PdfToBundle, fn_constructor_kwargs={"password": pw},
                       concurrency=N, batch_size=16)
    """

    def __init__(self, password: str | None = None,
                 pdf_column: str = "pdf", url_column: str = "url"):
        self.password = password
        self.pdf_column = pdf_column
        self.url_column = url_column
        # probe once per actor so per-row calls don't re-import
        try:
            _fitz()
            self.available = True
        except DocumentLoadError:
            self.available = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self.url_column).to_pylist()
        payloads = batch.column(self.pdf_column).to_pylist()
        out = []
        for url, data in zip(urls, payloads):
            try:
                bundle = pdf_bytes_to_bundle(data, password=self.password,
                                             filename=url)
                out.append(json.dumps(bundle).encode("utf-8"))
            except Exception:  # noqa: BLE001 — never fail the Ray task
                # anything a real decoder can throw (bad bytes, wrong
                # password, corrupt xref, non-serializable leftovers)
                # degrades to an empty payload -> standard error row
                out.append(b"")
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array(out, pa.large_binary()),
        })
