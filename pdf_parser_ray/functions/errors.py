"""Exception hierarchy (reference analog: core/exceptions.py:14-209).

The engine never lets these poison a Ray task — per-row handling catches
them and degrades to the ``error`` column — but the hierarchy gives API
users the same catch granularity the reference offers.
"""

from __future__ import annotations


class ExtractionError(Exception):
    """Base class (PDFParserError analog). Carries optional details."""

    def __init__(self, message: str, **details):
        self.details = {k: v for k, v in details.items() if v is not None}
        if self.details:
            joined = ", ".join(f"{k}={v!r}" for k, v in self.details.items())
            message = f"{message} ({joined})"
        super().__init__(message)


class DocumentLoadError(ExtractionError, ValueError):
    """Payload could not be decoded into a document (PDFLoadError analog)."""


class PageRangeError(ExtractionError, ValueError):
    """Invalid page number / range (PDFPageError analog)."""


class LayoutAnalysisError(ExtractionError):
    """Layout analysis failed for a page (same-name analog)."""


class TableExtractionError(ExtractionError):
    """Table conversion failed (same-name analog)."""


class ConfigurationError(ExtractionError, ValueError):
    """Invalid, missing, or conflicting configuration (same-name analog,
    core/exceptions.py:181-209). ``parameter=`` rides in the details dict
    exactly like the reference's keyword."""
