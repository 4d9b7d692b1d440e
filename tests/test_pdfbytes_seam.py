"""The real-PDF ingestion seam (sources/pdfbytes.py), exercised through a
stub fitz module — the sandbox has no PyMuPDF, so the stub stands in for
``fitz.open(stream=...)`` exactly like the multimodal codec stubs.

Stub 'PDF bytes' are JSON bundles; the stub document exposes the fitz
surface the adapter touches (is_encrypted / authenticate / metadata /
__len__ / __getitem__ / get_text('dict')), mirroring
tests/oracle/refbridge.py's approach of running reference code on stub
fitz objects."""

from __future__ import annotations

import json
import sys
import types

import pytest


class _StubPage:
    def __init__(self, pdict):
        self._pdict = pdict

    def get_text(self, kind):
        assert kind == "dict"
        return self._pdict


class _StubDoc:
    def __init__(self, spec):
        self._spec = spec
        self.closed = False

    @property
    def is_encrypted(self):
        return "password" in self._spec

    def authenticate(self, password):
        return password == self._spec.get("password")

    @property
    def metadata(self):
        return self._spec.get("metadata") or {}

    def __len__(self):
        return len(self._spec.get("pages", []))

    def __getitem__(self, i):
        return _StubPage(self._spec["pages"][i])

    def close(self):
        self.closed = True


def _stub_open(stream=None, filetype=None, **kwargs):
    try:
        return _StubDoc(json.loads(stream.decode("utf-8")))
    except Exception as e:  # mimic fitz failing on garbage bytes
        raise RuntimeError(f"cannot open stream: {e}")


@pytest.fixture()
def stub_fitz(monkeypatch):
    from pdf_parser_ray.sources import pdfbytes

    mod = types.ModuleType("fitz")
    mod.open = _stub_open
    monkeypatch.setitem(sys.modules, "fitz", mod)
    pdfbytes.reset_fitz_probe()
    yield mod
    pdfbytes.reset_fitz_probe()


def _spec_bytes(pages, metadata=None, password=None) -> bytes:
    spec = {"pages": pages}
    if metadata is not None:
        spec["metadata"] = metadata
    if password is not None:
        spec["password"] = password
    return json.dumps(spec).encode("utf-8")


PAGE = {
    "width": 612.0, "height": 792.0,
    "blocks": [{
        "type": 0, "bbox": [72.0, 100.0, 300.0, 120.0],
        "lines": [{"bbox": [72.0, 100.0, 300.0, 120.0], "spans": [
            {"text": "hello from a real pdf", "bbox": [72.0, 100.0, 300.0, 120.0],
             "size": 11.0, "font": "F1", "flags": 0}]}],
    }],
}


def test_bytes_to_bundle_matches_native_parse(stub_fitz):
    """bytes -> bundle -> extraction must equal parsing the same bundle
    through the native payload path, byte-identically."""
    from pdf_parser_ray.functions.document import extract_document
    from pdf_parser_ray.sources.pdfbytes import pdf_bytes_to_bundle

    meta = {"title": "T", "author": "", "subject": "S"}
    data = _spec_bytes([PAGE, PAGE], metadata=meta)
    bundle = pdf_bytes_to_bundle(data)
    assert bundle["metadata"] == {"title": "T", "subject": "S"}  # empties dropped
    native = extract_document("doc.pdf", json.dumps(
        {"pages": [PAGE, PAGE], "metadata": meta}).encode())
    via_seam = extract_document("doc.pdf", json.dumps(bundle).encode())
    assert via_seam["text"] == native["text"]
    assert via_seam["markdown"] == native["markdown"]
    assert via_seam["error"] == ""


def test_password_semantics(stub_fitz):
    from pdf_parser_ray.functions.errors import DocumentLoadError
    from pdf_parser_ray.sources.pdfbytes import pdf_bytes_to_bundle

    data = _spec_bytes([PAGE], password="s3cret")
    with pytest.raises(DocumentLoadError, match="no password"):
        pdf_bytes_to_bundle(data)
    with pytest.raises(DocumentLoadError, match="invalid password"):
        pdf_bytes_to_bundle(data, password="wrong")
    bundle = pdf_bytes_to_bundle(data, password="s3cret")
    assert len(bundle["pages"]) == 1


def test_load_failures(stub_fitz):
    from pdf_parser_ray.functions.errors import DocumentLoadError
    from pdf_parser_ray.sources.pdfbytes import pdf_bytes_to_bundle

    with pytest.raises(DocumentLoadError, match="empty data"):
        pdf_bytes_to_bundle(b"")
    with pytest.raises(DocumentLoadError, match="failed to load"):
        pdf_bytes_to_bundle(b"\x00not-a-pdf")


def test_missing_fitz_raises_cleanly(monkeypatch):
    from pdf_parser_ray.functions.errors import DocumentLoadError
    from pdf_parser_ray.sources import pdfbytes

    monkeypatch.setitem(sys.modules, "fitz", None)  # force ImportError
    pdfbytes.reset_fitz_probe()
    try:
        with pytest.raises(DocumentLoadError, match="not available"):
            pdfbytes.pdf_bytes_to_bundle(b"whatever")
    finally:
        pdfbytes.reset_fitz_probe()


@pytest.mark.usefixtures("ray_session")
def test_adapter_stage_plus_pipeline(stub_fitz):
    """The adapter batch kernel (driver-side, stub fitz) chained into the
    real distributed extraction: good rows extract, wrong-password rows
    degrade to error rows. (Ray workers cannot see a monkeypatched module,
    so the adapter batch runs in-driver — identical code to what
    map_batches(PdfToBundle) executes per worker.)"""
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.pipelines.extraction import extract_dataset
    from pdf_parser_ray.sources.pdfbytes import PdfToBundle

    rows = pa.table({
        "url": pa.array(["a.pdf", "b.pdf", "locked.pdf"], pa.string()),
        "pdf": pa.array([
            _spec_bytes([PAGE]),
            _spec_bytes([PAGE, PAGE], metadata={"title": "B"}),
            _spec_bytes([PAGE], password="nope"),
        ], pa.binary()),
    })
    bundles = PdfToBundle()(rows)
    assert bundles.schema.names == ["url", "html"]
    out = {r["url"]: r for r in
           extract_dataset(ray.data.from_arrow(bundles)).take_all()}
    assert out["a.pdf"]["error"] == "" and "hello from a real pdf" in out["a.pdf"]["text"]
    assert out["b.pdf"]["n_pages"] == 2
    assert out["locked.pdf"]["error"] != "" and out["locked.pdf"]["text"] == ""


@pytest.mark.usefixtures("ray_session")
def test_pipeline_pdf_column_without_fitz(tmp_path):
    """extract_paths(pdf_column=...) end-to-end with fitz genuinely absent
    (the sandbox truth): every row degrades to a standard error row — the
    distributed wiring itself never raises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.extraction import extract_paths

    rows = pa.table({
        "url": pa.array(["a.pdf", "b.pdf"], pa.string()),
        "pdf": pa.array([_spec_bytes([PAGE])] * 2, pa.binary()),
    })
    path = tmp_path / "pdfs.parquet"
    pq.write_table(rows, path)
    out = {r["url"]: r for r in
           extract_paths(str(path), pdf_column="pdf").take_all()}
    assert len(out) == 2
    for r in out.values():
        assert r["error"] != "" and r["text"] == ""


def test_image_blocks_are_sanitized_not_fatal(stub_fitz, monkeypatch):
    """PyMuPDF embeds raw image bytes in type-1 blocks; the seam must
    strip them (the layout engine only reads text blocks) instead of
    blowing up json.dumps — and close the document either way."""
    import types

    from pdf_parser_ray.sources import pdfbytes

    class _ImgPage:
        def get_text(self, kind):
            return {"width": 612.0, "height": 792.0, "blocks": [
                PAGE["blocks"][0],
                {"type": 1, "bbox": [0, 0, 9, 9], "image": b"\x89PNG..."},
            ]}

    class _ImgDoc(_StubDoc):
        def __init__(self):
            super().__init__({"pages": [None]})

        def __getitem__(self, i):
            return _ImgPage()

    doc = _ImgDoc()
    monkeypatch.setattr(sys.modules["fitz"], "open",
                        lambda stream=None, filetype=None: doc)
    pdfbytes.reset_fitz_probe()
    bundle = pdfbytes.pdf_bytes_to_bundle(b"whatever")
    assert doc.closed
    img_block = bundle["pages"][0]["blocks"][1]
    assert "image" not in img_block and img_block["type"] == 1
    # the bundle must be JSON-serializable end to end
    json.dumps(bundle)
    # and the actor stage must survive a page that RAISES mid-extract
    class _BadDoc(_ImgDoc):
        def __getitem__(self, i):
            raise RuntimeError("mupdf: corrupt page")

    monkeypatch.setattr(sys.modules["fitz"], "open",
                        lambda stream=None, filetype=None: _BadDoc())
    pdfbytes.reset_fitz_probe()
    import pyarrow as pa
    batch = pa.table({"url": ["x.pdf"], "pdf": [b"zz"]})
    out = pdfbytes.PdfToBundle()(batch)
    assert out.column("html")[0].as_py() == b""  # degraded, no raise
