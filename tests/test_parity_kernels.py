"""Byte-identical parity: engine kernels vs the reference code run through
the fitz-stub oracle (tests/oracle/refbridge.py) over the full synthetic
scenario space. This is the core of the input_hint contract: identical
extracted text per url."""

from __future__ import annotations

import json

import pytest

from pdf_parser_ray.functions import layout, render
from pdf_parser_ray.sources import synth
from tests.oracle import refbridge


def _engine_outputs(bundle: dict, url: str = "") -> dict:
    pages, meta = layout.parse_bundle(bundle)
    return {
        "text": render.render_plain(pages),
        "markdown": render.render_markdown(pages, meta),
        "json": render.render_json(pages, meta, url),
        "n_pages": len(pages),
        "n_blocks": sum(len(p["blocks"]) for p in pages),
        "n_tables": sum(len(p["tables"]) for p in pages),
    }


def _assert_match(bundle: dict, url: str = "") -> None:
    want = refbridge.reference_outputs(bundle, url)
    got = _engine_outputs(bundle, url)
    assert got["text"] == want["text"]
    assert got["markdown"] == want["markdown"]
    assert got["json"] == want["json"]
    for k in ("n_pages", "n_blocks", "n_tables"):
        assert got[k] == want[k], k


def _scenario_bundle(maker, seed: int, meta: bool = True) -> dict:
    import random

    rng = random.Random(seed)
    bundle = {"pages": [maker(rng)]}
    if meta:
        bundle["metadata"] = {"title": "Spec Doc", "author": "Nobody"}
    return bundle


SCENARIOS = {
    "single_column": synth._page_single_column,
    "two_column": lambda rng: synth._page_two_column(rng, False),
    "two_column_wide_split": lambda rng: synth._page_two_column(rng, True),
    "bands": synth._page_with_bands,
    "table": synth._page_with_table,
    "empty": synth._page_empty,
    "malformed": synth._page_malformed,
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
@pytest.mark.parametrize("seed", range(12))
def test_scenario_parity(name, seed):
    _assert_match(_scenario_bundle(SCENARIOS[name], seed * 7919 + 13))


@pytest.mark.parametrize("seed", range(8))
def test_multipage_mixed_parity(seed):
    import random

    rng = random.Random(seed * 104729 + 1)
    bundle = {
        "pages": [synth._make_page(rng) for _ in range(rng.randrange(2, 9))],
        "metadata": {"title": "Mixed", "author": ""},  # empty author filtered
    }
    _assert_match(bundle, url=f"doc-{seed}.pdf")


@pytest.mark.parametrize("doc_id", range(60))
def test_corpus_pdf_rows_parity(doc_id):
    row = synth.gen_document(doc_id, seed=42)
    if not row["url"].endswith(".pdf"):
        pytest.skip("html row")
    try:
        bundle = json.loads(row["html"].decode("utf-8"))
    except Exception:
        pytest.skip("intentionally-broken payload")
    _assert_match(bundle, row["url"])


def test_no_pages_bundle():
    _assert_match({"pages": []})


def test_giant_document_parity():
    # 150-page mixed document: the explode-path input shape, sequentially
    import random

    rng = random.Random(777)
    bundle = {
        "pages": [synth._make_page(rng) for _ in range(150)],
        "metadata": {"title": "Giant", "author": "Synthetic"},
    }
    _assert_match(bundle, url="giant.pdf")


def test_metadata_filtering():
    # empty values must be dropped from metadata (document.py:178)
    bundle = _scenario_bundle(synth._page_single_column, 5, meta=False)
    bundle["metadata"] = {"title": "", "author": "A"}
    _assert_match(bundle)


@pytest.mark.parametrize("seed", range(6))
def test_model_text_property_parity(seed):
    """The .text property variants (models.py:364-385/418-433, quirk Q2)
    match the reference objects exactly."""
    import random

    rng = random.Random(seed * 31337 + 5)
    bundle = {"pages": [synth._make_page(rng) for _ in range(3)],
              "metadata": {}}
    ref_doc = refbridge.reference_parse_bundle(bundle)
    pages, _ = layout.parse_bundle(bundle)
    for ref_page, page in zip(ref_doc.pages, pages):
        assert render.page_text_property(page) == ref_page.text
    assert render.document_text_property(pages) == ref_doc.text
