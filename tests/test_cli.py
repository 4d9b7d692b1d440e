"""CLI smoke tests (parse with resume, info, analyze, page range)."""

from __future__ import annotations

import os

import pytest

from pdf_parser_ray.cli import main
from pdf_parser_ray.sources import synth


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("clicorpus")
    path = d / "pages.parquet"
    pq.write_table(synth.corpus_table(40, seed=5), path)
    return str(path)


@pytest.mark.usefixtures("ray_session")
def test_parse_and_resume(corpus, tmp_path, capsys):
    out = str(tmp_path / "out")
    assert main(["parse", corpus, "-o", out]) == 0
    assert os.path.exists(os.path.join(out, "_manifest", "part-0000.json"))
    first = capsys.readouterr().out
    assert '"parts_run": 1' in first
    assert main(["parse", corpus, "-o", out]) == 0
    assert '"parts_skipped": 1' in capsys.readouterr().out


@pytest.mark.usefixtures("ray_session")
def test_info(corpus, capsys):
    assert main(["info", corpus]) == 0
    out = capsys.readouterr().out
    assert "documents: 40" in out
    assert "html rows:" in out


@pytest.mark.usefixtures("ray_session")
def test_analyze(corpus, capsys):
    # find a pdf url in the corpus
    url = next(
        synth.gen_document(i, 5)["url"] for i in range(40)
        if synth.gen_document(i, 5)["url"].endswith(".pdf")
    )
    assert main(["analyze", corpus, "--url", url]) == 0
    out = capsys.readouterr().out
    assert "--- page 1" in out

    assert main(["analyze", corpus, "--url", "https://nope.example/x.pdf"]) == 1


def test_page_range_semantics():
    from pdf_parser_ray.functions import layout

    bundle = {"pages": [{"width": 100.0, "height": 100.0, "blocks": []}
                        for _ in range(5)]}
    pages, _ = layout.parse_bundle(bundle, start_page=2, end_page=3)
    assert [p["page_number"] for p in pages] == [2, 3]
    # end past the document clamps (document.py:250-255)
    pages, _ = layout.parse_bundle(bundle, start_page=4, end_page=99)
    assert [p["page_number"] for p in pages] == [4, 5]
    with pytest.raises(ValueError):
        layout.parse_bundle(bundle, start_page=0)
    with pytest.raises(ValueError):
        layout.parse_bundle(bundle, start_page=4, end_page=2)
