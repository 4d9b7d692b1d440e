"""E2E Ray pipeline tests: both pipeline modes produce byte-identical
per-url output vs the sequential kernel (itself oracle-verified in
test_parity_kernels.py), deterministically."""

from __future__ import annotations

import pytest

from pdf_parser_ray.functions.document import extract_document
from pdf_parser_ray.sources import synth

N_DOCS = 120
SEED = 2024


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    import pyarrow.parquet as pq

    path = tmp_path_factory.mktemp("corpus") / "pages.parquet"
    pq.write_table(synth.corpus_table(N_DOCS, seed=SEED), path)
    return str(path)


@pytest.fixture(scope="module")
def golden(corpus_path):
    """Sequential per-row extraction = expected bytes."""
    rows = {}
    for i in range(N_DOCS):
        r = synth.gen_document(i, seed=SEED)
        rows[r["url"]] = extract_document(r["url"], r["html"])
    return rows


def _run(corpus_path, **kwargs):
    from pdf_parser_ray.pipelines.extraction import extract_paths

    out = extract_paths(corpus_path, **kwargs).take_all()
    return {r["url"]: r for r in out}


@pytest.mark.usefixtures("ray_session")
def test_pure_map_mode_matches_sequential(corpus_path, golden):
    got = _run(corpus_path, explode_threshold=None)
    assert set(got) == set(golden)
    for url, want in golden.items():
        row = got[url]
        assert row["text"] == want["text"], url
        assert row["markdown"] == want["markdown"], url
        assert row["n_pages"] == want["n_pages"], url
        assert row["n_blocks"] == want["n_blocks"], url
        assert row["n_tables"] == want["n_tables"], url
        assert row["error"] == want["error"], url


@pytest.mark.usefixtures("ray_session")
def test_explode_mode_matches_sequential(corpus_path, golden):
    # threshold=0: EVERY pdf row goes through explode + groupby reassembly
    got = _run(corpus_path, explode_threshold=0)
    assert set(got) == set(golden)
    for url, want in golden.items():
        row = got[url]
        assert row["text"] == want["text"], url
        assert row["markdown"] == want["markdown"], url
        assert row["n_blocks"] == want["n_blocks"], url
        assert row["n_tables"] == want["n_tables"], url


@pytest.mark.usefixtures("ray_session")
def test_explode_mode_with_no_giants(corpus_path, golden):
    # threshold far above any payload: explode mode with an EMPTY chunk
    # branch (empty groupby + union must be harmless)
    got = _run(corpus_path, explode_threshold=10**12)
    assert {u: r["text"] for u, r in got.items()} == {
        u: w["text"] for u, w in golden.items()}


@pytest.mark.usefixtures("ray_session")
def test_tasks_parse_mode(corpus_path, golden):
    got = _run(corpus_path, explode_threshold=None, parse_mode="tasks")
    assert {u: r["text"] for u, r in got.items()} == {
        u: w["text"] for u, w in golden.items()}


@pytest.mark.usefixtures("ray_session")
def test_two_runs_identical(corpus_path):
    a = _run(corpus_path, explode_threshold=64 * 1024)
    b = _run(corpus_path, explode_threshold=64 * 1024)
    assert {u: r["text"] for u, r in a.items()} == {u: r["text"] for u, r in b.items()}


@pytest.mark.usefixtures("ray_session")
def test_error_rows_survive(corpus_path, golden):
    got = _run(corpus_path, explode_threshold=None)
    broken = [u for u, w in golden.items() if w["error"]]
    assert broken, "corpus should contain intentionally-broken payloads"
    for u in broken:
        assert got[u]["error"] != ""
        assert got[u]["text"] == ""


@pytest.mark.usefixtures("ray_session")
def test_page_range_pipeline(corpus_path, golden):
    from pdf_parser_ray.functions.document import extract_document

    got = _run(corpus_path, start_page=1, end_page=2)
    for i in range(N_DOCS):
        r = synth.gen_document(i, seed=SEED)
        want = extract_document(r["url"], r["html"], start_page=1, end_page=2)
        assert got[r["url"]]["text"] == want["text"], r["url"]
        assert got[r["url"]]["n_pages"] == want["n_pages"]


@pytest.mark.usefixtures("ray_session")
def test_batch_size_invariance(corpus_path):
    # identical bytes under different task batchings (determinism is
    # data-driven, never arrival-order-driven)
    a = _run(corpus_path, explode_threshold=None, parse_batch_size=16)
    b = _run(corpus_path, explode_threshold=None, parse_batch_size=128)
    assert {u: r["text"] for u, r in a.items()} == {
        u: r["text"] for u, r in b.items()}


@pytest.mark.usefixtures("ray_session")
def test_structured_nested_output(corpus_path, golden):
    # nested Arrow blocks/tables columns (functions/schema.py), both modes
    for kwargs in ({"explode_threshold": None},
                   {"explode_threshold": 0}):
        got = _run(corpus_path, want_structured=True, **kwargs)
        for url, want in golden.items():
            row = got[url]
            assert len(row["blocks"]) == want["n_blocks"], url
            assert len(row["tables"]) == want["n_tables"], url
            if row["blocks"]:
                b = row["blocks"][0]
                assert set(b) == {"page_number", "text", "block_type",
                                  "column_index", "bbox"}
                assert len(b["bbox"]) == 4


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_mode(corpus_path, golden):
    # actor-pool parse stage (ctor kwargs path) incl. explode combination
    got = _run(corpus_path, parse_mode="actors", parse_concurrency=2,
               explode_threshold=64 * 1024)
    assert {u: r["text"] for u, r in got.items()} == {
        u: w["text"] for u, w in golden.items()}


@pytest.mark.usefixtures("ray_session")
def test_entry_schema_stable(corpus_path):
    # the driver smoke-checks a stable schema on entry(); guard the columns
    import __ray_entry__ as entrymod

    df = entrymod.entry()
    df = df if hasattr(df, "columns") else df.to_pandas()
    assert list(df.columns) == ["url", "n_pages", "n_blocks", "n_tables",
                                "error", "text_fp"]


@pytest.mark.usefixtures("ray_session")
def test_explode_mode_json_matches_sequential(corpus_path):
    """want_json through the explode path: per-page fragments reassembled
    into the exact sequential JSON document (both coordinate modes)."""
    for coords in (False, True):
        got = _run(corpus_path, explode_threshold=0, want_json=True,
                   json_coordinates=coords)
        for i in range(N_DOCS):
            r = synth.gen_document(i, seed=SEED)
            want = extract_document(r["url"], r["html"], want_json=True,
                                    json_coordinates=coords)
            assert got[r["url"]]["json"] == want["json"], (r["url"], coords)
