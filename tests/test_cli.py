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


@pytest.mark.usefixtures("ray_session")
def test_parse_pdf_front_door(tmp_path, capsys):
    """parse *.pdf (reference cli.py:44-169 single-file journey): raw PDF
    files are staged into (url, pdf) shards and run through the PyMuPDF
    seam. fitz is genuinely absent in this sandbox's workers, so every
    row degrades to a standard error row — the wiring itself (staging,
    checkpoint parts, resume, row accounting) is what's under test."""
    import json as _json

    import duckdb

    pdfs = []
    for name in ("a.pdf", "b.pdf", "c.pdf"):
        p = tmp_path / name
        p.write_bytes(b"%PDF-1.4 fake " + name.encode())
        pdfs.append(str(p))
    out = str(tmp_path / "out")

    assert main(["parse", *pdfs, "-o", out, "--pdfs-per-shard", "2",
                 "--files-per-part", "1"]) == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"parts_total": 2, "parts_skipped": 0,
                       "parts_run": 2, "rows": 3}
    rows = duckdb.sql(
        f"SELECT url, error, text FROM '{out}/part-*/*.parquet' ORDER BY url"
    ).fetchall()
    assert [r[0] for r in rows] == pdfs  # one row per input file, url=path
    assert all(r[1] != "" and r[2] == "" for r in rows)  # degraded, not lost

    # resume: unchanged input reuses the staging and skips both parts
    assert main(["parse", *pdfs, "-o", out, "--pdfs-per-shard", "2",
                 "--files-per-part", "1"]) == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["parts_skipped"] == 2 and summary["rows"] == 3


def test_parse_pdf_front_door_validation(tmp_path, capsys):
    (tmp_path / "real.pdf").write_bytes(b"%PDF")
    (tmp_path / "shard.parquet").write_bytes(b"PAR1")
    # mixing raw PDFs and parquet shards is an explicit error
    assert main(["parse", str(tmp_path / "real.pdf"),
                 str(tmp_path / "shard.parquet"),
                 "-o", str(tmp_path / "out")]) == 1
    assert "cannot mix" in capsys.readouterr().err
    # a missing .pdf fails fast, before any Ray work
    with pytest.raises(SystemExit, match="no such file"):
        from pdf_parser_ray.cli import _stage_pdfs

        _stage_pdfs([str(tmp_path / "ghost.pdf")],
                    str(tmp_path / "out2"), 64)


def test_stage_pdfs_deterministic_reuse(tmp_path):
    """Unchanged input list -> staging shards are reused byte-identically
    (no rewrite), so run_checkpointed's lineage check sees stable inputs;
    a changed list re-stages."""
    import os as _os

    from pdf_parser_ray.cli import _stage_pdfs

    p1 = tmp_path / "x.pdf"
    p2 = tmp_path / "y.pdf"
    p1.write_bytes(b"%PDF x")
    p2.write_bytes(b"%PDF y")
    out = str(tmp_path / "out")
    shards = _stage_pdfs([str(p1), str(p2)], out, 1)
    assert len(shards) == 2 and all(_os.path.isfile(s) for s in shards)
    mtimes = [_os.path.getmtime(s) for s in shards]
    again = _stage_pdfs([str(p1), str(p2)], out, 1)
    assert again == shards
    assert [_os.path.getmtime(s) for s in again] == mtimes  # untouched
    # a different input list invalidates the staging manifest
    third = _stage_pdfs([str(p1)], out, 1)
    assert len(third) == 1


def test_profile_any_parquet(tmp_path, capsys):
    """The generic profile subcommand derives a spec from any schema
    (ints, floats, strings, timestamps, binary-as-md5) and reports
    exact distincts."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.cli import build_parser

    tbl = pa.table({
        "k": pa.array([1, 2, 2, None], pa.int64()),
        "x": pa.array([0.5, 0.5, 1.5, 2.5], pa.float64()),
        "s": pa.array(["a", "b", "a", None], pa.string()),
        "t": pa.array([dt.datetime(2024, 1, 1)] * 4, pa.timestamp("us")),
        "b": pa.array([b"xx", b"xx", b"yy", b"zz"], pa.binary()),
        "nested": pa.array([[1], [2], [3], [4]],
                           pa.list_(pa.int64())),  # skipped by the spec
    })
    path = tmp_path / "any.parquet"
    pq.write_table(tbl, str(path))
    args = build_parser().parse_args(["profile", str(path)])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    lines = {ln.split()[0]: ln.split() for ln in out.strip().splitlines()[1:]}
    assert set(lines) == {"k", "x", "s", "t", "b"}
    assert lines["k"][1:4] == ["4", "1", "2"]     # rows, nulls, distinct
    assert lines["x"][3] == "3"
    assert lines["s"][3] == "2"
    assert lines["t"][3] == "1"
    assert lines["b"][3] == "3"                   # md5-fingerprint distinct


@pytest.mark.usefixtures("ray_session")
def test_dedup_exact_and_near(tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    # 3 exact copies of A, a near-copy pair (B, B'), one unique doc
    base_b = " ".join(f"tok{i}" for i in range(40))
    texts = ["aaa bbb ccc"] * 3 + [base_b, base_b + " tail", "unique doc x"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)

    out1 = str(tmp_path / "exact")
    assert main(["dedup", src, "-o", out1]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_in"] == 6 and rep["removed"] == 2
    import duckdb
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{out1}/*.parquet' ORDER BY doc_id").fetchall()]
    assert ids == [0, 3, 4, 5]   # min-id representative of the A family

    out2 = str(tmp_path / "near")
    assert main(["dedup", src, "-o", out2, "--mode", "near",
                 "--threshold", "0.8"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # near mode also folds the exact A-copies (J = 1) and the B pair
    assert rep["removed"] >= 3
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{out2}/*.parquet' ORDER BY doc_id").fetchall()]
    assert 0 in ids and 3 in ids and 5 in ids
    assert 4 not in ids   # B' folded into B's cluster


@pytest.mark.usefixtures("ray_session")
def test_dedup_derived_string_ids(tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "url": pa.array([f"https://ex.com/{i}" for i in range(4)],
                        pa.string()),
        "text": pa.array(["same body"] * 3 + ["other"], pa.string()),
    })
    src = str(tmp_path / "urls.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "out")
    assert main(["dedup", src, "-o", out, "--id-col", "url"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["derived_ids"] is True
    assert rep["rows_out"] == 2 and rep["removed"] == 2


@pytest.mark.usefixtures("ray_session")
def test_clean_writes_cleaned_text(tmp_path, capsys):
    import json

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    stop_pad = "the and is of to in a " * 6          # passes the C4 gate
    good = stop_pad + "alpha words body mail me at a@b.com now"
    dup_span = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"       # shared 8-gram run
    texts = [good, good,                              # exact dup pair
             stop_pad + dup_span + " left tail",      # shares the span
             stop_pad + dup_span + " right tail",
             "short"]                                 # gate-killed
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "clean")
    assert main(["clean", src, "-o", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_in"] == 5 and rep["after_dedup"] == 4
    assert rep["after_gate"] == 3 and rep["rows_out"] == 3
    assert rep["tokens_cut"] > 0                      # span surgery fired
    got = duckdb.sql(
        f"SELECT text_clean FROM '{out}/*.parquet' ORDER BY doc_id").df()
    assert "<EMAIL>" in got["text_clean"].iloc[0]     # PII scrub applied
    assert "a@b.com" not in got["text_clean"].iloc[0]


@pytest.mark.usefixtures("ray_session")
def test_clean_all_rows_gated(tmp_path, capsys):
    """Every doc fails the quality gate: the empty-survivors path must
    write a typed empty shard, not crash (round-4g review catch)."""
    import json

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["short", "tiny"], pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "clean")
    assert main(["clean", src, "-o", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"rows_in": 2, "after_dedup": 2, "after_gate": 0,
                   "rows_out": 0, "tokens_cut": 0, "derived_ids": False}
    got = duckdb.sql(f"SELECT * FROM '{out}/*.parquet'").df()
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "text_clean", "n_cut"]


@pytest.mark.usefixtures("ray_session")
def test_dedup_repeated_ids_warn(tmp_path, capsys):
    """Repeated id values flip id_unique and warn (min-id keep is
    per-id; rows sharing an id travel together)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array([1, 1, 2], pa.int64()),
        "text": pa.array(["a a a", "b b b", "a a a"], pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "dd")
    assert main(["dedup", src, "-o", out]) == 0
    err = capsys.readouterr()
    rep = json.loads(err.out.strip().splitlines()[-1])
    assert rep["id_unique"] is False
    assert "repeated values" in err.err


@pytest.mark.usefixtures("ray_session")
def test_dedup_ngram_and_simhash_modes(tmp_path, capsys):
    """All four blocking strategies feed the same CC keep rule; on an
    obvious near-dup pair every mode folds it."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    # 200-token docs: one replaced token keeps simhash hamming <= 3
    # (measured 2) while n-gram Jaccard stays >= 0.8
    base = " ".join(f"tok{i}" for i in range(200))
    texts = [base, base.replace("tok5", "tokX", 1),
             "completely different words here"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    for mode in ("ngram", "simhash"):
        out = str(tmp_path / mode)
        assert main(["dedup", src, "-o", out, "--mode", mode]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["removed"] == 1 and rep["rows_out"] == 2, mode


@pytest.mark.usefixtures("ray_session")
def test_quantile_any_column(tmp_path, capsys):
    """The quantile subcommand matches DuckDB's quantile_cont exactly on
    an int column (cast to double) with NULLs present."""
    import json

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [5, 1, None, 9, 3, 7, None, 2]
    tbl = pa.table({"x": pa.array(vals, pa.int64())})
    src = str(tmp_path / "t.parquet")
    pq.write_table(tbl, src)
    assert main(["quantile", src, "--col", "x", "-q", "0.5,0.9"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_valid"] == 6
    d = duckdb.sql(
        f"SELECT quantile_cont(CAST(x AS DOUBLE), 0.5), "
        f"quantile_cont(CAST(x AS DOUBLE), 0.9) FROM '{src}'").fetchone()
    assert repr(rep["quantiles"]["0.5"]) == repr(d[0])
    assert repr(rep["quantiles"]["0.9"]) == repr(d[1])

    # bad input handling
    assert main(["quantile", src, "--col", "nope"]) == 1
    assert main(["quantile", src, "--col", "x", "-q", "1.5"]) == 1


@pytest.mark.usefixtures("ray_session")
def test_search_bm25(tmp_path, capsys):
    """search ranks the term-dense doc first and respects -k; string ids
    ride through the derived-id mapping."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "url": pa.array([f"u{i}" for i in range(4)], pa.string()),
        "text": pa.array(["alpha beta beta", "beta", "gamma delta",
                          "alpha alpha beta"], pa.string()),
    })
    src = str(tmp_path / "c.parquet")
    pq.write_table(tbl, src)
    assert main(["search", src, "--query", "alpha beta", "-k", "2",
                 "--id-col", "url"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rep = json.loads(out[-1])
    assert rep["hits"] == 2
    first = out[0].split()
    assert first[1] in ("u0", "u3")   # the two alpha+beta docs win
    assert main(["search", src, "--query", "   "]) == 1


@pytest.mark.usefixtures("ray_session")
def test_hot_heavy_hitters(tmp_path, capsys):
    """hot finds the planted heavy token with its exact count over a
    wide vocabulary (MG compression engaged), and validates k > denom."""
    import json
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(9)
    texts = []
    for _ in range(50):
        toks = [f"w{rng.randrange(300)}" for _ in range(20)] + ["hot"] * 25
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    tbl = pa.table({"body": pa.array(texts, pa.string())})
    src = str(tmp_path / "t.parquet")
    pq.write_table(tbl, src)
    assert main(["hot", src, "--col", "body", "--denom", "40"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rep = json.loads(out[-1])
    assert rep["hitters"] == 1                      # only the plant
    assert out[0].split()[-1] == "hot"
    assert int(out[0].split()[0]) == 50 * 25        # exact count
    assert main(["hot", src, "--col", "body", "--denom", "64",
                 "-k", "63"]) == 1                  # k+1 <= denom rejected
