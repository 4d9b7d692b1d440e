"""WARC source (sources/warc.py): format round-trip, corruption
tolerance, pipeline parity vs the parquet path, and the CLI front door.
"""

from __future__ import annotations

import datetime as dt
import gzip
import os

import pytest

from pdf_parser_ray.sources.warc import (
    is_warc_path,
    parse_warc_bytes,
    warc_write_bytes,
)

_TS = dt.datetime(2024, 3, 1, 12, 0, 5)


def _pages(n=5):
    return [(f"https://x.org/p/{i:04d}.html", _TS + dt.timedelta(seconds=i),
             f"<html><body><p>{'paragraph %d content ' % i * 6}"
             f"</p></body></html>".encode())
            for i in range(n)]


class TestFormat:
    @pytest.mark.parametrize("gz", [True, False])
    def test_roundtrip(self, gz):
        pages = _pages()
        blob = warc_write_bytes(pages, gzip_per_record=gz)
        recs = parse_warc_bytes(blob)
        assert len(recs) == len(pages)  # warcinfo is not a response
        for (url, ts, html), rec in zip(pages, recs):
            assert rec["url"] == url
            assert rec["warc_ts"] == ts
            assert rec["html"] == html

    def test_multi_member_gzip_is_the_cc_convention(self):
        blob = warc_write_bytes(_pages(3), gzip_per_record=True)
        # each record its own member: 4 gzip magics (warcinfo + 3)
        assert blob.count(b"\x1f\x8b\x08") >= 4

    def test_truncated_gzip_keeps_good_prefix(self):
        blob = warc_write_bytes(_pages(5), gzip_per_record=True)
        recs = parse_warc_bytes(blob[:int(len(blob) * 0.6)])
        assert 0 < len(recs) < 5
        assert recs[0]["url"].endswith("0000.html")

    def test_garbage_and_malformed_records_skip(self):
        assert parse_warc_bytes(b"") == []
        assert parse_warc_bytes(b"not a warc at all") == []
        assert parse_warc_bytes(b"\x1f\x8b\x08 corrupt") == []
        good = warc_write_bytes(_pages(2), gzip_per_record=False)
        # bad Content-Length record injected before the good stream
        bad = b"WARC/1.0\r\nWARC-Type: response\r\n" \
              b"Content-Length: nope\r\n\r\nxxxx\r\n\r\n"
        recs = parse_warc_bytes(bad + good)
        assert len(recs) == 2

    def test_non_http_payload_record(self):
        raw = b"WARC/1.0\r\nWARC-Type: response\r\n" \
              b"WARC-Target-URI: https://x.org/raw\r\n" \
              b"WARC-Date: 2024-03-01T00:00:00Z\r\n" \
              b"Content-Type: text/html\r\n" \
              b"Content-Length: 11\r\n\r\nhello world\r\n\r\n"
        recs = parse_warc_bytes(raw)
        assert recs[0]["html"] == b"hello world"

    def test_is_warc_path(self):
        assert is_warc_path("a/b.warc")
        assert is_warc_path("a/b.WARC.GZ")
        assert not is_warc_path("a/b.parquet")


@pytest.mark.usefixtures("ray_session")
class TestPipelineParity:
    def test_extract_matches_parquet_path(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.extraction import extract_paths
        from pdf_parser_ray.sources import synth

        tbl = synth.corpus_table(40, seed=11)
        pq_path = str(tmp_path / "pages.parquet")
        pq.write_table(tbl, pq_path)
        # same corpus as two WARC shards
        rows = tbl.to_pylist()
        half = len(rows) // 2
        for si, part in enumerate((rows[:half], rows[half:])):
            pages = [(r["url"], r["warc_ts"], bytes(r["html"]))
                     for r in part]
            with open(tmp_path / f"s{si}.warc.gz", "wb") as f:
                f.write(warc_write_bytes(pages))

        a = extract_paths([pq_path]).to_pandas()
        b = extract_paths([str(tmp_path / "s0.warc.gz"),
                           str(tmp_path / "s1.warc.gz")]).to_pandas()
        a = a.sort_values("url").reset_index(drop=True)
        b = b.sort_values("url").reset_index(drop=True)
        assert a["url"].tolist() == b["url"].tolist()
        # byte-identical extracted text per url — the north-rule invariant
        assert a["text"].tolist() == b["text"].tolist()
        assert a["markdown"].tolist() == b["markdown"].tolist()

    def test_mixed_sources_rejected(self, tmp_path):
        from pdf_parser_ray.functions.errors import ConfigurationError
        from pdf_parser_ray.pipelines.extraction import extract_paths

        with pytest.raises(ConfigurationError):
            extract_paths(["a.parquet", "b.warc.gz"])


@pytest.mark.usefixtures("ray_session")
class TestCli:
    def test_synth_warc_then_parse(self, tmp_path, capsys):
        from pdf_parser_ray.cli import main

        corpus = str(tmp_path / "warc_corpus")
        out = str(tmp_path / "out")
        assert main(["synth", "60", "-o", corpus, "--format", "warc",
                     "--warc-shards", "3"]) == 0
        shards = sorted(os.listdir(corpus))
        assert len(shards) == 3 and shards[0].endswith(".warc.gz")
        args = ["parse"] + [os.path.join(corpus, s) for s in shards] + \
            ["-o", out]
        assert main(args) == 0
        summary = capsys.readouterr().out.strip().splitlines()[-1]
        import json

        s = json.loads(summary)
        assert s["rows"] == 60
        # resume skips completed partitions
        assert main(args) == 0
        s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert s2["parts_skipped"] == s2["parts_total"]


@pytest.mark.usefixtures("ray_session")
class TestReviewCatches:
    def test_pdf_column_rejected_on_warc_input(self):
        from pdf_parser_ray.functions.errors import ConfigurationError
        from pdf_parser_ray.pipelines.extraction import extract_paths

        with pytest.raises(ConfigurationError):
            extract_paths(["a.warc.gz"], pdf_column="pdf")
        with pytest.raises(ConfigurationError):
            extract_paths(["a.warc.gz"], password="x")

    def test_urldedup_over_warc_shards(self, tmp_path, capsys):
        import json

        from pdf_parser_ray.cli import main
        from pdf_parser_ray.sources.warc import warc_write_bytes

        # two spellings of one page + one distinct page
        pages = [("https://x.org/a?utm_source=z", _TS, b"<p>a</p>"),
                 ("https://x.org/a", _TS, b"<p>a</p>"),
                 ("https://x.org/b", _TS, b"<p>b</p>")]
        shard = tmp_path / "s.warc.gz"
        shard.write_bytes(warc_write_bytes(pages))
        out = str(tmp_path / "kept")
        assert main(["urldedup", str(shard), "-o", out]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows_in"] == 3 and rep["rows_out"] == 2

    def test_analyze_over_warc(self, tmp_path, capsys):
        from pdf_parser_ray.cli import main
        from pdf_parser_ray.sources.warc import warc_write_bytes

        pages = [("https://x.org/doc.html", _TS,
                  b"<html><body><p>" + b"real content words here " * 4
                  + b"</p></body></html>")]
        shard = tmp_path / "a.warc.gz"
        shard.write_bytes(warc_write_bytes(pages))
        assert main(["analyze", str(shard),
                     "--url", "https://x.org/doc.html"]) == 0
        out = capsys.readouterr().out
        assert "html document" in out

    def test_urldedup_parallelism_invariant(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from pdf_parser_ray.stages.dedup import url_dedup

        tbl = pa.table({
            "url": pa.array([f"https://x.org/{i % 7}?utm_source={i}"
                             for i in range(40)]),
            "v": pa.array(range(40), pa.int64())})
        outs = []
        for nparts in (1, 3, 8):
            ds = ray.data.from_arrow(tbl).repartition(nparts)
            df = url_dedup(ds).to_pandas().sort_values("url") \
                .reset_index(drop=True)
            outs.append(df)
        import pandas as pd

        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], outs[2])
        assert len(outs[0]) == 7

    def test_warc_explode_path_parity(self, tmp_path):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.extraction import extract_paths
        from pdf_parser_ray.sources import synth
        from pdf_parser_ray.sources.warc import warc_write_bytes

        tbl = synth.corpus_table(20, seed=13)
        pq_path = str(tmp_path / "p.parquet")
        pq.write_table(tbl, pq_path)
        rows = tbl.to_pylist()
        with open(tmp_path / "w.warc.gz", "wb") as f:
            f.write(warc_write_bytes(
                [(r["url"], r["warc_ts"], bytes(r["html"]))
                 for r in rows]))
        a = extract_paths([pq_path], explode_threshold=0).to_pandas()
        b = extract_paths([str(tmp_path / "w.warc.gz")],
                          explode_threshold=0).to_pandas()
        a = a.sort_values("url").reset_index(drop=True)
        b = b.sort_values("url").reset_index(drop=True)
        assert a["text"].tolist() == b["text"].tolist()


class TestWarcFuzz:
    """parse_warc_bytes is TOTAL: arbitrary bytes (including adversarial
    header fragments) never raise and never loop — the round-5
    negative-Content-Length hang, generalized into a property."""

    def test_total_over_garbage(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pdf_parser_ray.sources.warc import parse_warc_bytes

        frag = st.one_of(
            st.binary(max_size=40),
            st.sampled_from([
                b"WARC/1.0\r\n", b"Content-Length: ", b"-999", b"1e9",
                b"\r\n\r\n", b"WARC-Type: response\r\n",
                b"WARC-Target-URI: u\r\n",
                b"WARC-Date: 2024-01-01T00:00:00Z\r\n",
                b"\x1f\x8b\x08", b"WARC/"]))

        @settings(max_examples=300, deadline=None)
        @given(parts=st.lists(frag, max_size=8))
        def prop(parts):
            out = parse_warc_bytes(b"".join(parts))
            assert isinstance(out, list)

        prop()

    def test_roundtrip_survives_any_payload_bytes(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pdf_parser_ray.sources.warc import (
            parse_warc_bytes, warc_write_bytes)

        @settings(max_examples=100, deadline=None)
        @given(payloads=st.lists(st.binary(max_size=64), min_size=1,
                                 max_size=4))
        def prop(payloads):
            pages = [(f"https://x.org/{i}", _TS, b)
                     for i, b in enumerate(payloads)]
            recs = parse_warc_bytes(warc_write_bytes(pages))
            assert [r["html"] for r in recs] == payloads

        prop()
