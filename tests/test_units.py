"""Unit tests in the spirit of the reference suite (SURVEY.md §5.1:
bbox geometry, table structures, ASCII conversion) plus this engine's own
kernels (text stats, sketches, HTML stripping against committed goldens)."""

from __future__ import annotations

import json
import os

import pytest

from pdf_parser_ray.functions import geometry as g
from pdf_parser_ray.functions import sketches, tables, textstats
from pdf_parser_ray.functions.htmlstrip import strip_html
from pdf_parser_ray.functions.num import round_half_away

HERE = os.path.dirname(os.path.abspath(__file__))


class TestGeometry:
    def test_box_validation(self):
        with pytest.raises(ValueError):
            g.box(10, 0, 5, 5)
        with pytest.raises(ValueError):
            g.box(0, 10, 5, 5)
        assert g.box(1, 2, 3, 4) == (1.0, 2.0, 3.0, 4.0)

    def test_dims(self):
        b = g.box(10, 20, 30, 50)
        assert g.width(b) == 20 and g.height(b) == 30
        assert g.center_x(b) == 20 and g.center_y(b) == 35

    def test_intersects_touching_edges_count(self):
        # closed-interval semantics (models.py:86-93)
        assert g.intersects((0, 0, 10, 10), (10, 10, 20, 20))
        assert not g.intersects((0, 0, 10, 10), (11, 0, 20, 10))

    def test_h_overlap_frac(self):
        assert g.h_overlap_frac((0, 0, 10, 1), (5, 0, 15, 1)) == 0.5
        assert g.h_overlap_frac((0, 0, 10, 1), (20, 0, 30, 1)) == 0.0
        assert g.h_overlap_frac((0, 0, 10, 1), (2, 0, 4, 1)) == 1.0

    def test_union(self):
        assert g.union([(0, 0, 1, 1), (2, -1, 3, 5)]) == (0, -1, 3, 5)

    def test_v_aligned(self):
        assert g.v_aligned((0, 0, 1, 10), (0, 1, 1, 11))     # big overlap
        assert g.v_aligned((0, 0, 1, 10), (0, 4, 1, 14))     # centers near
        assert not g.v_aligned((0, 0, 1, 10), (0, 40, 1, 50))


class TestTables:
    SPEC = {"bbox_topleft": [72.0, 100.0, 400.0, 180.0],
            "data": [["Name", "Value"], ["alpha", "100"], ["beta", "200"]]}

    def test_payload_conversion_and_flip(self):
        t = tables.table_from_payload(self.SPEC, 792.0)
        assert t["num_rows"] == 3 and t["num_cols"] == 2
        # Q5: y flipped to bottom-left convention
        assert t["box"] == (72.0, 792.0 - 180.0, 400.0, 792.0 - 100.0)
        assert t["has_header"] is True  # numbers only below the first row

    def test_rejects_small(self):
        assert tables.table_from_payload(
            {"bbox_topleft": [0, 0, 100, 50], "data": [["only one row"]]},
            792.0) is None
        assert tables.table_from_payload(
            {"bbox_topleft": [0, 0, 5, 50],  # narrower than 2 min cells
             "data": [["a", "b"], ["c", "d"]]}, 792.0) is None

    def test_rejects_mostly_empty(self):
        spec = {"bbox_topleft": [0, 0, 100, 100],
                "data": [["x", ""], ["", ""], ["", ""]]}
        assert tables.table_from_payload(spec, 792.0) is None

    def test_ascii_shape(self):
        t = tables.table_from_payload(self.SPEC, 792.0)
        lines = t["ascii"].splitlines()
        assert lines[0].startswith("+") and lines[0].endswith("+")
        assert lines[1] == "| Name  | Value |"
        assert lines[2] == lines[0]  # header separator
        assert lines[-1] == lines[0]

    def test_ascii_wrapping_and_long_word_split(self):
        spec = {"bbox_topleft": [0, 0, 300, 100],
                "data": [["h1", "h2"],
                         ["x" * 55, "several words that will wrap eventually "
                                    "beyond forty characters"]]}
        t = tables.table_from_payload(spec, 792.0)
        body = t["ascii"]
        # width clamp at 40 + Q11 long-word split with trailing dash
        assert "x" * 39 + "-" in body
        assert all(len(line) == len(body.splitlines()[0])
                   for line in body.splitlines())

    def test_markdown_truncation(self):
        t = tables.table_from_payload(self.SPEC, 792.0)
        md = tables.render_markdown(t).splitlines()
        assert md[0] == "| Name  | Value |"
        assert md[1] == "| ----- | ----- |"


class TestTextStats:
    def test_token_count(self):
        assert textstats.token_count("a b  c\nd") == 4
        assert textstats.token_count("") == 0

    def test_alpha_ratio(self):
        assert textstats.alpha_ratio("") == 0.0
        assert textstats.alpha_ratio("ab12") == 0.5

    def test_predict_lang(self):
        assert textstats.predict_lang("the cat and the hat") == "en"
        assert textstats.predict_lang("der hund und die katze ist") == "de"
        assert textstats.predict_lang("xyzzy qwerty") == "unknown"

    def test_fingerprint_matches_md5(self):
        import hashlib

        assert textstats.fingerprint("abc") == hashlib.md5(b"abc").hexdigest()


class TestSketches:
    def test_minhash_deterministic_and_similarity(self):
        a = "the quick brown fox jumps over the lazy dog again and again"
        b = "the quick brown fox jumps over the lazy dog again and once"
        c = "completely different words everywhere nothing shared at all"
        sa, sb, sc = (sketches.minhash(t) for t in (a, b, c))
        assert (sa == sketches.minhash(a)).all()
        assert (sa == sb).mean() > (sa == sc).mean()

    def test_lsh_band_keys(self):
        sig = sketches.minhash("some text for banding with enough words here")
        keys = sketches.lsh_band_keys(sig)
        assert len(keys) == sketches.N_BANDS
        assert keys == sketches.lsh_band_keys(sig)

    def test_simhash_hamming(self):
        a = sketches.simhash("shared words shared words shared words alpha")
        b = sketches.simhash("shared words shared words shared words beta")
        c = sketches.simhash("entirely unrelated content with other tokens")
        assert sketches.hamming64(a, b) < sketches.hamming64(a, c)

    def test_jaccard(self):
        assert sketches.jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)
        assert sketches.jaccard(set(), set()) == 1.0


class TestRounding:
    def test_half_away_matches_duckdb(self):
        import duckdb

        con = duckdb.connect()
        for v in (0.03125, -0.03125, 0.5, 1.005, 2.675, -2.675, 123.4567849):
            for d in (2, 4):
                want = con.execute(f"select round({v!r}::DOUBLE, {d})").fetchone()[0]
                assert round_half_away(v, d) == want, (v, d)


class TestHtmlStripGoldens:
    def test_committed_goldens(self):
        with open(os.path.join(HERE, "goldens_htmlstrip.json")) as f:
            goldens = json.load(f)
        assert len(goldens) >= 15
        for name, case in goldens.items():
            text, n = strip_html(case["html"])
            assert text == case["text"], name
            assert n == case["n_blocks"], name

    def test_boilerplate_dropped(self):
        text, _ = strip_html(
            "<nav><p>navigation menu with plenty of characters</p></nav>"
            "<p>Real content paragraph long enough to be retained today.</p>")
        assert "navigation" not in text
        assert "Real content" in text


class TestErrors:
    def test_hierarchy(self):
        from pdf_parser_ray.functions import errors

        assert issubclass(errors.DocumentLoadError, errors.ExtractionError)
        assert issubclass(errors.DocumentLoadError, ValueError)
        assert issubclass(errors.PageRangeError, errors.ExtractionError)
        e = errors.PageRangeError("bad page", page_number=7)
        assert "page_number=7" in str(e)
        assert e.details == {"page_number": 7}

    def test_load_bundle_raises_load_error(self):
        from pdf_parser_ray.functions import errors, layout

        for bad in (b"", b"\x00junk", b"[1,2]", b'{"nope": 1}'):
            with pytest.raises(errors.DocumentLoadError):
                layout.load_bundle(bad)


class TestJaccardVerify:
    def test_verify_candidates(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pdf_parser_ray.stages.dedup import verify_candidates_jaccard

        docs = ray.data.from_arrow(pa.table({
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "alpha beta gamma delta epsilon zeta eta iota",
                "completely different words with no overlap at all",
            ],
        }))
        out = verify_candidates_jaccard(docs, [(1, 2), (1, 3)], threshold=0.5)
        assert [(r["doc_a"], r["doc_b"]) for r in out] == [(1, 2)]
        assert 0.5 <= out[0]["jaccard"] <= 1.0


@pytest.mark.usefixtures("ray_session")
def test_interval_point_join_exactly_once():
    """An interval spanning many buckets must join a contained point
    EXACTLY once (points live in one bucket; replicas are per-bucket
    unique), and boundary containment is closed on both ends."""
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.pipelines import relational as rel

    p_schema = pa.schema([("pid", pa.int64()), ("t", pa.int64())])
    i_schema = pa.schema([("iid", pa.int64()), ("st", pa.int64()),
                          ("en", pa.int64())])
    # bucket width 10; interval 0 spans buckets 0..5, interval 1 is a
    # point-interval on a bucket boundary
    points = ray.data.from_arrow(pa.table(
        {"pid": [1, 2, 3, 4], "t": [0, 37, 55, 56]}, schema=p_schema))
    intervals = ray.data.from_arrow(pa.table(
        {"iid": [10, 20], "st": [0, 50], "en": [55, 50]}, schema=i_schema))
    out = rel.interval_point_join(
        points, intervals, point_key="t", start_key="st", end_key="en",
        bucket_width=10, point_schema=p_schema, interval_schema=i_schema,
        num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["pid", "iid"]].itertuples(index=False)))
    # pid 1 (t=0): in [0,55]; pid 2 (t=37): in [0,55]; pid 3 (t=55):
    # closed end of [0,55]; pid 4 (t=56): in nothing; [50,50] holds none
    assert got == [(1, 10), (2, 10), (3, 10)]


@pytest.mark.usefixtures("ray_session")
def test_grouped_agg_arrow_partial_matches_pandas_path():
    """The Arrow fast path in rel.grouped_agg's map-side combine must be
    row-for-row identical to the pandas path it replaces: NULL key
    groups kept (dropna=False semantics), count/sum/min/max over int,
    string, and date sources; float sources must still take the pandas
    path (order-sensitive sums stay pinned)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa

    from pdf_parser_ray.pipelines import relational as rel

    batch = pa.table({
        "k": pa.array([1, 1, None, 2, None, 2], pa.int64()),
        "s": pa.array(["b", "a", "c", "a", "d", "z"], pa.string()),
        "v": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
        "d": pa.array([dt.date(2020, 1, i + 1) for i in range(6)],
                      pa.date32()),
        "f": pa.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6], pa.float64()),
    })
    spec = [("n", "", "count"), ("sv", "v", "sum"),
            ("mn", "s", "min"), ("mx", "d", "max")]

    # reconstruct both partial fns the way grouped_agg builds them
    def run(tbl, keys, sp):
        # call the inner partial through a 1-block dataset round trip
        import ray.data

        ds = ray.data.from_arrow(tbl)
        return rel.grouped_agg(ds, keys, sp, small_result=True)

    out = run(batch, ["k"], spec)
    out = out.sort_values("k", na_position="last").reset_index(drop=True)
    assert out["n"].tolist() == [2, 2, 2]
    assert out["sv"].tolist() == [30, 100, 80]
    assert out["mn"].tolist() == ["a", "a", "c"]
    assert out["mx"].tolist() == [dt.date(2020, 1, 2), dt.date(2020, 1, 6),
                                  dt.date(2020, 1, 5)]
    assert pd.isna(out["k"].iloc[2])

    # float source -> pandas path; result identical to a manual groupby
    fout = run(batch, ["k"], [("sf", "f", "sum")])
    fout = fout.sort_values("k", na_position="last").reset_index(drop=True)
    assert fout["sf"].tolist() == pytest.approx([0.3, 1.0, 0.8])
