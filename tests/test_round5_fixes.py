"""Round-5 ADVICE regressions: NULL-key / NULL-value semantics in the
events family, pinned against live DuckDB oracles on hand-built nullable
tables (the synthetic testdata is non-null, so the sf gate can't catch
these), plus the overlapping-comment-terminator tokenizer fix.

- events_value_median_by_type: a NULL event_type group must get DuckDB's
  real quantile_cont over its non-null values (equality `et == None`
  never matches, which previously fed the radix selection zero counts
  and produced a garbage f64_from_key median).
- events_watermark_drops: a NULL ts encodes as NaT == the _SENT
  sentinel; SQL's `ts < hw - INTERVAL` is NULL (excluded) for those
  rows, so they must count in n_events but never in n_dropped.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

_BASE = dt.datetime(2024, 3, 1)


def _events_table(rows) -> pa.Table:
    """rows: (event_id, seconds_or_None, event_type_or_None, value_or_None)."""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [None if r[1] is None else _BASE + dt.timedelta(seconds=r[1])
             for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1 + (r[0] % 3) for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })


def _run_both(query_name: str, tbl: pa.Table):
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        ray_df = entrymod.queries()[query_name]("fuzz")
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    con.register("events", tbl)
    sql_df = con.execute(entrymod.oracle_sql()[query_name]).df()
    con.close()
    return ray_df, sql_df


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    key = df.astype(object).where(df.notnull(), None).astype(str)
    order = key.sort_values(list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, name: str):
    a, b = _canon(a), _canon(b)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} != {len(b)}"
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            if pd.isnull(x) and pd.isnull(y):
                continue
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12), \
                    f"{name}.{col}[{i}]: {x!r} != {y!r}"
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.usefixtures("ray_session")
class TestNullableEvents:
    def test_median_by_type_null_group(self):
        # NULL event_type group with real values (odd count), a normal
        # group, and a group whose values are ALL NULL (median = NaN)
        rows = [
            (0, 10, None, 5.0),
            (1, 20, None, 1.0),
            (2, 30, None, 9.0),
            (3, 40, "click", 2.0),
            (4, 50, "click", 4.0),
            (5, 60, "view", None),
            (6, 70, "view", None),
            (7, 80, None, None),  # null value inside the NULL group
        ]
        ray_df, sql_df = _run_both(
            "events_value_median_by_type", _events_table(rows))
        _assert_frames_equal(ray_df, sql_df, "median_by_type")
        # the NULL group's median must be the real 5.0, not garbage
        null_row = ray_df[ray_df["event_type"].isnull()]
        assert len(null_row) == 1
        assert float(null_row["median"].iloc[0]) == 5.0

    def test_median_by_type_null_group_even(self):
        rows = [
            (0, 10, None, 2.0),
            (1, 20, None, 8.0),
            (2, 30, "click", 1.0),
        ]
        ray_df, sql_df = _run_both(
            "events_value_median_by_type", _events_table(rows))
        _assert_frames_equal(ray_df, sql_df, "median_by_type_even")
        null_row = ray_df[ray_df["event_type"].isnull()]
        assert float(null_row["median"].iloc[0]) == 5.0

    def test_watermark_drops_null_ts(self):
        # event 2 has NULL ts AFTER a high watermark exists: SQL's
        # three-valued `ts < hw - 10min` excludes it from n_dropped but
        # count(*) keeps it in n_events. Event 3 is genuinely late.
        rows = [
            (0, 0, "click", 1.0),
            (1, 3600, "click", 1.0),
            (2, None, "click", 1.0),
            (3, 60, "click", 1.0),       # 59 min behind the watermark
            (4, 3700, "view", 1.0),
            (5, None, "view", 1.0),
        ]
        ray_df, sql_df = _run_both(
            "events_watermark_drops", _events_table(rows))
        _assert_frames_equal(ray_df, sql_df, "watermark_drops")
        click = ray_df[ray_df["event_type"] == "click"].iloc[0]
        assert int(click["n_events"]) == 4
        assert int(click["n_dropped"]) == 1  # only event 3


@pytest.mark.usefixtures("ray_session")
class TestClusterBroadcastGate:
    """VERDICT r4 item 1: the cluster-membership consumers are size-
    gated — below ``broadcast_max`` labels they broadcast via ray.put,
    above it the labels stay a Dataset and the consumers hash-join
    (left_anti / left_outer / left_semi / grouped agg). Forcing the
    gate to 0 must produce byte-identical output on the real sf0.001
    corpus (the test_salted_exchange forced-path discipline)."""

    SF = "/root/testdata/sf0.001"

    def test_forced_join_paths_match_broadcast(self):
        from pdf_parser_ray.pipelines import queries as q

        _, n = q._cluster_labels(self.SF, 0.8)
        assert n > 0, "sf0.001 must have near-dup clusters for this test"
        for fn in [q.docs_dedup_keep, q.docs_soft_dedup_weights,
                   q.docs_split_leakage_safe, q.docs_dup_rate_by_source,
                   q.docs_dup_cluster_sizes]:
            a = fn(self.SF).reset_index(drop=True)
            b = fn(self.SF, broadcast_max=0).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b), fn.__name__


class TestDimensionCollectionGate:
    """VERDICT r4 item 2 (+ the round-5 attach_dim sweep): no pipeline
    may unconditionally gather a whole big dimension on the driver.
    Predicate sites push their filter into a distributed pass
    (q5/q8/q17/q19 pattern); predicate-free dimension maps go through
    the size-gated ``rel.attach_dim`` (broadcast below 5M rows, hash
    join above), so the allowlist is now EMPTY — any new
    `rel.load(big_table).to_pandas()` site fails this gate."""

    ALLOWED: set = set()

    def test_big_dimension_to_pandas_sites_are_allowlisted(self):
        import re

        src_path = "/root/repo/pdf_parser_ray/pipelines/queries.py"
        with open(src_path) as f:
            src = f.read()
        pat = re.compile(
            r'rel\.load\(sf_dir, "(?:part|supplier|customer|orders|'
            r'lineitem)"[^)]*\)\.to_pandas\(\)')
        offenders = set()
        for m in pat.finditer(src):
            # attribute the hit to its enclosing def
            defs = [(d.start(), d.group(1)) for d in re.finditer(
                r"^def (\w+)\(", src[:m.start()], re.M)]
            offenders.add(defs[-1][1] if defs else "<module>")
        assert offenders <= self.ALLOWED, (
            f"unlisted full-dimension driver collection in: "
            f"{sorted(offenders - self.ALLOWED)}")


@pytest.mark.usefixtures("ray_session")
class TestDimAttachGate:
    """Round-5 attach_dim sweep: every predicate-free dimension map
    dispatches on the dimension row count — broadcast_merge below
    rel.DIM_BROADCAST_MAX, sentinel-hardened hash join above. Forcing
    the gate to 0 must produce identical output on the real sf0.001
    tables for a representative cut of the 13 converted pipelines."""

    SF = "/root/testdata/sf0.001"

    def test_forced_join_path_matches_broadcast(self):
        import pdf_parser_ray.pipelines.relational as rel
        from pdf_parser_ray.pipelines import queries as q

        fns = [q.q5_nation_revenue, q.q7_trade_volume,
               q.segment_order_stats, q.q14_promo_share,
               q.customer_decile_by_nation, q.part_type_supplier_counts]
        base = {f.__name__: f(self.SF).reset_index(drop=True)
                for f in fns}
        old = rel.DIM_BROADCAST_MAX
        rel.DIM_BROADCAST_MAX = 0
        try:
            for f in fns:
                forced = f(self.SF).reset_index(drop=True)
                pd.testing.assert_frame_equal(base[f.__name__], forced)
        finally:
            rel.DIM_BROADCAST_MAX = old


@pytest.mark.usefixtures("ray_session")
class TestAttachDimUnit:
    def _io(self):
        import ray.data

        fact = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 2], pa.int64()),
            "v": pa.array([10, 20, 30, 40], pa.int64())}))
        dim = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "name": pa.array(["a", "b"])}))
        fs = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        ds_ = pa.schema([("k", pa.int64()), ("name", pa.string())])
        return fact, dim, fs, ds_

    @pytest.mark.parametrize("bmax", [10**9, 0])
    def test_inner_and_left(self, bmax):
        import pdf_parser_ray.pipelines.relational as rel

        fact, dim, fs, ds_ = self._io()
        inner = rel.attach_dim(fact, dim, on="k", dim_count=2,
                               fact_schema=fs, dim_schema=ds_,
                               broadcast_max=bmax).to_pandas()
        assert sorted(inner["v"].tolist()) == [10, 20, 40]
        left = rel.attach_dim(fact, dim, on="k", dim_count=2,
                              fact_schema=fs, dim_schema=ds_,
                              how="left", broadcast_max=bmax).to_pandas()
        assert len(left) == 4
        row3 = left[left["v"] == 30].iloc[0]
        assert pd.isnull(row3["name"])

    @pytest.mark.parametrize("bmax", [10**9, 0])
    def test_empty_dim(self, bmax):
        import ray.data

        import pdf_parser_ray.pipelines.relational as rel

        fact, _, fs, ds_ = self._io()
        empty = ray.data.from_arrow(ds_.empty_table())
        inner = rel.attach_dim(fact, empty, on="k", dim_count=0,
                               fact_schema=fs, dim_schema=ds_,
                               broadcast_max=bmax).to_pandas()
        assert len(inner) == 0


@pytest.mark.usefixtures("ray_session")
class TestLocalTopkTreeMerge:
    """VERDICT r4 item 4: local_topk tree-merges candidates (64 sets
    per merge batch) instead of concatenating <=k rows per block on the
    driver. Forcing driver_max=k exercises the merge levels; the result
    must equal the unforced path."""

    def test_forced_merge_levels_match(self):
        import ray.data

        import pdf_parser_ray.pipelines.relational as rel

        tbl = pa.table({
            "v": pa.array([(i * 37) % 1000 for i in range(5000)],
                          pa.int64()),
            "id": pa.array(range(5000), pa.int64())})
        ds = ray.data.from_arrow(tbl).repartition(50)
        keys = [("v", "descending"), ("id", "ascending")]
        a = rel.local_topk(ds, keys, 10).reset_index(drop=True)
        b = rel.local_topk(ds, keys, 10,
                           driver_max=10).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 10
        assert a["v"].iloc[0] == 999


@pytest.mark.usefixtures("ray_session")
class TestIntervalJoinHotBucketSalt:
    """VERDICT r4 item 8: a calendar-hot bucket (flash-crowd hour) is
    salted — intervals split across S = ceil(n/hot_bucket_max) salt
    replicas, points fan to every salt. Forcing a tiny hot_bucket_max
    must produce the same joined rows as the unsalted path, and the
    salt plan must bound per-(bucket,salt) interval counts."""

    def _data(self):
        import ray.data

        # one hot bucket (0..999 at width 1000): 300 intervals covering
        # it; a cold bucket at 5000 with 3 intervals
        st = [0] * 300 + [5000, 5100, 5200]
        en = [999] * 300 + [5050, 5150, 5250]
        ivals = pa.table({
            "iv_id": pa.array(range(len(st)), pa.int64()),
            "st": pa.array(st, pa.int64()),
            "en": pa.array(en, pa.int64())})
        pts = pa.table({
            "pt_id": pa.array(range(40), pa.int64()),
            "t": pa.array([i * 25 for i in range(40)], pa.int64())})
        return (ray.data.from_arrow(pts).repartition(4),
                ray.data.from_arrow(ivals).repartition(4))

    def _run(self, hot_bucket_max):
        import pdf_parser_ray.pipelines.relational as rel

        pts, ivals = self._data()
        p_schema = pa.schema([("pt_id", pa.int64()), ("t", pa.int64())])
        i_schema = pa.schema([("iv_id", pa.int64()), ("st", pa.int64()),
                              ("en", pa.int64())])
        out = rel.interval_point_join(
            pts, ivals, point_key="t", start_key="st", end_key="en",
            bucket_width=1000, point_schema=p_schema,
            interval_schema=i_schema, num_partitions=2,
            hot_bucket_max=hot_bucket_max).to_pandas()
        return (out[["pt_id", "iv_id", "t", "st", "en"]]
                .sort_values(["pt_id", "iv_id"], kind="mergesort")
                .reset_index(drop=True))

    def test_salted_matches_unsalted(self):
        cold = self._run(hot_bucket_max=10**9)
        hot = self._run(hot_bucket_max=50)  # forces S=6 on the hot bucket
        pd.testing.assert_frame_equal(cold, hot)
        # every point in the hot bucket (40 points at t<1000) matches
        # all 300 covering intervals
        assert len(cold) == 40 * 300

    def test_salt_plan_bounds_in_bucket_count(self):
        import pdf_parser_ray.pipelines.relational as rel

        counts = pd.DataFrame({"bucket": [0, 5], "n": [300, 3]})
        plan = rel._salt_plan(counts, hot_bucket_max=50, max_salt=256)
        assert plan == {0: 6}
        # ceil(n/S) <= hot_bucket_max
        assert -(-300 // plan[0]) <= 50
        # the cap bites for pathological buckets
        counts = pd.DataFrame({"bucket": [1], "n": [10**9]})
        assert rel._salt_plan(counts, 50, 256) == {1: 256}


def _span(text, x0, y0, x1, y1):
    return {"text": text, "bbox": [x0, y0, x1, y1],
            "font": "Times-Roman", "size": 11.0, "flags": 0, "color": 0}


def _cell_block(texts_boxes):
    lines = [{"bbox": list(b), "spans": [_span(t, *b)]}
             for t, b in texts_boxes]
    xs = [b[0] for _, b in texts_boxes] + [b[2] for _, b in texts_boxes]
    ys = [b[1] for _, b in texts_boxes] + [b[3] for _, b in texts_boxes]
    return {"type": 0, "bbox": [min(xs), min(ys), max(xs), max(ys)],
            "lines": lines}


class TestRuledLineTableDetector:
    """VERDICT r4 item 3: native ruled-line detection (the pdfplumber
    lines-strategy analog, detector.py:119-163) over the page-dict
    ``drawings`` payload. A page with drawn rules must produce the SAME
    table dict the equivalent fixture-payload page does — both arrival
    paths share table_from_payload."""

    # 3 rows x 2 cols: x rules 100/200/300, y rules 100/120/140/160
    DATA = [["Name", "Value"], ["Item1", "100"], ["Item2", "200"]]

    def _spans(self):
        out = []
        for r, row in enumerate(self.DATA):
            for c, text in enumerate(row):
                x0 = 105 + c * 100
                y0 = 105 + r * 20
                out.append((text, (x0, y0, x0 + 40, y0 + 10)))
        return out

    def _page_payload(self):
        return {"width": 612.0, "height": 792.0, "page_number": 1,
                "blocks": [_cell_block(self._spans())],
                "tables": [{"bbox_topleft": [100.0, 100.0, 300.0, 160.0],
                            "data": self.DATA}]}

    def _page_drawn(self, jitter=0.0, as_rect_frame=False):
        d = []
        if as_rect_frame:
            d.append({"type": "rect", "bbox": [100, 100, 300, 160]})
            inner_y, inner_x = [120, 140], [200]
        else:
            inner_y = [100, 120, 140, 160]
            inner_x = [100, 200, 300]
        for y in inner_y:
            d.append({"type": "line", "p0": [100, y + jitter],
                      "p1": [300, y]})
        for x in inner_x:
            d.append({"type": "line", "p0": [x + jitter, 100],
                      "p1": [x, 160]})
        return {"width": 612.0, "height": 792.0, "page_number": 1,
                "blocks": [_cell_block(self._spans())],
                "drawings": d}

    def test_detected_table_matches_payload_path(self):
        from pdf_parser_ray.functions import layout

        a = layout.analyze_page(1, self._page_payload())
        b = layout.analyze_page(1, self._page_drawn())
        assert len(a["tables"]) == len(b["tables"]) == 1
        ta, tb = a["tables"][0], b["tables"][0]
        assert ta["ascii"] == tb["ascii"]
        assert [c["text"] for c in ta["cells"]] == \
            [c["text"] for c in tb["cells"]]
        assert ta["has_header"] == tb["has_header"]
        assert tuple(ta["box"]) == tuple(tb["box"])
        # text blocks inside the table region are claimed on both paths
        assert len(a["blocks"]) == len(b["blocks"])

    def test_rect_frame_and_snap_jitter(self):
        from pdf_parser_ray.functions import layout

        base = layout.analyze_page(1, self._page_drawn())
        for page in (self._page_drawn(jitter=2.0),
                     self._page_drawn(as_rect_frame=True)):
            out = layout.analyze_page(1, page)
            assert len(out["tables"]) == 1
            assert out["tables"][0]["ascii"] == base["tables"][0]["ascii"]

    def test_noise_drawings_no_false_positive(self):
        from pdf_parser_ray.functions import layout

        page = {"width": 612.0, "height": 792.0, "page_number": 1,
                "blocks": [_cell_block(self._spans())],
                "drawings": [
                    {"type": "line", "p0": [50, 400], "p1": [500, 400]},
                    {"type": "line", "p0": [10, 10], "p1": [30, 30]},
                    {"not": "a drawing"},
                ]}
        out = layout.analyze_page(1, page)
        assert out["tables"] == []

    @pytest.mark.usefixtures("ray_session")
    def test_cli_analyze_shows_detected_table(self, tmp_path, capsys):
        import json

        import pyarrow.parquet as pq

        from pdf_parser_ray.cli import main

        bundle = {"pages": [self._page_drawn()],
                  "metadata": {"title": "t", "author": "a"}}
        tbl = pa.table({
            "url": pa.array(["https://x.org/d/1.pdf"]),
            "warc_ts": pa.array([dt.datetime(2024, 1, 1)],
                                pa.timestamp("us")),
            "html": pa.array([json.dumps(bundle).encode()], pa.binary()),
            "text": pa.array(["ignored"]),
            "lang": pa.array(["en"])})
        path = str(tmp_path / "one.parquet")
        pq.write_table(tbl, path)
        assert main(["analyze", path, "--url",
                     "https://x.org/d/1.pdf"]) == 0
        assert "tables: 1" in capsys.readouterr().out


class TestCommentTerminatorRegression:
    def test_overlapping_closer_is_not_terminator(self):
        from pdf_parser_ray.functions.htmlstrip import (
            _TreeBuilder, _fast_tree)

        def twin(raw):
            b = _TreeBuilder()
            b.feed(raw)
            b.close()
            return b.root

        def flat(n):
            return [c if isinstance(c, str) else (c.tag, flat(c))
                    for c in n.children]

        for s in ["<!-->", "<!--->", "<!---->", "<!-->tail",
                  "<p><!-->x</p>", "<!--->x-->", "<!----->",
                  "<!-- ok --><p>after</p>"]:
            assert flat(_fast_tree(s)) == flat(twin(s)), s


@pytest.mark.usefixtures("ray_session")
class TestDetectLangAtExtraction:
    """Round 5: opt-in language-ID pass over the EXTRACTED text —
    pred_lang must match the standalone langid kernel on the same
    strings, on both the pure-map and explode paths, and the default
    output schema stays unchanged."""

    def _corpus(self, tmp_path):
        import pyarrow.parquet as pq

        from pdf_parser_ray.sources import synth

        path = str(tmp_path / "pages.parquet")
        pq.write_table(synth.corpus_table(30, seed=5), path)
        return path

    def test_pred_lang_matches_kernel(self, tmp_path):
        from pdf_parser_ray.pipelines.extraction import extract_paths
        from pdf_parser_ray.stages.text import lang_pred_array

        path = self._corpus(tmp_path)
        base = extract_paths([path]).to_pandas()
        assert "pred_lang" not in base.columns  # default schema unchanged
        out = extract_paths([path], detect_lang=True).to_pandas()
        assert "pred_lang" in out.columns
        want = lang_pred_array(pa.array(out["text"].tolist(),
                                        pa.string())).to_pylist()
        assert out["pred_lang"].tolist() == want
        assert set(out["pred_lang"]) <= {"en", "de", "fr", "es", "unknown"}

    def test_explode_path_identical(self, tmp_path):
        from pdf_parser_ray.pipelines.extraction import extract_paths

        path = self._corpus(tmp_path)
        a = extract_paths([path], detect_lang=True).to_pandas()
        b = extract_paths([path], detect_lang=True,
                          explode_threshold=0).to_pandas()
        a = a.sort_values("url").reset_index(drop=True)
        b = b.sort_values("url").reset_index(drop=True)
        assert a["pred_lang"].tolist() == b["pred_lang"].tolist()
        assert a["text"].tolist() == b["text"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestQualitySignalsAtExtraction:
    def test_columns_match_kernel(self, tmp_path):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.extraction import extract_paths
        from pdf_parser_ray.sources import synth
        from pdf_parser_ray.stages.text import quality_signal_columns

        path = str(tmp_path / "pages.parquet")
        pq.write_table(synth.corpus_table(20, seed=9), path)
        out = extract_paths([path], quality_signals=True,
                            detect_lang=True).to_pandas()
        for col in ("n_tokens", "alpha_ratio", "stop_ratio", "pred_lang"):
            assert col in out.columns
        want = dict(quality_signal_columns(
            pa.array(out["text"].tolist(), pa.string())))
        assert out["n_tokens"].tolist() == want["n_tokens"].to_pylist()
        assert out["alpha_ratio"].tolist() == \
            want["alpha_ratio"].to_pylist()
        # stats_batch (the oracled docs profile kernel) shares the
        # kernel, so the oracle gate transitively certifies this pass
