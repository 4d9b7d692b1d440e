"""Round-4d additions: sorted-neighborhood (SNM) dedup pairs and the
trailing-7-day rolling-WAU window.

Fuzz covers: shared-prefix near-dups (small vocab, so sort-adjacency is
real), shingle-less short docs, duplicate texts with distinct ids,
NULL-user events (rolling WAU must drop them from the count but keep
their days in the output domain), multi-day gaps, and ts ties. The
dedicated partition-invariance test forces the multi-partition SNM path
(boundary-strip stitching) and pins it to the single-partition result.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import __ray_entry__ as entrymod

_BASE = dt.datetime(2024, 3, 1)

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_DOC = st.tuples(
    st.integers(min_value=0, max_value=10_000),          # doc_id (dedup'd)
    st.lists(st.integers(min_value=0, max_value=7),      # word indices
             min_size=0, max_size=8),
)
_DOCS = st.lists(_DOC, min_size=1, max_size=20,
                 unique_by=lambda d: d[0])

# user_id may be NULL; 20-day offset span so the 7-day window slides
_EVENT = st.tuples(
    st.one_of(st.none(), st.integers(min_value=1, max_value=4)),
    st.integers(min_value=0, max_value=1_700_000),       # seconds offset
)
_EVENTS = st.lists(_EVENT, min_size=1, max_size=25)


def _docs_table(rows) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([" ".join(_VOCAB[i] for i in r[1]) for r in rows],
                         pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })


def _events_table(rows) -> pa.Table:
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(query_name: str, tbl: pa.Table, view: str) -> None:
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
    con.register(view, tbl)
    sql_df = con.execute(entrymod.oracle_sql()[query_name]).df()
    a, b = _canon(pd.DataFrame(ray_df)), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{len(a)} != {len(b)}"
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            assert x == y, f"{query_name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(rows=_DOCS)
def test_snm_pairs_fuzz(rows):
    _check("docs_snm_pairs", _docs_table(rows), "documents")


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=_EVENTS)
def test_rolling_wau_fuzz(rows):
    _check("events_rolling_wau", _events_table(rows), "events")


@pytest.mark.usefixtures("ray_session")
def test_rolling_wau_null_only_day():
    """A day whose whole trailing window holds only NULL-user events must
    appear with wau=0 (left-join semantics), not vanish."""
    rows = [(None, 0), (1, 10 * 86400)]
    out = None
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = _events_table(rows)
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        out = q.events_rolling_wau("fuzz")
    finally:
        q.rel.load = orig
    assert len(out) == 2
    assert out["wau"].tolist() == [0, 1]


@pytest.mark.usefixtures("ray_session")
def test_snm_partition_invariance():
    """Multi-partition SNM (tiny rows_per_part forces sampled boundaries
    and cross-strip stitching) must equal the single-partition result:
    the window is over the GLOBAL sort order, not per-partition."""
    import ray.data

    from pdf_parser_ray.stages import dedup

    n = 120
    rows = [(i, [(i * 5 + j) % 8 for j in range(3 + i % 4)])
            for i in range(n)]
    # salt in near-dup clusters: every 10th doc repeats its predecessor
    for i in range(10, n, 10):
        rows[i] = (rows[i][0], rows[i - 1][1])
    tbl = _docs_table(rows)

    def run(rows_per_part, sample_mod):
        ds = ray.data.from_arrow(tbl.select(["doc_id", "text"]))
        out = dedup.snm_pairs(ds, rows_per_part=rows_per_part,
                              sample_mod=sample_mod).to_pandas()
        return _canon(out)

    multi = run(rows_per_part=10, sample_mod=4)
    single = run(rows_per_part=10**9, sample_mod=4)
    assert len(multi) > 0  # the salted dups must surface
    pd.testing.assert_frame_equal(multi, single)


# ---- batch 2: incremental dedup, novelty, cross-source matrix ----------

_DOCS_SRC = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.lists(st.integers(min_value=0, max_value=7),
                 min_size=0, max_size=8),
        st.sampled_from(["web", "wiki", "books"]),
    ),
    min_size=1, max_size=20, unique_by=lambda d: d[0])


def _docs_src_table(rows) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([" ".join(_VOCAB[i] for i in r[1]) for r in rows],
                         pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })


def _check_docs(query_name: str, tbl: pa.Table) -> None:
    from pdf_parser_ray.pipelines import queries as q

    q.clear_session_caches()  # _ngram_pairs memo keys on the fake sf_dir
    try:
        _check(query_name, tbl, "documents")
    finally:
        q.clear_session_caches()


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(rows=_DOCS_SRC)
def test_incremental_dedup_fuzz(rows):
    _check_docs("docs_incremental_dedup", _docs_src_table(rows))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(rows=_DOCS_SRC)
def test_novelty_scores_fuzz(rows):
    _check_docs("docs_novelty_scores", _docs_src_table(rows))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(rows=_DOCS_SRC)
def test_cross_source_dup_matrix_fuzz(rows):
    _check_docs("docs_cross_source_dup_matrix", _docs_src_table(rows))


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_pinned():
    """Pinned semantics: an odd doc identical to an even doc is dropped;
    an odd doc identical only to another ODD doc survives (incoming
    never self-pairs); shingle-less docs always survive."""
    rows = [
        (0, [0, 1, 2, 3], "web"),   # base
        (1, [0, 1, 2, 3], "web"),   # incoming dup of base -> dropped
        (3, [4, 5, 6, 7], "web"),   # incoming, dups only doc 5 -> kept
        (5, [4, 5, 6, 7], "web"),   # incoming dup of odd 3 -> kept
        (7, [0], "web"),            # shingle-less -> kept
    ]
    _check_docs("docs_incremental_dedup", _docs_src_table(rows))
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = _docs_src_table(rows)
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        out = q.docs_incremental_dedup("fuzz2")
    finally:
        q.rel.load = orig
    assert out["doc_id"].tolist() == [3, 5, 7]
