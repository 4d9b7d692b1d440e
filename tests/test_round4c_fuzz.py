"""Property-based SQL parity for the round-4c additions: rolling median
(order-statistic window), churn snapshot diff (full-outer shape),
purchase-day streaks (gaps-and-islands), and the KMV bottom-k sample
quantile sketch. Fuzz covers timestamp ties, single-event users, empty
purchase slices, cutoff-boundary hits, and the k-binding sample path the
tiny draws can't reach (dedicated 1000-doc test).
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

# ~23-day span so the 14-day churn cutoff and multi-day streaks both bind
_EVENT = st.tuples(
    st.integers(min_value=1, max_value=3),            # user_id
    st.integers(min_value=0, max_value=2_000_000),    # seconds offset
    st.sampled_from(["click", "error", "purchase"]),
    st.integers(min_value=0, max_value=9999),         # value cents
)
_EVENTS = st.lists(_EVENT, min_size=1, max_size=25)

_DOC = st.tuples(
    st.integers(min_value=0, max_value=10_000),       # doc_id (dedup'd)
    st.integers(min_value=0, max_value=100_000),      # n_chars
)
_DOCS = st.lists(_DOC, min_size=1, max_size=25,
                 unique_by=lambda d: d[0])


def _events_table(rows) -> pa.Table:
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] / 100.0 for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })


def _docs_table(rows) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["x"] * len(rows), pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([r[1] for r in rows], pa.int64()),
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
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_rolling_median_fuzz(rows):
    _check("events_rolling_median", _events_table(rows), "events")


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_churn_diff_fuzz(rows):
    _check("events_user_churn_diff", _events_table(rows), "events")


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_purchase_streaks_fuzz(rows):
    _check("events_purchase_streaks", _events_table(rows), "events")


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_DOCS)
def test_sample_quantiles_fuzz(rows):
    _check("docs_sample_quantiles", _docs_table(rows), "documents")


@pytest.mark.usefixtures("ray_session")
def test_sample_quantiles_k_binds():
    """1000 docs > k=256: the bottom-k sample is a strict subset, so this
    exercises the per-batch top-k merge path the tiny fuzz draws skip."""
    rows = [(i * 7 % 1009, (i * 37) % 5000) for i in range(1000)]
    rows = list({r[0]: r for r in rows}.values())
    assert len(rows) > 256
    _check("docs_sample_quantiles", _docs_table(rows), "documents")


@pytest.mark.usefixtures("ray_session")
def test_rolling_median_window_semantics():
    """Pinned example: quantile_disc ceil-rank on warmup windows
    (n=1..5) — lower-middle for even n, middle for odd n."""
    rows = [(1, i * 60, "click", c) for i, c in
            enumerate([500, 100, 300, 200, 400])]
    tbl = _events_table(rows)
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        out = entrymod.queries()["events_rolling_median"]("fuzz")
    finally:
        q.rel.load = orig
    got = list(out.sort_values("event_id")["med5"])
    # windows: [5] [5,1] [5,1,3] [5,1,3,2] [5,1,3,2,4]
    assert got == [5.0, 1.0, 3.0, 2.0, 3.0]
