"""Property-based SQL parity for the events window/join family: the
as-of join, the trailing-window interval join, sessionization, and the
cohort matrix must match their DuckDB oracles on ARBITRARY small event
tables — timestamp ties, single-event users, empty event-type slices and
window-boundary hits included (the fixed testdata can't cover those).

Domain note: user_id is generated non-null — the testdata has no null
users, and the null-dropping pipelines (cohort, HLL, distinct) pin their
null semantics in dedicated tests.
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

_EVENT = st.tuples(
    st.integers(min_value=1, max_value=3),            # user_id
    st.integers(min_value=0, max_value=350_000),      # seconds offset
    st.sampled_from(["click", "error", "view", "purchase"]),
    st.integers(min_value=0, max_value=9999),         # value cents
)
_EVENTS = st.lists(_EVENT, min_size=1, max_size=25)


def _table(rows) -> pa.Table:
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] / 100.0 for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(query_name: str, rows) -> None:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = _table(rows)
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
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{len(a)} != {len(b)}"
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            assert x == y, f"{query_name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_interval_join_fuzz(rows):
    _check("events_error_click_window", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_asof_join_fuzz(rows):
    _check("events_asof_click", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_sessions_fuzz(rows):
    _check("events_sessions", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_cohort_retention_fuzz(rows):
    _check("events_cohort_retention", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_funnel_fuzz(rows):
    _check("events_funnel", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_hopping_windows_fuzz(rows):
    _check("events_hopping", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_salted_sessions_fuzz(rows):
    # the salted two-level plan must equal the window-SQL oracle on
    # arbitrary inputs — midnight-boundary sessions included (the
    # offsets span ~4 days, so slice merges genuinely trigger)
    _check("events_sessions_salted", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_latest_snapshot_fuzz(rows):
    # keep-latest-per-key: ts ties (same-second events) exercise the
    # event_id tie-break; single-event users the no-dup path
    _check("events_latest_snapshot", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_type_value_stats_fuzz(rows):
    # integer cents moments; the s2/n - (s/n)^2 float expression is
    # op-for-op identical on both engines
    _check("events_type_value_stats", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_percent_rank_fuzz(rows):
    # min-rank ties + the single (rank-1)/(n-1) division; value-cent
    # collisions in the strategy produce real tie groups
    _check("events_value_percent_rank", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_interarrival_fuzz(rows):
    # lag window: same-second ties resolved by event_id; single-event
    # users yield one NULL delta
    _check("events_interarrival", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_debounce_fuzz(rows):
    # lag-based suppression with same-second ties and window-boundary
    # hits (d == 300s must be DROPPED on both engines: strict >)
    _check("events_debounce", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_hourly_pivot_fuzz(rows):
    _check("events_hourly_pivot", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_user_top_type_fuzz(rows):
    _check("events_user_top_type", rows)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_type_affinity_fuzz(rows):
    _check("events_type_affinity", rows)

