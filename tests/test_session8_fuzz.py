"""Property-based SQL parity for the session-8 operators: the Pareto
skyline must match its NOT EXISTS dominance oracle on ARBITRARY small
part catalogs (duplicate (price, size) points, single-point frontiers,
constant columns), and the max-concurrency sweep must match its
window-cumsum oracle on ARBITRARY event streams (timestamp ties,
single-event sessions whose start == end, sessions crossing the
day-keyed scan's partition boundary)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import __ray_entry__ as entrymod

_BASE = dt.datetime(2024, 2, 29, 22, 0, 0)  # sessions straddle midnight

_PART = st.tuples(
    st.integers(min_value=1, max_value=6),       # p_size (dense -> ties)
    st.integers(min_value=100, max_value=600),   # price cents (ties)
)
_PARTS = st.lists(_PART, min_size=1, max_size=30)

_EVENT = st.tuples(
    st.integers(min_value=1, max_value=4),          # user_id
    st.integers(min_value=0, max_value=18_000),     # seconds offset (5h)
)
_EVENTS = st.lists(_EVENT, min_size=1, max_size=30)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(query_name: str, table_name: str, tbl: pa.Table) -> None:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl).repartition(3)
    try:
        ray_df = entrymod.queries()[query_name]("fuzz")
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    con.register(table_name, tbl)
    sql_df = con.execute(entrymod.oracle_sql()[query_name]).df()
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{len(a)} != {len(b)}"
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            assert x == y, f"{query_name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_PARTS)
def test_part_skyline_fuzz(rows):
    tbl = pa.table({
        "p_partkey": pa.array(range(len(rows)), pa.int64()),
        "p_size": pa.array([r[0] for r in rows], pa.int32()),
        "p_retailprice": pa.array([r[1] / 100.0 for r in rows],
                                  pa.float64()),
    })
    _check("part_skyline", "part", tbl)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_events_max_concurrency_fuzz(rows):
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    _check("events_max_concurrency", "events", tbl)
