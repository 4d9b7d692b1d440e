"""Round-4f additions: the data-quality family (profilers, constraint
reports), linear multi-touch attribution, Mann-Kendall, power-law MLE
and Theil decomposition.

Fuzz covers: NULL keys/values in profiled columns (nulls excluded from
distinct/min/max but counted), injected constraint violations of every
kind (dup pks, dangling fks, out-of-domain values, NULLs, non-positive
prices, n_chars drift), attribution edge cases (equal timestamps, the
strict window boundary, purchases with zero touches, shared touches
across purchases), all-tied Mann-Kendall months (var18 = 0 -> z = 0),
single-event users everywhere (sum_ln = 0 -> NaN alpha on both
engines), and single-group / all-equal-price Theil (zero inequality).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import __ray_entry__ as entrymod

_BASE = dt.datetime(2024, 3, 1)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(query_name: str, tables: dict[str, pa.Table]) -> None:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load

    def fake_load(sf, t, columns=None):
        tbl = tables[t]
        return ray.data.from_arrow(tbl.select(columns) if columns else tbl)

    q.rel.load = fake_load
    try:
        ray_df = entrymod.queries()[query_name]("fuzz")
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    for name, tbl in tables.items():
        con.register(name, tbl)
    sql_df = con.execute(entrymod.oracle_sql()[query_name]).df()
    a, b = _canon(pd.DataFrame(ray_df)), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{query_name}: {len(a)} != {len(b)}"
    for col in a.columns:
        for x, y in zip(a[col], b[col]):
            both_nan = (isinstance(x, float) and isinstance(y, float)
                        and math.isnan(x) and math.isnan(y))
            assert both_nan or repr(x) == repr(y), \
                f"{query_name}.{col}: {x!r} != {y!r}"


def _orders(rows) -> pa.Table:
    return pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
        "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[4] for r in rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
    })


def _customer(keys) -> pa.Table:
    return pa.table({
        "c_custkey": pa.array(list(keys), pa.int64()),
        "c_name": pa.array([f"c{k}" for k in keys], pa.string()),
        "c_nationkey": pa.array([0] * len(keys), pa.int32()),
        "c_acctbal": pa.array([0.0] * len(keys), pa.float64()),
        "c_mktsegment": pa.array(["S"] * len(keys), pa.string()),
    })


def _documents(rows) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })


def _events(rows) -> pa.Table:
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })


class TestConstraintInjection:
    def test_orders_all_violation_kinds(self):
        d = dt.datetime(2024, 1, 1)
        rows = [
            (1, 10, "O", 5.0, d, "1-URGENT"),
            (1, 10, "O", 5.0, d, "1-URGENT"),      # dup pk
            (2, 99, "F", 5.0, d, "1-URGENT"),      # dangling fk
            (3, 10, "X", 5.0, d, "1-URGENT"),      # bad domain
            (4, 10, "P", -1.0, d, "1-URGENT"),     # non-positive price
            (5, 10, "P", 0.0, d, "1-URGENT"),      # zero price
            (6, 10, "O", 5.0, None, "1-URGENT"),   # null date
        ]
        tables = {"orders": _orders(rows), "customer": _customer([10])}
        _check("orders_constraint_report", tables)
        rep = _report(tables)
        assert dict(zip(rep["check"], rep["violations"])) == {
            "pk_unique(o_orderkey)": 1,
            "fk(o_custkey -> customer.c_custkey)": 1,
            "domain(o_orderstatus in {F,O,P})": 1,
            "not_null(o_orderdate)": 1,
            "range(o_totalprice > 0)": 2,
        }

    def test_docs_all_violation_kinds(self):
        rows = [
            (1, "hello", "en", "s0", 5),
            (1, "world", "en", "s0", 5),     # dup pk
            (2, "abc", "xx", "s0", 3),       # bad lang
            (3, "abcd", "en", "s0", 99),     # n_chars drift
            (4, None, "en", "s0", 0),        # null text (+len check fails)
            (5, "café", "fr", "s0", 4),  # unicode: 4 code points
        ]
        tables = {"documents": _documents(rows)}
        _check("docs_constraint_report", tables)

    def test_clean_tables_all_pass(self):
        d = dt.datetime(2024, 1, 1)
        rows = [(i, 10, "O", 5.0, d, "1-URGENT") for i in range(5)]
        tables = {"orders": _orders(rows), "customer": _customer([10])}
        rep = _report(tables)
        assert rep["passed"].all()


def _report(tables) -> pd.DataFrame:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load

    def fake_load(sf, t, columns=None):
        tbl = tables[t]
        return ray.data.from_arrow(tbl.select(columns) if columns else tbl)

    q.rel.load = fake_load
    try:
        return q.orders_constraint_report("fuzz")
    finally:
        q.rel.load = orig


_PROFILE_ORDER_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=5),
        st.sampled_from(["O", "F", "P"]),
        st.sampled_from([0.005, 1.0, 1.005, 999999.99]),
        st.sampled_from([dt.datetime(2024, 1, 1),
                         dt.datetime(2024, 7, 15, 13, 0, 1)]),
        st.sampled_from(["1-URGENT", "5-LOW"]),
    ),
    min_size=1, max_size=20)


class TestProfilers:
    @settings(max_examples=25, deadline=None)
    @given(_PROFILE_ORDER_ROWS)
    def test_orders_profile_fuzz(self, rows):
        tables = {"orders": _orders(rows), "customer": _customer([1])}
        _check("orders_profile", tables)

    def test_docs_profile_dups_and_unicode(self):
        rows = [
            (1, "same text", "en", "s0", 9),
            (2, "same text", "en", "s1", 9),   # exact dup text
            (3, "café 中文", "zh", "s0", 7),
            (4, "", "de", "s1", 0),            # empty text
        ]
        _check("docs_profile", {"documents": _documents(rows)})


_ATTR_EVENTS = st.lists(
    st.tuples(st.integers(min_value=1, max_value=3),
              st.integers(min_value=0, max_value=7200),
              st.sampled_from(["click", "view", "purchase"]),
              st.sampled_from([0.0, 0.01, 7.77, 100.0])),
    min_size=1, max_size=30)


class TestAttribution:
    @settings(max_examples=40, deadline=None)
    @given(_ATTR_EVENTS)
    def test_linear_attribution_fuzz(self, rows):
        _check("events_linear_attribution", {"events": _events(rows)})

    def test_window_boundaries_and_equal_ts(self):
        rows = [
            (1, 0, "click", 0.0),        # exactly 3600 s before: INCLUDED
            (1, 1, "view", 0.0),
            (1, 3600, "purchase", 10.0),
            (1, 3600, "click", 0.0),     # equal ts: EXCLUDED (strict <)
            (2, 100, "purchase", 5.0),   # zero touches: unattributed
            (3, 0, "click", 0.0),
            (3, 30, "purchase", 0.01),   # 1-cent split over 1 touch
            (3, 40, "purchase", 0.01),   # same touch feeds 2 purchases
        ]
        _check("events_linear_attribution", {"events": _events(rows)})


class TestTrendAndTails:
    def test_mann_kendall_all_tied_months(self):
        d1, d2, d3 = (dt.datetime(2024, m, 1) for m in (1, 2, 3))
        rows = [(i, 1, "O", 5.0, d, "1-URGENT")
                for i, d in enumerate([d1, d2, d3])]
        tables = {"orders": _orders(rows), "customer": _customer([1])}
        _check("orders_mann_kendall", tables)  # var18 = 0 -> z = 0

    def test_mann_kendall_monotone(self):
        rows = []
        k = 0
        for m in (1, 2, 3, 4):
            for _ in range(m):
                rows.append((k, 1, "O", 5.0, dt.datetime(2024, m, 1),
                             "1-URGENT"))
                k += 1
        tables = {"orders": _orders(rows), "customer": _customer([1])}
        _check("orders_mann_kendall", tables)

    def test_power_law_all_single_event_users(self):
        rows = [(u, u * 10, "click", 0.0) for u in (1, 2, 3)]
        _check("events_power_law_alpha", {"events": _events(rows)})

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.tuples(
        st.one_of(st.none(), st.integers(min_value=1, max_value=4)),
        st.integers(min_value=0, max_value=100),
        st.sampled_from(["click"]), st.just(0.0)),
        min_size=1, max_size=30))
    def test_power_law_fuzz(self, rows):
        _check("events_power_law_alpha", {"events": _events(rows)})

    def test_theil_single_group_equal_prices(self):
        d = dt.datetime(2024, 1, 1)
        rows = [(i, 1, "O", 7.0, d, "1-URGENT") for i in range(4)]
        tables = {"orders": _orders(rows), "customer": _customer([1])}
        _check("orders_theil_decomposition", tables)  # theil 0 exactly

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.tuples(
        st.integers(min_value=1, max_value=50),
        st.just(1),
        st.just("O"),
        st.sampled_from([0.005, 0.01, 3.5, 999.99]),
        st.just(dt.datetime(2024, 1, 1)),
        st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"])),
        min_size=1, max_size=25))
    def test_theil_fuzz(self, rows):
        tables = {"orders": _orders(rows), "customer": _customer([1])}
        _check("orders_theil_decomposition", tables)
