"""Round-4e additions: per-nation NTILE(10) spend deciles and the
out-of-order arrival (watermark) metric.

Fuzz covers: nations with fewer than 10 customers (NTILE gives 1-row
buckets and the empty tail deciles vanish from the rollup), exact spend
ties (NTILE splits them across buckets by custkey order — the rollup sum
must be tie-placement-invariant), customers without orders (excluded on
both engines), NULL-user events (one shared lag partition on both
engines), duplicate timestamps (not out-of-order: strict <), and strictly
decreasing sequences (everything after the first arrival is late).
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

# (custkey, nationkey) pool: 3 nations so small-n NTILE paths trigger
_CUSTOMERS = st.lists(
    st.tuples(st.integers(min_value=1, max_value=30),
              st.integers(min_value=0, max_value=2)),
    min_size=1, max_size=12, unique_by=lambda c: c[0])

# orders as (custkey index into the customer list, price in cents)
_ORDERS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=11),
              st.sampled_from([100, 100, 2500, 999999])),  # heavy ties
    min_size=0, max_size=25)

_EVENTS = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=1, max_value=3)),
              st.integers(min_value=0, max_value=500),      # seconds
              st.sampled_from(["click", "purchase"])),
    min_size=1, max_size=25)


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
    assert len(a) == len(b), f"{len(a)} != {len(b)}"
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            both_nan = (isinstance(x, float) and isinstance(y, float)
                        and math.isnan(x) and math.isnan(y))
            assert x == y or both_nan, \
                f"{query_name}.{col}[{i}]: {x!r} != {y!r}"


def _rel_tables(customers, orders) -> dict[str, pa.Table]:
    nation = pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["ALGERIA", "BRAZIL", "CANADA"], pa.string()),
    })
    customer = pa.table({
        "c_custkey": pa.array([c[0] for c in customers], pa.int64()),
        "c_nationkey": pa.array([c[1] for c in customers], pa.int64()),
    })
    keys = [c[0] for c in customers]
    rows = [(keys[idx % len(keys)], cents) for idx, cents in orders]
    order_tbl = pa.table({
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] / 100.0 for r in rows],
                                 pa.float64()),
    })
    return {"nation": nation, "customer": customer, "orders": order_tbl}


def _events_table(rows) -> pa.Table:
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=12, deadline=None)
@given(customers=_CUSTOMERS, orders=_ORDERS)
def test_decile_by_nation_fuzz(customers, orders):
    _check("customer_decile_by_nation", _rel_tables(customers, orders))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=_EVENTS)
def test_out_of_order_fuzz(rows):
    _check("events_out_of_order", {"events": _events_table(rows)})


@pytest.mark.usefixtures("ray_session")
def test_out_of_order_decreasing_and_ties():
    """A strictly decreasing per-user sequence flags every arrival after
    the first; a tied timestamp is NOT out of order (strict <)."""
    rows = [(1, 300, "click"), (1, 200, "click"), (1, 100, "click"),
            (2, 50, "purchase"), (2, 50, "purchase")]
    _check("events_out_of_order", {"events": _events_table(rows)})

    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = _events_table(rows)
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        out = q.events_out_of_order("fuzz")
    finally:
        q.rel.load = orig
    got = dict(zip(out["event_type"], out["n_out_of_order"]))
    assert got == {"click": 2, "purchase": 0}


@pytest.mark.usefixtures("ray_session")
def test_decile_small_nation_sizes():
    """n < 10 customers in a nation: NTILE hands one row to each of the
    first n deciles; deciles n+1..10 must be absent, not zero-rows."""
    customers = [(1, 0), (2, 0), (3, 0)]
    orders = [(0, 300), (1, 200), (2, 100)]
    tables = _rel_tables(customers, orders)
    _check("customer_decile_by_nation", tables)

    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tables[t].select(columns) if columns else tables[t])
    try:
        out = q.customer_decile_by_nation("fuzz")
    finally:
        q.rel.load = orig
    assert out["decile"].tolist() == [1, 2, 3]
    assert out["decile_spend_c"].tolist() == [300, 200, 100]


# ---- round-4e batch 2: percentile_cont / assortativity / Levene ----

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_DOCS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.lists(st.integers(min_value=0, max_value=7),
                       min_size=0, max_size=8)),
    min_size=1, max_size=16, unique_by=lambda d: d[0])

_PRICES = st.lists(
    st.sampled_from([1.0, 1.0, 2.5, 2.5, 99.99, 12345.67, 0.01]),
    min_size=0, max_size=30)

_LEVENE_EVENTS = st.lists(
    st.tuples(st.one_of(st.none(),
                        st.sampled_from(["click", "purchase", "view"])),
              st.one_of(st.none(),
                        st.floats(min_value=-1000, max_value=1000,
                                  allow_nan=False, width=32))),
    min_size=0, max_size=30)


def _docs_table(rows) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([" ".join(_VOCAB[i] for i in r[1]) for r in rows],
                         pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(prices=_PRICES)
def test_percentile_cont_fuzz(prices):
    tbl = pa.table({
        "o_orderkey": pa.array(range(len(prices)), pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64()),
    })
    _check("orders_percentile_cont", {"orders": tbl})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(rows=_DOCS)
def test_assortativity_fuzz(rows):
    from pdf_parser_ray.pipelines import queries as q

    q.clear_session_caches()   # fuzz re-binds rel.load under one key
    _check("docs_dup_graph_assortativity", {"documents": _docs_table(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=_LEVENE_EVENTS)
def test_levene_fuzz(rows):
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE] * len(rows), pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    _check("events_levene", {"events": tbl})


@pytest.mark.usefixtures("ray_session")
def test_assortativity_star_is_negative():
    """A pure star (hub duplicated text with distinct leaves? no — a
    clique of identical docs has uniform degree -> zero variance ->
    NaN; a two-clique graph with different sizes has positive r).
    Pin the exact-clique NaN case: 3 identical docs = triangle, all
    degrees 2, zero degree variance."""
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    q.clear_session_caches()
    text = "alpha beta gamma delta eps"
    rows = [(i, text) for i in range(3)]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(text)] * 3, pa.int64()),
    })
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        out = q.docs_dup_graph_assortativity("fuzz")
    finally:
        q.rel.load = orig
        q.clear_session_caches()
    assert out["n_edges"].tolist() == [3]
    assert math.isnan(out["assortativity"].iloc[0])


# ---- round-4e batch 3: status reconcile / hourly OHLC ----

_LINESTATUS_ROWS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),      # orderkey
              st.sampled_from(["F", "O"])),
    min_size=0, max_size=25)

_OHLC_EVENTS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7300),   # seconds (~2h)
              st.one_of(st.none(),
                        st.sampled_from([1.5, -2.25, 0.0, 99.75]))),
    min_size=0, max_size=30)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=_LINESTATUS_ROWS)
def test_status_reconcile_fuzz(rows):
    line = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_linestatus": pa.array([r[1] for r in rows], pa.string()),
    })
    keys = sorted({r[0] for r in rows} | {99})   # 99: order w/o lines
    orders = pa.table({
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_orderstatus": pa.array(
            ["F" if k % 3 == 0 else ("O" if k % 3 == 1 else "P")
             for k in keys], pa.string()),
    })
    _check("orders_status_reconcile",
           {"lineitem": line, "orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=_OHLC_EVENTS)
def test_hourly_ohlc_fuzz(rows):
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[0]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    _check("events_hourly_ohlc", {"events": tbl})


@pytest.mark.usefixtures("ray_session")
def test_hourly_ohlc_tie_order():
    """Two events at the SAME timestamp: open/close tie-break by
    event_id, matching the SQL window's (ts, event_id) order."""
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    rows = [(0, 10.0), (0, 20.0), (0, 30.0)]
    tbl = pa.table({
        "event_id": pa.array([2, 0, 1], pa.int64()),
        "ts": pa.array([_BASE] * 3, pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["click"] * 3, pa.string()),
        "value": pa.array([v for _, v in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * 3, pa.string()),
    })
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        out = q.events_hourly_ohlc("fuzz")
    finally:
        q.rel.load = orig
    assert len(out) == 1
    # event_id order at the tied ts: 0 (20.0) opens, 2 (10.0) closes
    assert out["open"].iloc[0] == 20.0
    assert out["close"].iloc[0] == 10.0
    assert out["high"].iloc[0] == 30.0 and out["low"].iloc[0] == 10.0


# ---- round-4e batch 4: soft-dedup weights / bounce rate / length gini ----

_GINI_DOCS = st.lists(st.integers(min_value=0, max_value=50),
                      min_size=0, max_size=25)

_BOUNCE_EVENTS = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=1, max_value=3)),
              st.integers(min_value=0, max_value=7200)),
    min_size=0, max_size=25)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(rows=_DOCS)
def test_soft_dedup_weights_fuzz(rows):
    from pdf_parser_ray.pipelines import queries as q

    q.clear_session_caches()
    try:
        _check("docs_soft_dedup_weights",
               {"documents": _docs_table(rows)})
    finally:
        q.clear_session_caches()


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=_BOUNCE_EVENTS)
def test_bounce_rate_fuzz(rows):
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    _check("events_bounce_rate", {"events": tbl})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(lens=_GINI_DOCS)
def test_length_gini_fuzz(lens):
    tbl = pa.table({
        "doc_id": pa.array(range(len(lens)), pa.int64()),
        "text": pa.array(["x" * n for n in lens], pa.string()),
        "lang": pa.array(["en"] * len(lens), pa.string()),
        "source": pa.array(["s"] * len(lens), pa.string()),
        "n_chars": pa.array(lens, pa.int64()),
    })
    _check("docs_length_gini", {"documents": tbl})


@pytest.mark.usefixtures("ray_session")
def test_soft_dedup_weight_values():
    """A 3-clique of identical docs weighs 333333 ppm each; the
    singleton keeps 1000000."""
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    text = "alpha beta gamma delta eps"
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 9], pa.int64()),
        "text": pa.array([text, text, text, "zeta eta theta"],
                         pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
        "n_chars": pa.array([len(text)] * 3 + [14], pa.int64()),
    })
    q.clear_session_caches()
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        out = q.docs_soft_dedup_weights("fuzz")
    finally:
        q.rel.load = orig
        q.clear_session_caches()
    assert out["weight_ppm"].tolist() == [333333, 333333, 333333, 1000000]


# ---- round-4e batch 5: CMS error profile / windowed funnel ----

_FUNNEL_EVENTS = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=1, max_value=3)),
              st.integers(min_value=0, max_value=7200),
              st.sampled_from(["click", "purchase", "view"])),
    min_size=0, max_size=25)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(rows=_DOCS)
def test_cms_error_profile_fuzz(rows):
    _check("docs_cms_error_profile", {"documents": _docs_table(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=_FUNNEL_EVENTS)
def test_funnel_windowed_fuzz(rows):
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    _check("events_funnel_windowed", {"events": tbl})


@pytest.mark.usefixtures("ray_session")
def test_funnel_window_boundaries():
    """Purchase exactly AT the click ts does not convert (strict >);
    purchase exactly at click + 60 min converts (inclusive <=);
    purchase 1 us past the window does not."""
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    rows = [
        (1, 0, "click"), (1, 0, "purchase"),          # tie: no
        (2, 0, "click"), (2, 3600, "purchase"),       # boundary: yes
        (3, 0, "click"), (3, 3601, "purchase"),       # past: no
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    _check("events_funnel_windowed", {"events": tbl})
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        out = q.events_funnel_windowed("fuzz")
    finally:
        q.rel.load = orig
    assert out["n_clicked"].tolist() == [3]
    assert out["n_converted"].tolist() == [1]
