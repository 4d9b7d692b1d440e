"""Property-based SQL parity for the exact-cents aggregation discipline:
money columns fuzz over adversarial doubles (sign changes, magnitudes,
half-cent neighborhoods) and the grouped/global sums must stay BIT-equal
to DuckDB, because both engines round the identical per-row double to
int64 cents before summing — accumulation order can no longer matter.

Domain note: l_quantity stays integral (as in TPC-H) — q1's sum_qty is a
raw double sum on both engines, which is only order-independent for
integral values; arbitrary-float quantity sums are outside the pinned
contract (the money columns are where the cents discipline applies)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __ray_entry__ as entrymod

_BASE = dt.datetime(1996, 1, 1)

_MONEY = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    # half-cent neighborhoods: x.xx5 boundaries where naive double
    # rounding of SUMS (instead of per-row cents) would flip
    st.integers(min_value=-200000, max_value=200000).map(
        lambda k: k / 1000.0),
)

_LINE = st.tuples(
    st.sampled_from(["A", "N", "R"]),                  # l_returnflag
    st.sampled_from(["F", "O"]),                       # l_linestatus
    st.integers(min_value=1, max_value=50),            # l_quantity
    _MONEY,                                            # l_extendedprice
    st.integers(min_value=0, max_value=10).map(
        lambda k: k / 100.0),                          # l_discount
    st.integers(min_value=0, max_value=1200),          # shipdate day offset
)
_LINES = st.lists(_LINE, min_size=1, max_size=30)

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=200_000),       # seconds offset
    st.sampled_from(["view", "click", "purchase"]),
    _MONEY,
)
_EVENTS = st.lists(_EVENT, min_size=1, max_size=30)


def _lineitem(rows) -> pa.Table:
    return pa.table({
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_linestatus": pa.array([r[1] for r in rows], pa.string()),
        "l_quantity": pa.array([float(r[2]) for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[3] for r in rows], pa.float64()),
        "l_discount": pa.array([r[4] for r in rows], pa.float64()),
        "l_shipdate": pa.array(
            [_BASE + dt.timedelta(days=r[5]) for r in rows],
            pa.timestamp("us")),
    })


def _events(rows) -> pa.Table:
    return pa.table({
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[0]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(query_name: str, tables: dict[str, pa.Table]) -> None:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load

    def load(sf_dir, table, columns=None):
        tbl = tables[table]
        return ray.data.from_arrow(tbl.select(columns) if columns else tbl)

    q.rel.load = load
    try:
        ray_df = entrymod.queries()[query_name]("fuzz")
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    for name, tbl in tables.items():
        con.register(name, tbl)
    sql_df = con.execute(entrymod.oracle_sql()[query_name]).df()
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{len(a)} != {len(b)}"
    import math

    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            if (isinstance(x, float) and isinstance(y, float)
                    and math.isnan(x) and math.isnan(y)):
                continue
            assert x == y, f"{query_name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(rows=_LINES)
def test_q1_cents_discipline_fuzz(rows):
    _check("q1_pricing_summary", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(rows=_LINES)
def test_q6_cents_discipline_fuzz(rows):
    _check("q6_forecast_revenue", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(rows=_EVENTS)
def test_events_hourly_cents_fuzz(rows):
    _check("events_hourly", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(bals=st.lists(_MONEY, min_size=1, max_size=25),
       nkeys=st.lists(st.integers(min_value=0, max_value=3),
                      min_size=1, max_size=25))
def test_grouped_median_cents_fuzz(bals, nkeys):
    n = min(len(bals), len(nkeys))
    nation = pa.table({
        "n_nationkey": pa.array([0, 1, 2, 3], pa.int64()),
        "n_name": ["AA", "BB", "CC", "DD"],
        "n_regionkey": pa.array([0, 0, 1, 1], pa.int64()),
    })
    customer = pa.table({
        "c_nationkey": pa.array(nkeys[:n], pa.int64()),
        "c_acctbal": pa.array(bals[:n], pa.float64()),
    })
    _check("nation_acctbal_median",
           {"nation": nation, "customer": customer})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(rows=_LINES)
def test_grouped_corr_moments_fuzz(rows):
    # distributed moment sums: zero-variance groups (constant qty or
    # discount) must yield NaN on BOTH engines (0/0), n=1 groups too
    _check("lineitem_qty_discount_corr", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=12), _MONEY),
    min_size=1, max_size=30))
def test_running_revenue_scan_fuzz(rows):
    # distributed prefix scan: duplicate days force multi-row groups;
    # the exclusive day offsets + in-group cumsum must reproduce the
    # SQL cumulative window bit-exactly (cents discipline)
    orders = pa.table({
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=r[0]) for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("orders_running_revenue", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),   # ts: force ties
              st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
              st.sampled_from(["view", "click", "purchase"])),
    min_size=1, max_size=30))
def test_markov_transitions_fuzz(rows):
    # lead() parity: ties on ts break by event_id on both engines;
    # null users drop before sequencing on both engines
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[0]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    _check("events_markov", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),   # ts: force ties
              st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
              st.sampled_from(["view", "click", "purchase"])),
    min_size=1, max_size=30))
def test_top_paths_fuzz(rows):
    # double-lead() parity and the deterministic top-k tie order
    # (n desc, e1, e2, e3): tied counts at the k-th rank must select
    # the same triple set on both engines
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[0]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    _check("events_top_paths", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
              st.integers(min_value=0, max_value=12)),   # day: force gaps
    min_size=1, max_size=30))
def test_user_streaks_fuzz(rows):
    # gaps-and-islands parity: duplicate days collapse, single-day
    # streaks, adjacent-vs-gapped runs, all-null users -> empty frame
    import hypothesis
    hypothesis.assume(any(r[0] is not None for r in rows))
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(days=r[1], seconds=i)
                        for i, r in enumerate(rows)], pa.timestamp("us")),
    })
    _check("events_user_streaks", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=12),   # day: gaps+ties
              st.sampled_from(["view", "click", "purchase"])),
    min_size=1, max_size=40))
def test_trending_types_fuzz(rows):
    # trailing-window argmax through count ties (first-max = type-asc
    # on both engines) and calendar gaps inside the window
    events = pa.table({
        "ts": pa.array([_BASE + dt.timedelta(days=r[0], seconds=i)
                        for i, r in enumerate(rows)], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    })
    _check("events_trending_types", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=20), _MONEY),
    min_size=1, max_size=30))
def test_dow_seasonality_fuzz(rows):
    # weekday bucketing arithmetic ((epoch_days+4)%7) and exact-cents
    # share ppm across arbitrary day/price mixes
    orders = pa.table({
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=r[0]) for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("orders_dow_seasonality", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),    # few customers
              st.integers(min_value=0, max_value=15)),  # day: ties+gaps
    min_size=1, max_size=30))
def test_order_gaps_fuzz(rows):
    # grouped quantile_disc median over gap multisets: same-day orders
    # (gap 0), single-order customers dropping, even/odd gap counts
    orders = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=r[1]) for r in rows],
            pa.timestamp("us")),
    })
    _check("customer_order_gaps", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=72 * 3600 - 1),
              st.sampled_from(["view", "error"])),
    min_size=1, max_size=25))
def test_error_rate_ci_fuzz(rows):
    # the Wilson formula is a long double expression: identical counts
    # must produce bit-identical rounded bounds, including the p=0 and
    # p=1 single-event hours where the naive interval degenerates
    events = pa.table({
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[0]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    })
    _check("events_error_rate_ci", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(prices=st.lists(_MONEY, min_size=1, max_size=30))
def test_benford_profile_fuzz(prices):
    # digit peeling by integer division vs SQL string-substr must agree
    # on every magnitude, incl. exact powers of ten; <= 0 amounts drop
    import hypothesis
    hypothesis.assume(any(round(p * 100) > 0 for p in prices))
    orders = pa.table({
        "o_totalprice": pa.array(prices, pa.float64()),
    })
    _check("orders_benford_profile", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(users=st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
    min_size=1, max_size=60))
def test_user_gini_fuzz(users):
    # exact Gini from the count-of-counts histogram must equal the SQL
    # rank formula on arbitrary (skewed, tied, null-bearing) user
    # multisets; all-null inputs yield the typed empty frame vs SQL's
    # zero-user division guard
    import hypothesis
    hypothesis.assume(any(u is not None for u in users))
    events = pa.table({
        "user_id": pa.array(users, pa.int64()),
    })
    _check("events_user_gini", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),   # custkey: few -> ties
              st.integers(min_value=0, max_value=10),  # day offset
              _MONEY.filter(lambda x: x >= 0)),
    min_size=1, max_size=30))
def test_customer_rfm_fuzz(rows):
    # quintile bounds under heavy ties (few customers, duplicate
    # recency/frequency values) must replicate quantile_disc + the
    # CASE-chain tie semantics on both engines
    orders = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=r[1]) for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    })
    _check("customer_rfm", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(okeys=st.lists(st.integers(min_value=0, max_value=8),
                      min_size=1, max_size=20),
       ldays=st.lists(st.tuples(st.integers(min_value=0, max_value=8),
                                st.integers(min_value=0, max_value=15)),
                      min_size=1, max_size=30))
def test_open_backlog_fuzz(okeys, ldays):
    # interval deltas + cumsum must match the SQL windowed sum under
    # same-day open/close, orders without lineitems (inner-join drop),
    # and lineitems pointing at absent orders
    orders = pa.table({
        "o_orderkey": pa.array(sorted(set(okeys)), pa.int64()),
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=k) for k in sorted(set(okeys))],
            pa.timestamp("us")),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array([k for k, _ in ldays], pa.int64()),
        "l_shipdate": pa.array(
            [_BASE + dt.timedelta(days=d) for _, d in ldays],
            pa.timestamp("us")),
    })
    _check("orders_open_backlog", {"orders": orders,
                                   "lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=72 * 3600 - 1),
              st.sampled_from(["view", "click"])),
    min_size=1, max_size=40))
def test_hour_profile_z_fuzz(rows):
    # z-scores derive from exact integer cell counts via identical
    # double formulas; constant profiles (single cell) pin z = 0 on
    # both engines instead of NaN semantics
    events = pa.table({
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[0]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    })
    _check("events_hour_profile_z", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),   # suppkey
              _MONEY.filter(lambda x: x >= 0),          # extendedprice
              st.integers(min_value=0, max_value=10).map(lambda k: k / 100.0)),
    min_size=1, max_size=30))
def test_nation_hhi_fuzz(rows):
    # share squares in whole dollars must replicate the HUGEINT SQL
    # exactly, incl. single-supplier monopolies (hhi = 1e6) and
    # zero-revenue nations (guarded 0)
    supplier = pa.table({
        "s_suppkey": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "s_nationkey": pa.array([0, 0, 1, 1, 2, 2], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["AA", "BB", "CC"], pa.string()),
    })
    lineitem = pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
        "l_discount": pa.array([r[2] for r in rows], pa.float64()),
    })
    _check("nation_supplier_hhi", {"lineitem": lineitem,
                                   "supplier": supplier,
                                   "nation": nation})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(vals=st.lists(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=1, max_size=12))
def test_quantize_error_fuzz(vals):
    # float32 storage promotes to double identically on both engines;
    # pico-unit integer error terms keep the per-vector sum exact;
    # all-zero corpora pin err = 0 (s = 0 guard)
    embeddings = pa.table({
        "vec_id": pa.array(range(len(vals)), pa.int64()),
        "embedding": pa.array(vals, pa.list_(pa.float32())),
    })
    _check("emb_quantize_error", {"embeddings": embeddings})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(vals=st.lists(
    st.lists(st.floats(min_value=-5, max_value=5, allow_nan=False,
                       width=32),
             min_size=3, max_size=3),
    min_size=2, max_size=16))
def test_half_drift_fuzz(vals):
    # micro-int centroid sums + pico-int distance terms: bit-identical
    # at any parallelism and vs SQL; needs both halves present
    embeddings = pa.table({
        "vec_id": pa.array(range(len(vals)), pa.int64()),
        "embedding": pa.array(vals, pa.list_(pa.float32())),
    })
    _check("emb_half_drift", {"embeddings": embeddings})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(vals=st.lists(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                       width=32),
             min_size=3, max_size=3),
    min_size=1, max_size=16))
def test_norm_outliers_fuzz(vals):
    # tenk-unit integer x^2 terms keep the norm exact; the rank-rule
    # band must select the identical outlier set through heavy norm
    # ties (tiny corpora pin lo=min/hi=max -> empty on both engines)
    embeddings = pa.table({
        "vec_id": pa.array(range(len(vals)), pa.int64()),
        "embedding": pa.array(vals, pa.list_(pa.float32())),
    })
    _check("emb_norm_outliers", {"embeddings": embeddings})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(vals=st.lists(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                       width=32),
             min_size=2, max_size=2),
    min_size=1, max_size=16))
def test_emb_diversity_fuzz(vals):
    # moment-identity mean pairwise distance: micro-quantized integer
    # algebra must match HUGEINT SQL exactly, n=1 pins NULL/NaN
    embeddings = pa.table({
        "vec_id": pa.array(range(len(vals)), pa.int64()),
        "embedding": pa.array(vals, pa.list_(pa.float32())),
    })
    _check("emb_diversity", {"embeddings": embeddings})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["view", "click"]),
              st.one_of(st.none(),
                        st.integers(min_value=-100000, max_value=100000)
                        .map(lambda c: c / 100.0))),
    min_size=1, max_size=30))
def test_winsorized_stats_fuzz(rows):
    # quantile_disc band + clip + truncating integer division must
    # agree through ties, single-value types, NULL values, and
    # NEGATIVE sums (DuckDB // truncates toward zero; Python floors —
    # the engine mirrors DuckDB explicitly)
    import hypothesis
    hypothesis.assume(any(r[1] is not None for r in rows))
    events = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("events_winsorized_stats", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),       # user
              st.integers(min_value=0, max_value=7200)),   # sec offset
    min_size=1, max_size=30))
def test_user_burstiness_fuzz(rows):
    # exact int gap moments -> identical double CV; ts ties (gap 0),
    # metronome users (all-equal gaps, cv 0 after var clamp), and
    # single-event users (no gaps, dropped) all pinned
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
    })
    _check("events_user_burstiness", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=9),        # day offset
              st.sampled_from(["view", "click", "purchase"])),
    min_size=1, max_size=30))
def test_type_drift_fuzz(rows):
    # split-day derivation, one-sided types (zero cells), and
    # single-day ranges (empty first half, greatest(1,..) guard) must
    # match the SQL twin exactly
    events = pa.table({
        "ts": pa.array([_BASE + dt.timedelta(days=r[0]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    })
    _check("events_type_drift", {"events": events})


_TPCH_LINE = st.tuples(
    st.integers(min_value=0, max_value=11),   # orderkey
    st.integers(min_value=0, max_value=7),    # partkey
    st.integers(min_value=0, max_value=4),    # suppkey
    st.integers(min_value=1, max_value=60),   # quantity (integral + band
                                              # edges around 11/20/30)
    _MONEY,                                   # extendedprice
    st.integers(min_value=0, max_value=10).map(lambda k: k / 100.0),
    st.integers(min_value=0, max_value=1100), # shipdate day offset
)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(lines=st.lists(_TPCH_LINE, min_size=1, max_size=30),
       cust_nations=st.lists(st.integers(min_value=0, max_value=3),
                             min_size=6, max_size=6),
       supp_nations=st.lists(st.integers(min_value=0, max_value=3),
                             min_size=5, max_size=5),
       order_cust=st.lists(st.integers(min_value=0, max_value=5),
                           min_size=12, max_size=12),
       qty_thresh=st.sampled_from([0.0, 50.0, 100.0]))
def test_tpch_q7_q8_q13_q18_q19_fuzz(lines, cust_nations, supp_nations,
                                     order_cust, qty_thresh):
    # one table universe drives all five classic shapes: cross/same
    # nation mixes and out-of-band ship dates (q7), zero-revenue years
    # and absent nations (q8 NULL-share path), customers with no
    # orders (q13 zero bucket), threshold-edge order quantities incl.
    # an empty survivor set (q18 empty-join path), and band-edge
    # qty/size/brand combos (q19)
    nation = pa.table({
        "n_nationkey": pa.array(range(4), pa.int64()),
        "n_name": pa.array([f"NATION_{i}" for i in range(4)], pa.string()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array(range(5), pa.int64()),
        "s_nationkey": pa.array(supp_nations, pa.int64()),
    })
    customer = pa.table({
        "c_custkey": pa.array(range(6), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(6)],
                           pa.string()),
        "c_nationkey": pa.array(cust_nations, pa.int64()),
    })
    part = pa.table({
        "p_partkey": pa.array(range(8), pa.int64()),
        "p_brand": pa.array([f"Brand#{b}" for b in
                             (12, 23, 34, 45, 12, 23, 34, 55)],
                            pa.string()),
        "p_type": pa.array(["STANDARD", "PROMO"] * 4, pa.string()),
        "p_size": pa.array([1, 15, 16, 25, 26, 35, 36, 40], pa.int32()),
    })
    orders = pa.table({
        "o_orderkey": pa.array(range(12), pa.int64()),
        "o_custkey": pa.array(order_cust, pa.int64()),
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=90 * i) for i in range(12)],
            pa.timestamp("us")),
        "o_totalprice": pa.array([100.0 + i for i in range(12)],
                                 pa.float64()),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
        "l_partkey": pa.array([r[1] for r in lines], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in lines], pa.int64()),
        "l_quantity": pa.array([float(r[3]) for r in lines], pa.float64()),
        "l_extendedprice": pa.array([r[4] for r in lines], pa.float64()),
        "l_discount": pa.array([r[5] for r in lines], pa.float64()),
        "l_shipdate": pa.array(
            [_BASE + dt.timedelta(days=r[6]) for r in lines],
            pa.timestamp("us")),
    })
    tables = {"nation": nation, "supplier": supplier, "customer": customer,
              "part": part, "orders": orders, "lineitem": lineitem}
    _check("q7_trade_volume", tables)
    _check("q8_market_share", tables)
    _check("q13_order_count_distribution", tables)
    _check("q19_discounted_revenue", tables)
    # q18's SQL threshold is baked at 250; fuzz the engine-side param
    # against a matching ad-hoc oracle instead
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load

    def load(sf_dir, table, columns=None):
        tbl = tables[table]
        return ray.data.from_arrow(tbl.select(columns) if columns else tbl)

    q.rel.load = load
    try:
        ray_df = q.q18_large_orders("fuzz", min_qty=qty_thresh)
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    for name, tbl in tables.items():
        con.register(name, tbl)
    sql_df = con.execute(f"""
        SELECT c_name, o_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               sum_q / 100.0 AS total_qty
        FROM (SELECT l_orderkey,
                     sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_q
              FROM lineitem GROUP BY l_orderkey
              HAVING sum_q > {int(round(qty_thresh * 100))}) b
        JOIN orders ON o_orderkey = b.l_orderkey
        JOIN customer ON c_custkey = o_custkey
    """).df()
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for col in a.columns:
        for x, y in zip(a[col], b[col]):
            assert x == y, f"q18.{col}: {x!r} != {y!r}"


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=9),     # orderkey
              st.integers(min_value=0, max_value=5)),    # partkey
    min_size=1, max_size=30))
def test_basket_pairs_fuzz(rows):
    # tiny key domains force real co-occurrence: duplicate (order,
    # part) rows must collapse before pairing, single-part baskets
    # contribute nothing (possibly-empty result), and the HUGEINT
    # lift ppm must match Python bigint math bit-exactly through
    # top-k boundary ties (total order pins the winner set)
    lineitem = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    _check("lineitem_basket_pairs", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(),
                        st.integers(min_value=1, max_value=4)),  # user
              st.integers(min_value=0, max_value=1000),          # secs
              st.sampled_from(["view", "click", "purchase"])),
    min_size=1, max_size=30))
def test_first_touch_fuzz(rows):
    # NULL users drop on both engines (possibly emptying the table);
    # ts ties break on event_id; purchase-as-first-touch pins gap 0;
    # channels with zero conversions pin NULL/NaN avg_gap; ppm and
    # avg math are truncating integer division in lockstep
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    _check("events_first_touch", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(vals=st.lists(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                       width=32),
             min_size=3, max_size=3),
    min_size=1, max_size=12))
def test_emb_dim_stats_fuzz(vals):
    # micro-int first moments are exact int64; the second moment
    # travels as a decimal string (HUGEINT twin); negative sums pin
    # the truncate-toward-zero mean (DuckDB // semantics); n=1
    # corpora pin var 0
    embeddings = pa.table({
        "vec_id": pa.array(range(len(vals)), pa.int64()),
        "embedding": pa.array(vals, pa.list_(pa.float32())),
    })
    _check("emb_dim_stats", {"embeddings": embeddings})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),    # suppkey
              _MONEY,                                   # extendedprice
              st.integers(min_value=0, max_value=10).map(lambda k: k / 100.0),
              st.integers(min_value=0, max_value=200)), # shipdate offset
    min_size=1, max_size=30))
def test_q15_top_supplier_fuzz(rows):
    # global-max equality filter through exact-cents ties (several
    # suppliers can tie on the max, incl. all-out-of-window -> empty);
    # negative revenue pins the signed max path
    lineitem = pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
        "l_discount": pa.array([r[2] for r in rows], pa.float64()),
        "l_shipdate": pa.array(
            [_BASE + dt.timedelta(days=r[3]) for r in rows],
            pa.timestamp("us")),
    })
    supplier = pa.table({
        "s_suppkey": pa.array(range(5), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(5)],
                           pa.string()),
    })
    _check("q15_top_supplier", {"lineitem": lineitem,
                                "supplier": supplier})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=7),    # partkey
              st.integers(min_value=1, max_value=50),   # quantity
              _MONEY),                                  # extendedprice
    min_size=1, max_size=30))
def test_q17_small_qty_fuzz(rows):
    # correlated per-part threshold via the exact integer cross-product
    # form; single-lineitem parts can never qualify (qty*5*1 >= qty
    # for qty >= 1... unless avg math says so), absent-brand parts
    # pin the NULL-sum/NaN row
    part = pa.table({
        "p_partkey": pa.array(range(8), pa.int64()),
        "p_brand": pa.array([f"Brand#{b}" for b in
                             (23, 23, 23, 12, 12, 23, 34, 23)],
                            pa.string()),
    })
    lineitem = pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_quantity": pa.array([float(r[1]) for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
    })
    _check("q17_small_qty_revenue", {"lineitem": lineitem, "part": part})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(bals=st.lists(st.one_of(st.none(), _MONEY), min_size=1, max_size=20),
       order_cust=st.lists(st.integers(min_value=0, max_value=19),
                           min_size=0, max_size=15))
def test_q22_idle_balance_fuzz(bals, order_cust):
    # exact rational above-average gate (bal*c > s, never a double
    # avg); NULL balances drop; all-non-positive corpora pin the
    # empty result; the anti-join side fuzzes over partial coverage
    customer = pa.table({
        "c_custkey": pa.array(range(len(bals)), pa.int64()),
        "c_mktsegment": pa.array(
            [["BUILDING", "MACHINERY"][i % 2] for i in range(len(bals))],
            pa.string()),
        "c_acctbal": pa.array(bals, pa.float64()),
    })
    orders = pa.table({
        "o_custkey": pa.array(order_cust, pa.int64()),
    })
    _check("q22_idle_balance", {"customer": customer, "orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),    # suppkey
              _MONEY,
              st.integers(min_value=0, max_value=10).map(lambda k: k / 100.0)),
    min_size=1, max_size=30))
def test_supplier_pareto_fuzz(rows):
    # cumulative HUGEINT shares with signed truncating division:
    # negative revenues drive cum past total (shares > 1e6) and a
    # zero/negative total pins the NULL/sign paths
    lineitem = pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
        "l_discount": pa.array([r[2] for r in rows], pa.float64()),
    })
    _check("supplier_revenue_pareto", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
              st.sampled_from(["view", "click", "purchase"]),
              _MONEY),
    min_size=1, max_size=30))
def test_ab_lift_fuzz(rows):
    # md5 arm bucketing + per-user conversion fold: null users drop,
    # the truncating conv ppm and cents revenue must match bit-exactly
    # whatever the arm split and purchase mix
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    _check("events_ab_lift", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
              st.integers(min_value=0, max_value=180)),  # seconds: ties
    min_size=1, max_size=40))
def test_bot_minutes_fuzz(rows):
    # (user, minute) count -> per-user max -> >= threshold gate: minute
    # truncation and the HAVING boundary must agree on both engines
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_bot_minutes", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),      # day
              st.integers(min_value=0, max_value=86399)), # second of day
    min_size=1, max_size=40))
def test_peak_hour_fuzz(rows):
    # per-day argmax hour with ties -> earliest hour: the row_number
    # tie order must match the pandas head(1) pick exactly
    events = pa.table({
        "ts": pa.array(
            [_BASE + dt.timedelta(days=r[0], seconds=r[1]) for r in rows],
            pa.timestamp("us")),
    })
    _check("events_peak_hour", {"events": events})


@pytest.mark.usefixtures("ray_session")
# the two domain assumes (no zero-cent rows, no zero-cent months) filter
# heavily on seeds that cluster _MONEY near zero — a legitimate domain
# constraint (DuckDB raises on the excluded inputs), not a distortion
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.filter_too_much])
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=120),   # day offset
              _MONEY),
    min_size=1, max_size=30))
def test_monthly_growth_fuzz(rows):
    # LAG over month order with signed truncating ppm: negative revenue
    # months flip the division sign, the first month pins NULL/NaN
    import hypothesis
    hypothesis.assume(all(round(p * 100) != 0
                          for p in (r[1] for r in rows)))
    orders = pa.table({
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=r[0]) for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    # guard: a month summing to exactly zero cents would divide by zero
    # in BOTH engines (DuckDB raises); keep the fuzz inside the domain
    months = {}
    for r in rows:
        m = (_BASE + dt.timedelta(days=r[0])).month
        months[m] = months.get(m, 0) + round(r[1] * 100)
    hypothesis.assume(all(v != 0 for v in months.values()))
    _check("orders_monthly_growth", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(lines=st.lists(
    st.tuples(st.integers(min_value=0, max_value=9),     # orderkey
              st.integers(min_value=-5, max_value=40)),  # ship day offset
    min_size=1, max_size=30),
    orders=st.lists(st.integers(min_value=0, max_value=12),
                    min_size=1, max_size=10))
def test_ship_latency_fuzz(lines, orders):
    # hash-join + day-lag rollup: negative lags (ship before order)
    # exercise the signed truncating mean; dangling orderkeys drop via
    # inner-join semantics on both engines
    lineitem = pa.table({
        "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
        "l_shipdate": pa.array(
            [_BASE + dt.timedelta(days=10 + r[1]) for r in lines],
            pa.timestamp("us")),
    })
    otbl = pa.table({
        "o_orderkey": pa.array(range(len(orders)), pa.int64()),
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=d) for d in orders],
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [f"{1 + k % 3}-P" for k in range(len(orders))], pa.string()),
    })
    _check("orders_ship_latency", {"lineitem": lineitem, "orders": otbl})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(_MONEY,
              st.integers(min_value=0, max_value=8).map(lambda k: k / 100.0)),
    min_size=1, max_size=30))
def test_tax_profile_fuzz(rows):
    # bracket key and both money sums ride the per-row cents rounding:
    # price*tax products at half-cent boundaries must bucket identically
    lineitem = pa.table({
        "l_extendedprice": pa.array([r[0] for r in rows], pa.float64()),
        "l_tax": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("lineitem_tax_profile", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["hash", "scan", "sort", "spark", "other",
                              "the", "hashx"]),
             min_size=0, max_size=12),
    min_size=1, max_size=15))
def test_keyword_hits_fuzz(docs):
    # containment vs occurrence split and the zero-hit left-join rows:
    # watchlist terms absent from every doc must still report (0, 0),
    # and near-miss tokens (hashx) must never count
    documents = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })
    _check("docs_keyword_hits", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=1200),  # day: multi-year
              st.sampled_from(["1-U", "2-H", "3-M"])),
    min_size=1, max_size=30))
def test_priority_year_share_fuzz(rows):
    # per-year share ppm (truncating) + per-priority LAG across gap
    # years: a priority absent in some middle year must lag to its
    # last PRESENT year on both engines, first appearance pins NULL
    orders = pa.table({
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=r[0]) for r in rows],
            pa.timestamp("us")),
        "o_orderpriority": pa.array([r[1] for r in rows], pa.string()),
    })
    _check("orders_priority_year_share", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
              st.integers(min_value=0, max_value=6)),   # day
    min_size=1, max_size=40))
def test_new_vs_returning_fuzz(rows):
    # first-day attribution: a user active on multiple days must count
    # as new exactly once; null users drop; new+returning = active
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(days=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_new_vs_returning", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(vecs=st.lists(
    st.lists(st.floats(min_value=-4, max_value=4, allow_nan=False,
                       allow_infinity=False),
             min_size=4, max_size=4),
    min_size=1, max_size=24))
def test_pair_hist_fuzz(vecs):
    # md5-sampled pair histogram: bin edges ride round4-then-floor on
    # both engines; identical vectors pin the cos=1.0 top bin. Zero
    # vectors are outside the contract (cosine undefined) as in the
    # knn-graph oracle.
    import hypothesis
    hypothesis.assume(all(any(x != 0.0 for x in v) for v in vecs))
    embeddings = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    })
    _check("emb_pair_hist", {"embeddings": embeddings})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["aa", "bb", "cc", "dd"]),   # text
              st.sampled_from(["s1", "s2"])),              # source
    min_size=1, max_size=30))
def test_exactdup_savings_fuzz(rows):
    # min-doc_id keeper discipline across sources: the keeper's source
    # gets no savings row for it, every later copy charges ITS source
    documents = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[0]) for r in rows], pa.int64()),
    })
    _check("docs_exactdup_savings", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(docs=st.lists(
    st.tuples(st.sampled_from(["s1", "s2"]),
              st.lists(st.sampled_from(["a", "b", "c", "d", "e"]),
                       min_size=0, max_size=10)),
    min_size=1, max_size=15))
def test_hapax_rate_fuzz(docs):
    # ==1 test runs on fully-aggregated counts: a token seen once in
    # two different docs of the same source must NOT count as hapax
    documents = pa.table({
        "source": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([" ".join(d[1]) for d in docs], pa.string()),
    })
    _check("docs_hapax_rate", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
              st.integers(min_value=0, max_value=7200)),  # seconds
    min_size=1, max_size=40))
def test_session_length_hist_fuzz(rows):
    # 30-min gap sessionization -> length histogram: boundary gaps
    # (exactly 1800 s continues the session on both engines) and ts
    # ties (event_id order) must agree
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_session_length_hist", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),    # partkey
              st.integers(min_value=0, max_value=4),    # suppkey
              _MONEY),
    min_size=1, max_size=30))
def test_cheapest_supplier_fuzz(rows):
    # per-part argmin with exact-cents tie groups: several suppliers
    # hitting the same min cents must resolve to min suppkey
    lineitem = pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
    })
    part = pa.table({"p_partkey": pa.array(range(6), pa.int64())})
    _check("part_cheapest_supplier", {"lineitem": lineitem, "part": part})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),     # custkey
              st.integers(min_value=0, max_value=1100),  # day offset
              _MONEY),
    min_size=1, max_size=30))
def test_cohort_ltv_fuzz(rows):
    # first-year cohort attribution: a customer's every order lands in
    # its min-year cohort row, cents-exact revenue per triangle cell
    orders = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=r[1]) for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    })
    customer = pa.table({"c_custkey": pa.array(range(7), pa.int64())})
    _check("orders_cohort_ltv", {"orders": orders, "customer": customer})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),
              st.integers(min_value=0, max_value=10).map(lambda k: k / 100.0)),
    min_size=1, max_size=30))
def test_discount_deviation_fuzz(rows):
    # both means truncate BEFORE the subtraction: deviations must be
    # integer-identical, and the |dev| top-k tie order (abs desc,
    # suppkey) must pick the same supplier set
    lineitem = pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_discount": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("supplier_discount_deviation", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),    # suppkey
              _MONEY,
              st.integers(min_value=0, max_value=10).map(lambda k: k / 100.0)),
    min_size=1, max_size=30))
def test_region_share_fuzz(rows):
    # three collapsed dimension hops + truncating shares: negative
    # revenues can push a region's share below 0 or past 1e6, and a
    # zero world total pins the NULL/NaN share path on both engines
    lineitem = pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
        "l_discount": pa.array([r[2] for r in rows], pa.float64()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array(range(5), pa.int64()),
        "s_nationkey": pa.array([0, 1, 2, 3, 0], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array(range(4), pa.int64()),
        "n_regionkey": pa.array([0, 0, 1, 2], pa.int64()),
    })
    region = pa.table({
        "r_regionkey": pa.array(range(3), pa.int64()),
        "r_name": pa.array(["R0", "R1", "R2"], pa.string()),
    })
    _check("region_revenue_share",
           {"lineitem": lineitem, "supplier": supplier,
            "nation": nation, "region": region})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
              st.integers(min_value=0, max_value=7200),
              st.sampled_from(["view", "error"])),
    min_size=1, max_size=40))
def test_error_burst_sessions_fuzz(rows):
    # session error-flag fold: a session counts once however many
    # errors it contains; the all-null-user corpus pins the empty row
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    _check("events_error_burst_sessions", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(keys=st.lists(st.integers(min_value=3, max_value=40),
                     min_size=1, max_size=30))
def test_key_continuity_fuzz(keys):
    # duplicate keys count once in n_distinct but fully in n_rows;
    # holes derive from the span, not the row count
    orders = pa.table({"o_orderkey": pa.array(keys, pa.int64())})
    _check("orders_key_continuity", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), _MONEY),
    min_size=1, max_size=30))
def test_price_index_fuzz(rows):
    # ratio-of-means in HUGEINT cross products: both engines truncate
    # the same integer quotient; a zero global total is outside the
    # domain (SQL would divide by zero), as is per-type avg on n=0
    import hypothesis
    hypothesis.assume(sum(round(r[1] * 100) for r in rows) != 0)
    lineitem = pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    part = pa.table({
        "p_partkey": pa.array(range(6), pa.int64()),
        "p_type": pa.array([["T0", "T1", "T2"][i % 3] for i in range(6)],
                           pa.string()),
    })
    _check("part_type_price_index", {"lineitem": lineitem, "part": part})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(bals=st.lists(st.one_of(st.none(), _MONEY), min_size=1, max_size=12),
       order_rows=st.lists(
           st.tuples(st.integers(min_value=0, max_value=11), _MONEY),
           min_size=1, max_size=25))
def test_spend_balance_corr_fuzz(bals, order_rows):
    # cross-table moment fold: integer-dollar rounding on BOTH inputs,
    # customers without orders drop, constant columns pin the NaN path
    customer = pa.table({
        "c_custkey": pa.array(range(len(bals)), pa.int64()),
        "c_acctbal": pa.array(bals, pa.float64()),
    })
    orders = pa.table({
        "o_custkey": pa.array([r[0] for r in order_rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in order_rows], pa.float64()),
    })
    _check("customer_spend_balance_corr",
           {"customer": customer, "orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3"]),
              st.lists(st.sampled_from(["a", "b", "c", "d"]),
                       min_size=0, max_size=8)),
    min_size=1, max_size=12))
def test_source_vocab_jaccard_fuzz(docs):
    # per-token pair fan-out == SQL self-join on the distinct vocab:
    # zero-intersection pairs must be ABSENT (not 0 rows) on both
    documents = pa.table({
        "source": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([" ".join(d[1]) for d in docs], pa.string()),
    })
    _check("docs_source_vocab_jaccard", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=1, max_value=7),
              _MONEY,
              st.integers(min_value=1, max_value=50)),
    min_size=1, max_size=30))
def test_position_stats_fuzz(rows):
    # signed truncating ppm means over cents/quantity sums: negative
    # price sums flip the division sign identically on both engines
    lineitem = pa.table({
        "l_linenumber": pa.array([r[0] for r in rows], pa.int32()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
        "l_quantity": pa.array([float(r[2]) for r in rows], pa.float64()),
    })
    _check("lineitem_position_stats", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),
              st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
              st.sampled_from(["view", "click", "purchase"])),
    min_size=2, max_size=30))
def test_transition_entropy_fuzz(rows):
    # micro-nat term rounding over the markov counts: single-successor
    # types pin H=0 exactly (ln(n) - n*ln(n)/n), ties follow event_id
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[0]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    _check("events_type_transition_entropy", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(edays=st.lists(st.integers(min_value=0, max_value=8),
                      min_size=0, max_size=20),
       odays=st.lists(st.integers(min_value=0, max_value=8),
                      min_size=1, max_size=20))
def test_activity_overlay_fuzz(edays, odays):
    # full-outer calendar merge: days present on only one side must
    # report a 0 (not drop) on both engines
    events = pa.table({
        "ts": pa.array([_BASE + dt.timedelta(days=d) for d in edays],
                       pa.timestamp("us")),
    })
    orders = pa.table({
        "o_orderdate": pa.array([_BASE + dt.timedelta(days=d)
                                 for d in odays], pa.timestamp("us")),
    })
    _check("daily_activity_overlay", {"events": events, "orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(lines=st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), _MONEY,
              st.integers(min_value=0, max_value=10).map(lambda k: k / 100.0),
              st.integers(min_value=0, max_value=8).map(lambda k: k / 100.0)),
    min_size=1, max_size=25),
    totals=st.lists(_MONEY, min_size=1, max_size=7))
def test_reconcile_fuzz(lines, totals):
    # header-vs-lines drift fold: the net formula multiplies in the
    # same order on both engines, and exact-cents equality is the
    # match rule (no tolerance)
    lineitem = pa.table({
        "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in lines], pa.float64()),
        "l_discount": pa.array([r[2] for r in lines], pa.float64()),
        "l_tax": pa.array([r[3] for r in lines], pa.float64()),
    })
    orders = pa.table({
        "o_orderkey": pa.array(range(len(totals)), pa.int64()),
        "o_totalprice": pa.array(totals, pa.float64()),
    })
    _check("orders_lineitem_reconcile",
           {"lineitem": lineitem, "orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(vals=st.lists(_MONEY, min_size=1, max_size=30))
def test_value_magnitude_hist_fuzz(vals):
    # digit-count binning: non-positive cents are outside the
    # histogram; power-of-ten boundaries must bucket identically
    events = pa.table({"value": pa.array(vals, pa.float64())})
    _check("events_value_magnitude_hist", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.sampled_from([
        "",  # gate-failing empty
        "the and of to in " * 8,          # passes all three gates
        "x1 y2 z3",                       # too few tokens
        "### $$$ %%% " * 12,              # alpha gate fails
        "the and of to in " * 8 + "!!",   # near-duplicate variant
    ]),
    min_size=1, max_size=12))
def test_pipeline_yield_fuzz(docs):
    # funnel counts must agree at every stage: duplicate texts keep
    # min doc_id, the quality gate compares the same rounded metrics
    documents = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    })
    _check("docs_pipeline_yield", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", "dddd", "eeeeeee"]),
             min_size=0, max_size=10),
    min_size=1, max_size=12))
def test_token_len_hist_fuzz(docs):
    # codepoint-length binning must match SQL length() per token
    documents = pa.table({
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })
    _check("docs_token_len_hist", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["view", "click", "error"]),
              st.integers(min_value=0, max_value=200_000_000)),  # us
    min_size=1, max_size=30))
def test_type_time_coverage_fuzz(rows):
    # exact int64 microsecond extrema and whole-day span truncation
    events = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([_BASE + dt.timedelta(microseconds=r[1])
                        for r in rows], pa.timestamp("us")),
    })
    _check("events_type_time_coverage", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.sampled_from([
        "", "the and of to in " * 8, "x1 y2 z3",
        "### $$$ %%% " * 12, "words only here " * 12,
    ]),
    min_size=1, max_size=12))
def test_gate_attribution_fuzz(docs):
    # independent kill counters: a doc failing two gates increments
    # both; pass requires clearing all three on the ROUNDED metrics
    documents = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    _check("docs_quality_gate_attribution", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
              st.integers(min_value=0, max_value=8000)),   # seconds
    min_size=1, max_size=40))
def test_gap_sensitivity_fuzz(rows):
    # one-pass multi-gap counts: boundary deltas (exactly 900/1800/3600
    # s continue the session) must agree at every gap simultaneously
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_session_gap_sensitivity", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(ks=st.lists(st.integers(min_value=0, max_value=30),
                   min_size=1, max_size=30))
def test_props_k_hist_fuzz(ks):
    # JSON k extraction histogram: duplicate values fold, the domain
    # bounds the output
    events = pa.table({
        "props": pa.array(['{"k": %d}' % k for k in ks], pa.string()),
    })
    _check("events_props_k_hist", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),    # partkey
              st.integers(min_value=0, max_value=4)),   # suppkey
    min_size=1, max_size=30))
def test_supplier_counts_fuzz(rows):
    # distinct-through-join: a supplier shipping the same part twice
    # counts once per type; dangling partkeys drop via the inner join
    lineitem = pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    part = pa.table({
        "p_partkey": pa.array(range(5), pa.int64()),   # key 5 dangles
        "p_type": pa.array([["T0", "T1"][i % 2] for i in range(5)],
                           pa.string()),
    })
    _check("part_type_supplier_counts", {"lineitem": lineitem,
                                         "part": part})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),
              st.integers(min_value=0, max_value=6)),
    min_size=1, max_size=30))
def test_catalog_breadth_fuzz(rows):
    # two-level dedup/count: histogram buckets must fold duplicates at
    # both levels identically
    lineitem = pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    _check("supplier_catalog_breadth", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["view", "click", "error"]),
              st.integers(min_value=0, max_value=20)),  # day offset
    min_size=1, max_size=40))
def test_type_dow_matrix_fuzz(rows):
    # (epoch_days + 4) % 7 weekday convention + per-type truncating
    # shares must agree across week boundaries
    events = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([_BASE + dt.timedelta(days=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_type_dow_matrix", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["A", "N", "R"]), _MONEY,
              st.integers(min_value=0, max_value=10).map(lambda k: k / 100.0)),
    min_size=1, max_size=30))
def test_discount_uplift_fuzz(rows):
    # giveaway = gross - net as INTEGER cents difference: half-cent
    # rounding happens per column, so the difference is order-immune
    lineitem = pa.table({
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
        "l_discount": pa.array([r[2] for r in rows], pa.float64()),
    })
    _check("lineitem_discount_uplift", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=8),     # custkey
              st.integers(min_value=0, max_value=1),     # year offset
              _MONEY),
    min_size=1, max_size=30))
def test_top_growth_fuzz(rows):
    # positive-prior gate + signed truncating growth + (growth desc,
    # custkey) top-k tie order must agree; negative current years
    # produce growth below -1e6 ppm
    import hypothesis
    prev = {}
    for ck, yo, p in rows:
        if yo == 0:
            prev[ck] = prev.get(ck, 0) + round(p * 100)
    hypothesis.assume(any(v > 0 for v in prev.values()))
    orders = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [dt.datetime(1996 + r[1], 6, 1) for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    })
    _check("orders_top_growth_customers", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["s1", "s2"]),
              st.integers(min_value=0, max_value=50)),
    min_size=1, max_size=40))
def test_source_median_fuzz(rows):
    # quantile_disc rank rule over the distributed histogram: even
    # counts pick the lower-middle value on both engines
    documents = pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_chars": pa.array([r[1] for r in rows], pa.int64()),
    })
    _check("docs_source_median_chars", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(users=st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
    min_size=1, max_size=50))
def test_power_users_share_fuzz(users):
    # top-k selection ties (count desc, user asc) and the truncating
    # share must agree; fewer than k users covers everything
    import hypothesis
    hypothesis.assume(any(u is not None for u in users))
    events = pa.table({"user_id": pa.array(users, pa.int64())})
    _check("events_power_users_share", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.sampled_from(["", "abc def", "a1b2", "### $$$", "pure words here",
                     "half 1234 mix"]),
    min_size=1, max_size=15))
def test_quality_metric_hist_fuzz(docs):
    # banding on the ROUNDED 4-digit metric: 0.05-boundary values
    # (e.g. exactly 0.5000) must land in the same band on both engines
    documents = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    _check("docs_quality_metric_hist", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
             min_size=0, max_size=12),
    min_size=1, max_size=12))
def test_coverage_curve_fuzz(docs):
    # the (count desc, tok) total order pins the top-k set through
    # ties; k past the vocab size must cover everything exactly
    import hypothesis
    hypothesis.assume(any(d for d in docs))
    documents = pa.table({
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })
    _check("docs_token_coverage_curve", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]),
             min_size=0, max_size=10),
    min_size=1, max_size=12))
def test_bigram_entropy_rate_fuzz(docs):
    # micro-nat folds over bigram AND first-token counts must both be
    # order-free; single-doc and single-token corpora pin the empty /
    # zero-entropy paths
    documents = pa.table({
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })
    _check("docs_bigram_entropy_rate", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
              st.integers(min_value=0, max_value=7200),
              _MONEY),
    min_size=1, max_size=40))
def test_session_value_fuzz(rows):
    # per-session cents sums + truncating mean: negative session
    # values flip the division sign identically on both engines
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    _check("events_session_value", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),
              st.floats(min_value=0.5, max_value=1e5,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=30))
def test_price_dispersion_fuzz(rows):
    # CV from one identical double expression: constant-price
    # suppliers pin cv=0.0 exactly; the s>0 gate binds on both sides
    lineitem = pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("supplier_price_dispersion", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10),
    min_size=1, max_size=12))
def test_simpson_index_fuzz(docs):
    # integer-exact quadratic diversity: sub-2-token corpora are
    # outside the domain (empty result) on both engines
    documents = pa.table({
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })
    _check("docs_simpson_index", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["A", "N", "R"]),
              st.integers(min_value=1, max_value=8)),
    min_size=1, max_size=40))
def test_qty_mode_fuzz(rows):
    # per-group argmax with (count desc, qty asc) ties: equal-count
    # modes must resolve to the smallest quantity on both engines
    lineitem = pa.table({
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_quantity": pa.array([float(r[1]) for r in rows], pa.float64()),
    })
    _check("lineitem_qty_mode", {"lineitem": lineitem})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(users=st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=8)),
    min_size=1, max_size=60))
def test_user_count_mad_fuzz(users):
    # double quantile_disc walk (median then MAD of deviations) and
    # the > med + 3*MAD boundary must agree exactly
    import hypothesis
    hypothesis.assume(any(u is not None for u in users))
    events = pa.table({"user_id": pa.array(users, pa.int64())})
    _check("events_user_count_mad", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
              st.integers(min_value=0, max_value=300)),   # seconds
    min_size=1, max_size=40))
def test_rate_limit_sim_fuzz(rows):
    # least(c, cap) fold over (user, minute) buckets: exactly-at-cap
    # minutes keep everything, null users are invisible to the limiter
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_rate_limit_sim", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.sampled_from(
        ["", "tiny", "long enough text here"])),
        st.one_of(st.none(), st.sampled_from(["en", "de"])),
        st.one_of(st.none(), st.sampled_from(["s1"]))),
    min_size=1, max_size=20))
def test_field_completeness_fuzz(rows):
    # NULL vs empty vs short are three distinct counters; NULL text
    # must not leak into the empty/short buckets
    documents = pa.table({
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    _check("docs_field_completeness", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
              st.integers(min_value=0, max_value=10 * 86400)),  # seconds
    min_size=1, max_size=40))
def test_first_week_activation_fuzz(rows):
    # the <= first + 7d boundary (inclusive) and the >= 5 gate must
    # agree; events past the window never count
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_first_week_activation", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]),
             min_size=0, max_size=10),
    min_size=1, max_size=10))
def test_dup_threshold_sweep_fuzz(docs):
    # one pair frame, four monotone counts: n_pairs must be
    # non-increasing in threshold and match the SQL FILTER counts
    documents = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })
    _check("docs_dup_threshold_sweep", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), _MONEY),
    min_size=1, max_size=30))
def test_repeat_rate_fuzz(rows):
    # >= 2-order gate + revenue-share trunc: negative revenues can
    # push the repeat share outside [0, 1e6]; zero total is outside
    # the domain (SQL divides by it)
    import hypothesis
    hypothesis.assume(sum(round(r[1] * 100) for r in rows) != 0)
    orders = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("orders_customer_repeat_rate", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(docs=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                     min_size=1, max_size=30))
def test_top_dup_families_fuzz(docs):
    # family fold (count, min-doc keeper, chars) + the (copies desc,
    # keeper) top-k tie order; singleton families are excluded
    documents = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    })
    _check("docs_top_dup_families", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(order_cust=st.lists(st.integers(min_value=0, max_value=9),
                           min_size=1, max_size=30))
def test_single_order_by_nation_fuzz(order_cust):
    # ==1 gate through the dimension hop: customers without orders
    # are invisible (u drives the join), repeat customers count once
    orders = pa.table({
        "o_custkey": pa.array(order_cust, pa.int64()),
    })
    customer = pa.table({
        "c_custkey": pa.array(range(10), pa.int64()),
        "c_nationkey": pa.array([i % 3 for i in range(10)], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array(range(3), pa.int64()),
        "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
    })
    _check("customer_single_order_by_nation",
           {"orders": orders, "customer": customer, "nation": nation})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]),
             min_size=0, max_size=10),
    min_size=1, max_size=10))
def test_shingle_df_hist_fuzz(docs):
    # per-doc DISTINCT shingles before the df count: a shingle
    # repeated inside one doc contributes df=1, sub-3-token docs none
    documents = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })
    _check("docs_shingle_df_hist", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES)
def test_price_qty_ols_fuzz(rows):
    # grouped moment fold vs DuckDB's fold; degenerate variances
    # (single-row flags, constant quantity) must agree as NaN/NULL
    _check("lineitem_price_qty_ols", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_type_dow_chisq_fuzz(rows):
    # contingency grid must include observed-zero cells; micro-rounded
    # terms keep the fold order-free; dof-0 grids (one type or one
    # weekday) must agree as NaN/NULL Cramer's V
    _check("events_type_dow_chisq", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES)
def test_qty_discount_spearman_fuzz(rows):
    # histogram-derived average ranks vs window-cumsum ranks; constant
    # columns (zero rank variance) must agree as NaN/NULL
    _check("lineitem_qty_discount_spearman", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES)
def test_charge_unpivot_fuzz(rows):
    # wide->long melt totals vs the UNION ALL it replaces (exact ints)
    _check("lineitem_charge_unpivot", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_value_ks_fuzz(rows):
    # exact cross-multiplied CDF walk vs window cumsums; one-sided
    # samples (no purchases drawn) must agree as zero rows
    _check("events_value_ks_test", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_value_mannwhitney_fuzz(rows):
    # 2U integrality + tie handling (c2/2 tie credit) vs the window
    # ROWS ... 1 PRECEDING cumulative
    _check("events_value_mannwhitney", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_hourly_autocorr_fuzz(rows):
    # dense-hour zero fill: silent hours must enter the lag pairs on
    # both engines; single-hour spans agree as zero rows
    _check("events_hourly_autocorr", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(
    st.integers(min_value=0, max_value=8),          # user_id
    st.integers(min_value=0, max_value=20 * 86400), # seconds offset
), min_size=1, max_size=30))
def test_cumulative_users_fuzz(rows):
    # first-seen fold vs running COUNT(DISTINCT); silent days must
    # appear with the carried-forward total on both engines
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_cumulative_users", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_cusum_shift_fuzz(rows):
    # integer-scaled CUSUM argmax vs the SQL window walk; silent hours
    # must enter the walk as zeros; |S_k| ties must break to the
    # earliest hour on both engines
    _check("events_cusum_shift", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES)
def test_qty_discount_kendall_fuzz(rows):
    # histogram-derived concordant/discordant counts vs the SQL cell
    # self-join; tie-heavy and constant columns must agree as NaN when
    # (n0-n1)(n0-n2) = 0
    _check("lineitem_qty_discount_kendall", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES)
def test_status_cube_fuzz(rows):
    # the driver-derived coarse grouping sets must match SQL CUBE
    # exactly, including NULL level markers and exact-cents sums
    _check("lineitem_status_cube", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(
    st.integers(min_value=0, max_value=6),           # user_id
    st.integers(min_value=0, max_value=30 * 86400),  # seconds offset
), min_size=1, max_size=30))
def test_retention_km_fuzz(rows):
    # suffix-sum risk sets + the sequential double product vs the
    # recursive-CTE replay; all-censored corpora must agree as zero
    # rows; same-day users (dur=0) must enter the first risk set
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    _check("events_retention_km", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(
    st.integers(min_value=0, max_value=6),            # user_id
    st.integers(min_value=0, max_value=200_000),      # seconds offset
    st.sampled_from(["view", "click", "purchase"]),
), min_size=1, max_size=30))
def test_conversion_lag_fuzz(rows):
    # conditional-min folds vs SQL CASE mins; purchase-before-click
    # users must drop on both engines; lag buckets by truncating µs
    # division
    events = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    _check("events_conversion_lag_hist", {"events": events})


_DIM_NATION = pa.table({
    "n_nationkey": pa.array([0, 1, 2], pa.int64()),
    "n_name": pa.array(["ALPHA", "BETA", "GAMMA"], pa.string()),
    "n_regionkey": pa.array([0, 0, 1], pa.int64()),
})
_DIM_SUPPLIER = pa.table({
    "s_suppkey": pa.array([0, 1, 2, 3], pa.int64()),
    "s_name": pa.array([f"S{i}" for i in range(4)], pa.string()),
    "s_nationkey": pa.array([0, 1, 2, 0], pa.int64()),
    "s_acctbal": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES, skeys=st.lists(st.integers(min_value=0, max_value=3),
                                   min_size=1, max_size=30))
def test_q9_profit_cents_fuzz(rows, skeys):
    # cents discipline through the dimension chain: the per-row rounded
    # profit must sum bit-equal across the broadcast join
    li = _lineitem(rows)
    n = len(li)
    li = li.append_column(
        "l_suppkey", pa.array([skeys[i % len(skeys)] for i in range(n)],
                              pa.int64()))
    _check("q9_profit_by_nation_year",
           {"lineitem": li, "supplier": _DIM_SUPPLIER,
            "nation": _DIM_NATION})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_acf_grid_fuzz(rows):
    # one histogram pass must reproduce every lag's window self-join;
    # short series must drop high lags (no pairs) on both engines and
    # zero-variance slices must agree as NaN via the DOUBLE-product gate
    _check("events_acf_grid", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES, pkeys=st.lists(st.integers(min_value=0, max_value=5),
                                   min_size=1, max_size=30))
def test_q11_important_parts_fuzz(rows, pkeys):
    # the exact-rational HAVING (value*10000 > total, evaluated as the
    # overflow-free floor compare) must agree with the HUGEINT SQL
    # product for any sign mix, including all-negative totals
    li = _lineitem(rows)
    n = len(li)
    li = li.append_column(
        "l_partkey", pa.array([pkeys[i % len(pkeys)] for i in range(n)],
                              pa.int64()))
    _check("q11_important_parts", {"lineitem": li})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES,
       pkeys=st.lists(st.integers(min_value=0, max_value=5),
                      min_size=1, max_size=30),
       skeys=st.lists(st.integers(min_value=0, max_value=3),
                      min_size=1, max_size=30))
def test_q20_dominant_suppliers_fuzz(rows, pkeys, skeys):
    # centi-unit quantity dominance (5q > tq) across the pair combine,
    # the partkey re-combine and the hash join must match the SQL
    # integer compare exactly — boundary shares included
    li = _lineitem(rows)
    n = len(li)
    li = li.append_column(
        "l_partkey", pa.array([pkeys[i % len(pkeys)] for i in range(n)],
                              pa.int64()))
    li = li.append_column(
        "l_suppkey", pa.array([skeys[i % len(skeys)] for i in range(n)],
                              pa.int64()))
    _check("q20_dominant_suppliers",
           {"lineitem": li, "supplier": _DIM_SUPPLIER})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES,
       okeys=st.lists(st.integers(min_value=0, max_value=8),
                      min_size=1, max_size=30),
       skeys=st.lists(st.integers(min_value=0, max_value=3),
                      min_size=1, max_size=30))
def test_q21_last_shippers_fuzz(rows, okeys, skeys):
    # argmax-uniqueness semantics: shipdate ties on the order max must
    # disqualify (n_at_max > 1) identically on both engines, and
    # single-supplier orders must never count
    li = _lineitem(rows)
    n = len(li)
    li = li.append_column(
        "l_orderkey", pa.array([okeys[i % len(okeys)] for i in range(n)],
                               pa.int64()))
    li = li.append_column(
        "l_suppkey", pa.array([skeys[i % len(skeys)] for i in range(n)],
                              pa.int64()))
    _check("q21_last_shippers",
           {"lineitem": li, "supplier": _DIM_SUPPLIER})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES)
def test_theilsen_fuzz(rows):
    # weighted-median-of-cell-slopes must replay the SQL window-cumsum
    # walk exactly: slope doubles group identically, the lower-median
    # rule (2*cum >= W) matches, and all-equal-quantity inputs yield
    # empty frames on both engines
    _check("lineitem_qty_discount_theilsen", {"lineitem": _lineitem(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_welch_t_fuzz(rows):
    # exact-moment Welch t: identical int64 (n, s, ss) operands on both
    # engines; sides with < 2 rows or zero pooled variance agree as NaN
    # (DuckDB's NULL-on-double-div-zero feeds the same CASE gate)
    _check("events_value_welch_t", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES, pkeys=st.lists(st.integers(min_value=0, max_value=5),
                                   min_size=1, max_size=30))
def test_abc_class_fuzz(rows, pkeys):
    # the cumulative 80/95 walk must match the SQL window exactly:
    # (revenue desc, partkey) tie-break, HUGEINT-safe integer threshold
    # compares, and sign-mixed revenues (non-monotone cum) included
    li = _lineitem(rows)
    n = len(li)
    li = li.append_column(
        "l_partkey", pa.array([pkeys[i % len(pkeys)] for i in range(n)],
                              pa.int64()))
    _check("lineitem_abc_class", {"lineitem": li})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_overdispersion_fuzz(rows):
    # silent-hour densification and the exact-int population moments
    # must agree for any arrival pattern, including single-hour series
    # (variance 0 -> dispersion 0.0 on both engines)
    _check("events_overdispersion", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS,
       users=st.lists(st.one_of(st.none(),
                                st.integers(min_value=0, max_value=6)),
                      min_size=1, max_size=30))
def test_type_breadth_fuzz(rows, users):
    # two-level distinct combine: NULL users drop, per-user distinct
    # type counts histogram identically at any block split
    ev = _events(rows)
    n = len(ev)
    ev = ev.append_column(
        "user_id", pa.array([users[i % len(users)] for i in range(n)],
                            pa.int64()))
    _check("events_user_type_breadth", {"events": ev})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_revenue_trend_fuzz(rows):
    # dense-day OLS: silent-day densification plus exact-int normal
    # equations must match the SQL HUGEINT moments; single-day spans
    # agree as NaN on both engines
    _check("events_revenue_trend", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_weekend_lift_fuzz(rows):
    # arithmetic (d+4)%7 weekday classification over the dense span:
    # no calendar function on either engine; zero-weekday-revenue spans
    # agree as NaN
    _check("events_weekend_lift", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(vals=st.lists(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=1, max_size=12))
def test_emb_covariance_fuzz(vals):
    # micro-int X^T X partials (decimal-string transport) must fold to
    # the SQL self-join's HUGEINT cross moments exactly; single-vector
    # corpora pin cov = 0 on both engines
    embeddings = pa.table({
        "vec_id": pa.array(range(len(vals)), pa.int64()),
        "embedding": pa.array(vals, pa.list_(pa.float32())),
    })
    _check("emb_covariance", {"embeddings": embeddings})


_SEGMENT = st.sampled_from(["AUTOMOBILE", "BUILDING", "MACHINERY"])


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(_SEGMENT, _MONEY), min_size=1,
                     max_size=30))
def test_segment_welch_matrix_fuzz(rows):
    # all-pairs Welch from one moment fold: every pair's gate
    # (either side < 2 rows, zero pooled variance) must agree as NaN,
    # and pairs must order lexicographically on both engines
    customer = pa.table({
        "c_custkey": pa.array(range(len(rows)), pa.int64()),
        "c_mktsegment": pa.array([r[0] for r in rows], pa.string()),
        "c_acctbal": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("customer_segment_welch_matrix", {"customer": customer})


_PRIORITY = st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES,
       okeys=st.lists(st.integers(min_value=0, max_value=8),
                      min_size=1, max_size=30),
       ordrows=st.lists(st.tuples(st.integers(min_value=0, max_value=700),
                                  _PRIORITY),
                        min_size=9, max_size=9))
def test_q12_late_priority_fuzz(rows, okeys, ordrows):
    # the 60-day boundary must bind identically (>= compare on int64
    # epoch-us vs SQL INTERVAL arithmetic) and the priority split must
    # count LINES, not distinct orders, through the per-batch shrink
    li = _lineitem(rows)
    n = len(li)
    li = li.append_column(
        "l_orderkey", pa.array([okeys[i % len(okeys)] for i in range(n)],
                               pa.int64()))
    orders = pa.table({
        "o_orderkey": pa.array(range(9), pa.int64()),
        "o_orderdate": pa.array(
            [_BASE + dt.timedelta(days=r[0]) for r in ordrows],
            pa.timestamp("us")),
        "o_orderpriority": pa.array([r[1] for r in ordrows],
                                    pa.string()),
    })
    _check("q12_late_priority_split", {"lineitem": li, "orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_revenue_ewma_fuzz(rows):
    # the sequential EWMA recurrence must replay bit-equal through the
    # recursive CTE (window products would re-associate); peak ties
    # resolve to the earliest hour on both engines
    _check("events_revenue_ewma", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(min_value=0, max_value=500),
                               _MONEY),
                     min_size=1, max_size=30))
def test_seasonal_index_fuzz(rows):
    # calendar-month grouping (pyarrow month vs SQL month) plus the
    # ratio-of-means must agree, including a zero global mean -> NaN
    orders = pa.table({
        "o_orderdate": pa.array([_BASE + dt.timedelta(days=r[0])
                                 for r in rows], pa.timestamp("us")),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("orders_seasonal_index", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(min_value=0, max_value=12),
                               _MONEY),
                     min_size=1, max_size=30))
def test_top_decile_share_fuzz(rows):
    # k = (n+9)//10 and the (rev desc, custkey) tie order must pick the
    # identical top set; zero/negative totals gate as NaN
    orders = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("orders_top_decile_share", {"orders": orders})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES, pkeys=st.lists(st.integers(min_value=0, max_value=5),
                                   min_size=1, max_size=30))
def test_price_competition_fuzz(rows, pkeys):
    # second-order group statistic: the distinct combine, the
    # drop-the-min join and the second-min re-combine must agree with
    # the SQL, including single-distinct-price parts (NULL runner-up)
    # and the exact-rational 1% tightness compare under negative prices
    li = _lineitem(rows)
    n = len(li)
    li = li.append_column(
        "l_partkey", pa.array([pkeys[i % len(pkeys)] for i in range(n)],
                              pa.int64()))
    _check("part_price_competition", {"lineitem": li})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS,
       errs=st.lists(st.booleans(), min_size=1, max_size=30))
def test_error_pchart_fuzz(rows, errs):
    # the 3-sigma limit test runs on raw identical doubles (strict >)
    # — boundary hours must flag identically; all-error and no-error
    # streams yield zero-width limits on both engines
    ev = _events(rows)
    n = len(ev)
    types = ["error" if errs[i % len(errs)] else "view"
             for i in range(n)]
    ev = ev.set_column(1, "event_type", pa.array(types, pa.string()))
    _check("events_error_pchart", {"events": ev})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_runs_test_fuzz(rows):
    # lower-median split (exact int compare), sequential runs count and
    # the large-sample Z must agree; constant series (all at the
    # median) degenerate to NaN on both engines
    _check("events_revenue_runs_test", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(vals=st.lists(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=1, max_size=12),
    lens=st.lists(st.integers(min_value=0, max_value=100000),
                  min_size=1, max_size=12))
def test_emb_length_norm_corr_fuzz(vals, lens):
    # cross-modal join + string-transported big moments: the corr must
    # match the SQL HUGEINT fold; constant lengths or constant norms
    # (zero variance) agree as NaN through the DOUBLE-product gate
    n = len(vals)
    embeddings = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vals, pa.list_(pa.float32())),
    })
    documents = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array([lens[i % len(lens)] for i in range(n)],
                            pa.int64()),
    })
    _check("docs_emb_length_norm_corr",
           {"documents": documents, "embeddings": embeddings})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS,
       users=st.lists(st.integers(min_value=0, max_value=4),
                      min_size=1, max_size=30))
def test_session_abandonment_fuzz(rows, users):
    # session-granular funnel: the 30-min boundary, the per-session
    # max-flags and the truncating ppm must agree; purchase-only
    # sessions contribute nothing to either count
    ev = _events(rows)
    n = len(ev)
    ev = ev.append_column(
        "user_id", pa.array([users[i % len(users)] for i in range(n)],
                            pa.int64()))
    ev = ev.append_column("event_id",
                          pa.array(range(n), pa.int64()))
    _check("events_session_abandonment", {"events": ev})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(min_value=0, max_value=4),
                               _MONEY),
                     min_size=1, max_size=30))
def test_nation_anova_fuzz(rows):
    # the order-sensitive sum of per-group s^2/n doubles is made
    # order-free by micro-rounding each term before the exact sum —
    # SSB/SSW must match the SQL HUGEINT fold for any group mix, and
    # single-group / zero-within-variance designs agree as NaN
    customer = pa.table({
        "c_nationkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_acctbal": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("customer_nation_anova", {"customer": customer})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(min_value=0, max_value=4),
                               _MONEY),
                     min_size=1, max_size=30))
def test_jackknife_fuzz(rows):
    # leave-one-group-out pseudo-values micro-round before the exact
    # sum, so the SE matches the SQL HUGEINT fold in any group order;
    # single-group designs agree as NaN
    customer = pa.table({
        "c_nationkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_acctbal": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("customer_balance_jackknife", {"customer": customer})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(pairs=st.lists(st.tuples(st.sampled_from(["en", "de", "fr"]),
                                st.sampled_from(["web", "wiki"])),
                      min_size=1, max_size=30))
def test_cramers_v_fuzz(pairs):
    # the dense expected grid (absent cells contribute!) and the
    # micro-rounded chi-square terms must fold identically; 1xC and
    # Rx1 tables agree as NaN effect size
    documents = pa.table({
        "doc_id": pa.array(range(len(pairs)), pa.int64()),
        "lang": pa.array([p[0] for p in pairs], pa.string()),
        "source": pa.array([p[1] for p in pairs], pa.string()),
    })
    _check("docs_lang_source_cramers_v", {"documents": documents})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_LINES,
       taxes=st.lists(st.integers(min_value=0, max_value=8).map(
           lambda k: k / 100.0), min_size=1, max_size=30))
def test_tax_discount_grid_fuzz(rows, taxes):
    # 2-factor interaction lattice: cents ratio-of-sums per cell must
    # divide identical integers on both engines, half-cent charges
    # included (the shared fixture lacks l_tax, so append it)
    li = _lineitem(rows)
    n = len(li)
    li = li.append_column(
        "l_tax", pa.array([taxes[i % len(taxes)] for i in range(n)],
                          pa.float64()))
    _check("lineitem_tax_discount_grid", {"lineitem": li})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS,
       users=st.lists(st.one_of(st.none(),
                                st.integers(min_value=0, max_value=5)),
                      min_size=1, max_size=30))
def test_dayn_retention_fuzz(rows, users):
    # first-day fold + flag join: day-1/day-7 presence must count per
    # USER (not per event), NULL users drop, truncating ppm agrees
    ev = _events(rows)
    n = len(ev)
    ev = ev.append_column(
        "user_id", pa.array([users[i % len(users)] for i in range(n)],
                            pa.int64()))
    _check("events_dayn_retention", {"events": ev})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_EVENTS)
def test_hourly_type_entropy_fuzz(rows):
    # per-hour-of-day type-mix entropy: micro-rounded c*ln(c) terms
    # fold order-free; single-type hours pin entropy to 0.0
    _check("events_hourly_type_entropy", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(min_value=1, max_value=50),
                               _MONEY),
                     min_size=1, max_size=30))
def test_part_size_price_corr_fuzz(rows):
    # dimension-table moment fold with string-transported y^2: constant
    # size or price degenerates to NaN via the DOUBLE-product gate
    part = pa.table({
        "p_partkey": pa.array(range(len(rows)), pa.int64()),
        "p_size": pa.array([r[0] for r in rows], pa.int32()),
        "p_retailprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    _check("part_size_price_corr", {"part": part})


# --- round 4: bucketed point-in-interval RANGE JOIN ---------------------------

_RJ_EVENT = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # user
    st.integers(min_value=0, max_value=14_400),       # seconds offset (4 h)
    st.sampled_from(["view", "click", "purchase"]),
)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=st.lists(_RJ_EVENT, min_size=1, max_size=40))
def test_purchase_session_overlap_fuzz(rows):
    """The bucketed range join must match DuckDB's inequality join on
    adversarial inputs: NULL users, duplicate timestamps, sessions that
    straddle bucket boundaries, exact 30-min gap ties, single-event
    sessions whose interval is a point."""
    events = pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([_BASE + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    _check("events_purchase_session_overlap", {"events": events})


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
             min_size=0, max_size=10),
    min_size=1, max_size=10))
def test_simhash_eval_fuzz(docs):
    """Composed candidate-quality eval: the simhash screen and the exact
    Jaccard truth set are each independently oracled; this pins the
    composition — set intersection, truncating ppm, and the NULL/NaN
    degenerate denominators (empty docs make empty signatures and no
    truth pairs)."""
    from pdf_parser_ray.pipelines import queries as q

    q.clear_session_caches()  # fake sf_dir keys must not hit stale memos
    documents = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs], pa.string()),
    })
    _check("docs_simhash_eval", {"documents": documents})
