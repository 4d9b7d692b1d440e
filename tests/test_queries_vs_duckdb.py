"""Driver-style correctness gate, run locally: every queries() entry with
an oracle_sql() twin must match DuckDB on row count, column names, and
(order-insensitively) values."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    # EXACT equality on purpose: the rounding discipline (half-away at a
    # fixed scale on identically-computed doubles) makes Ray and DuckDB
    # agree bit-for-bit; a tolerance here would only hide regressions.
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


SQL_QUERIES = sorted(entrymod.oracle_sql())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(con, name):
    ray_df = _canon(_to_df(entrymod.queries()[name](SF_DIR)))
    sql_df = _canon(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"columns differ: {list(ray_df.columns)} vs {list(sql_df.columns)}")
    assert len(ray_df) == len(sql_df), f"row count {len(ray_df)} vs {len(sql_df)}"
    for col in ray_df.columns:
        for i, (x, y) in enumerate(zip(ray_df[col], sql_df[col])):
            assert _values_equal(x, y), f"{name}.{col}[{i}]: {x!r} != {y!r}"


NON_SQL = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", NON_SQL)
def test_rows_only_queries_run(name):
    df = _to_df(entrymod.queries()[name](SF_DIR))
    assert df.shape[0] >= 0
    # determinism: a second run yields identical bytes
    df2 = _to_df(entrymod.queries()[name](SF_DIR))
    pd.testing.assert_frame_equal(_canon(df), _canon(df2))


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    result = entrymod.entry()
    df = _to_df(result)
    assert len(df) > 0
    assert "url" in df.columns
