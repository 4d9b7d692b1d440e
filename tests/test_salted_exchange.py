"""Direct semantics tests for the salted exchange primitives
(relational.salted_agg / salted_map_groups): equal keys MUST co-locate
regardless of per-batch null patterns, NULL keys must survive like SQL
GROUP BY, and results must equal Ray's key-sorted aggregate bit-for-bit
on order-insensitive ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pdf_parser_ray.pipelines import relational as rel


def _sorted_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_salted_agg_matches_sorted_aggregate():
    rng = np.random.RandomState(3)
    t = pa.table({
        "k": rng.randint(0, 500, 5000).astype(np.int64),
        "v": rng.randint(-100, 100, 5000).astype(np.int64),
    })
    ds = ray.data.from_arrow(t).repartition(7)
    from ray.data.aggregate import Max, Min, Sum

    legacy = ds.groupby("k").aggregate(
        Sum("v", alias_name="s"), Min("v", alias_name="mn"),
        Max("v", alias_name="mx")).to_pandas()
    salted = rel.salted_agg(ds, ["k"], [("v", "sum", "s"),
                                        ("v", "min", "mn"),
                                        ("v", "max", "mx")],
                            num_partitions=5).to_pandas()
    pd.testing.assert_frame_equal(_sorted_df(legacy), _sorted_df(salted))


@pytest.mark.usefixtures("ray_session")
def test_salted_agg_null_dtype_canonicalization():
    """The trap the Arrow-canonical hash exists for: an int64 key column
    whose batches differ in null-presence converts to int64 in one
    pandas block and float64 in another — a pandas-roundtrip hash then
    splits EQUAL keys across partitions. Build batches engineered that
    way and require one output row per logical key."""
    t1 = pa.table({"k1": pa.array(["a", "b", "a"], pa.string()),
                   "k2": pa.array([1, None, 1], pa.int64()),
                   "v": pa.array([1, 2, 3], pa.int64())})
    t2 = pa.table({"k1": pa.array(["a", "b"], pa.string()),
                   "k2": pa.array([1, 2], pa.int64()),  # null-free batch
                   "v": pa.array([10, 20], pa.int64())})
    ds = ray.data.from_arrow([t1, t2])
    out = rel.salted_agg(ds, ["k1", "k2"], [("v", "sum", "s")],
                         num_partitions=4).to_pandas()
    out = _sorted_df(out)
    # logical groups: (a,1)=14, (b,NULL)=2, (b,2)=20 — a split key would
    # surface as a duplicated (k1, k2) row
    assert len(out) == 3
    got = {(r.k1, None if pd.isna(r.k2) else int(r.k2)): int(r.s)
           for r in out.itertuples()}
    assert got == {("a", 1): 14, ("b", None): 2, ("b", 2): 20}


@pytest.mark.usefixtures("ray_session")
def test_salted_map_groups_pandas_group_integrity():
    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "user": rng.randint(0, 40, 400).astype(np.int64),
        "x": rng.randint(0, 1000, 400).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(5)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        # one row per group; n counts prove the whole group arrived
        return pd.DataFrame({"user": [int(g["user"].iloc[0])],
                             "n": [len(g)], "sx": [int(g["x"].sum())]})

    out = rel.salted_map_groups(ds, ["user"], per_user,
                                num_partitions=6).to_pandas()
    expect = df.groupby("user").agg(n=("x", "size"), sx=("x", "sum")) \
        .reset_index().astype({"user": "int64", "n": "int64", "sx": "int64"})
    pd.testing.assert_frame_equal(_sorted_df(out), _sorted_df(expect))


@pytest.mark.usefixtures("ray_session")
def test_salted_map_groups_arrow_boundaries():
    """pyarrow wrapper: sort_by + boundary slicing must deliver each key
    exactly once, including single-row groups and a key spanning many
    input blocks."""
    keys = ["k%03d" % (i % 57) for i in range(600)]
    t = pa.table({"key": pa.array(keys, pa.string()),
                  "v": pa.array(list(range(600)), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(9)

    def per_key(g: pa.Table) -> pa.Table:
        ks = g.column("key").to_pylist()
        assert len(set(ks)) == 1  # group integrity
        return pa.table({"key": pa.array([ks[0]], pa.string()),
                         "n": pa.array([g.num_rows], pa.int64())})

    out = rel.salted_map_groups(ds, ["key"], per_key, "pyarrow",
                                num_partitions=4).to_pandas()
    assert len(out) == 57
    assert int(out["n"].sum()) == 600
    assert sorted(out["key"]) == sorted(set(keys))
