"""Scale-path tests for near-pair search: the distributed block-pair
exact plan (no driver materialization) and the LSH-bucketed variant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _planted_table(n: int, dim: int, n_planted: int, seed: int,
                   noise: float = 1e-4):
    """Random unit-ish vectors with ``n_planted`` near-duplicate pairs:
    vec[n + k] is a tiny perturbation of vec[k]."""
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, dim))
    dups = base[:n_planted] + noise * rng.standard_normal((n_planted, dim))
    mat = np.vstack([base, dups])
    ids = np.arange(len(mat))
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
    })
    planted = {(int(k), int(n + k)) for k in range(n_planted)}
    return t, planted


@pytest.mark.usefixtures("ray_session")
def test_pairs_above_block_plan_no_driver_materialization():
    """30k vectors across 8 blocks: planted pairs found exactly, and the
    driver never fetches a large object (the block-pair plan keeps vector
    blocks in the object store; only (i,j) indices and matched pairs cross
    to the driver)."""
    import ray
    import ray.data

    from pdf_parser_ray.stages import similarity

    t, planted = _planted_table(n=30_000, dim=8, n_planted=25, seed=11)
    ds = ray.data.from_arrow(t).repartition(8)

    fetched = []
    real_get = ray.get

    def spy_get(obj, **kwargs):
        out = real_get(obj, **kwargs)
        for o in out if isinstance(out, list) else [out]:
            if isinstance(o, (pa.Table, pd.DataFrame)):
                nbytes = (o.nbytes if isinstance(o, pa.Table)
                          else int(o.memory_usage(deep=True).sum()))
                fetched.append(nbytes)
        return out

    ray.get = spy_get
    try:
        out = similarity.pairs_above(ds, threshold=0.9999)
    finally:
        ray.get = real_get

    got = set(zip(out["vec_a"].tolist(), out["vec_b"].tolist()))
    assert got == planted
    assert (out["cos_sim"] > 0.999).all()
    # driver-side fetches must all be small (pair results / index blocks);
    # the old implementation pulled the whole vector table (~2 MB+ here)
    big = [b for b in fetched if b > 512 * 1024]
    assert not big, f"driver fetched large objects: {big}"


@pytest.mark.usefixtures("ray_session")
def test_lsh_pairs_match_exact_on_planted_dups():
    import ray.data

    from pdf_parser_ray.stages import similarity

    t, planted = _planted_table(n=4000, dim=32, n_planted=40, seed=7,
                                noise=0.05)  # cos ~ 0.995+
    ds = ray.data.from_arrow(t).repartition(4)
    exact = similarity.pairs_above(ds, threshold=0.9)
    approx = similarity.lsh_pairs_above(ds, threshold=0.9)
    pd.testing.assert_frame_equal(exact, approx)
    got = set(zip(exact["vec_a"].tolist(), exact["vec_b"].tolist()))
    assert got == planted


@pytest.mark.usefixtures("ray_session")
def test_lsh_hot_bucket_cap_bounds_pairing():
    """200 identical vectors with cap=50: pairing is truncated to the 50
    lowest ids instead of emitting O(200^2) pairs per band."""
    import ray.data

    from pdf_parser_ray.stages import similarity

    vec = np.ones(16)
    mat = np.tile(vec, (200, 1))
    t = pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(t)
    out = similarity.lsh_pairs_above(ds, threshold=0.9, bucket_cap=50)
    assert len(out) == 50 * 49 // 2
    assert out["vec_a"].max() < 50 and out["vec_b"].max() < 50


@pytest.mark.usefixtures("ray_session")
def test_lsh_pairs_empty_dataset():
    import ray.data

    from pdf_parser_ray.stages import similarity

    t = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    })
    out = similarity.lsh_pairs_above(ray.data.from_arrow(t))
    assert out.empty
    assert list(out.columns) == ["vec_a", "vec_b", "cos_sim"]


@pytest.mark.usefixtures("ray_session")
def test_pairs_above_empty_and_single():
    import ray.data

    from pdf_parser_ray.stages import similarity

    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float64()))})
    out = similarity.pairs_above(ray.data.from_arrow(empty))
    assert out.empty and list(out.columns) == ["vec_a", "vec_b", "cos_sim"]
    single = pa.table({"vec_id": pa.array([7], pa.int64()),
                       "embedding": pa.array([[1.0] * 8], pa.list_(pa.float64()))})
    assert similarity.pairs_above(ray.data.from_arrow(single)).empty


@pytest.mark.usefixtures("ray_session")
def test_emb_dedup_keep_drops_planted_dups():
    """SemDeDup keep-list on planted near-dups: exactly the higher-id
    member of every planted pair is dropped, and the result equals the
    NOT-EXISTS SQL oracle."""
    import duckdb
    import ray.data

    import __ray_entry__ as entrymod
    from pdf_parser_ray.pipelines import queries as q

    t, planted = _planted_table(n=300, dim=16, n_planted=25, seed=11,
                                noise=1e-4)
    t = t.append_column("label", pa.array(
        (np.arange(len(t)) % 7).astype(np.int32), pa.int32()))
    orig = q.rel.load
    q.rel.load = lambda sf, tbl, columns=None: ray.data.from_arrow(
        t.select(columns) if columns else t).repartition(4)
    try:
        kept = q.emb_dedup_keep("planted", threshold=0.9)
    finally:
        q.rel.load = orig
    dropped = {b for _, b in planted}
    assert set(kept["vec_id"]) == set(range(len(t))) - dropped
    con = duckdb.connect()
    con.register("embeddings", t)
    sql = entrymod.oracle_sql()["emb_dedup_keep"].replace("> 0.8", "> 0.9")
    want = con.execute(sql).df().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        kept.reset_index(drop=True), want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_emb_normalize_matches_duckdb_bitwise():
    """Unit-norm export vs DuckDB on random float32 vectors including a
    zero vector: sequential sum order + IEEE sqrt + one division =>
    bit-identical rounded values."""
    import duckdb
    import ray.data

    import __ray_entry__ as entrymod
    from pdf_parser_ray.pipelines import queries as q

    rng = np.random.RandomState(17)
    mat = rng.standard_normal((50, 13)).astype(np.float32)
    mat[7] = 0.0  # zero vector exercises the CASE branch
    t = pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array([list(r) for r in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(mat), dtype=np.int32), pa.int32()),
    })
    orig = q.rel.load
    q.rel.load = lambda sf, tbl, columns=None: ray.data.from_arrow(
        t.select(columns) if columns else t).repartition(3)
    try:
        got = q.emb_normalize("probe")
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    con.register("embeddings", t)
    want = (con.execute(entrymod.oracle_sql()["emb_normalize"]).df()
            .sort_values(["vec_id", "dim"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_ann_recall_eval_on_testdata():
    # the recall eval harness itself: every exact top-k set is size k,
    # hits never exceed it, the corpus mean recall on the sf0.001
    # testdata IVF (nprobe=4/16) stays above 0.8, and self-queries
    # (qid's own vector, cos = 1) are always recalled
    from pdf_parser_ray.pipelines import queries as q

    df = q.emb_ann_recall("/root/testdata/sf0.001")
    assert len(df) > 0
    assert (df["n_exact"] == 5).all()
    assert (df["n_hit"] <= df["n_exact"]).all()
    assert df["recall_ppm"].mean() >= 800_000
