"""Property-based SQL parity for the session-4 operators: graph
analytics over varying corpus sizes (modulo edge cases: 1-doc
self-loops, tiny graphs), bigram-LM / DSIR scoring on arbitrary unicode
text (tokenization + md5-hash lockstep with DuckDB), the KMV sketch on
arbitrary user-id multisets spanning both the exact and the estimate
branch, and the Gram matrix on signed/zero embeddings."""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import __ray_entry__ as entrymod

_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Po"),
                           whitelist_characters="\xa0 \x0b\x1f",
                           blacklist_characters="'\\"),
    min_size=1, max_size=6)
_TEXT = st.lists(_WORD, min_size=0, max_size=20).map(" ".join)
_DOCS = st.lists(_TEXT, min_size=1, max_size=8)
_LANG = st.sampled_from(["en", "de", "fr", "unknown"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(query_name: str, view: str, tbl: pa.Table) -> None:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    q.clear_session_caches()  # fake sf_dir keys must not hit stale memos

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
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{len(a)} != {len(b)}"
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            assert x == y, f"{query_name}.{col}[{i}]: {x!r} != {y!r}"


def _docs_table(texts, langs=None) -> pa.Table:
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array(["fuzz"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=8, deadline=None)
@given(n_docs=st.integers(min_value=1, max_value=25))
def test_pagerank_fuzz_graph_sizes(n_docs):
    _check("docs_pagerank", "documents",
           _docs_table([f"doc {i}" for i in range(n_docs)]))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=8, deadline=None)
@given(n_docs=st.integers(min_value=1, max_value=40))
def test_triangles_fuzz_graph_sizes(n_docs):
    _check("docs_triangles", "documents",
           _docs_table([f"doc {i}" for i in range(n_docs)]))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(texts=_DOCS)
def test_bigram_fluency_fuzz(texts):
    _check("docs_bigram_fluency", "documents", _docs_table(texts))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(texts=_DOCS, data=st.data())
def test_dsir_weights_fuzz(texts, data):
    langs = [data.draw(_LANG) for _ in texts]
    _check("docs_dsir_weights", "documents", _docs_table(texts, langs))


def _events_table(user_ids) -> pa.Table:
    n = len(user_ids)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")),
        "user_id": pa.array(user_ids, pa.int64()),
        "event_type": pa.array(["view"] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(uids=st.lists(
    st.one_of(st.integers(min_value=0, max_value=500), st.none()),
    min_size=1, max_size=400))
def test_kmv_fuzz_exact_branch(uids):
    _check("events_users_kmv", "events", _events_table(uids))


@pytest.mark.usefixtures("ray_session")
def test_kmv_estimate_branch_parity():
    # > 256 distinct -> both engines take the ((k-1)<<64)//h_k path
    _check("events_users_kmv", "events",
           _events_table(list(range(1000)) + [None] * 5))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(mat=st.lists(
    st.lists(st.floats(min_value=-5, max_value=5, allow_nan=False,
                       width=32),
             min_size=3, max_size=3),
    min_size=1, max_size=20))
def test_gram_matrix_fuzz(mat):
    m = np.array(mat, dtype=np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(m)), pa.int64()),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(m), np.int32), pa.int32()),
    })
    _check("emb_gram_matrix", "embeddings", tbl)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(mat=st.lists(
    st.lists(st.floats(min_value=-3, max_value=3, allow_nan=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=2, max_size=25))
def test_knn_graph_fuzz(mat):
    # duplicate rows force rounded-sim ties; the total order (sim desc,
    # vec_id asc) must agree with the SQL row_number twin exactly
    m = np.array(mat + mat[:2], dtype=np.float32)
    norms = np.linalg.norm(m.astype(np.float64), axis=1)
    m[norms == 0] = np.float32(1.0)   # cosine undefined on zero vectors
    tbl = pa.table({
        "vec_id": pa.array(range(len(m)), pa.int64()),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(m), np.int32), pa.int32()),
    })
    _check("emb_knn_graph", "embeddings", tbl)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=8, deadline=None)
@given(mat=st.lists(
    st.lists(st.floats(min_value=-3, max_value=3, allow_nan=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=2, max_size=18))
def test_snn_keep_fuzz(mat):
    # duplicated rows guarantee mutual-kNN clusters; the keep-list must
    # match the SQL recursive-component twin exactly
    m = np.array(mat + mat[:3], dtype=np.float32)
    norms = np.linalg.norm(m.astype(np.float64), axis=1)
    m[norms == 0] = np.float32(1.0)
    tbl = pa.table({
        "vec_id": pa.array(range(len(m)), pa.int64()),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(m), np.int32), pa.int32()),
    })
    _check("emb_snn_keep", "embeddings", tbl)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(prices=st.lists(
    st.floats(min_value=0, max_value=500, allow_nan=False),
    min_size=1, max_size=300))
def test_range_partition_fuzz(prices):
    # heavy ties (quantized prices) stress the ties-go-low rule and
    # duplicate quantile bounds
    prices = [round(p, 1) for p in prices]
    n = len(prices)
    tbl = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_orderstatus": pa.array(["O"] * n, pa.string()),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([dt.datetime(2024, 1, 1)] * n,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    _check("orders_range_partition", "orders", tbl)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=8, deadline=None)
@given(mat=st.lists(
    st.lists(st.floats(min_value=-3, max_value=3, allow_nan=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=2, max_size=20),
    data=st.data())
def test_label_prop_fuzz(mat, data):
    m = np.array(mat + mat[:2], dtype=np.float32)
    norms = np.linalg.norm(m.astype(np.float64), axis=1)
    m[norms == 0] = np.float32(1.0)
    labs = np.array([data.draw(st.integers(min_value=0, max_value=3))
                     for _ in range(len(m))], dtype=np.int32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(m)), pa.int64()),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
        "label": pa.array(labs, pa.int32()),
    })
    _check("emb_label_prop", "embeddings", tbl)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=12, deadline=None)
@given(nchars=st.lists(st.integers(min_value=0, max_value=100000),
                       min_size=1, max_size=300))
def test_weighted_sample_fuzz(nchars):
    # arbitrary weights incl. 0 (w+1 smoothing) — the pow parity claim
    # must hold across the whole (u, exponent) surface
    texts = ["x" * min(n, 50) for n in nchars]
    tbl = pa.table({
        "doc_id": pa.array(range(len(nchars)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(nchars), pa.string()),
        "source": pa.array(["fuzz"] * len(nchars), pa.string()),
        "n_chars": pa.array(nchars, pa.int64()),
    })
    _check("docs_weighted_sample", "documents", tbl)


def test_weighted_sample_inclusion_tracks_weight():
    # A-ES property: with one heavy doc vs many light docs, the heavy
    # doc is (deterministically, via md5 uniforms) overwhelmingly likely
    # in the sample — sanity-check the weighting direction
    import math

    from pdf_parser_ray.functions.sketches import _md5_64

    pris = {d: math.pow(_md5_64(str(d)) / 2**64, 1.0 / (w + 1))
            for d, w in [(0, 10_000_000)] + [(i, 1) for i in range(1, 500)]}
    top = sorted(pris, key=lambda d: (-pris[d], d))[:50]
    assert 0 in top
