"""Unit tests for the session-4 operators (graph analytics, KMV sketch,
LM scoring): each distributed plan is checked against an independent
pure-Python reference implementation of the same integer-exact spec, on
synthetic in-memory tables (the DuckDB twin is covered separately by
test_queries_vs_duckdb)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_parser_ray.functions.sketches import _md5_64, re2_tokens


def _docs(texts, langs=None) -> pa.Table:
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array(["t"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _patched(table: pa.Table, op: str, *args, **kwargs):
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    def load(sf, name, columns=None):
        return ray.data.from_arrow(
            table.select(columns) if columns else table).repartition(4)

    orig = q.rel.load
    q.rel.load = load
    try:
        return getattr(q, op)("t", *args, **kwargs)
    finally:
        q.rel.load = orig


# ---------------------------------------------------------------------------
# graph ops vs pure-python reference
# ---------------------------------------------------------------------------


def _ref_edges(n_docs: int, out_deg: int = 3):
    return [(u, _md5_64(f"{u}#pr{j}") % n_docs)
            for u in range(n_docs) for j in range(out_deg)]


def _ref_pagerank(n_docs: int, n_iters: int = 4):
    edges = _ref_edges(n_docs)
    scores = {v: 1_000_000 for v in range(n_docs)}
    for _ in range(n_iters):
        nxt = {v: 150_000 for v in range(n_docs)}
        for u, v in edges:
            nxt[v] += (85 * scores[u]) // 300
        scores = nxt
    return scores


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_reference_spec():
    n = 40
    tbl = _docs([f"doc {i}" for i in range(n)])
    out = _patched(tbl, "docs_pagerank")
    ref = _ref_pagerank(n)
    assert len(out) == n
    got = dict(zip(out["doc_id"], out["pr_micro"]))
    assert got == ref
    # teleport floor: every score carries at least the teleport mass
    assert out["pr_micro"].min() >= 150_000


@pytest.mark.usefixtures("ray_session")
def test_triangles_matches_reference_count():
    n = 60
    tbl = _docs([f"doc {i}" for i in range(n)])
    out = _patched(tbl, "docs_triangles")
    und = {(min(u, v), max(u, v)) for u, v in _ref_edges(n) if u != v}
    tri = sum(1 for (a, b) in und for c in range(b + 1, n)
              if (b, c) in und and (a, c) in und)
    assert out["n_triangles"].tolist() == [tri]


# ---------------------------------------------------------------------------
# KMV sketch properties
# ---------------------------------------------------------------------------


def _events_users(user_ids) -> pa.Table:
    import datetime as dt

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
def test_kmv_exact_below_k_and_null_drop():
    # 120 distinct users (< k = 256) + nulls -> exact distinct count
    uids = list(range(120)) * 3 + [None] * 10
    out = _patched(_events_users(uids), "events_users_kmv")
    assert out["est_users"].tolist() == [120]


@pytest.mark.usefixtures("ray_session")
def test_kmv_estimate_accuracy_above_k():
    # 20_000 distinct -> sketch path; k=256 gives ~6% typical error
    uids = list(range(20_000))
    out = _patched(_events_users(uids), "events_users_kmv")
    est = out["est_users"].iloc[0]
    assert abs(est - 20_000) / 20_000 < 0.25


def test_kmv_bottom_k_merge_is_associative():
    # bottom-k of a union == bottom-k of the union of bottom-ks
    rng = np.random.RandomState(7)
    hs = rng.randint(0, 1 << 63, 5000).astype(np.uint64)
    k = 64
    full = np.sort(np.unique(hs))[:k]
    parts = np.array_split(hs, 7)
    merged = np.sort(np.unique(np.concatenate(
        [np.sort(np.unique(p))[:k] for p in parts])))[:k]
    assert np.array_equal(full, merged)


# ---------------------------------------------------------------------------
# LM scoring vs pure-python reference
# ---------------------------------------------------------------------------


_TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "a dog ran over the hill and far away",
    "the cat",
    "singleton",          # 1 token -> no bigrams -> excluded
    "",                   # empty -> excluded from both ops' token paths
    "on the mat the cat sat",
]


def _ref_bigram_fluency(texts):
    cnt1: dict[str, int] = {}
    cnt2: dict[tuple, int] = {}
    for t in texts:
        w = re2_tokens(t)
        for tok in w:
            cnt1[tok] = cnt1.get(tok, 0) + 1
        for i in range(len(w) - 1):
            cnt2[(w[i], w[i + 1])] = cnt2.get((w[i], w[i + 1]), 0) + 1
    out = {}
    for did, t in enumerate(texts):
        w = re2_tokens(t)
        if len(w) < 2:
            continue
        ps = [(1_000_000 * cnt2[(w[i], w[i + 1])]) // cnt1[w[i]]
              for i in range(len(w) - 1)]
        out[did] = sum(ps) // len(ps)
    return out


@pytest.mark.usefixtures("ray_session")
def test_bigram_fluency_matches_reference():
    out = _patched(_docs(_TEXTS), "docs_bigram_fluency")
    ref = _ref_bigram_fluency(_TEXTS)
    assert dict(zip(out["doc_id"], out["fluency_micro"])) == ref
    # docs without bigrams (0 or 1 token) are excluded
    assert set(ref) == {0, 1, 2, 3, 6}
    # an ambiguous head ("the" -> cat/mat/hat/hill/...) conditions below
    # certainty: every p is at most SCALE and doc 0 mixes both
    assert 0 < ref[0] < 1_000_000


def _ref_dsir(texts, langs, n_buckets=1024):
    call = np.zeros(n_buckets, dtype=np.int64)
    cen = np.zeros(n_buckets, dtype=np.int64)
    for t, lg in zip(texts, langs):
        for tok in re2_tokens(t):
            b = _md5_64(tok) % n_buckets
            call[b] += 1
            if lg == "en":
                cen[b] += 1
    out = {}
    for did, t in enumerate(texts):
        toks = re2_tokens(t)
        if not toks:
            continue
        s = sum(int((1_000_000 * (cen[_md5_64(tok) % n_buckets] + 1))
                    // (call[_md5_64(tok) % n_buckets] + 1))
                for tok in toks)
        out[did] = s // len(toks)
    return out


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_match_reference_and_separate_langs():
    texts = ["the cat sat", "the cat sat", "der hund lief schnell",
             "le chat noir dort", "the dog ran", ""]
    langs = ["en", "en", "de", "fr", "en", "en"]
    out = _patched(_docs(texts, langs), "docs_dsir_weights")
    ref = _ref_dsir(texts, langs)
    assert dict(zip(out["doc_id"], out["dsir_micro"])) == ref
    got = dict(zip(out["doc_id"], out["dsir_micro"]))
    # english docs score higher than non-target-language docs
    assert min(got[0], got[1], got[4]) > max(got[2], got[3])


# ---------------------------------------------------------------------------
# Gram matrix vs pure-python reference
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_gram_matrix_matches_reference():
    from pdf_parser_ray.functions.num import np_round_half_away_int

    rng = np.random.RandomState(11)
    mat = rng.standard_normal((30, 5)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        "label": pa.array(np.zeros(30, np.int32), pa.int32()),
    })
    out = _patched(tbl, "emb_gram_matrix")
    x = mat.astype(np.float64)
    got = {(i, j): g for i, j, g in
           zip(out["i"], out["j"], out["gram_micro"])}
    for i in range(5):
        for j in range(i, 5):
            ref = int(np_round_half_away_int(
                (x[:, i] * x[:, j]) * 1_000_000).sum())
            assert got[(i, j)] == ref
    # symmetric reduction emits exactly the upper triangle
    assert len(out) == 5 * 6 // 2


# ---------------------------------------------------------------------------
# SNN mutual-kNN dedup
# ---------------------------------------------------------------------------


def _emb_with_planted_dups() -> pa.Table:
    rng = np.random.RandomState(5)
    base = rng.standard_normal((40, 8))
    mat = np.vstack([base, base[:6] + 1e-5 * rng.standard_normal((6, 8))])
    return pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
        "label": pa.array((np.arange(len(mat)) % 3).astype(np.int32),
                          pa.int32()),
    })


@pytest.mark.usefixtures("ray_session")
def test_snn_keep_removes_planted_duplicates():
    tbl = _emb_with_planted_dups()
    out = _patched(tbl, "emb_snn_keep")
    kept = set(out["vec_id"])
    # every planted duplicate (rows 40..45, cos ~ 1 with its original)
    # is a non-representative member of its component -> removed
    assert kept.isdisjoint(range(40, 46))
    # a removed vector's component representative survives
    assert len(kept) < tbl.num_rows
    assert min(kept) == 0


# ---------------------------------------------------------------------------
# BPE merge learning vs pure-python reference trainer
# ---------------------------------------------------------------------------


def _ref_bpe(texts, n_merges=6):
    counts: dict[str, int] = {}
    for t in texts:
        for w in re2_tokens(t):
            counts[w] = counts.get(w, 0) + 1
    segs = {w: list(w) for w in counts}
    merges = []
    for _ in range(n_merges):
        acc: dict[tuple, int] = {}
        for w, n in counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                acc[(s[i], s[i + 1])] = acc.get((s[i], s[i + 1]), 0) + n
        if not acc:
            break
        best = min(acc, key=lambda p: (-acc[p], p[0], p[1]))
        merges.append((best[0], best[1], acc[best]))
        a, b = best
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


@pytest.mark.usefixtures("ray_session")
def test_bpe_merges_match_reference_trainer():
    texts = ["low lower lowest low low",
             "new newer newest new",
             "wide wider widest wide wide wide",
             ""]
    out = _patched(_docs(texts), "docs_bpe_merges")
    ref = _ref_bpe(texts)
    got = list(zip(out["left"], out["right"], out["pair_count"]))
    assert got == ref
    assert list(out["round"]) == list(range(len(ref)))
    # the dominant pattern ("lo"/"wi"-style frequent pairs) merges first
    assert out["pair_count"].is_monotonic_decreasing or len(ref) <= 1


@pytest.mark.usefixtures("ray_session")
def test_bpe_merges_chain_builds_longer_symbols():
    # enough repetition that merges compose into a multi-char symbol
    texts = ["abab abab abab abab"] * 3
    out = _patched(_docs(texts), "docs_bpe_merges")
    syms = [l + r for l, r in zip(out["left"], out["right"])]
    assert any(len(s) >= 3 for s in syms)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_broadcast_and_join_paths_identical():
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    n = 60
    tbl = _docs([f"doc {i}" for i in range(n)])

    def load(sf, name, columns=None):
        return ray.data.from_arrow(
            tbl.select(columns) if columns else tbl).repartition(4)

    orig = q.rel.load
    q.rel.load = load
    try:
        fast = q.docs_pagerank("t")                      # broadcast path
        slow = q.docs_pagerank("t", broadcast_max=0)     # forced join path
    finally:
        q.rel.load = orig
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True))
    assert dict(zip(fast["doc_id"], fast["pr_micro"])) == _ref_pagerank(n)


@pytest.mark.usefixtures("ray_session")
def test_triangles_broadcast_and_join_paths_identical():
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    n = 80
    tbl = _docs([f"doc {i}" for i in range(n)])

    def load(sf, name, columns=None):
        return ray.data.from_arrow(
            tbl.select(columns) if columns else tbl).repartition(4)

    orig = q.rel.load
    q.rel.load = load
    try:
        fast = q.docs_triangles("t")                      # broadcast path
        slow = q.docs_triangles("t", broadcast_max=0)     # forced join path
    finally:
        q.rel.load = orig
    assert fast["n_triangles"].tolist() == slow["n_triangles"].tolist()


# ---------------------------------------------------------------------------
# label propagation semantics
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_label_prop_spreads_cluster_labels_and_fixes_seeds():
    rng = np.random.RandomState(9)
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]],
                       dtype=np.float64)
    mat = np.vstack([c + 0.05 * rng.standard_normal((12, 4))
                     for c in centers])
    true_lab = np.repeat([0, 1, 2], 12).astype(np.int32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
        "label": pa.array(true_lab, pa.int32()),
    })
    out = _patched(tbl, "emb_label_prop")
    got = dict(zip(out["vec_id"], out["label_out"]))
    # seeds keep their exact label
    for v in range(len(mat)):
        if v % 3 == 0:
            assert got[v] == true_lab[v]
    # tight clusters: every member adopts its cluster's label
    assert all(got[v] == true_lab[v] for v in range(len(mat)))
