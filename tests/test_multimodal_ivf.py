"""Multimodal plumbing tests (stubbed decode, real schema/actor wiring)
and IVF recall vs brute-force cosine top-k."""

from __future__ import annotations

import json

import pytest


@pytest.mark.usefixtures("ray_session")
def test_media_features_plumbing():
    import ray.data

    from pdf_parser_ray.stages import multimodal

    ds = ray.data.from_arrow(multimodal.synth_media_table(30))
    out = multimodal.media_features(ds).to_pandas()
    assert len(out) == 30
    assert set(out.columns) == {"media_id", "backend", "feature", "info"}
    # PNG/WAV/AVI payloads decode for REAL (stdlib codecs); opaque
    # payloads degrade to the marked stub — per row, not per actor
    by_kind = {0: "png", 1: "wav", 2: "avi"}
    for _, row in out.iterrows():
        kind_i = row["media_id"] % 3
        expect = by_kind[kind_i]
        if kind_i == 0 and row["media_id"] % 9 == 6:
            expect = "stub"  # seeded-noise image row
        if kind_i == 1 and row["media_id"] % 9 == 7:
            expect = "stub"  # seeded-noise audio row
        if kind_i == 2 and row["media_id"] % 9 == 8:
            expect = "stub"  # seeded-noise video row
        assert row["backend"] == expect, (row["media_id"], row["backend"])
    # the backend column proves real video decode happened
    assert (out[out.media_id % 3 == 2]["backend"] == "avi").any()
    assert all(len(v) == multimodal.FEATURE_DIM for v in out["feature"])
    # deterministic across runs
    out2 = multimodal.media_features(ds).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert a["feature"].map(tuple).equals(b["feature"].map(tuple))
    # video info records sampled frame indices
    vid = out[out.media_id % 3 == 2].iloc[0]
    assert "sampled_frames" in json.loads(vid["info"])


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_bruteforce():
    from pdf_parser_ray.pipelines import queries as q
    from pdf_parser_ray.pipelines.relational import load
    from pdf_parser_ray.stages import similarity

    sf = "/root/testdata/sf0.001"
    embs = load(sf, "embeddings", ["vec_id", "embedding"])
    queries = q._query_vectors(sf)
    exact = similarity.topk_cosine(embs, queries, k=5)
    approx = similarity.ivf_topk(embs, queries, k=5, n_centers=16, nprobe=4)
    assert len(approx) > 0
    recalls = []
    for qid in sorted(queries):
        want = set(exact[exact.qid == qid]["vec_id"])
        got = set(approx[approx.qid == qid]["vec_id"])
        recalls.append(len(want & got) / len(want))
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # determinism
    approx2 = similarity.ivf_topk(embs, queries, k=5, n_centers=16, nprobe=4)
    assert approx.equals(approx2)


@pytest.mark.usefixtures("ray_session")
def test_ivf_full_probe_equals_bruteforce():
    from pdf_parser_ray.pipelines import queries as q
    from pdf_parser_ray.pipelines.relational import load
    from pdf_parser_ray.stages import similarity

    sf = "/root/testdata/sf0.001"
    embs = load(sf, "embeddings", ["vec_id", "embedding"])
    queries = q._query_vectors(sf)
    exact = similarity.topk_cosine(embs, queries, k=5)
    full = similarity.ivf_topk(embs, queries, k=5, n_centers=8, nprobe=8)
    assert exact.equals(full)


@pytest.mark.usefixtures("ray_session")
def test_media_features_single_scan():
    """The media corpus must be scanned once, not once per modality."""
    import math

    import ray
    import ray.data

    from pdf_parser_ray.stages import multimodal

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    counter = Counter.remote()

    def count_scan(batch):
        ray.get(counter.inc.remote())
        return batch

    n, bs = 60, 15
    ds = (ray.data.from_arrow(multimodal.synth_media_table(n))
          .map_batches(count_scan, batch_format="pyarrow", batch_size=bs))
    out = multimodal.media_features(ds).to_pandas()
    assert len(out) == n
    scans = ray.get(counter.get.remote())
    assert scans == math.ceil(n / bs), (
        f"media corpus scanned {scans}x, expected {math.ceil(n / bs)} "
        "(one pass)")


@pytest.mark.usefixtures("ray_session")
def test_kmeans_init_matches_lowest_ids():
    """Distributed min-k init == the n_centers lowest-vec_id vectors."""
    import numpy as np
    import ray.data

    from pdf_parser_ray.stages import similarity

    rng = np.random.RandomState(3)
    vecs = rng.rand(200, 8)
    ids = rng.permutation(200)  # ids deliberately not in storage order
    import pyarrow as pa
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t).map_batches(lambda b: b, batch_size=16,
                                            batch_format="pyarrow")
    rows = similarity._lowest_id_rows(ds, 10)
    assert [r["vec_id"] for r in rows] == sorted(ids.tolist())[:10]
    order = np.argsort(ids)
    want = vecs[order[:10]]
    got = np.array([r["embedding"] for r in rows])
    assert np.allclose(got, want)
