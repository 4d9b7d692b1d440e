"""Similarity search over the ``embeddings`` table (list<float> column).

* ``topk_cosine``: brute-force cosine top-k against a broadcast query
  matrix — numpy matmul per batch, per-batch local top-k, tiny final
  combine. The scale path swaps the scorer for an IVF/LSH-bucketed probe;
  the harness (broadcast once, local top-k, small merge) is unchanged.
* ``pairs_above``: EXACT embedding near-duplicate pairs (cosine >
  threshold) via a distributed block-pair plan — no driver
  materialization, each task fetches two object-store blocks.
* ``lsh_pairs_above``: the subquadratic scale path — random-hyperplane
  LSH banding, in-bucket exact scoring, hot-bucket cap.
* ``label_centroids``: per-(label, dim) mean via two-phase aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pdf_parser_ray.functions.num import np_round_half_away


def _matrix(batch: pa.Table) -> np.ndarray:
    """Embedding column -> (N, dim) float64 matrix.

    Fast path: fixed-size-list columns, and variable list columns whose
    lengths are uniform (the parquet layout of the testdata), reshape the
    flattened Arrow values buffer directly — zero-copy up to the single
    vectorized float64 upcast, never per-row Python lists (the r2 path
    converted via to_pylist, the hottest conversion in the embedding
    suite). Ragged or null layouts fall back to the row-wise path."""
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if col.null_count == 0:
        import pyarrow.compute as pc

        if pa.types.is_fixed_size_list(col.type):
            dim = col.type.list_size
            flat = col.values.slice(col.offset * dim, n * dim)
            return (flat.to_numpy(zero_copy_only=False)
                    .reshape(n, dim).astype(np.float64, copy=False))
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            mm = pc.min_max(pc.list_value_length(col))
            dim = mm["min"].as_py()
            if dim == mm["max"].as_py() and dim is not None and dim > 0:
                flat = col.flatten()  # offset-aware
                return (flat.to_numpy(zero_copy_only=False)
                        .reshape(n, dim).astype(np.float64, copy=False))
    return np.array(col.to_pylist(), dtype=np.float64)


def _id_array(batch: pa.Table, col: str = "vec_id") -> np.ndarray:
    """Numeric id column -> numpy without Python-object round-trips."""
    c = batch.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


def _unit(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def topk_cosine(embs: ray.data.Dataset, queries: dict[int, list[float]],
                k: int = 5) -> pd.DataFrame:
    """-> (qid, vec_id, cos_sim) top-k per query, deterministically ordered
    by (qid, -cos_sim, vec_id)."""
    qids = sorted(queries)
    qmat = _unit(np.array([queries[q] for q in qids], dtype=np.float64))
    qref = ray.put(qmat)

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        vecs = _unit(_matrix(batch))
        ids = _id_array(batch)
        sims = vecs @ ray.get(qref).T  # (N, Q)
        frames = []
        for qi, qid in enumerate(qids):
            s = np_round_half_away(sims[:, qi], 4)
            take = min(k, len(ids))
            idx = np.lexsort((ids, -s))[:take]
            frames.append(pd.DataFrame({
                "qid": qid, "vec_id": ids[idx], "cos_sim": s[idx],
            }))
        return pd.concat(frames, ignore_index=True)

    cand = embs.map_batches(local_topk, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    out = (cand.sort_values(["qid", "cos_sim", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
           .groupby("qid", sort=True).head(k).reset_index(drop=True))
    return out


_EMPTY_PAIRS = {
    "vec_a": pa.array([], pa.int64()),
    "vec_b": pa.array([], pa.int64()),
    "cos_sim": pa.array([], pa.float64()),
}


def _exact_pairs_tables(ids_a, mat_a, ids_b, mat_b, threshold: float,
                        same_block: bool, chunk_rows: int) -> pa.Table:
    """Exact cosine pairs > threshold between two unit matrices, chunked so
    the sims buffer never exceeds chunk_rows^2 floats. Pairs are oriented
    (min_id, max_id); for a block against itself only the strict upper
    triangle of indices is scored."""
    out_a, out_b, out_s = [], [], []
    for a0 in range(0, len(ids_a), chunk_rows):
        a1 = min(a0 + chunk_rows, len(ids_a))
        for b0 in range(0, len(ids_b), chunk_rows):
            b1 = min(b0 + chunk_rows, len(ids_b))
            if same_block and b1 <= a0:
                continue  # fully below the diagonal
            sims = mat_a[a0:a1] @ mat_b[b0:b1].T
            ai, bj = np.nonzero(sims > threshold)
            if same_block:
                keep = (a0 + ai) < (b0 + bj)  # strict upper triangle
                ai, bj = ai[keep], bj[keep]
            if not len(ai):
                continue
            ida = ids_a[a0 + ai]
            idb = ids_b[b0 + bj]
            lo = np.minimum(ida, idb)
            hi = np.maximum(ida, idb)
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(np_round_half_away(sims[ai, bj], 4))
    if not out_a:
        return pa.table(_EMPTY_PAIRS)
    return pa.table({
        "vec_a": pa.array(np.concatenate(out_a), pa.int64()),
        "vec_b": pa.array(np.concatenate(out_b), pa.int64()),
        "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
    })


def _superblock_plan(embs: ray.data.Dataset):
    """Shared scaffolding of the block-pair fan-outs (pairs_above,
    knn_graph): leave every block in the object store (to_arrow_refs),
    coalesce small blocks into ~64 MB super-block groups — pair-plan
    cost is O(G^2) in the group count; sizes are probed by tiny remote
    tasks so the driver never touches block data; a block larger than
    the target stays its own group — and build the (i, j) upper-triangle
    index list. Returns (refs_ref, groups_ref, pairs_idx)."""
    refs = embs.select_columns(["vec_id", "embedding"]).to_arrow_refs()
    nbytes_of = ray.remote(num_cpus=0)(lambda t: t.nbytes)
    sizes = ray.get([nbytes_of.remote(r) for r in refs])
    target_group_bytes = 64 * 1024 * 1024
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for i, sz in enumerate(sizes):
        if cur and cur_bytes + sz > target_group_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(i)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    ngroups = len(groups)
    pairs_idx = [{"i": i, "j": j}
                 for i in range(ngroups) for j in range(i, ngroups)]
    return ray.put(refs), ray.put(groups), pairs_idx


def _fetch_group(all_refs, group) -> pa.Table:
    return pa.concat_tables([ray.get(all_refs[k]) for k in group])


def pairs_above(embs: ray.data.Dataset, threshold: float = 0.95,
                chunk_rows: int = 4096) -> pd.DataFrame:
    """-> (vec_a, vec_b, cos_sim) for ALL pairs above threshold (a < b) —
    exact, via a distributed block-pair plan.

    The driver never materializes vectors: ``to_arrow_refs`` leaves every
    block in the object store; a tiny (i, j) block-index dataset fans out
    one task per block pair, and each task fetches exactly its two blocks
    and scores them with a chunked matmul (peak sims buffer
    chunk_rows^2 x 8 B). Only matching pairs ever reach the driver.
    Cost is inherently O(B^2/2) tasks — the exact-search model; the
    subquadratic scale path is ``lsh_pairs_above`` (same kernel per LSH
    bucket)."""
    refs_ref, groups_ref, pairs_idx = _superblock_plan(embs)

    def score(batch: pa.Table) -> pa.Table:
        all_refs = ray.get(refs_ref)
        all_groups = ray.get(groups_ref)
        tables = []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ta = _fetch_group(all_refs, all_groups[i])
            if ta.num_rows == 0:
                continue  # empty input blocks (e.g. an empty dataset)
            ids_a = _id_array(ta)
            mat_a = _unit(_matrix(ta))
            if j == i:
                ids_b, mat_b = ids_a, mat_a
            else:
                tb = _fetch_group(all_refs, all_groups[j])
                if tb.num_rows == 0:
                    continue
                ids_b = _id_array(tb)
                mat_b = _unit(_matrix(tb))
            tables.append(_exact_pairs_tables(ids_a, mat_a, ids_b, mat_b,
                                              threshold, j == i, chunk_rows))
        return pa.concat_tables(tables) if tables else pa.table(_EMPTY_PAIRS)

    # one task per index block; cap task count so tiny inputs don't pay
    # per-task scheduling overhead for trivial group pairs
    from pdf_parser_ray.runtime import cluster_cpus

    n_tasks = max(1, min(len(pairs_idx), cluster_cpus() * 2))
    idx = ray.data.from_items(pairs_idx, override_num_blocks=n_tasks)
    out = idx.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty:
        out = pd.DataFrame({
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "cos_sim": pd.Series(dtype="float64"),
        })
    return out.sort_values(["vec_a", "vec_b"], kind="mergesort").reset_index(drop=True)


# LSH near-pair search: the subquadratic scale path for pairs_above.
# Random-hyperplane signatures; docs sharing any band key are candidates,
# scored with the SAME exact kernel inside their bucket.
LSH_PLANES = 64
LSH_BANDS = 16
LSH_SEED = 0x5EED
LSH_BUCKET_CAP = 2048


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(LSH_SEED)
    return rng.standard_normal((dim, LSH_PLANES))


def lsh_pairs_above(embs: ray.data.Dataset, threshold: float = 0.8,
                    bucket_cap: int = LSH_BUCKET_CAP) -> pd.DataFrame:
    """Near-duplicate pairs via random-hyperplane LSH + in-bucket exact
    scoring — subquadratic: shuffles (band_key, vec_id, embedding) rows,
    never forms cross-bucket pairs.

    Recall for cos >= 0.8 with 16 bands x 4 bits is ~0.9998 (tested on
    planted near-dups); pairs found in several bands are deduped by a
    (vec_a, vec_b) groupby. Hot buckets beyond ``bucket_cap`` rows are
    truncated (logged) — the cap bounds the O(|bucket|^2) kernel."""
    first = embs.take(1)
    if not first:
        return pd.DataFrame({
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "cos_sim": pd.Series(dtype="float64"),
        })
    dim = len(first[0]["embedding"])
    rows_per_band = LSH_PLANES // LSH_BANDS
    pref = ray.put(_hyperplanes(dim))

    def band_rows(batch: pa.Table) -> pa.Table:
        vecs = _unit(_matrix(batch))
        bits = (vecs @ ray.get(pref)) > 0  # (N, planes)
        weights = (1 << np.arange(rows_per_band)).astype(np.int64)
        tables = []
        for b in range(LSH_BANDS):
            chunk = bits[:, b * rows_per_band:(b + 1) * rows_per_band]
            vals = chunk.astype(np.int64) @ weights
            key = pa.array([f"{b}:{v}" for v in vals], pa.string())
            tables.append(pa.table({
                "band_key": key,
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }))
        return pa.concat_tables(tables)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(_EMPTY_PAIRS)
        if n > bucket_cap:
            import logging

            logging.getLogger(__name__).warning(
                "lsh_pairs_above: hot bucket %s has %d rows; truncating to "
                "%d (dropping %d rows from in-bucket pairing)",
                group.column("band_key")[0].as_py(), n, bucket_cap,
                n - bucket_cap)
            order = pa.compute.sort_indices(group.column("vec_id"))
            group = group.take(order[:bucket_cap])
        ids = _id_array(group)
        mat = _unit(_matrix(group))
        return _exact_pairs_tables(ids, mat, ids, mat, threshold,
                                   same_block=True, chunk_rows=bucket_cap)

    banded = embs.map_batches(band_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    from pdf_parser_ray.pipelines.relational import (
        salted_agg,
        salted_map_groups,
    )

    pairs = salted_map_groups(banded, ["band_key"], bucket_pairs,
                              "pyarrow")
    deduped = salted_agg(pairs, ["vec_a", "vec_b"],
                         [("cos_sim", "min", "cos_sim")])
    out = deduped.to_pandas()
    if out.empty:
        out = pd.DataFrame({
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "cos_sim": pd.Series(dtype="float64"),
        })
    out = out.astype({"vec_a": "int64", "vec_b": "int64",
                      "cos_sim": "float64"})
    return out.sort_values(["vec_a", "vec_b"], kind="mergesort").reset_index(drop=True)


def label_centroids(embs: ray.data.Dataset) -> pd.DataFrame:
    """-> (label, dim, centroid): per-label mean embedding, exploded to one
    row per dimension (SQL-mirrorable via unnest with ordinality)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        vecs = _matrix(batch)
        labels = _id_array(batch, "label")
        frames = []
        for lab in np.unique(labels):
            sel = vecs[labels == lab]
            frames.append(pd.DataFrame({
                "label": int(lab),
                "dim": np.arange(1, vecs.shape[1] + 1),
                "s": sel.sum(axis=0),
                "n": len(sel),
            }))
        return pd.concat(frames, ignore_index=True)

    partials = embs.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    # (label, dim) cardinality is n_labels x embedding_dim — a few thousand
    # rows — so the final combine of the distributed partial sums runs on
    # the driver instead of paying a sort-shuffle groupby
    df = partials.to_pandas().groupby(["label", "dim"], as_index=False,
                                      sort=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    return pd.DataFrame({
        "label": df["label"].astype("int64"),
        "dim": df["dim"].astype("int64"),
        "centroid": np_round_half_away(df["s"].to_numpy() / df["n"].to_numpy(), 4),
    })


# ---------------------------------------------------------------------------
# IVF (coarse-quantizer) approximate search — the scale path for topk_cosine
# ---------------------------------------------------------------------------


def _lowest_id_rows(embs: ray.data.Dataset, k: int) -> list[dict]:
    """The ``k`` rows with the lowest vec_id via distributed local min-k
    (per-batch top-k + tiny driver merge) — no global sort shuffle for a
    handful of rows."""
    import pyarrow.compute as pc

    def local_mink(batch: pa.Table) -> pa.Table:
        t = batch.select(["vec_id", "embedding"])
        idx = pc.sort_indices(t, sort_keys=[("vec_id", "ascending")])[:k]
        return t.take(idx)

    cand = embs.map_batches(local_mink, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()  # <= k per block
    cand.sort(key=lambda r: r["vec_id"])
    return cand[:k]


def kmeans_centers(embs: ray.data.Dataset, n_centers: int = 16,
                   iters: int = 4) -> np.ndarray:
    """Deterministic distributed Lloyd iterations.

    Init = the ``n_centers`` vectors with the lowest vec_id (stable across
    runs and shardings, computed as a distributed local min-k — never a
    global sort); each iteration is one map_batches pass producing
    per-center partial sums, combined on the driver (K x dim floats — tiny).
    """
    first = _lowest_id_rows(embs, n_centers)
    centers = _unit(np.array([r["embedding"] for r in first], dtype=np.float64))

    for _ in range(iters):
        cref = ray.put(centers)

        def assign_partial(batch: pa.Table) -> pd.DataFrame:
            vecs = _unit(_matrix(batch))
            sims = vecs @ ray.get(cref).T
            owner = np.argmax(sims, axis=1)
            frames = []
            for c in np.unique(owner):
                sel = vecs[owner == c]
                frames.append(pd.DataFrame({
                    "center": int(c),
                    "dim": np.arange(sel.shape[1]),
                    "s": sel.sum(axis=0),
                    "n": len(sel),
                }))
            return pd.concat(frames, ignore_index=True)

        parts = embs.map_batches(assign_partial, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
        agg = parts.groupby(["center", "dim"], sort=True).agg(
            s=("s", "sum"), n=("n", "sum")).reset_index()
        new = centers.copy()
        for c, grp in agg.groupby("center", sort=True):
            grp = grp.sort_values("dim")
            new[int(c)] = grp["s"].to_numpy() / grp["n"].to_numpy()
        centers = _unit(new)
    return centers


def ivf_topk(embs: ray.data.Dataset, queries: dict[int, list[float]],
             k: int = 5, n_centers: int = 16, nprobe: int = 4,
             centers: np.ndarray | None = None) -> pd.DataFrame:
    """Approximate cosine top-k: probe only the ``nprobe`` coarse cells
    nearest each query. Same output layout as topk_cosine; recall depends
    on nprobe (tested >= 0.8 at nprobe=4/16 on the testdata)."""
    if centers is None:
        centers = kmeans_centers(embs, n_centers=n_centers)
    qids = sorted(queries)
    qmat = _unit(np.array([queries[q] for q in qids], dtype=np.float64))
    probe = np.argsort(-(qmat @ centers.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    cref = ray.put(centers)
    qref = ray.put(qmat)
    pref = ray.put(probe)

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        vecs = _unit(_matrix(batch))
        ids = _id_array(batch)
        owner = np.argmax(vecs @ ray.get(cref).T, axis=1)
        sims = vecs @ ray.get(qref).T
        probes = ray.get(pref)
        frames = []
        for qi, qid in enumerate(qids):
            mask = np.isin(owner, probes[qi])
            if not mask.any():
                continue
            s = np_round_half_away(sims[mask, qi], 4)
            sub_ids = ids[mask]
            take = min(k, len(sub_ids))
            idx = np.lexsort((sub_ids, -s))[:take]
            frames.append(pd.DataFrame({
                "qid": qid, "vec_id": sub_ids[idx], "cos_sim": s[idx],
            }))
        if not frames:
            return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "cos_sim": pd.Series(dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    cand = embs.map_batches(local_topk, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    if "qid" not in cand.columns:
        return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64"),
                             "cos_sim": pd.Series(dtype="float64")})
    return (cand.sort_values(["qid", "cos_sim", "vec_id"],
                             ascending=[True, False, True], kind="mergesort")
            .groupby("qid", sort=True).head(k).reset_index(drop=True))


def knn_graph(embs: ray.data.Dataset, k: int = 5,
              as_dataset: bool = False):
    """Exact k-nearest-neighbor graph by cosine, self excluded — the
    candidate-graph primitive under SNN clustering and graph-based
    semantic dedup. Returns (qid, vec_id, cos_sim) with at most k
    neighbors per vector.

    Plan: the ``pairs_above`` block-pair fan-out generalized to per-ROW
    local top-k. Each task scores one super-block pair in both
    directions and keeps each row's k+1 best candidates under the total
    order (-rounded_sim, neighbor_id) — an int64 composite key, so
    selection is exact and deterministic. The only exchange is the
    candidate stream, O(n x G x k) rows (G = super-block count); a
    grouped per-qid top-k under the SAME total order merges it (top-k of
    a union == top-k of per-part top-ks under a total order). Exact kNN
    is inherently O(n^2) compute; at corpus scale the same kernel runs
    per IVF/LSH bucket (see ``ivf_topk`` / ``lsh_pairs_above``).

    Ids must fit 33 bits for the packed key (testdata contract; wider
    ids would rank on a structured sort instead). Domain contract shared
    with the SQL twin: no zero vectors (cosine is undefined there — the
    oracle's list_cosine_similarity yields NaN while _unit substitutes
    norm 1; both engines exclude them upstream)."""
    _SENTINEL = np.iinfo(np.int64).max

    refs_ref, groups_ref, pairs_idx = _superblock_plan(embs)

    empty = {
        "qid": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "cos_sim": pa.array([], pa.float64()),
    }

    def _local(ids_q, mat_q, ids_c, mat_c, same) -> pa.Table:
        sims = mat_q @ mat_c.T
        r = np_round_half_away(sims, 4)
        score_i = np.rint(r * 1e4).astype(np.int64)
        keys = (-score_i) * (1 << 33) + ids_c[None, :]
        if same:
            keys[ids_q[:, None] == ids_c[None, :]] = _SENTINEL
        kk = min(k + (1 if same else 0), keys.shape[1])
        part = np.argpartition(keys, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(keys.shape[0]), kk)
        cols = part.ravel()
        valid = keys[rows, cols] != _SENTINEL
        if not valid.any():
            return pa.table(empty)
        return pa.table({
            "qid": pa.array(np.repeat(ids_q, kk)[valid], pa.int64()),
            "vec_id": pa.array(ids_c[cols][valid], pa.int64()),
            "cos_sim": pa.array(r[rows, cols][valid], pa.float64()),
        })

    def score(batch: pa.Table) -> pa.Table:
        all_refs = ray.get(refs_ref)
        all_groups = ray.get(groups_ref)
        tables = []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ta = _fetch_group(all_refs, all_groups[i])
            if ta.num_rows == 0:
                continue
            ids_a, mat_a = _id_array(ta), _unit(_matrix(ta))
            if j == i:
                tables.append(_local(ids_a, mat_a, ids_a, mat_a, True))
                continue
            tb = _fetch_group(all_refs, all_groups[j])
            if tb.num_rows == 0:
                continue
            ids_b, mat_b = _id_array(tb), _unit(_matrix(tb))
            tables.append(_local(ids_a, mat_a, ids_b, mat_b, False))
            tables.append(_local(ids_b, mat_b, ids_a, mat_a, False))
        return pa.concat_tables(tables) if tables else pa.table(empty)

    from pdf_parser_ray.runtime import cluster_cpus

    n_tasks = max(1, min(len(pairs_idx), cluster_cpus() * 2))
    idx = ray.data.from_items(pairs_idx, override_num_blocks=n_tasks)
    cands = idx.map_batches(score, batch_format="pyarrow")

    def per_q(df: pd.DataFrame) -> pd.DataFrame:
        key = ((-np.rint(df["cos_sim"].to_numpy() * 1e4).astype(np.int64))
               * (1 << 33) + df["vec_id"].to_numpy(np.int64))
        order = np.argsort(key, kind="stable")[:k]
        return df.iloc[order]

    knn = cands.groupby("qid").map_groups(per_q, batch_format="pandas")
    if as_dataset:
        # downstream consumers (SNN dedup) keep the n x k graph
        # distributed; the pandas return below is the comparison sink
        return knn
    out = knn.to_pandas()
    if out.empty:
        out = pd.DataFrame({
            "qid": pd.Series(dtype="int64"),
            "vec_id": pd.Series(dtype="int64"),
            "cos_sim": pd.Series(dtype="float64"),
        })
    return (out.sort_values(["qid", "vec_id"], kind="mergesort")
            .reset_index(drop=True))
