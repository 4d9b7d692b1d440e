"""Distributed Okapi BM25 retrieval over a (doc_id, text) Dataset.

Shared by the oracled ``docs_bm25_topk`` pipeline (queries.py, whose SQL
twin pins every float to the ulp) and the ``search`` CLI front door.
One text scan produces the narrow per-doc feature table
(doc_id, tf per term, dl) with the vectorized explode kernel; corpus
statistics (N, avg dl, per-term df) fold from constant-width per-batch
partials — never a vocabulary exchange, the query term list is fixed —
and the top-k is per-batch local top-k + an output-sized driver merge.
Scale notes live on docs_bm25_topk; a BROAD query set (thousands of
queries) would swap the per-term columns for a (doc, term, tf) long
table + the tfidf-style hash join on term.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

K1 = 1.2
B = 0.75


def bm25_topk(ds: "ray.data.Dataset", terms: tuple[str, ...],
              k_out: int = 20) -> pd.DataFrame:
    """Top ``k_out`` documents of a (doc_id, text) Dataset for the bag
    of ``terms`` (whitespace tokenizer parity: a term matches a whole
    \\S+ token). Scores round half-away to 4 and ranking uses the
    ROUNDED score (doc_id tie-break), exactly as the oracled pipeline.
    Returns (doc_id, bm25) sorted by doc_id."""
    from pdf_parser_ray.functions.num import np_round_half_away
    from pdf_parser_ray.pipelines import relational as rel
    from pdf_parser_ray.stages.text import token_count_array

    n_docs = ds.count()
    if n_docs == 0 or not terms:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "bm25": pd.Series(dtype="float64")})

    def features(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        toks = pc.split_pattern_regex(batch.column("text"), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        cols = {"doc_id": ids,
                "dl": pa.array(token_count_array(batch.column("text")),
                               pa.int64())}
        for i, t in enumerate(terms):
            hit = pc.equal(flat, pa.scalar(t)).to_numpy(
                zero_copy_only=False)
            tf = np.bincount(parents[hit],
                             minlength=len(ids)).astype(np.int64)
            cols[f"tf{i + 1}"] = pa.array(tf, pa.int64())
        return pa.table(cols)

    feats = ds.map_batches(features, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def stat_partial(batch: pa.Table) -> pa.Table:
        out = {"sum_dl": pa.array([int(pc.sum(batch.column("dl")).as_py()
                                       or 0)], pa.int64())}
        for i in range(len(terms)):
            c = batch.column(f"tf{i + 1}")
            out[f"df{i + 1}"] = pa.array(
                [int(pc.sum(pc.cast(
                    pc.greater(c, pa.scalar(0, pa.int64())),
                    pa.int64())).as_py() or 0)], pa.int64())
        return pa.table(out)

    sp = feats.map_batches(stat_partial,
                           batch_format="pyarrow").to_pandas()
    sum_dl = int(sp["sum_dl"].sum()) if len(sp) else 0
    avgdl = sum_dl / n_docs if n_docs else 0.0
    idf = []
    for i in range(len(terms)):
        df_t = int(sp[f"df{i + 1}"].sum()) if len(sp) else 0
        idf.append(float(np.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1)))

    def score(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(
            np.float64)
        # written-order sum c1 + c2 + ... — pinned against the SQL twin
        s = np.zeros(len(dl), dtype=np.float64)
        for i in range(len(terms)):
            tf = batch.column(f"tf{i + 1}").to_numpy(
                zero_copy_only=False).astype(np.float64)
            s = s + (idf[i] * (tf * (K1 + 1))) / (
                tf + K1 * (1 - B + (B * dl) / avgdl))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "bm25": pa.array(np_round_half_away(s, 4), pa.float64()),
        })

    top = rel.local_topk(feats.map_batches(score, batch_format="pyarrow"),
                         [("bm25", "descending"), ("doc_id", "ascending")],
                         k_out)
    df = rel.ensure_columns(top, {"doc_id": "int64", "bm25": "float64"})
    return rel.to_pandas_sorted(df[["doc_id", "bm25"]], ["doc_id"])
