"""Exact corpus heavy hitters: distributed Misra-Gries screen + exact
verification pass (the classic two-pass heavy-hitters plan; MG summaries
are deterministic and mergeable, Agarwal et al., "Mergeable Summaries").

Shared by the oracled ``docs_heavy_hitters`` pipeline (queries.py) and
the ``hot`` CLI front door. Pass 1 (screen): each batch computes exact
in-batch token counts with the vectorized explode kernel, then
MG-compresses them to <= k survivors by subtracting the (k+1)-th largest
count from every counter (per-token deficit <= batch_tokens/(k+1)); one
grouped sum over the <= (k+1)-rows-per-batch summaries merges the
partials, so the total deficit is <= N/(k+1). Any token with true count
> N/denom therefore survives the merge with estimate
> N*(1/denom - 1/(k+1)), and — pigeonhole on the estimate mass — at most
1/(1/denom - 1/(k+1)) (~104 at denom=40, k=64) tokens can clear that
bar: the candidate set is a CONSTANT, however large the vocabulary, and
nothing driver-side scales with the corpus. Pass 2 (verify): the
candidate set broadcasts into a second scan that exact-counts ONLY
candidates; the final filter keeps cnt*denom > N. Text never shuffles;
both exchanges carry <= k+1 rows per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def exact_heavy_hitters(ds: "ray.data.Dataset", column: str = "text",
                        k: int = 64, denom: int = 40) -> pd.DataFrame:
    """Tokens of ``column`` whose share of ALL whitespace tokens exceeds
    1/denom, with EXACT counts -> (tok, cnt, share_ppm) sorted by tok."""
    from pdf_parser_ray.pipelines import relational as rel

    assert k + 1 > denom, "MG capacity must out-resolve the threshold"

    def screen(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(pc.cast(batch.column(column), "string"), ""),
            r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        n_batch = len(flat)
        vc = pc.value_counts(flat)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        values = vc.field("values")
        if len(counts) > k:
            kth = int(np.partition(counts, len(counts) - (k + 1))[
                len(counts) - (k + 1)])
            keep = counts > kth
            est = counts[keep] - kth
            values = values.filter(pa.array(keep))
        else:
            est = counts
        # the sentinel "" row carries this batch's token mass: "" can
        # never collide with a real token (tokens match \S+), and the
        # same grouped sum that merges the summaries then yields N
        return pa.table({
            "tok": pa.concat_arrays(
                [values.cast(pa.string()), pa.array([""], pa.string())]),
            "est": pa.array(np.concatenate([est, [n_batch]]), pa.int64()),
        })

    partials = ds.map_batches(screen, batch_format="pyarrow",
                              zero_copy_batch=True)
    summed = rel.ensure_schema(
        rel.salted_agg(partials, ["tok"], [("est", "sum", "est")]),
        pa.schema([("tok", pa.string()), ("est", pa.int64())])).materialize()

    total = summed.map_batches(
        lambda b: b.filter(pc.equal(b.column("tok"), pa.scalar(""))),
        batch_format="pyarrow").to_pandas()
    n_total = int(total["est"].sum()) if len(total) and \
        "est" in total.columns else 0
    empty = pd.DataFrame({"tok": pd.Series(dtype="object"),
                          "cnt": pd.Series(dtype="int64"),
                          "share_ppm": pd.Series(dtype="int64")})
    if n_total == 0:
        return empty

    # merged-estimate bar: est > N*(1/denom - 1/(k+1)), exact in ints
    lo_num = n_total * (k + 1 - denom)
    lo_den = denom * (k + 1)

    def cand_filter(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(b.column("tok"), pa.scalar("")),
                       pc.greater(pc.multiply(
                           pc.cast(b.column("est"), pa.int64()),
                           pa.scalar(lo_den, pa.int64())),
                           pa.scalar(lo_num, pa.int64())))
        return b.filter(keep)

    cands = summed.map_batches(cand_filter,
                               batch_format="pyarrow").to_pandas()
    # a fully-filtered Dataset loses its schema at to_pandas
    cand_toks = sorted(cands["tok"].tolist()) if "tok" in cands.columns \
        else []
    cand_set = pa.array(cand_toks, pa.string())
    if len(cand_set) == 0:
        return empty

    def verify(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(pc.cast(batch.column(column), "string"), ""),
            r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.is_in(flat, value_set=cand_set))
        vc = pc.value_counts(flat)
        return pa.table({"tok": vc.field("values").cast(pa.string()),
                         "cnt": vc.field("counts").cast(pa.int64())})

    exact = rel.ensure_schema(
        rel.salted_agg(ds.map_batches(verify, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       ["tok"], [("cnt", "sum", "cnt")]),
        pa.schema([("tok", pa.string()), ("cnt", pa.int64())]))
    df = exact.to_pandas()
    df = df[df["cnt"] * denom > n_total].copy()
    df["share_ppm"] = (df["cnt"].astype("int64") * 1_000_000) // n_total
    df = rel.ensure_columns(df, {"tok": "object", "cnt": "int64",
                                 "share_ppm": "int64"})
    return rel.to_pandas_sorted(df[["tok", "cnt", "share_ppm"]], ["tok"])
