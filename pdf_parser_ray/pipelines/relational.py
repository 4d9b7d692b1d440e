"""Relational building blocks over Ray Data: scan pruning, two-phase
aggregation, broadcast joins, shuffle hash joins.

Scale pattern notes (SURVEY.md §2.6):
* ``grouped_agg`` ALWAYS pre-aggregates inside ``map_batches`` (map-side
  combine) so the shuffle moves one row per (batch x group), not per input
  row — a groupby on 10^12 rows with a low-cardinality key shuffles
  kilobytes, not terabytes.
* ``broadcast_merge`` ships the small side once via ``ray.put`` and merges
  inside each task (vectorised pandas merge) — the idiomatic replacement
  for a shuffle join against a dimension table.
* ``hash_join`` delegates to ``Dataset.join`` (hash shuffle both sides) and
  is reserved for genuinely big-big joins.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

_PARTIAL_COUNT = "__pcount"


def load(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Scan one testdata table, pruning to ``columns`` at the read."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def grouped_agg(ds: ray.data.Dataset, keys: list[str],
                spec: list[tuple[str, str, str]],
                small_result: bool = False):
    """Two-phase grouped aggregation.

    ``spec`` entries are ``(out_name, src_col, op)`` with op in
    {"sum", "count", "min", "max"}.

    ``small_result=True`` declares the group-key cardinality bounded (a few
    thousand at most — priorities, nations, languages, hours): the map-side
    combine still runs distributed, but the final merge of the tiny partial
    rows happens on the driver instead of paying a whole sort-shuffle
    groupby (which costs seconds of fixed overhead per call). Returns a
    pandas DataFrame in that mode, a Dataset otherwise.
    """
    need_count = any(op == "count" for _, _, op in spec)
    src_cols = sorted({src for _, src, op in spec if op != "count"})

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow fast path: grouped combine with no pandas roundtrip.
        # pa.TableGroupBy keeps NULL key groups (== dropna=False) and
        # use_threads=False pins per-group accumulation to row order.
        # Gated to non-floating sources: float sums are order-sensitive
        # and the pandas path is the pinned behaviour for those.
        if all(not pa.types.is_floating(batch.schema.field(src).type)
               for src in src_cols):
            aggs = [(src, op) for _, src, op in spec if op != "count"]
            if need_count:
                aggs.append(([], "count_all"))
            res = pa.TableGroupBy(
                batch.select(keys + src_cols), keys,
                use_threads=False).aggregate(aggs)
            names = list(keys) + [out for out, _, op in spec
                                  if op != "count"]
            if need_count:
                names.append(_PARTIAL_COUNT)
            return res.rename_columns(names)
        df = batch.select(keys + src_cols).to_pandas()
        # dropna=False: SQL GROUP BY keeps NULL groups (DuckDB lockstep)
        gb = df.groupby(keys, as_index=False, sort=False, dropna=False)
        named = {}
        for out, src, op in spec:
            if op == "count":
                continue
            named[out] = pd.NamedAgg(column=src, aggfunc=op)
        agg = gb.agg(**named) if named else gb.size().rename(columns={"size": _PARTIAL_COUNT})
        if need_count and named:
            counts = (df.groupby(keys, sort=False, dropna=False).size()
                      .reset_index(name=_PARTIAL_COUNT))
            agg = agg.merge(counts, on=keys)
        # ALWAYS hand Arrow blocks to the downstream Dataset.groupby:
        # pandas-format blocks make Ray 2.49's sort-shuffle aggregate
        # ~30x slower (measured 117 s vs 4 s on 274k rows / 150k groups)
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    if small_result:
        df = partials.to_pandas()
        if df.empty and not set(keys) <= set(df.columns):
            # a fully-empty Ray dataset loses its schema at to_pandas:
            # rebuild the typed empty result frame
            return pd.DataFrame({c: pd.Series(dtype="object") for c in keys}
                                | {out: pd.Series(dtype="int64")
                                   for out, _, _ in spec})
        gb = df.groupby(keys, as_index=False, sort=False, dropna=False)
        named = {}
        for out, _, op in spec:
            if op == "count":
                named[out] = pd.NamedAgg(column=_PARTIAL_COUNT, aggfunc="sum")
            elif op in ("sum", "min", "max"):
                named[out] = pd.NamedAgg(column=out, aggfunc=op)
        final_df = gb.agg(**named)
        return final_df[keys + [out for out, _, _ in spec]]

    finals = []
    for out, _, op in spec:
        if op == "count":
            finals.append(Sum(_PARTIAL_COUNT, alias_name=out))
        elif op == "sum":
            finals.append(Sum(out, alias_name=out))
        elif op == "min":
            finals.append(Min(out, alias_name=out))
        elif op == "max":
            finals.append(Max(out, alias_name=out))
        else:
            raise ValueError(f"unsupported op {op}")
    return partials.groupby(keys).aggregate(*finals)


def broadcast_merge(ds: ray.data.Dataset, right: pd.DataFrame,
                    on, how: str = "inner") -> ray.data.Dataset:
    """Broadcast the (small) right side once via ``ray.put``; merge per
    batch. Join columns must share names (rename the right side first)."""
    ref = ray.put(right)

    def merge(batch: pa.Table) -> pa.Table:
        merged = batch.to_pandas().merge(ray.get(ref), on=on, how=how)
        # arrow blocks out: pandas blocks cripple any downstream shuffle
        return pa.Table.from_pandas(merged, preserve_index=False)

    return ds.map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)


def collect_column(ds: ray.data.Dataset, col: str) -> pa.Array:
    """Gather ONE column of a Dataset to the driver as a compact Arrow
    array (zero-copy chunks, no Python row objects). The distributed
    projection runs first, so only the key column crosses to the driver —
    the semi-join build-side pattern for sides too big for take_all() but
    small enough to broadcast (e.g. a filtered key set)."""
    refs = ds.select_columns([col]).to_arrow_refs()
    chunks: list[pa.Array] = []
    for ref in refs:
        t = ray.get(ref)
        if col in t.schema.names:  # skip schema-less empty blocks
            # drop EMPTY chunks too: an all-filtered pandas-roundtripped
            # block can carry a retyped (int64/null) column that would
            # poison the chunked_array concat (seen at sf0.1 where many
            # aggregate partitions filter to nothing)
            chunks.extend(c for c in t.column(col).chunks if len(c))
    if not chunks:
        # typed empty: a mistyped value_set breaks pc.is_in downstream
        return pa.array([], ds.schema().base_schema.field(col).type)
    t0 = chunks[0].type
    chunks = [c if c.type == t0 else c.cast(t0) for c in chunks]
    return pa.chunked_array(chunks).combine_chunks()


def broadcast_semi(ds: ray.data.Dataset, key: str, values) -> ray.data.Dataset:
    """Semi-join filter: keep rows whose ``key`` is in the broadcast set.
    ``values`` may be a Python iterable or an Arrow array (from
    ``collect_column``)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    else:
        arr = pa.array(sorted(values))
    ref = ray.put(arr)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column(key), value_set=ray.get(ref))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def ensure_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Normalize every block to ``schema``. Ray's sort-shuffle aggregate
    emits SCHEMA-LESS empty blocks for empty partitions; pyarrow (Acero)
    hash joins fail on them ("No match ... for key field"), so any
    aggregate output that feeds a join must pass through here."""

    def fix(batch: pa.Table) -> pa.Table:
        if set(schema.names) <= set(batch.schema.names):
            return batch.select(schema.names).cast(schema)
        return schema.empty_table()

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def join_partitions(n_keys: int, rows_per_part: int = 1000,
                    cap: int = 16) -> int:
    """Partition count for a Ray 2.49 ``Dataset.join``.

    Two failure modes bound it: (a) a partition receiving ZERO rows
    crashes the Acero join ("No match for key field"), so the count
    scales with the known key/row count; (b) join aggregator pools sized
    past the core count DEADLOCK on small clusters (a 4-CPU session hung
    on chained 16-partition joins), so the count also caps at half the
    cluster CPUs."""
    from pdf_parser_ray.runtime import cluster_cpus

    return max(1, min(cap, max(1, cluster_cpus() // 2),
                      n_keys // rows_per_part))


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: str, right_on: str | None = None,
              num_partitions: int = 32,
              join_type: str = "inner") -> ray.data.Dataset:
    return left.join(
        right,
        join_type,
        num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


def _sentinel_row(schema: pa.Schema, key: str, key_value: int) -> pa.Table:
    arrays = []
    for f in schema:
        if f.name == key:
            arrays.append(pa.array([key_value], f.type))
        elif pa.types.is_integer(f.type):
            arrays.append(pa.array([0], f.type))
        elif pa.types.is_floating(f.type):
            arrays.append(pa.array([0.0], f.type))
        elif pa.types.is_timestamp(f.type):
            arrays.append(pa.array([0], pa.int64()).cast(f.type))
        else:
            arrays.append(pa.array([""], f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def hash_join_nonempty(left: ray.data.Dataset, right: ray.data.Dataset,
                       on: str, right_on: str,
                       num_partitions: int,
                       left_schema: pa.Schema,
                       right_schema: pa.Schema) -> ray.data.Dataset:
    """Inner hash join hardened for possibly-fully-empty inputs.

    Ray 2.49's hash shuffle DROPS empty blocks, so a side whose every
    block was filtered away hands the Acero join a zero-column partition
    table and the join dies with "No match ... for key field" — an
    ``ensure_schema`` pass upstream cannot defend this (its schema'd
    empty blocks are dropped too). Each side therefore gains ONE
    sentinel row under an impossible key (-1 left, -2 right): the keys
    can never match real int64 keys (all >= 0) or each other, so inner
    semantics drop the sentinels from the output with no post-filter.
    Callers pass the exact block schemas (sides must already be
    ensure_schema-normalized)."""
    left = left.union(ray.data.from_arrow(
        _sentinel_row(left_schema, on, -1)))
    right = right.union(ray.data.from_arrow(
        _sentinel_row(right_schema, right_on, -2)))
    return hash_join(left, right, on=on, right_on=right_on,
                     num_partitions=num_partitions)


def interval_point_join(points: ray.data.Dataset,
                        intervals: ray.data.Dataset, *,
                        point_key: str, start_key: str, end_key: str,
                        bucket_width: int,
                        point_schema: pa.Schema,
                        interval_schema: pa.Schema,
                        num_partitions: int) -> ray.data.Dataset:
    """RANGE JOIN (point-in-interval, big x big) via the bucketed
    decomposition: each interval replicates to every width-
    ``bucket_width`` bucket it overlaps (replication factor
    span/width + 1 — pick the width near the typical interval span);
    each point lives in exactly ONE bucket, so the bucket equi-join
    co-locates every candidate pair exactly once (no post-join dedup)
    and the exact ``start <= point <= end`` predicate runs vectorized
    per batch. In-bucket cost is |points_b| x |intervals_b| — the
    inherent range-join cost; calendar-hot buckets are the salting
    lever (split a hot bucket's intervals across salt replicas and
    fan the bucket's points to every salt). Keys and bounds must be
    int64 (cast timestamps to epoch microseconds); non-key column
    names must not collide across sides. Returns the joined dataset
    (with the ``bucket`` column) filtered to exact containment."""

    def bucket_points(batch: pa.Table) -> pa.Table:
        b = pc.divide(batch.column(point_key),
                      pa.scalar(bucket_width, pa.int64()))
        return batch.append_column("bucket", b)

    def replicate(batch: pa.Table) -> pa.Table:
        st = batch.column(start_key).to_numpy(zero_copy_only=False)
        en = batch.column(end_key).to_numpy(zero_copy_only=False)
        b0 = st // bucket_width
        reps = (en // bucket_width - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(st), dtype=np.int64), reps)
        # replica offset within each interval's bucket run
        off = (np.arange(len(idx), dtype=np.int64)
               - np.repeat(np.cumsum(reps) - reps, reps))
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column("bucket",
                                 pa.array(b0[idx] + off, pa.int64()))

    p_schema = point_schema.append(pa.field("bucket", pa.int64()))
    i_schema = interval_schema.append(pa.field("bucket", pa.int64()))
    p = ensure_schema(points, point_schema).map_batches(
        bucket_points, batch_format="pyarrow", zero_copy_batch=True)
    i = ensure_schema(intervals, interval_schema).map_batches(
        replicate, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join_nonempty(p, i, on="bucket", right_on="bucket",
                                num_partitions=num_partitions,
                                left_schema=p_schema,
                                right_schema=i_schema)

    def exact(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less_equal(batch.column(start_key),
                          batch.column(point_key)),
            pc.less_equal(batch.column(point_key),
                          batch.column(end_key)))
        return batch.filter(keep)

    return joined.map_batches(exact, batch_format="pyarrow",
                              zero_copy_batch=True)


def local_topk(ds: ray.data.Dataset, sort_keys: list[tuple[str, str]],
               k: int) -> pd.DataFrame:
    """Global top-k without a sort shuffle: per-batch local top-k (Arrow
    sort_indices) then a tiny driver merge of <= k rows per block.
    ``sort_keys`` follow pyarrow: [(col, "ascending"|"descending"), ...].
    """

    def take_top(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(batch, sort_keys=sort_keys)
        return batch.take(idx[:k])

    cand = ds.map_batches(take_top, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    cols = [c for c, _ in sort_keys]
    if cand.empty and not set(cols) <= set(cand.columns):
        # all-empty upstream loses the Dataset schema; rebuild the sort
        # columns so an empty top-k is an empty frame, not a KeyError
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    asc = [d == "ascending" for _, d in sort_keys]
    return (cand.sort_values(cols, ascending=asc, kind="mergesort")
            .head(k).reset_index(drop=True))


def as_pandas(x) -> pd.DataFrame:
    """Dataset-or-DataFrame -> DataFrame (grouped_agg returns either)."""
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def ensure_columns(df: pd.DataFrame, dtypes: dict[str, str]) -> pd.DataFrame:
    """A Dataset whose every block is empty loses its schema at
    ``to_pandas()`` (column-less frame); rebuild the typed empty result
    so downstream sorts/selects don't KeyError. No-op when columns
    exist."""
    if set(dtypes) <= set(df.columns):
        return df
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in dtypes.items()})


def to_pandas_sorted(ds_or_df, by: list[str]) -> pd.DataFrame:
    """Small-result helper: stable deterministic ordering for comparisons."""
    df = ds_or_df.to_pandas() if hasattr(ds_or_df, "to_pandas") else ds_or_df
    return df.sort_values(by, kind="mergesort").reset_index(drop=True)


def cc_min_labels(edge_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Connected components by iterative distributed min-label
    propagation over an undirected edge Dataset with columns (u, v)
    (BOTH directions present). Returns a Dataset (doc_id, label) with
    label = min node id in the component; converges in O(component
    diameter) rounds with a fixpoint exit on the (strictly decreasing)
    total label sum. Edges never gather on the driver. Shared by the
    near-dup text clustering (docs_dup_clusters) and the SNN-graph
    embedding dedup (emb_snn_keep)."""
    from ray.data.aggregate import Min

    label_schema = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])

    def init_labels(b: pa.Table) -> pa.Table:
        if "u" not in b.schema.names:  # schema-less empty shuffle block
            return label_schema.empty_table()
        return pa.table({"doc_id": b.column("u"), "label": b.column("u")})

    labels = (grouped_agg(edge_ds, ["u"], [("n", "", "count")])
              .map_batches(init_labels, batch_format="pyarrow")
              .materialize())

    # join partition count from the known edge count (Ray 2.49 joins
    # fail on empty hash partitions — see dedup.minhash_verified_pairs)
    n_parts = join_partitions(edge_ds.count())

    def as_cand(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("v"),
                         "label": batch.column("label")})

    for _ in range(64):  # diameter bound; real loop exits on fixpoint
        # candidate labels: every node keeps its own and receives each
        # neighbor's current label
        prop = edge_ds.join(labels, "inner", n_parts, on=("u",),
                            right_on=("doc_id",))
        cands = prop.map_batches(as_cand, batch_format="pyarrow").union(labels)
        new_labels = ensure_schema(
            cands.groupby("doc_id").aggregate(Min("label", alias_name="label")),
            label_schema).materialize()
        # fixpoint check: total label sum strictly decreases until stable
        if new_labels.sum("label") == labels.sum("label"):
            labels = new_labels
            break
        labels = new_labels
    return labels
