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
                small_result: bool = False,
                int_exact: bool = False,
                agg_partitions: int | None = None):
    """Two-phase grouped aggregation.

    ``spec`` entries are ``(out_name, src_col, op)`` with op in
    {"sum", "count", "min", "max"}.

    ``small_result=True`` declares the group-key cardinality bounded (a few
    thousand at most — priorities, nations, languages, hours): the map-side
    combine still runs distributed, but the final merge of the tiny partial
    rows happens on the driver instead of paying a whole sort-shuffle
    groupby (which costs seconds of fixed overhead per call). Returns a
    pandas DataFrame in that mode, a Dataset otherwise.

    ``int_exact=True`` declares every aggregated source integer/string
    (order-insensitive exact ops — the cents-int discipline): the final
    combine then runs through ``salted_agg`` (hash-partitioned, sort-free;
    see its docstring for the measured 59 s -> 0.74 s delta at 1M groups)
    instead of Ray's key-sorted aggregate. Float sums must NOT set this:
    their accumulation order is the pinned oracle behaviour.
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

    # count/min/max are order-insensitive for EVERY dtype (count folds
    # int partials; min/max are lattice ops), so sum-free specs always
    # take the sort-free combine; sums need the caller's int_exact
    # declaration because a float sum's accumulation order is pinned.
    if int_exact or all(op in ("count", "min", "max") for _, _, op in spec):
        aggs = [((_PARTIAL_COUNT, "sum", out) if op == "count"
                 else (out, op, out)) for out, _, op in spec]
        return salted_agg(partials, keys, aggs,
                          num_partitions=agg_partitions)

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


# salted_agg constants: FNV-1a / golden-ratio mixing for the partition
# hash; null sentinels only decide CO-LOCATION (the in-partition groupby
# still separates real keys), so a collision with a genuine value is a
# skew detail, never a correctness issue.
_SALT_FNV = np.uint64(1099511628211)
_SALT_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_NULL_INT_SENTINEL = -(1 << 62) + 12345
_NULL_STR_SENTINEL = "\x00<NULL>"


def default_agg_partitions() -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 2 * cpus)


def _salt_column(batch: pa.Table, keys: list[str], p: int) -> pa.Array:
    """Deterministic partition id per row from the key tuple. Hashing is
    Arrow-canonicalized: a pandas roundtrip would hash the same logical
    column as int64 in null-free batches and float64 in batches with
    nulls, splitting equal keys across partitions (observed)."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in keys:
        col = batch.column(c)
        if (pa.types.is_integer(col.type) or pa.types.is_temporal(col.type)
                or pa.types.is_boolean(col.type)):
            x = pc.fill_null(pc.cast(col, pa.int64()), _NULL_INT_SENTINEL)
            arr = x.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            s = pc.fill_null(pc.cast(col, pa.string()), _NULL_STR_SENTINEL)
            arr = pd.util.hash_array(
                s.to_numpy(zero_copy_only=False)).astype(np.uint64)
        h = h * _SALT_FNV ^ (arr * _SALT_GOLDEN)
    return pa.array((h % np.uint64(p)).astype(np.int64), pa.int64())


def salted_agg(partials: ray.data.Dataset, keys: list[str],
               aggs: list[tuple[str, str, str]],
               num_partitions: int | None = None) -> ray.data.Dataset:
    """Hash-partitioned final combine for two-phase aggregation — the
    sort-free replacement for ``Dataset.groupby(keys).aggregate(...)``.

    Ray 2.49's aggregate pays a full sort exchange keyed on the GROUP KEY
    (measured 59 s for 4M partial rows / 1M int64 groups at 16 CPUs), but
    a final combine only needs CO-LOCATION, not order: hash the key tuple
    to one of ``num_partitions`` salt values, sort-exchange on THAT tiny
    domain instead (0.74 s, same input — the sort collapses when the key
    domain is the partition count), and run ONE vectorized
    ``pa.TableGroupBy`` per partition. Exact for order-insensitive ops
    (integer/string sum, min, max, count); float sums must stay on the
    legacy path, whose accumulation order is the pinned behaviour.

    ``aggs``: (src, op, out) triples over the PARTIAL columns; op in
    {"sum", "min", "max", "count_all"}.

    Scale: each partition holds its keys' partial rows as one in-memory
    block, so size ``num_partitions`` to partial-row volume (callers that
    know the key cardinality pass it — join_partitions discipline); the
    default 2x cluster CPUs suits corpus-scale partials that map-side
    combine has already reduced."""
    p = num_partitions or default_agg_partitions()

    def addpart(batch: pa.Table) -> pa.Table:
        return batch.append_column("part", _salt_column(batch, keys, p))

    spec = [(src, op) if op != "count_all" else ([], "count_all")
            for src, op, _ in aggs]
    out_names = list(keys) + [out for _, _, out in aggs]

    def combine(group: pa.Table) -> pa.Table:
        cols = [c for c in group.schema.names if c != "part"]
        g = pa.TableGroupBy(group.select(cols), keys,
                            use_threads=False).aggregate(spec)
        # pyarrow names aggregate outputs "<src>_<op>" ("count_all" for
        # the row count); select by name, then rename to the out names
        picked = list(keys) + [
            (f"{src}_{op}" if op != "count_all" else "count_all")
            for src, op, _ in aggs]
        return g.select(picked).rename_columns(out_names)

    return (partials.map_batches(addpart, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("part").map_groups(combine, batch_format="pyarrow"))


def salted_map_groups(ds: ray.data.Dataset, keys: list[str], fn,
                      batch_format: str = "pandas",
                      num_partitions: int | None = None) -> ray.data.Dataset:
    """Group-integrity ``map_groups`` WITHOUT the key-sorted exchange:
    the drop-in for ``ds.groupby(keys).map_groups(fn, batch_format=...)``
    when the key is high-cardinality (user_id, band_key). The exchange
    runs on a hashed partition id (tiny domain — the sort collapses, same
    measured delta as salted_agg); group integrity still holds because
    equal keys hash to the same partition, and the per-group ``fn`` is
    replayed inside each partition by a local groupby.

    pandas format: multi-key, NULL keys preserved (dropna=False — the
    sorted-exchange path delivers NULL-key groups too). pyarrow format:
    single NON-NULL key (sort_by + boundary slicing keeps everything
    zero-copy; the band-key use cases guarantee non-null).

    Groups arrive at ``fn`` sorted by key within each partition, matching
    the sorted-exchange path's per-group contract (fn sees one whole
    group; cross-group order was never guaranteed to callers)."""
    p = num_partitions or default_agg_partitions()

    def addpart(batch: pa.Table) -> pa.Table:
        return batch.append_column("part", _salt_column(batch, keys, p))

    salted = ds.map_batches(addpart, batch_format="pyarrow",
                            zero_copy_batch=True)

    if batch_format == "pandas":
        def wrapper(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns=["part"])
            outs = [fn(g) for _, g in df.groupby(keys, sort=True,
                                                 dropna=False)]
            return pd.concat(outs, ignore_index=True)

        return salted.groupby("part").map_groups(wrapper,
                                                 batch_format="pandas")

    if len(keys) != 1:
        raise ValueError("pyarrow salted_map_groups supports one key")
    key = keys[0]

    def wrapper_arrow(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"]).sort_by([(key, "ascending")])
        if t.num_rows == 0:
            return fn(t)
        col = t.column(key).combine_chunks()
        neq = pc.not_equal(col.slice(1), col.slice(0, len(col) - 1))
        starts = np.flatnonzero(np.concatenate(
            ([True], neq.to_numpy(zero_copy_only=False))))
        bounds = np.append(starts, len(col))
        outs = [fn(t.slice(int(s), int(e - s)))
                for s, e in zip(bounds[:-1], bounds[1:])]
        return pa.concat_tables(outs)

    return salted.groupby("part").map_groups(wrapper_arrow,
                                             batch_format="pyarrow")


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


DIM_BROADCAST_MAX = 5_000_000  # rows; ~the r3 gate size for key sets


def attach_dim(fact: ray.data.Dataset, dim: ray.data.Dataset, *,
               on: str, dim_count: int,
               fact_schema: pa.Schema, dim_schema: pa.Schema,
               how: str = "inner",
               broadcast_max: int | None = None) -> ray.data.Dataset:
    """Attach a dimension's payload columns to a fact Dataset,
    SIZE-GATED on the dimension row count (the cluster-label gate
    discipline): below ``broadcast_max`` rows the dimension collects
    once and broadcasts (``broadcast_merge`` — one ray.put, zero
    shuffle); above it (a TPC-H customer/supplier/part dimension at
    100 TB outgrows any broadcast) both sides hash-partition through a
    sentinel-hardened ``Dataset.join``. Join column names must already
    match (rename the dim first); ``how`` is "inner", "left" or
    "left_outer" (the last two are synonyms)."""
    if broadcast_max is None:
        broadcast_max = DIM_BROADCAST_MAX
    join_type = {"inner": "inner", "left": "left_outer",
                 "left_outer": "left_outer"}[how]
    how = "left" if join_type == "left_outer" else "inner"  # pandas name
    if dim_count <= broadcast_max:
        dim_df = as_pandas(dim.to_pandas())
        if not set(dim_schema.names) <= set(dim_df.columns):
            # an all-empty Dataset loses its schema at to_pandas();
            # rebuild the typed empty frame so the merge keeps columns
            dim_df = dim_schema.empty_table().to_pandas()
        return broadcast_merge(fact, dim_df, on=on, how=how)
    return hash_join_guarded(
        ensure_schema(fact, fact_schema), ensure_schema(dim, dim_schema),
        on, on, join_partitions(dim_count, cap=32),
        fact_schema, dim_schema, join_type=join_type)


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


def hash_join_guarded(left: ray.data.Dataset, right: ray.data.Dataset,
                      on: str, right_on: str,
                      num_partitions: int,
                      left_schema: pa.Schema,
                      right_schema: pa.Schema,
                      join_type: str = "inner") -> ray.data.Dataset:
    """``hash_join_nonempty`` generalized to any left-preserving join
    type (inner / left_outer / left_semi / left_anti). The same
    impossible-key sentinels (-1 left, -2 right) defend the Acero join
    against a fully-empty side; non-inner types can LEAK the left
    sentinel into the output (left_outer pads it with nulls, left_anti
    keeps it by definition), so the result is post-filtered to
    ``on >= 0`` — callers' real int64 keys must be non-negative (the
    doc_id/cluster_id discipline everywhere in this repo)."""
    left = left.union(ray.data.from_arrow(
        _sentinel_row(left_schema, on, -1)))
    right = right.union(ray.data.from_arrow(
        _sentinel_row(right_schema, right_on, -2)))
    joined = left.join(right, join_type, num_partitions,
                       on=(on,), right_on=(right_on,))

    def unsentinel(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column(on),
                                             pa.scalar(0, pa.int64())))

    return joined.map_batches(unsentinel, batch_format="pyarrow",
                              zero_copy_batch=True)


def _salt_plan(bucket_counts: pd.DataFrame, hot_bucket_max: int,
               max_salt: int) -> dict[int, int]:
    """bucket -> salt factor for buckets whose interval count exceeds
    ``hot_bucket_max``: S = ceil(n / hot_bucket_max), capped at
    ``max_salt`` so point replication stays bounded. Per-(bucket,salt)
    interval count is then <= ceil(n / S) <= hot_bucket_max (until the
    cap bites, where the residual is n / max_salt and logged by the
    caller's census)."""
    if bucket_counts.empty:
        return {}
    hot = bucket_counts[bucket_counts["n"] > hot_bucket_max]
    return {int(b): min(int(-(-int(n) // hot_bucket_max)), max_salt)
            for b, n in zip(hot["bucket"], hot["n"])}


def interval_point_join(points: ray.data.Dataset,
                        intervals: ray.data.Dataset, *,
                        point_key: str, start_key: str, end_key: str,
                        bucket_width: int,
                        point_schema: pa.Schema,
                        interval_schema: pa.Schema,
                        num_partitions: int,
                        hot_bucket_max: int = 256 * 1024,
                        max_salt: int = 256) -> ray.data.Dataset:
    """RANGE JOIN (point-in-interval, big x big) via the bucketed
    decomposition: each interval replicates to every width-
    ``bucket_width`` bucket it overlaps (replication factor
    span/width + 1 — pick the width near the typical interval span);
    each point lives in exactly ONE bucket, so the bucket equi-join
    co-locates every candidate pair exactly once (no post-join dedup)
    and the exact ``start <= point <= end`` predicate runs vectorized
    per batch.

    In-bucket cost is |points_b| x |intervals_b| — the inherent
    range-join cost — so CALENDAR-HOT buckets (a flash-crowd hour) are
    salted: a census over the replicated intervals (per-bucket counts,
    bounded by the time span / width) finds buckets holding more than
    ``hot_bucket_max`` intervals; a hot bucket's intervals split across
    S = ceil(n/hot_bucket_max) <= ``max_salt`` salt replicas and the
    bucket's points fan to every salt, so no single join partition ever
    sees more than ~hot_bucket_max intervals per bucket. Cold corpora
    pay only the census (one bounded grouped agg).

    Keys and bounds must be int64 (cast timestamps to epoch
    microseconds); non-key column names must not collide across sides.
    Returns the joined dataset (with the ``bucket`` column) filtered
    to exact containment."""

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
        replicate, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # hot-bucket census: per-bucket interval counts are bounded by the
    # covered time range / bucket_width, so the frame is driver-tiny
    counts = ensure_columns(
        as_pandas(grouped_agg(i, ["bucket"], [("n", "", "count")],
                              small_result=True)),
        {"bucket": "int64", "n": "int64"})
    salt_map = _salt_plan(counts, hot_bucket_max, max_salt)

    if salt_map:
        sref = ray.put(salt_map)
        ps_schema = p_schema.append(pa.field("salt", pa.int64()))
        is_schema = i_schema.append(pa.field("salt", pa.int64()))

        def salt_intervals(batch: pa.Table) -> pa.Table:
            m = ray.get(sref)
            b = batch.column("bucket").to_numpy(zero_copy_only=False)
            s = np.zeros(len(b), np.int64)
            for hb, S in m.items():
                mask = b == hb
                k = int(mask.sum())
                if k:
                    # any partition into S groups is correct (points
                    # fan to every salt); round-robin balances them
                    s[mask] = np.arange(k, dtype=np.int64) % S
            return batch.append_column("salt", pa.array(s, pa.int64()))

        def salt_points(batch: pa.Table) -> pa.Table:
            m = ray.get(sref)
            b = batch.column("bucket").to_numpy(zero_copy_only=False)
            reps = np.ones(len(b), np.int64)
            for hb, S in m.items():
                reps[b == hb] = S
            idx = np.repeat(np.arange(len(b), dtype=np.int64), reps)
            off = (np.arange(len(idx), dtype=np.int64)
                   - np.repeat(np.cumsum(reps) - reps, reps))
            out = batch.take(pa.array(idx, pa.int64()))
            return out.append_column("salt", pa.array(off, pa.int64()))

        ps = p.map_batches(salt_points, batch_format="pyarrow",
                           zero_copy_batch=True)
        isd = i.map_batches(salt_intervals, batch_format="pyarrow",
                            zero_copy_batch=True)
        # sentinel-hardened two-key join (the hash_join_nonempty
        # discipline): impossible bucket keys -1/-2, dropped by inner
        # semantics
        ps = ps.union(ray.data.from_arrow(
            _sentinel_row(ps_schema, "bucket", -1)))
        isd = isd.union(ray.data.from_arrow(
            _sentinel_row(is_schema, "bucket", -2)))
        joined = ps.join(isd, "inner", num_partitions,
                         on=("bucket", "salt"),
                         right_on=("bucket", "salt"))
    else:
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
        out = batch.filter(keep)
        if "salt" in out.schema.names:  # schema parity with the cold path
            out = out.drop_columns(["salt"])
        return out

    return joined.map_batches(exact, batch_format="pyarrow",
                              zero_copy_batch=True)


def local_topk(ds: ray.data.Dataset, sort_keys: list[tuple[str, str]],
               k: int, driver_max: int = 64 * 1024) -> pd.DataFrame:
    """Global top-k without a sort shuffle: per-batch local top-k (Arrow
    sort_indices), then TREE-MERGE levels (64 candidate sets per merge
    batch — the HLL fan-in pattern) until at most ``driver_max``
    candidate rows remain to cross to the driver. At 100 TB / 128 MB
    blocks the per-block candidates alone are ~800k*k rows; the merge
    levels bound the driver concat regardless of block count, and each
    level runs over the already-k-bounded candidates only.
    ``sort_keys`` follow pyarrow: [(col, "ascending"|"descending"), ...].
    """

    def take_top(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(batch, sort_keys=sort_keys)
        return batch.take(idx[:k])

    cand_ds = ds.map_batches(take_top, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    while cand_ds.count() > max(driver_max, k):
        cand_ds = cand_ds.map_batches(
            take_top, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=64 * k).materialize()
    cand = cand_ds.to_pandas()
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
