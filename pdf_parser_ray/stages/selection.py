"""Distributed EXACT order statistics by radix selection.

The engine's selection family (scalar / grouped / weighted medians, the
multi-percentile op, the `quantile` CLI) shares this machinery: doubles
map to uint64 keys whose unsigned order is the IEEE-754 total order, and
each order statistic is pinned by four rounds of 2^16-bucket histograms
(16 bits per round; 64 bits determine the value itself, so there is
never a residual candidate set to gather). Scans are shared across ALL
requested ranks, and ranks that still share a bit-prefix share one
histogram — so a 5-quantile request costs the same 4 scans as a median.

Exactness contract: bit-identical to DuckDB's quantile_cont — selection
is exact by construction, and interpolation uses DuckDB's convex
``lo*(1-frac) + hi*frac`` form (probed: it differs from the naive lerp
in the last ulp and survives |lo+hi| > DBL_MAX). NULLs are excluded
from selection (SQL lockstep); NaN VALUES are a documented
precondition (DuckDB ranks NaN above +inf, this kernel excludes them
with the nulls).

Scale: driver state is one 65536-int histogram per (round, live
prefix) plus a bit-prefix per rank; each round is one map-side scan
whose exchange carries <= 65536 sparse (prefix, bucket, count) rows per
batch. The knob is bucket width — 2^20-bucket rounds would fix 20 bits
per pass (3 passes) at 8 MB driver histograms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_F64_TOP = np.uint64(1) << np.uint64(63)
_F64_ALL = np.uint64(0xFFFFFFFFFFFFFFFF)


def f64_sort_keys(v: np.ndarray) -> np.ndarray:
    """IEEE-754 doubles -> uint64 keys whose UNSIGNED integer order is
    the total order of the doubles (negatives flip all bits, positives
    flip the sign bit — the classic radix-sort transform)."""
    bits = v.view(np.uint64)
    flip = np.where(bits >> np.uint64(63) == 1, _F64_ALL, _F64_TOP)
    return bits ^ flip


def f64_from_key(key: int) -> float:
    k = np.uint64(key)
    bits = (k ^ _F64_TOP) if (k >> np.uint64(63)) == 1 else ~k
    return float(np.uint64(bits).view(np.float64))


def _make_hist(column: str, r: int, shift: int, prefixes: tuple):
    def hist(batch: pa.Table) -> pa.Table:
        v = pc.drop_null(batch.column(column)).to_numpy(
            zero_copy_only=False)
        key = f64_sort_keys(np.ascontiguousarray(v, np.float64))
        out_p, out_b, out_c = [], [], []
        for pref in prefixes:
            kt = key if r == 0 else \
                key[(key >> np.uint64(shift + 16)) == pref]
            if not len(kt):
                continue
            b = ((kt >> np.uint64(shift))
                 & np.uint64(0xFFFF)).astype(np.int64)
            cnt = np.bincount(b, minlength=1)
            nz = np.flatnonzero(cnt)
            out_p.extend([pref] * len(nz))
            out_b.extend(nz.tolist())
            out_c.extend(cnt[nz].tolist())
        return pa.table({"p": pa.array(out_p, pa.int64()),
                         "bucket": pa.array(out_b, pa.int64()),
                         "cnt": pa.array(out_c, pa.int64())})
    return hist


def _fold(parts: pd.DataFrame, pref: int) -> np.ndarray:
    counts = np.zeros(65536, np.int64)
    if "p" in parts.columns and len(parts):
        sel = parts[parts["p"] == pref]
        if len(sel):
            g = sel.groupby("bucket")["cnt"].sum()
            counts[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)
    return counts


def select_ranks(ds: "ray.data.Dataset", column: str,
                 ranks: set[int] | None = None,
                 ranks_fn=None) -> tuple[dict[int, float], int]:
    """Select the values at 0-based non-null ranks of ``column``
    (ascending IEEE total order). Returns ({rank: value}, n_valid).
    Pass either ``ranks`` directly, or ``ranks_fn(n_valid) -> set`` —
    the callback form lets quantile callers derive their ranks from
    n_valid WITHOUT an extra counting scan (n_valid falls out of round
    0's histogram, which then seeds the selection: 4 scans total)."""
    parts0 = ds.map_batches(_make_hist(column, 0, 48, (0,)),
                            batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    counts0 = _fold(parts0, 0)
    n_valid = int(counts0.sum())
    if ranks_fn is not None and n_valid:
        ranks = ranks_fn(n_valid)
    if n_valid == 0 or not ranks:
        return {}, n_valid
    cum0 = np.cumsum(counts0)
    state = {}
    for k in ranks:
        b_idx = int(np.searchsorted(cum0, k, side="right"))
        below = int(cum0[b_idx - 1]) if b_idx > 0 else 0
        state[k] = (b_idx, below)
    for r in range(1, 4):
        shift = 48 - 16 * r
        prefixes = tuple(sorted({p for p, _ in state.values()}))
        parts = ds.map_batches(_make_hist(column, r, shift, prefixes),
                               batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        new_state = {}
        for k, (pref, below) in state.items():
            cum = np.cumsum(_fold(parts, pref))
            rel_k = k - below
            b_idx = int(np.searchsorted(cum, rel_k, side="right"))
            below += int(cum[b_idx - 1]) if b_idx > 0 else 0
            new_state[k] = ((pref << 16) | b_idx, below)
        state = new_state
    return {k: f64_from_key(p) for k, (p, _) in state.items()}, n_valid


def exact_quantiles(ds: "ray.data.Dataset", column: str,
                    qs: list[float]) -> tuple[list[float], int]:
    """quantile_cont(column, q) for each q in ``qs``, bit-identical to
    DuckDB, in ONE shared selection run — exactly 4 scans: the ranks
    derive from n_valid inside the round-0 callback, so there is no
    separate counting pass. Returns (values, n_valid); values are NaN
    when the column has no non-null rows."""
    plan: list[tuple[int, float]] = []

    def ranks_fn(n_valid: int) -> set[int]:
        ranks: set[int] = set()
        for q in qs:
            h = (n_valid - 1) * q
            i0 = int(np.floor(h))
            frac = h - i0
            plan.append((i0, frac))
            ranks.add(i0)
            if frac > 0:
                ranks.add(i0 + 1)
        return ranks

    val, n_valid = select_ranks(ds, column, ranks_fn=ranks_fn)
    if n_valid == 0:
        return [float("nan")] * len(qs), 0
    out = []
    for i0, frac in plan:
        if frac > 0:
            out.append(val[i0] * (1 - frac) + val[i0 + 1] * frac)
        else:
            out.append(val[i0])
    return out, n_valid
