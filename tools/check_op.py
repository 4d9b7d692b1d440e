#!/usr/bin/env python
"""Spot-check ONE registered pipeline against its DuckDB oracle at one
or more scale factors — the per-op development loop behind the full
local_gate.py run.

Usage: python tools/check_op.py OP [OP...] [--sf 0.001 0.01]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="+")
    ap.add_argument("--sf", nargs="+", default=["0.001", "0.01"])
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    import __ray_entry__ as entrymod

    qmap, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = False
    for sf in args.sf:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM '{sf_dir}/{t}.parquet'")
        for op in args.ops:
            t0 = time.time()
            res = qmap[op](sf_dir)
            if hasattr(res, "to_pandas") and not hasattr(res, "columns"):
                res = res.to_pandas()
            if op not in oracles:
                print(f"sf{sf} {op}: NO ORACLE, rows={len(res)} "
                      f"({time.time() - t0:.1f}s)")
                continue
            a = _canon(res)
            b = _canon(con.execute(oracles[op]).df())
            ok = (len(a) == len(b)
                  and list(a.columns) == list(b.columns))
            bad = None
            if ok:
                for col in a.columns:
                    for i, (x, y) in enumerate(zip(a[col], b[col])):
                        if not _eq(x, y):
                            ok, bad = False, (col, i, x, y)
                            break
                    if not ok:
                        break
            print(f"sf{sf} {op}: {'GREEN' if ok else 'MISMATCH'} "
                  f"rows={len(a)}/{len(b)} cols={list(a.columns)} "
                  f"({time.time() - t0:.1f}s)"
                  + (f" first-diff={bad}" if bad else ""))
            failed |= not ok
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
