#!/usr/bin/env python
"""Local full-suite correctness gate, mirroring the driver's check.

The per-round driver records only the FIRST 50 ``queries()`` entries in
CORRECTNESS_rN.json; this script runs EVERY registered pipeline against
its DuckDB oracle (same compare rules: row count, column names, exact
values after sorting columns by name and rows by all columns) and writes
the full result map, so the repo always carries a complete, current
correctness artifact regardless of the driver cap.

Usage:
    python local_gate.py [--sf-dir /root/testdata/sf0.01] \
                         [--out CORRECTNESS_LOCAL_r03.json] [--cpus 8]

Owns its Ray session (the driver contract forbids ray.init inside
__ray_entry__ / the library — this script is a driver).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _value_hash(df) -> str:
    h = hashlib.md5()
    for col in df.columns:
        for v in df[col]:
            h.update(repr(v).encode())
        h.update(b"|")
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_LOCAL_r04.json")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="comma-separated pipeline names to run "
                         "(default: all)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import ray

    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    oracles = entrymod.oracle_sql()
    out: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        row: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "ray_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            res = fn(args.sf_dir)
            if hasattr(res, "to_pandas") and not hasattr(res, "columns"):
                res = res.to_pandas()
            row["ray_rows"] = int(len(res))
            if name in oracles:
                a = _canon(res)
                b = _canon(con.execute(oracles[name]).df())
                row["oracle_rows"] = int(len(b))
                row["rows_match"] = len(a) == len(b)
                row["schema_match"] = list(a.columns) == list(b.columns)
                # repr-level hash compare, exactly as strict as the
                # driver: dtype drift (int64 vs float64 repr) fails here
                # even when the numeric values coincide.  Round 3 shipped
                # 11 such drifts because the old compare coerced to float.
                ha, hb = _value_hash(a), _value_hash(b)
                row["hash_match"] = bool(row["rows_match"]
                                         and row["schema_match"]
                                         and ha == hb)
                row["ray_hash"] = ha
                row["oracle_hash"] = hb
            else:
                row["err"] = "no_oracle"
                # determinism: a second run must return identical bytes
                res2 = fn(args.sf_dir)
                if hasattr(res2, "to_pandas") and not hasattr(res2, "columns"):
                    res2 = res2.to_pandas()
                row["deterministic"] = _value_hash(_canon(res)) == \
                    _value_hash(_canon(res2))
        except Exception as exc:  # noqa: BLE001 - the gate must not die
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        row["sec"] = round(time.time() - t0, 2)
        out[name] = row
        status = ("GREEN" if row.get("hash_match")
                  else row["err"] or "MISMATCH")
        print(f"{name:34s} {status:10s} {row['sec']:7.2f}s", flush=True)

    if only is not None and os.path.exists(args.out):
        # targeted rerun: refresh just those rows, keep the full record
        with open(args.out) as f:
            merged = json.load(f)
        merged.update(out)
        out = merged
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    greens = sum(1 for r in out.values() if r.get("hash_match"))
    print(f"\n{greens} hash-green / {len(out)} total -> {args.out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
