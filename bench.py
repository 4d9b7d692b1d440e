#!/usr/bin/env python
"""Benchmark driver.

Default: run the headline extraction pipeline over a synthetic pages corpus
sized to $GRAFT_SF_DIR's scale factor, plus the full query suite over the
testdata tables, in one Ray session (num_cpus from $RAY_GRAFT_CPUS,
default 32). Prints ONE JSON line:

    {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, ...}

``--scaling``: run ONLY the headline extraction twice in fresh processes
(num_cpus=8 then 32) on the same corpus and report both throughputs plus
scaling efficiency = (thr_32 / thr_8) / (32 / 8).

Env knobs: GRAFT_SF_DIR, RAY_GRAFT_CPUS, GRAFT_BENCH_DOCS (override corpus
size), GRAFT_BENCH_SEED.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return 0.1


def _bench_docs(sf: float) -> int:
    if os.environ.get("GRAFT_BENCH_DOCS"):
        return int(os.environ["GRAFT_BENCH_DOCS"])
    return max(200, int(400_000 * sf))


def _init_ray(num_cpus: int):
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _corpus(n_docs: int, seed: int) -> tuple[str, dict]:
    from pdf_parser_ray.sources.pages import materialize_corpus

    t0 = time.time()
    path = materialize_corpus(n_docs, seed)
    gen_sec = time.time() - t0
    bytes_in = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    )
    return path, {"gen_sec": round(gen_sec, 2), "bytes_in": bytes_in}


def run_extraction(corpus_dir: str) -> dict:
    """Time the extraction pipeline end-to-end, streaming consumption."""
    from pdf_parser_ray.pipelines.extraction import extract_paths

    files = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    t0 = time.time()
    out = extract_paths(files)
    docs = pages = out_bytes = 0
    for batch in out.iter_batches(batch_size=4096, batch_format="pyarrow"):
        docs += batch.num_rows
        pages += sum(batch.column("n_pages").to_pylist())
        out_bytes += batch.column("text").nbytes
    wall = time.time() - t0
    return {
        "wall_sec": round(wall, 3),
        "docs": docs,
        "pages": pages,
        "docs_per_sec": round(docs / wall, 1),
        "pages_per_sec": round(pages / wall, 1),
        "text_mb_out": round(out_bytes / 1e6, 1),
    }


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as entrymod

    times = {}
    for name, fn in entrymod.queries().items():
        if name == "extract_corpus":
            continue  # the headline extraction covers this path at scale
        t0 = time.time()
        result = fn(sf_dir)
        if hasattr(result, "to_pandas") and not hasattr(result, "columns"):
            result.to_pandas()
        times[name] = round(time.time() - t0, 3)
    return times


def single_run(args) -> dict:
    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)
    seed = int(os.environ.get("GRAFT_BENCH_SEED", "42"))

    _init_ray(num_cpus)
    corpus_dir, corpus_info = _corpus(_bench_docs(sf), seed)

    extraction = run_extraction(corpus_dir)
    queries = {} if args.headline_only else run_queries(sf_dir)

    total = extraction["wall_sec"] + sum(queries.values())
    report = {
        "metric": "extraction+queries wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"extract_headline": extraction["wall_sec"], **queries},
        "sf": sf,
        "num_cpus": num_cpus,
        "extraction": extraction,
        "corpus": corpus_info,
    }
    import ray

    ray.shutdown()
    return report


def scaling_run(args) -> dict:
    """Two fresh processes on the same corpus: the sandbox proxy for the
    N-vs-4N-node criterion (BASELINE.md)."""
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)
    seed = int(os.environ.get("GRAFT_BENCH_SEED", "42"))

    # warm the corpus cache (and page cache) once
    _init_ray(int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    _corpus(_bench_docs(sf), seed)
    import ray

    ray.shutdown()

    points = {}
    for cpus in (args.low, args.high):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--headline-only", "--cpus", str(cpus)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = proc.stdout.strip().splitlines()[-1]
        points[cpus] = json.loads(line)

    thr_lo = points[args.low]["extraction"]["pages_per_sec"]
    thr_hi = points[args.high]["extraction"]["pages_per_sec"]
    eff = (thr_hi / thr_lo) / (args.high / args.low)
    return {
        "metric": "scaling efficiency (pages/s, fresh processes)",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"extract_cpus{args.low}": points[args.low]["extraction"]["wall_sec"],
            f"extract_cpus{args.high}": points[args.high]["extraction"]["wall_sec"],
        },
        "sf": sf,
        "num_cpus": args.high,
        "low": points[args.low]["extraction"],
        "high": points[args.high]["extraction"],
        "efficiency": round(eff, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    report = scaling_run(args) if args.scaling else single_run(args)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
