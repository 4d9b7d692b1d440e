"""Distributed synthetic pages-corpus materialisation for benchmarks.

The corpus is a pure function of (seed, doc_id) (sources/synth.py), so it
can be generated inside Ray ``map_batches`` at any scale with bytes
identical to a sequential run — no driver-side generation loop.  Written
once to parquet shards under a cache directory keyed by (n_docs, seed) and
reused across bench runs.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from pdf_parser_ray.sources.synth import corpus_table_for_ids

DEFAULT_CACHE = "/tmp/pdf_parser_ray_corpus"


def synth_dataset(n_docs: int, seed: int = 42) -> ray.data.Dataset:
    """Generate the corpus as a streaming Dataset (id range -> rows)."""
    ids = ray.data.range(n_docs)

    def gen(batch: pa.Table) -> pa.Table:
        return corpus_table_for_ids(batch.column("id").to_pylist(), seed)

    return ids.map_batches(gen, batch_format="pyarrow", batch_size=512)


def _generator_fingerprint() -> str:
    """Hash of the generator source: a changed synth.py must invalidate
    cached corpora or benchmarks would silently run on stale data."""
    import hashlib
    import inspect

    from pdf_parser_ray.sources import synth

    return hashlib.sha256(inspect.getsource(synth).encode()).hexdigest()[:12]


def materialize_corpus(n_docs: int, seed: int = 42,
                       cache_dir: str = DEFAULT_CACHE) -> str:
    """Write (or reuse) the corpus parquet shards; returns the directory.

    The completion marker lives OUTSIDE the shard directory (sibling file)
    so a plain ``ray.data.read_parquet(dir)`` never tries to parse it."""
    out = os.path.join(cache_dir, f"n{n_docs}_s{seed}")
    marker = os.path.join(cache_dir, f"n{n_docs}_s{seed}.complete")
    legacy_marker = os.path.join(out, "_COMPLETE")
    fingerprint = _generator_fingerprint()
    # the marker lives OUTSIDE the shard dir, so its existence no longer
    # implies the data's: require both
    if os.path.exists(marker) and os.path.isdir(out):
        with open(marker) as f:
            if f.read().strip() == fingerprint:
                return out
    import shutil

    if os.path.exists(out):
        shutil.rmtree(out)
    if os.path.exists(marker):
        os.remove(marker)
    os.makedirs(cache_dir, exist_ok=True)
    synth_dataset(n_docs, seed).write_parquet(out)
    if os.path.exists(legacy_marker):  # pre-relocation cache layout
        os.remove(legacy_marker)
    with open(marker, "w") as f:
        f.write(fingerprint)
    return out
