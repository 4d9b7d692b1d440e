"""End-to-end extraction pipeline assembly.

    read_parquet(shards, columns=["url", "html"])       # prune at the read
      -> map_batches(route_and_explode)                 # stateless tasks
      -> map_batches(ParseDocuments, concurrency=N)     # actor pool
      -> [groupby("url").map_groups(assemble)]          # only in explode mode
      -> write_parquet / downstream

Two modes:

* ``explode_threshold=None`` (pure map): no shuffle anywhere; giant
  documents are parsed inside their task. Streaming, trivially linear.
* ``explode_threshold=<bytes>``: documents above the threshold are split to
  per-page rows before parsing and reassembled by a ``groupby("url")``
  consolidation. The shuffle moves only extracted text chunks (the html
  payload is dropped at the route stage). This is the skew path the north
  rule requires: one 10k-page document no longer pins a single task.

Scale notes (100 TB / 256 nodes): the parse stage is an actor pool sized by
``concurrency``; blocks stream with backpressure; nothing materialises the
corpus. The groupby key ``url`` is unique per document -> high cardinality,
no hot keys; its cost is bounded by extracted-text volume, not crawl bytes.
"""

from __future__ import annotations

import ray.data

from pdf_parser_ray.runtime import cluster_cpus, ensure_data_context
from pdf_parser_ray.stages.extract import (
    OUTPUT_COLUMNS,
    ParseDocuments,
    assemble_group,
    make_router,
)

# Defaults tuned on the 32-CPU sandbox; see BENCH notes in BASELINE.md.
DEFAULT_PARSE_BATCH = 64
# Only genuinely giant documents (thousands of pages) explode; the common
# case stays on the shuffle-free fast path. A ~1 MB bundle is ~300 pages
# (~0.6 s of parse) — not yet a straggler.
DEFAULT_EXPLODE_THRESHOLD = 1024 * 1024


def read_pages(paths, columns=("url", "html")) -> ray.data.Dataset:
    """Input reader: only the columns the pipeline needs leave storage."""
    return ray.data.read_parquet(list(paths) if isinstance(paths, (list, tuple)) else paths,
                                 columns=list(columns))


def extract_dataset(
    ds: ray.data.Dataset,
    *,
    explode_threshold: int | None = DEFAULT_EXPLODE_THRESHOLD,
    want_markdown: bool = True,
    want_json: bool = False,
    parse_concurrency=None,
    parse_batch_size: int = DEFAULT_PARSE_BATCH,
) -> ray.data.Dataset:
    """Wire the extraction stages onto ``ds`` (columns: url, html).

    Returns a streaming Dataset with columns
    (url, text, markdown, json, n_pages, n_blocks, n_tables, error).
    """
    ensure_data_context()
    routed = ds.map_batches(
        make_router(explode_threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    parsed = routed.map_batches(
        ParseDocuments,
        fn_constructor_kwargs={
            "want_markdown": want_markdown,
            "want_json": want_json,
        },
        batch_format="pyarrow",
        batch_size=parse_batch_size,
        zero_copy_batch=True,
        # fixed-size actor pool: the parse stage dominates compute, so claim
        # the cores upfront instead of waiting on autoscaler ramp-up — but
        # leave two cores for the read/route tasks feeding the pool, or the
        # pipeline starves itself
        concurrency=parse_concurrency if parse_concurrency is not None
        else max(2, cluster_cpus() - 2),
        num_cpus=1,
    )
    if explode_threshold is None:
        return parsed.select_columns(OUTPUT_COLUMNS)
    return parsed.groupby("url").map_groups(assemble_group,
                                            batch_format="pyarrow")


def extract_paths(paths, **kwargs) -> ray.data.Dataset:
    return extract_dataset(read_pages(paths), **kwargs)
