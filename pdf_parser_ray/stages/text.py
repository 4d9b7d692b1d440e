"""Batch stages for text analysis over the ``documents`` table.

All stages are stateless ``map_batches`` functions over Arrow batches; the
regex state is compiled once at module import (per worker process), so no
per-batch setup cost.
"""

from __future__ import annotations

import pyarrow as pa

from pdf_parser_ray.functions import textstats as ts
from pdf_parser_ray.functions.num import round_half_away


def stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id/text -> token counts + quality signals (SQL-mirrorable)."""
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array([ts.token_count(t) for t in texts], pa.int64()),
        "alpha_ratio": pa.array([round_half_away(ts.alpha_ratio(t), 4) for t in texts]),
        "stop_ratio": pa.array([round_half_away(ts.stopword_ratio(t), 4) for t in texts]),
    })


def langid_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array([ts.predict_lang(t) for t in texts], pa.string()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fp": pa.array([ts.fingerprint(t) for t in texts], pa.string()),
    })
