"""Batch stages for text analysis over the ``documents`` table.

All stages are stateless ``map_batches`` functions over Arrow batches,
vectorized end to end with ``pyarrow.compute`` regex kernels + numpy —
no per-row Python in the hot path. The kernels stay in DuckDB lockstep:
Arrow's regex engine is RE2, the same engine DuckDB uses, so counts are
identical by construction; the scalar kernels in functions/textstats.py
compile with re.ASCII so all three engines agree even on non-ASCII text
(parity-tested on the corpus plus unicode edge cases). md5 fingerprints
keep the hashlib loop — there is no Arrow md5 kernel — but that loop is
memory-bound, not compute-bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pdf_parser_ray.functions import textstats as ts
from pdf_parser_ray.functions.num import np_round_half_away

_TOKEN_RX = r"\S+"
_NON_ALPHA_RX = "[^a-zA-Z ]"
_LANG_RX = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|es|y)\b",
}


def _count_rx(col: pa.ChunkedArray | pa.Array, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(col, pattern).to_numpy(zero_copy_only=False)


def _safe_ratio(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    out = np.zeros(len(num), dtype=np.float64)
    np.divide(num, den, out=out, where=den > 0)
    return out


def stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id/text -> token counts + quality signals (SQL-mirrorable);
    the kernel lives in ``quality_signal_columns`` (shared with the
    extraction-time annotation pass)."""
    cols = {"doc_id": batch.column("doc_id")}
    cols.update(quality_signal_columns(batch.column("text")))
    return pa.table(cols)


def quality_signal_columns(col: pa.ChunkedArray | pa.Array):
    """The stats_batch quality kernel over a bare text column:
    [(name, array), ...] for n_tokens / alpha_ratio / stop_ratio —
    reused by the extraction-time ``quality_signals`` annotation pass."""
    n_tokens = _count_rx(col, _TOKEN_RX)
    n_chars = pc.utf8_length(col).to_numpy(
        zero_copy_only=False).astype(np.float64)
    kept = pc.utf8_length(pc.replace_substring_regex(
        col, _NON_ALPHA_RX, "")).to_numpy(
        zero_copy_only=False).astype(np.float64)
    stops = _count_rx(col, _LANG_RX["en"]).astype(np.float64)
    return [
        ("n_tokens", pa.array(n_tokens.astype(np.int64), pa.int64())),
        ("alpha_ratio", pa.array(
            np_round_half_away(_safe_ratio(kept, n_chars), 4),
            pa.float64())),
        ("stop_ratio", pa.array(
            np_round_half_away(
                _safe_ratio(stops, n_tokens.astype(np.float64)), 4),
            pa.float64())),
    ]


def lang_pred_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized n-gram language ID over a text column with the fixed
    >= cascade (en, de, fr, es; 'unknown' when no marker hits)."""
    en = _count_rx(col, _LANG_RX["en"])
    de = _count_rx(col, _LANG_RX["de"])
    fr = _count_rx(col, _LANG_RX["fr"])
    es = _count_rx(col, _LANG_RX["es"])
    pred = np.where(
        (en == 0) & (de == 0) & (fr == 0) & (es == 0), "unknown",
        np.where((en >= de) & (en >= fr) & (en >= es), "en",
                 np.where((de >= fr) & (de >= es), "de",
                          np.where(fr >= es, "fr", "es"))))
    return pa.array(pred.tolist(), pa.string())


def langid_batch(batch: pa.Table) -> pa.Table:
    """doc_id/text -> (doc_id, pred_lang); see ``lang_pred_array``."""
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": lang_pred_array(batch.column("text")),
    })


def token_count_array(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized whitespace token counts (int64) for reuse in other
    stages (docs_lang_summary etc.)."""
    return _count_rx(col, _TOKEN_RX).astype(np.int64)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fp": pa.array([ts.fingerprint(t) for t in texts], pa.string()),
    })
