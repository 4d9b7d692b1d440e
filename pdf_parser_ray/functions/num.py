"""Numeric helpers shared by the query pipelines.

``round_half_away`` matches DuckDB's ROUND (half away from zero on the
double value) instead of Python/numpy's bankers' rounding — required for
value-hash agreement between the Ray pipelines and their SQL oracles
(e.g. 1/32 = 0.03125 rounds to 0.0313 in SQL but 0.0312 under half-even).
"""

from __future__ import annotations

import math

import numpy as np


def round_half_away(x: float, digits: int) -> float:
    scale = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def np_round_half_away(a, digits: int):
    a = np.asarray(a, dtype=np.float64)
    scale = 10.0 ** digits
    return np.copysign(np.floor(np.abs(a) * scale + 0.5), a) / scale


def np_round_half_away_int(a) -> np.ndarray:
    """Half-away-from-zero to the nearest INTEGER, as int64 — the numpy
    twin of SQL ``CAST(round(x) AS BIGINT)`` for pre-scaled values (the
    exact-integer-sum discipline for means/sums of floats)."""
    a = np.asarray(a, dtype=np.float64)
    return np.copysign(np.floor(np.abs(a) + 0.5), a).astype(np.int64)


def series_round_half_away(s, digits: int):
    import pandas as pd

    return pd.Series(np_round_half_away(s.to_numpy(), digits), index=s.index)
