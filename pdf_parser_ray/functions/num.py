"""Numeric helpers shared by the query pipelines.

``round_half_away`` matches DuckDB's ROUND (half away from zero on the
double value) instead of Python/numpy's bankers' rounding — required for
value-hash agreement between the Ray pipelines and their SQL oracles
(e.g. 1/32 = 0.03125 rounds to 0.0313 in SQL but 0.0312 under half-even).
"""

from __future__ import annotations

import math

import numpy as np


# floor(y + 0.5) equals C's round(y) — DuckDB's kernel — for every
# double EXCEPT y in [2^52, 2^53): there y is already integral (ulp 1)
# but y + 0.5 is inexact and ROUNDS TO EVEN, bumping odd y up by one
# (found by the round-4g ANOVA fuzz: an F ~ 8.6e9 rounded to 6 decimals
# scales to 8.6e15, inside the band — Ray read ...926 vs DuckDB's
# ...925). Values at or past 2^52 carry no sub-integer bits, so the
# scaled value IS the rounded value.
_INTEGRAL = float(1 << 52)


def round_half_away(x: float, digits: int) -> float:
    scale = 10.0 ** digits
    y = abs(x) * scale
    if y >= _INTEGRAL:
        return math.copysign(y, x) / scale
    return math.copysign(math.floor(y + 0.5), x) / scale


def np_round_half_away(a, digits: int):
    a = np.asarray(a, dtype=np.float64)
    scale = 10.0 ** digits
    y = np.abs(a) * scale
    r = np.where(y >= _INTEGRAL, y, np.floor(y + 0.5))
    return np.copysign(r, a) / scale


def np_round_half_away_int(a) -> np.ndarray:
    """Half-away-from-zero to the nearest INTEGER, as int64 — the numpy
    twin of SQL ``CAST(round(x) AS BIGINT)`` for pre-scaled values (the
    exact-integer-sum discipline for means/sums of floats)."""
    a = np.asarray(a, dtype=np.float64)
    y = np.abs(a)
    r = np.where(y >= _INTEGRAL, y, np.floor(y + 0.5))
    return np.copysign(r, a).astype(np.int64)


def series_round_half_away(s, digits: int):
    import pandas as pd

    return pd.Series(np_round_half_away(s.to_numpy(), digits), index=s.index)
