"""HyperLogLog: a mergeable distinct-count sketch for cardinalities the
two-phase exact count cannot afford to shuffle (billions of keys at
corpus scale).

Registers are a pure function of the VALUE SET (max is commutative,
associative, idempotent), so per-batch sketches merged in any split order
are bit-identical — the mergeability that makes the sketch a one-pass
`map_batches` + tiny driver (or tree) combine. Hashing is md5-derived
(functions/sketches._md5_64), process-stable.

Flajolet et al. 2007 estimator with the standard small-range
linear-counting correction; p=12 -> 4096 byte registers, ~1.6% typical
relative error.
"""

from __future__ import annotations

import numpy as np

from pdf_parser_ray.functions.sketches import _md5_64

P = 12
M = 1 << P  # 4096 registers
_ALPHA = 0.7213 / (1 + 1.079 / M)


def empty_registers() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)


def add_values(registers: np.ndarray, values) -> np.ndarray:
    """Fold an iterable of (stringable) values into the registers."""
    hs = np.array([_md5_64(str(v)) for v in values], dtype=np.uint64)
    if not len(hs):
        return registers
    idx = (hs >> np.uint64(64 - P)).astype(np.int64)
    rest = hs << np.uint64(P)  # top 64-P bits consumed by the index
    # rank = leading zeros of the remaining bits + 1 (capped)
    ranks = np.full(len(hs), 64 - P + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # leading zero count via float64 exponent is unsafe near 2^63;
        # use bit_length: lz = 64 - bit_length(rest)
        bl = np.frompyfunc(int.bit_length, 1, 1)(rest[nz].astype(object))
        ranks[nz] = (64 - bl.astype(np.int64) + 1).astype(np.uint8)
    np.maximum.at(registers, idx, ranks)
    return registers


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(registers: np.ndarray) -> float:
    inv = np.power(2.0, -registers.astype(np.float64))
    raw = _ALPHA * M * M / inv.sum()
    if raw <= 2.5 * M:
        zeros = int((registers == 0).sum())
        if zeros:
            return M * np.log(M / zeros)  # linear counting
    return raw
