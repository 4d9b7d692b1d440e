"""Mergeable Bloom filter over md5-derived 64-bit keys.

The membership sketch for incremental-crawl dedup at corpus scale:
"has this document fingerprint been seen by a previous run?" A bit
array is a pure OR-fold of per-batch sketches (commutative, associative,
idempotent — the same mergeability argument as the HLL registers), so
per-batch blooms built inside ``map_batches`` tree-merge to one
broadcastable object regardless of split order.

Guarantees: NO false negatives ever (the exactness of a bloom-prefiltered
anti-join rests on this); false-positive rate ~ (1 - e^(-k n / m))^k —
with the default m = 2^21 bits (256 KB) and k = 4, about 2.4e-3 at
n = 100k keys. Indices derive from the key via double hashing
(Kirsch-Mitzenmacher: idx_i = h_lo + i * h_hi mod m), so one 64-bit
md5-derived key is the only hashing cost per item.
"""

from __future__ import annotations

import numpy as np

M_BITS_LOG2 = 21
M_BITS = 1 << M_BITS_LOG2
K_HASHES = 4
_MASK = np.uint64(M_BITS - 1)


def empty() -> np.ndarray:
    """All-zeros bit array as packed uint8 (M_BITS / 8 bytes)."""
    return np.zeros(M_BITS // 8, dtype=np.uint8)


def _indices(keys: np.ndarray) -> np.ndarray:
    """(N, K) bit indices via double hashing of the 64-bit keys."""
    h_lo = keys & np.uint64(0xFFFFFFFF)
    h_hi = (keys >> np.uint64(32)) | np.uint64(1)  # odd -> full-period
    i = np.arange(K_HASHES, dtype=np.uint64)[None, :]
    return ((h_lo[:, None] + i * h_hi[:, None]) & _MASK).astype(np.int64)


def add_keys(bits: np.ndarray, keys) -> np.ndarray:
    """Fold 64-bit keys into the sketch (in place; returns it)."""
    keys = np.asarray(keys, dtype=np.uint64)
    if not len(keys):
        return bits
    idx = _indices(keys).ravel()
    np.bitwise_or.at(bits, idx >> 3,
                     (np.uint8(1) << (idx & 7).astype(np.uint8)))
    return bits


def contains(bits: np.ndarray, keys) -> np.ndarray:
    """Vectorized membership test -> bool array (no false negatives)."""
    keys = np.asarray(keys, dtype=np.uint64)
    if not len(keys):
        return np.zeros(0, dtype=bool)
    idx = _indices(keys)
    probes = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
    return probes.all(axis=1)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)
