"""Similarity sketches for near-duplicate detection: MinHash + LSH banding,
SimHash, n-gram Jaccard.  All hashing is crc32-based (process-stable — no
reliance on Python's randomized str hash), vectorised with numpy.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

# DuckDB's regex engine is RE2 with ASCII character classes: \s matches
# exactly [\t\n\f\r ] (no \v, no Unicode Zs like NBSP). Python's
# str.split() splits on UNICODE whitespace, so text containing NBSP or \v
# would tokenize differently on the two engines. Every sketch tokenizes
# through this RE2-equivalent class so the SQL twins
# (regexp_extract_all(text, '\S+')) are exact on arbitrary text — parity
# fuzz in tests/test_sketch_sql_fuzz.py includes Zs/Cc characters.
_RE2_TOKEN = re.compile(r"[^\t\n\f\r ]+")


def re2_tokens(text: str) -> list[str]:
    """Whitespace tokens under RE2 \\S+ semantics (DuckDB lockstep)."""
    return _RE2_TOKEN.findall(text)

_MERSENNE = (1 << 61) - 1
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS

# fixed affine permutation parameters (seeded once, process-independent)
_rng = np.random.RandomState(0xC0FFEE)
_A = _rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def word_shingles(text: str, k: int = 3) -> set[str]:
    words = re2_tokens(text)
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def _crc_array(items) -> np.ndarray:
    return np.array(
        [zlib.crc32(s.encode("utf-8")) for s in items], dtype=np.uint64
    )


def minhash(text: str, k: int = 3) -> np.ndarray:
    """64-permutation MinHash signature (uint64)."""
    shingles = word_shingles(text, k)
    if not shingles:
        return np.full(N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    base = _crc_array(sorted(shingles))  # (S,)
    # (S, P) affine permutations mod the Mersenne prime
    vals = (base[:, None] * _A[None, :] + _B[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def lsh_band_keys(signature: np.ndarray, doc_salt: str = "") -> list[str]:
    """One key per band: docs sharing any band key are near-dup candidates."""
    keys = []
    for b in range(N_BANDS):
        chunk = signature[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        keys.append(f"{b}:{zlib.crc32(chunk.tobytes()):08x}")
    return keys


def _md5_64(token: str) -> int:
    """64-bit token hash == DuckDB ``md5_number_upper``: the first 8 bytes
    of the md5 digest, little-endian — chosen so SQL oracles can replicate
    the SimHash exactly."""
    import hashlib

    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8],
                          "little")


def simhash(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5-derived bit votes; every
    occurrence votes, matching an ``unnest(tokens)`` SQL formulation)."""
    tokens = re2_tokens(text)
    if not tokens:
        return 0
    cache: dict[str, int] = {}
    h64 = np.array([cache.get(t) or cache.setdefault(t, _md5_64(t))
                    for t in tokens], dtype=np.uint64)
    bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = 64 // SIMHASH_CHUNKS


def simhash_band_keys(sig: int) -> list[str]:
    """One key per 16-bit chunk. Pigeonhole: two signatures within hamming
    distance SIMHASH_CHUNKS - 1 (= 3) MUST agree on at least one chunk, so
    chunk-key grouping is an EXACT candidate generator for hamming <= 3."""
    mask = (1 << SIMHASH_CHUNK_BITS) - 1
    return [f"{c}:{(sig >> (c * SIMHASH_CHUNK_BITS)) & mask}"
            for c in range(SIMHASH_CHUNKS)]


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0
