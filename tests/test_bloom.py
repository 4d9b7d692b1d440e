"""Bloom sketch invariants: zero false negatives (the exactness
foundation of the bloom-prefiltered anti-join), bounded false-positive
rate, and split-merge invariance (per-batch sketches OR-fold to the same
bits in any order)."""

from __future__ import annotations

import numpy as np

from pdf_parser_ray.functions import bloom


def _keys(seed: int, n: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2 ** 63, size=n).astype(np.uint64)


def test_no_false_negatives():
    keys = _keys(1, 50_000)
    bits = bloom.add_keys(bloom.empty(), keys)
    assert bloom.contains(bits, keys).all()


def test_false_positive_rate_bounded():
    n = 100_000
    bits = bloom.add_keys(bloom.empty(), _keys(2, n))
    probes = _keys(3, 100_000)  # disjoint with overwhelming probability
    fp = bloom.contains(bits, probes).mean()
    # theory ~2.4e-3 at these parameters; assert an order of headroom
    assert fp < 0.01, fp


def test_split_merge_invariance():
    keys = _keys(4, 30_000)
    whole = bloom.add_keys(bloom.empty(), keys)
    parts = bloom.empty()
    for chunk in np.array_split(keys, 7)[::-1]:  # reversed order
        parts = bloom.merge(parts, bloom.add_keys(bloom.empty(), chunk))
    assert np.array_equal(whole, parts)


def test_empty_inputs():
    bits = bloom.add_keys(bloom.empty(), np.array([], dtype=np.uint64))
    assert not bits.any()
    assert bloom.contains(bits, np.array([], dtype=np.uint64)).shape == (0,)
