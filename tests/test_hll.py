"""HyperLogLog sketch: accuracy, merge semantics, split invariance."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_parser_ray.functions import hll


def test_estimate_accuracy_across_cardinalities():
    rng = np.random.RandomState(1)
    for n in (50, 1_000, 20_000, 200_000):
        values = [f"user-{i}" for i in range(n)]
        regs = hll.add_values(hll.empty_registers(), values)
        est = hll.estimate(regs)
        assert abs(est - n) / n < 0.05, (n, est)


def test_split_merge_invariance():
    """Registers are a pure function of the value SET: any split into
    batches, merged in any order, gives bit-identical registers."""
    values = [f"k{i}" for i in range(5000)]
    whole = hll.add_values(hll.empty_registers(), values)
    rng = np.random.RandomState(3)
    perm = rng.permutation(len(values))
    parts = np.array_split(perm, 7)
    merged = hll.empty_registers()
    for part in reversed(parts):
        regs = hll.add_values(hll.empty_registers(),
                              [values[i] for i in part])
        merged = hll.merge(merged, regs)
    assert np.array_equal(whole, merged)


def test_duplicates_do_not_move_the_estimate():
    once = hll.add_values(hll.empty_registers(), ["a", "b", "c"])
    many = hll.add_values(hll.empty_registers(), ["a", "b", "c"] * 1000)
    assert np.array_equal(once, many)


@pytest.mark.usefixtures("ray_session")
def test_events_hll_close_to_exact():
    from pdf_parser_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    exact = int(q.events_distinct_users(sf)["n_users"].iloc[0])
    est = float(q.events_users_hll(sf)["est_users"].iloc[0])
    assert abs(est - exact) / exact < 0.05, (exact, est)
    # determinism: identical bytes on a second run
    assert est == float(q.events_users_hll(sf)["est_users"].iloc[0])
