"""LSAP solver vs scipy.optimize.linear_sum_assignment (the reference's
solver, music_detr/matcher.py:91).  Optimal total cost must match exactly
(assignments may differ on ties, so we compare objective values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from mgsv_tpu.ops import lsap


def _total_cost_from_col_to_row(cost, col_to_row):
    r = cost.shape[0]
    total = 0.0
    matched_rows = set()
    for j, i in enumerate(col_to_row):
        if i < r:
            assert i not in matched_rows, "row matched twice"
            matched_rows.add(int(i))
            total += cost[int(i), j]
    return total, len(matched_rows)


@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (5, 5), (8, 8), (2, 5), (5, 2), (1, 4), (6, 1)])
def test_matches_scipy_cost(shape):
    rng = np.random.RandomState(hash(shape) % 2**31)
    for trial in range(5):
        cost = rng.randn(*shape).astype(np.float32) * 10
        col_to_row = np.asarray(lsap.solve(jnp.asarray(cost)))
        ours, n_matched = _total_cost_from_col_to_row(cost, col_to_row)
        ri, ci = linear_sum_assignment(cost)
        ref = cost[ri, ci].sum()
        assert n_matched == min(shape)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_batched_and_jitted():
    rng = np.random.RandomState(0)
    costs = rng.randn(16, 4, 6).astype(np.float32)
    solve_jit = jax.jit(lsap.solve_batch)
    out = np.asarray(solve_jit(jnp.asarray(costs)))
    assert out.shape == (16, 6)
    for b in range(16):
        ours, _ = _total_cost_from_col_to_row(costs[b], out[b])
        ri, ci = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(ours, costs[b][ri, ci].sum(), atol=1e-4)


def test_identity_on_diagonal_favoring_matrix():
    cost = jnp.eye(5) * -100.0  # diagonal strongly preferred
    col_to_row = np.asarray(lsap.solve(cost))
    np.testing.assert_array_equal(col_to_row, np.arange(5))
