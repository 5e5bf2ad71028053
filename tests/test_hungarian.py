"""Jittable LAP solver vs scipy.optimize.linear_sum_assignment."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from swiftwatcher_tpu.ops.hungarian import solve_lap


@pytest.mark.parametrize("n", [1, 2, 5, 12, 24, 48])
def test_random_matrices_optimal(rng, n):
    for _ in range(8):
        cost = rng.random((n, n)).astype(np.float32) * 10
        rows, cols = linear_sum_assignment(cost)
        ours = np.asarray(solve_lap(cost))
        # assignment is a permutation
        assert sorted(ours.tolist()) == list(range(n))
        # same optimal total (tie-broken assignments may differ)
        np.testing.assert_allclose(
            cost[np.arange(n), ours].sum(), cost[rows, cols].sum(), rtol=1e-5
        )


def test_identity_on_tracking_structure(rng):
    # The tracking matrix with no matches: all 1+eps off-diagonal, diagonal 1
    # -> must pick the diagonal (every segment appears/disappears).
    n = 10
    cost = np.ones((n, n), np.float32) + np.float32(1e-6)
    np.fill_diagonal(cost, 1.0)
    ours = np.asarray(solve_lap(cost))
    np.testing.assert_array_equal(ours, np.arange(n))


def test_tracking_like_matrix(rng):
    # 2 prev, 3 curr: one clear match, others appear/disappear.
    n_prev, n_curr = 2, 3
    n = n_prev + n_curr
    cost = np.ones((n, n), np.float64) + 2.2e-16
    cost[0, n_prev + 1] = 0.01   # prev 0 <-> curr 1 strongly matched
    cost[1, n_prev + 0] = 0.9    # prev 1 <-> curr 0 weakly
    np.fill_diagonal(cost, 1.0)
    rows, cols = linear_sum_assignment(cost)
    ours = np.asarray(solve_lap(cost.astype(np.float32)))
    # totals agree; the forced matches agree (remaining cells are exact ties
    # between equal 1+eps fillers, where tie-breaking may differ)
    np.testing.assert_allclose(
        cost[np.arange(n), ours].sum(), cost[rows, cols].sum(), rtol=1e-6
    )
    assert ours[0] == cols[0] == n_prev + 1
    assert ours[1] == cols[1] == n_prev + 0


def test_skip_padding_matches_full_solve(rng):
    """solve_lap(skip=...) on tracker-structured matrices must equal the
    unskipped solve exactly (identical col4row, not just identical cost):
    padding rows are forced onto their free diagonal in any optimum, and
    JV-processing them is a dual no-op."""
    K = 12
    n = 2 * K
    for trial in range(10):
        n_prev = int(rng.integers(0, 5))
        n_curr = int(rng.integers(0, 5))
        pv = np.zeros(K, bool)
        pv[:n_prev] = True
        cv = np.zeros(K, bool)
        cv[:n_curr] = True
        rv = np.concatenate([pv, cv])
        cost = np.where(rv[:, None] & rv[None, :], 1.0 + 1.19e-7, 1e9).astype(
            np.float32
        )
        # random match block
        match = (rng.random((K, K)) * 2).astype(np.float32)
        blk = cost[:K, K:]
        cost[:K, K:] = np.where(pv[:, None] & cv[None, :], match, blk)
        diag = np.where(rv, 1.0, 0.0).astype(np.float32)
        np.fill_diagonal(cost, diag)

        full = np.asarray(solve_lap(cost))
        skipped = np.asarray(solve_lap(cost, skip=~rv))
        np.testing.assert_array_equal(full, skipped, err_msg=f"trial {trial}")
        rows, cols = linear_sum_assignment(cost.astype(np.float64))
        np.testing.assert_allclose(
            cost[np.arange(n), skipped].sum(), cost[rows, cols].sum(), rtol=1e-5
        )


def test_large_finite_blocks(rng):
    # BIG impossible cells: matching row k -> col 8+k would FORCE row 8+k
    # onto a BIG cell, so the optimum is all-diagonal.  (This is why the
    # device tracker replicates the reference's 1+eps filler cells rather
    # than using BIG sentinels — BIG would flip the match/no-match
    # trade-off.)
    n = 16
    cost = np.full((n, n), 1e6, np.float32)
    np.fill_diagonal(cost, 1.0)
    for k in range(4):
        cost[k, 8 + k] = 0.1
    ours = np.asarray(solve_lap(cost))
    rows, cols = linear_sum_assignment(cost)
    np.testing.assert_allclose(
        cost[np.arange(n), ours].sum(), cost[rows, cols].sum(), rtol=1e-6
    )
    np.testing.assert_array_equal(ours, np.arange(n))
