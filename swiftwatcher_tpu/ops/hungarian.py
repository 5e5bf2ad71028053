"""Jittable linear-assignment (Hungarian) solver.

Jonker-Volgenant shortest-augmenting-path LAP, the same algorithm family as
scipy.optimize.linear_sum_assignment (the reference's solver,
segment_tracking.py:257-263), expressed with lax loops over fixed-size
padded matrices so the whole tracking scan stays on device.

Matrices here are tiny (2 * max_tracks square), so the sequential Dijkstra
inner loop is cheap; the point is avoiding host round-trips per frame, not
FLOPs.  Optimal cost matches scipy exactly; tie-breaking between equal-cost
optima may differ (documented — the tracking cost design makes ties
measure-zero in float).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


@jax.jit
def solve_lap(cost: jnp.ndarray, skip: jnp.ndarray | None = None) -> jnp.ndarray:
    """col4row (N,) int32: the column assigned to each row of cost (N, N).

    Rows are processed in order; every row/column is assigned (perfect
    matching on the square matrix).  float32 costs; rows/cols meant to be
    excluded should carry a large-but-finite cost structure.

    skip: optional (N,) bool marking PADDING rows whose diagonal entry is 0
    and whose every other entry (and every other row's entry in column i) is
    large.  Such rows are pre-assigned to their diagonal and their augment
    step skipped entirely.  This is exact, not approximate: any optimal
    matching must put these rows on their free diagonal, and JV-processing
    such a row is a no-op on the duals (its Dijkstra pops the zero-reduced-
    cost diagonal immediately with min_val 0), so the remaining rows see
    bit-identical state to the unskipped solve.  The tracking scan uses this
    to make the per-frame LAP cost scale with REAL segments instead of the
    padded capacity."""
    N = cost.shape[0]
    cost = cost.astype(jnp.float32)

    def augment_row(carry, cur_row):
        u, v, row4col, col4row = carry

        # --- Dijkstra over columns from cur_row ----------------------------
        def dij_cond(s):
            _, _, _, _, _, done, _ = s
            return jnp.logical_not(done)

        def dij_body(s):
            i, min_val, SR, SC, shortest, _, pred = s
            SR = SR.at[i].set(True)
            r = min_val + cost[i, :] - u[i] - v
            upd = jnp.logical_and(~SC, r < shortest)
            pred = jnp.where(upd, i, pred)
            shortest = jnp.where(upd, r, shortest)
            masked = jnp.where(SC, _INF, shortest)
            j = jnp.argmin(masked)
            min_val2 = masked[j]
            SC = SC.at[j].set(True)
            nxt = row4col[j]
            done = nxt < 0
            return (
                jnp.where(done, i, nxt),
                min_val2,
                SR,
                SC,
                shortest,
                done,
                pred,
            )

        SR0 = jnp.zeros((N,), bool)
        SC0 = jnp.zeros((N,), bool)
        shortest0 = jnp.full((N,), _INF)
        pred0 = jnp.full((N,), cur_row, jnp.int32)
        i0 = cur_row
        _, min_val, SR, SC, shortest, _, pred = jax.lax.while_loop(
            dij_cond, dij_body, (i0, jnp.float32(0.0), SR0, SC0, shortest0, False, pred0)
        )
        # The terminating column j* satisfies SC[j*] & row4col[j*] < 0 —
        # Dijkstra stops at the first unassigned column it pops, so exactly
        # one such column exists.
        cand = jnp.logical_and(SC, row4col < 0)
        j_sink = jnp.argmax(cand)  # exactly one such column exists

        # --- dual updates (scipy _lsap.c order) -----------------------------
        rows = jnp.arange(N, dtype=jnp.int32)
        u = u.at[cur_row].add(min_val)
        other = jnp.logical_and(SR, rows != cur_row)
        # shortest[col4row[i]] for visited rows i (their matched column)
        short_at_row = shortest[jnp.clip(col4row, 0, N - 1)]
        u = jnp.where(other, u + min_val - short_at_row, u)
        v = jnp.where(SC, v - (min_val - shortest), v)

        # --- augment along predecessor chain --------------------------------
        def aug_cond(s):
            _, _, _, done = s
            return jnp.logical_not(done)

        def aug_body(s):
            j, row4col_, col4row_, _ = s
            i = pred[j]
            row4col_ = row4col_.at[j].set(i)
            j_prev = col4row_[i]
            col4row_ = col4row_.at[i].set(j)
            return j_prev, row4col_, col4row_, i == cur_row

        _, row4col, col4row, _ = jax.lax.while_loop(
            aug_cond, aug_body, (j_sink, row4col, col4row, False)
        )
        return (u, v, row4col, col4row), None

    u0 = jnp.zeros((N,), jnp.float32)
    v0 = jnp.zeros((N,), jnp.float32)
    rows = jnp.arange(N, dtype=jnp.int32)
    if skip is None:
        row4col0 = jnp.full((N,), -1, jnp.int32)
        col4row0 = jnp.full((N,), -1, jnp.int32)
        (_, _, _, col4row), _ = jax.lax.scan(
            augment_row, (u0, v0, row4col0, col4row0), rows
        )
        return col4row

    # Pre-assign padding rows to their zero diagonal (see docstring), then
    # augment ONLY the valid rows, in ascending index order, via a
    # dynamic-trip while_loop: the per-frame cost becomes O(real segments),
    # not O(capacity).  Sequential-loop overhead dominates these tiny LAPs
    # on TPU, so skipping steps (not just their work) matters.  The order
    # (valid rows ascending, then don't-care) comes from a cumsum-rank
    # scatter rather than a stable argsort — sorts are multi-pass networks
    # on TPU and this runs inside the tracking scan; only the first n_valid
    # entries are ever read.
    row4col0 = jnp.where(skip, rows, -1)
    col4row0 = jnp.where(skip, rows, -1)
    ranks = jnp.cumsum(~skip) - 1
    valid_order = (
        jnp.zeros((N + 1,), jnp.int32)
        .at[jnp.where(~skip, ranks, N)]
        .set(rows)[:N]
    )
    n_valid = jnp.sum(~skip).astype(jnp.int32)

    def w_cond(s):
        i, _ = s
        return i < n_valid

    def w_body(s):
        i, carry = s
        carry, _ = augment_row(carry, valid_order[i])
        return i + 1, carry

    _, (_, _, _, col4row) = jax.lax.while_loop(
        w_cond, w_body, (jnp.int32(0), (u0, v0, row4col0, col4row0))
    )
    return col4row
