"""Adversarial equal-cost LAP ties: pin the blast radius of the documented
tie-breaking deviation (PARITY.md #2) between the device JV solver and
scipy 1.3.1's Hungarian.

Scenario: one previous segment exactly equidistant from two current
segments, with no motion history (angle cost is the constant 1 for both,
segment_tracking.py:200-211) — the two match assignments have identical
total cost.  Which segment inherits the history is tie-broken, but the
downstream event OUTCOME must be invariant: exactly one of the two carries
a history, so exactly one ROI-disappearance event fires either way.
"""

import numpy as np
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.ops.hungarian import solve_lap
from swiftwatcher_tpu.pipeline.tracking import SegmentTracker, Track, build_cost_matrix
from swiftwatcher_tpu.pipeline.tracking_jax import empty_state, track_window

PREV = (10.0, 10.0)
CURR_A = (10.0, 6.0)   # distance 4 left
CURR_B = (10.0, 14.0)  # distance 4 right — exact cost tie with CURR_A


def test_lap_total_equal_on_exact_tie():
    prev = [Track(centroid=PREV, frame_number=0, timestamp=None)]
    curr = [
        Track(centroid=CURR_A, frame_number=1, timestamp=None),
        Track(centroid=CURR_B, frame_number=1, timestamp=None),
    ]
    cost = build_cost_matrix(prev, curr, DEFAULT_CONFIG)
    # the two match cells are exactly equal (the adversarial construction)
    assert cost[0, 1] == cost[0, 2]
    rows, cols = linear_sum_assignment(cost)
    ours = np.asarray(solve_lap(cost.astype(np.float32)))
    n = cost.shape[0]
    assert sorted(ours.tolist()) == list(range(n))
    np.testing.assert_allclose(
        cost[np.arange(n), ours].sum(), cost[rows, cols].sum(), rtol=1e-6
    )
    # whichever branch was taken, exactly one curr segment is matched
    assert (ours[0] in (1, 2)) == (cols[0] in (1, 2))


def _drive_host(cfg, roi):
    tr = SegmentTracker(roi, cfg)
    tr.step([PREV], 0, None)
    tr.step([CURR_A, CURR_B], 1, None)
    tr.step([], 2, None)
    return tr.events


def _drive_device(cfg, roi):
    K = cfg.max_tracks
    cys = np.zeros((3, K), np.float32)
    cxs = np.zeros((3, K), np.float32)
    valids = np.zeros((3, K), bool)
    cys[0, 0], cxs[0, 0], valids[0, 0] = PREV[0], PREV[1], True
    cys[1, 0], cxs[1, 0], valids[1, 0] = CURR_A[0], CURR_A[1], True
    cys[1, 1], cxs[1, 1], valids[1, 1] = CURR_B[0], CURR_B[1], True
    fns = jnp.arange(3, dtype=jnp.int32)
    _, ev = track_window(
        empty_state(K), jnp.asarray(roi), jnp.asarray(cys), jnp.asarray(cxs),
        jnp.asarray(valids), fns, cfg,
    )
    return ev


def test_event_outcome_invariant_under_tie():
    cfg = DEFAULT_CONFIG
    roi = np.full((32, 32), 255, np.uint8)  # every disappearance is in-ROI

    host_events = _drive_host(cfg, roi)
    ev = _drive_device(cfg, roi)

    # Exactly ONE event on both paths: the tied match links exactly one of
    # the two segments (hist 1), the other appears fresh (hist 0).
    assert len(host_events) == 1
    assert int(ev.count) == 1 and not bool(ev.overflow)

    # The event's endpoints are pinned up to the tie: first centroid is the
    # shared prev, last centroid is one of the two tied segments.
    h = host_events[0]
    assert h.first_centroid == PREV
    assert h.last_centroid in (CURR_A, CURR_B)
    assert (float(ev.first_cy[0]), float(ev.first_cx[0])) == PREV
    assert (float(ev.last_cy[0]), float(ev.last_cx[0])) in (CURR_A, CURR_B)
    assert int(ev.last_fn[0]) == h.frame_number == 1
