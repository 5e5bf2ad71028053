"""Device-tracker capacity overflow: graceful, flagged, never fatal.

The device tracker runs on fixed-capacity tables (cfg.max_tracks); a frame
with more segments than capacity drops the excess (ascending label order is
kept) and flags `overflow` so run_video can count it in the manifest.  The
host tracker is capacity-free, so overflow scenes are also exactly where the
two paths may legitimately diverge — the flag is the user's signal to rerun
with --tracker host or a larger max_tracks.
"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.ops.props import region_tables
from swiftwatcher_tpu.pipeline.tracking_jax import (
    compact_tables,
    empty_state,
    track_window,
)


def _table_with_n_segments(n, H=64, W=96):
    """Labels image with n isolated 1-px segments -> RegionTable."""
    lab = np.zeros((H, W), np.uint8)
    for k in range(n):
        y, x = 2 + 3 * (k // 8), 2 + 3 * (k % 8)
        lab[y, x] = k + 1
    return region_tables(jnp.asarray(lab[None]))


def test_compact_tables_flags_overflow():
    K = DEFAULT_CONFIG.max_tracks
    table = _table_with_n_segments(K + 6)
    cy, cx, kvalid, overflow = compact_tables(table, K)
    assert bool(np.asarray(overflow)[0])
    # capacity fully used, kept in ascending label order (centroids sorted
    # by construction of the grid)
    assert int(np.asarray(kvalid)[0].sum()) == K
    table_ok = _table_with_n_segments(K - 1)
    _, _, kv2, ov2 = compact_tables(table_ok, K)
    assert not bool(np.asarray(ov2)[0])
    assert int(np.asarray(kv2)[0].sum()) == K - 1


def test_track_window_survives_overflow_frames():
    cfg = dataclasses.replace(DEFAULT_CONFIG, max_tracks=8)
    K = cfg.max_tracks
    T = 6
    tables = [_table_with_n_segments(n) for n in (2, K + 10, K + 10, 3, 0, 1)]
    cys, cxs, kvs = [], [], []
    for t in tables:
        cy, cx, kv, _ = compact_tables(t, K)
        cys.append(cy[0])
        cxs.append(cx[0])
        kvs.append(kv[0])
    roi = jnp.zeros((64, 96), jnp.uint8)
    st, ev = track_window(
        empty_state(K), roi,
        jnp.stack(cys), jnp.stack(cxs), jnp.stack(kvs),
        jnp.arange(T, dtype=jnp.int32), cfg,
    )
    # no event (ROI empty), no event-buffer overflow, state stays finite
    assert int(ev.count) == 0 and not bool(ev.overflow)
    assert np.isfinite(np.asarray(st.cy)).all()
    # last frame had 1 segment -> exactly one live track
    assert int(np.asarray(st.valid).sum()) == 1
