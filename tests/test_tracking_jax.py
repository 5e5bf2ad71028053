"""Device tracking scan vs the host (scipy-exact) tracker."""

import numpy as np

import jax
import jax.numpy as jnp

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.geometry import (
    crop_region_from_corners,
    roi_crop_region_from_corners,
)
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.ops.roi_mask import generate_roi_mask
from swiftwatcher_tpu.pipeline.window import localize_windows
from swiftwatcher_tpu.pipeline.tracking import SegmentTracker
from swiftwatcher_tpu.pipeline.runner import extract_frame_segments_batched
from swiftwatcher_tpu.pipeline.tracking_jax import (
    compact_tables,
    empty_state,
    track_window,
)


def test_device_tracking_matches_host():
    cfg = DEFAULT_CONFIG
    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1)
    crop_region = crop_region_from_corners(video.corners, cfg)
    roi_region = roi_crop_region_from_corners(video.corners, cfg)
    roi_mask = np.asarray(
        generate_roi_mask(video.frames[0], roi_region, crop_region, cfg)
    )
    (x1, y1), (x2, y2) = crop_region

    host = SegmentTracker(roi_mask, cfg)
    state = empty_state(cfg.max_tracks)
    dev_events = []

    for w0 in range(0, 63, 21):
        crops = np.stack(
            [np.ascontiguousarray(video.frames[w0 : w0 + 21, y1:y2, x1:x2, :])]
        )
        table, _ = localize_windows(crops, cfg)
        table_h = jax.tree.map(np.asarray, table)

        # host path
        for t in range(21):
            host.step(extract_frame_segments_batched(table_h, 0, t), w0 + t, None)

        # device path
        cy, cx, kvalid, _ = compact_tables(table, cfg.max_tracks)
        fns = jnp.arange(w0, w0 + 21, dtype=jnp.int32)
        state, ev = track_window(
            state, jnp.asarray(roi_mask), cy[0], cx[0], kvalid[0], fns, cfg
        )
        n = int(ev.count)
        assert not bool(ev.overflow)
        for i in range(n):
            dev_events.append(
                (
                    int(ev.last_fn[i]),
                    float(ev.first_cy[i]),
                    float(ev.first_cx[i]),
                    float(ev.last_cy[i]),
                    float(ev.last_cx[i]),
                )
            )

    host_events = sorted(
        (
            e.frame_number,
            e.first_centroid[0],
            e.first_centroid[1],
            e.last_centroid[0],
            e.last_centroid[1],
        )
        for e in host.events
    )
    dev_events = sorted(dev_events)
    assert len(dev_events) == len(host_events) > 0
    for d, h in zip(dev_events, host_events):
        assert d[0] == h[0]
        np.testing.assert_allclose(d[1:], h[1:], atol=1e-3)


def test_enum_lap_matches_jv(rng):
    """The enumeration LAP (track_enum_lap=N: all partial matchings of the
    first N slots scored in one vectorized pass) must be output-identical to
    the sequential JV solve for any mix of under- and over-threshold frames,
    including scattered validity inside the first N slots."""
    import dataclasses

    K = DEFAULT_CONFIG.max_tracks
    roi = np.zeros((64, 96), np.uint8)
    roi[0:16, 30:60] = 255
    roi_d = jnp.asarray(roi)

    for n_enum in (2, 3, 4, 5):
        cfg1 = dataclasses.replace(DEFAULT_CONFIG, track_enum_lap=n_enum)
        for trial in range(4):
            T = int(rng.integers(30, 90))
            cys = rng.uniform(0, 64, (T, K)).astype(np.float32)
            cxs = rng.uniform(0, 96, (T, K)).astype(np.float32)
            # short-range steps so the LAP sees real match structure
            cys[1:] = np.clip(cys[:-1] + rng.uniform(-9, 9, (T - 1, K)), 0, 63)
            cxs[1:] = np.clip(cxs[:-1] + rng.uniform(-9, 9, (T - 1, K)), 0, 95)
            valids = np.zeros((T, K), bool)
            for t in range(T):
                r = rng.random()
                if r < 0.15:
                    continue                       # empty frame
                if r < 0.8:                        # fits the enum block
                    n = int(rng.integers(1, n_enum + 1))
                    slots = rng.choice(n_enum, size=n, replace=False)
                else:                              # forces the JV fallback
                    n = int(rng.integers(n_enum + 1, 9))
                    slots = rng.choice(K, size=n, replace=False)
                valids[t, slots] = True
            fns = np.arange(T, dtype=np.int32)

            args = (
                empty_state(K), roi_d,
                jnp.asarray(cys), jnp.asarray(cxs), jnp.asarray(valids),
                jnp.asarray(fns),
            )
            s0, e0 = track_window(*args, DEFAULT_CONFIG)
            s1, e1 = track_window(*args, cfg1)
            for a, b in zip(jax.tree.leaves((s0, e0)), jax.tree.leaves((s1, e1))):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"n_enum={n_enum} trial={trial}",
                )


def test_enum_lap_ties_are_optimal(rng):
    """Single-frame matchings from the enum and JV paths: wherever they
    differ, BOTH must be optimal for the frame's weight matrix up to f32
    rounding (exact equal-cost ties — duplicate integer-snapped centroids —
    and near-ties inside one f32 ulp, where the two solvers' different f32
    summation orders legitimately disagree, are the only permitted
    divergences; PARITY.md deviation 10)."""
    import dataclasses

    from swiftwatcher_tpu.pipeline.tracking_jax import (
        TrackState,
        _match_block,
        _pattern_table,
        _prev_match_enum,
        _prev_match_lap,
        empty_state,
    )

    cfg = DEFAULT_CONFIG
    K = cfg.max_tracks
    n = 4
    pats = _pattern_table(n)
    ties = diffs = 0
    for trial in range(300):
        snap = trial % 2  # integer-snapped halves force exact ties
        def coords(m):
            c = rng.uniform(0, 40, (2, m)).astype(np.float32)
            return np.floor(c) if snap else c
        P = int(rng.integers(0, n + 1))
        C = int(rng.integers(0, n + 1))
        pcy, pcx = coords(K)
        ccy, ccx = coords(K)
        pv = np.zeros(K, bool); pv[:P] = True
        cv = np.zeros(K, bool); cv[:C] = True
        hist = (rng.integers(0, 3, K)).astype(np.int32) * pv
        fcy, fcx = coords(K)
        state = TrackState(
            cy=jnp.asarray(pcy), cx=jnp.asarray(pcx), valid=jnp.asarray(pv),
            hist_len=jnp.asarray(hist), first_cy=jnp.asarray(fcy),
            first_cx=jnp.asarray(fcx), fn=jnp.asarray(0, jnp.int32),
        )
        m_jv = np.asarray(
            _prev_match_lap(state, jnp.asarray(ccy), jnp.asarray(ccx),
                            jnp.asarray(cv), cfg)
        )
        m_en = np.asarray(
            _prev_match_enum(state, jnp.asarray(ccy), jnp.asarray(ccx),
                             jnp.asarray(cv), cfg, n)
        )
        if np.array_equal(m_jv, m_en):
            continue
        diffs += 1
        # score both matchings (and the true optimum) in f64 on the same
        # f32 weight block the solvers saw
        mb = np.asarray(
            _match_block(state, jnp.asarray(ccy), jnp.asarray(ccx), cfg)
        ).astype(np.float64)
        w = mb + (float(np.float32(1.1920929e-07)) - cfg.nonmatch_cost)
        w = np.where(pv[:, None] & cv[None, :], w, np.inf)[:n, :n]

        def score(match):
            s = 0.0
            for p in range(n):
                if match[p] >= 0:
                    s += w[p, match[p]]
            return s

        best = min(
            sum(w[p, c] for p, c in enumerate(row) if c >= 0) for row in pats
        )
        s_jv, s_en = score(m_jv), score(m_en)
        # optimal up to f32 rounding of the ~4-term score sums
        tol = 4 * np.float32(1.1920929e-07) * max(
            1.0, abs(best), abs(s_jv), abs(s_en)
        )
        assert abs(s_jv - best) <= tol, (trial, s_jv, best)
        assert abs(s_en - best) <= tol, (trial, s_en, best)
        ties += 1
    # the integer-snapped corpus must actually produce some ties, or this
    # test is vacuous
    assert diffs == ties
    assert ties >= 1


def test_pattern_table_shapes():
    """Matching-pattern counts are the known combinatorial series
    sum_k C(n,k)^2 k!; n>6 is rejected before the table explodes."""
    import pytest

    from swiftwatcher_tpu.pipeline.tracking_jax import (
        _pattern_onehot,
        _pattern_table,
    )

    for n, count in ((1, 2), (2, 7), (3, 34), (4, 209), (5, 1546), (6, 13327)):
        pats = _pattern_table(n)
        assert pats.shape == (count, n)
        # every pattern is a partial matching: no column used twice
        for row in pats:
            used = [c for c in row if c >= 0]
            assert len(used) == len(set(used))
        oh = _pattern_onehot(n)
        assert oh.shape == (count, n, n)
        np.testing.assert_array_equal(oh.sum(-1), (pats >= 0).astype(np.float32))
    with pytest.raises(ValueError):
        _pattern_table(7)


def test_stacked_ops_bit_identical(rng):
    """cfg.track_stacked_ops (event scatters stacked 5->2, linking gathers
    5->1 with a bitcast-carried int32) must be bit-identical to the plain
    layout for any stream — across the enum LAP, chunked scan, inactive
    padding, and event overflow."""
    import dataclasses

    K = DEFAULT_CONFIG.max_tracks
    roi = np.zeros((64, 96), np.uint8)
    roi[0:32, 20:80] = 255                  # large ROI so events do fire
    roi_d = jnp.asarray(roi)

    total_events = 0
    for trial in range(8):
        T = int(rng.integers(9, 60))
        cys = rng.uniform(0, 64, (T, K)).astype(np.float32)
        cxs = rng.uniform(0, 96, (T, K)).astype(np.float32)
        # short-range steps so tracks link across frames (hist_len > 0,
        # exercising the gathered first-centroid path)
        cys[1:] = np.clip(cys[:-1] + rng.uniform(-6, 6, (T - 1, K)), 0, 63)
        cxs[1:] = np.clip(cxs[:-1] + rng.uniform(-6, 6, (T - 1, K)), 0, 95)
        valids = np.zeros((T, K), bool)
        for t in range(T):
            r = rng.random()
            if r < 0.2:
                continue
            valids[t, : int(rng.integers(1, 6))] = True
        active = rng.random(T) > 0.1
        fns = np.arange(T, dtype=np.int32)

        for enum in (0, 4):
            for chunk in (1, 8):
                base = dataclasses.replace(
                    DEFAULT_CONFIG, track_enum_lap=enum
                )
                cfg_s = dataclasses.replace(base, track_stacked_ops=True)
                args = (
                    empty_state(K), roi_d,
                    jnp.asarray(cys), jnp.asarray(cxs), jnp.asarray(valids),
                    jnp.asarray(fns),
                )
                kw = dict(active=jnp.asarray(active), chunk=chunk)
                s0, e0 = track_window(*args, base, **kw)
                s1, e1 = track_window(*args, cfg_s, **kw)
                assert type(e1) is type(e0)   # callers always see EventBuffer
                for a, b in zip(
                    jax.tree.leaves((s0, e0)), jax.tree.leaves((s1, e1))
                ):
                    np.testing.assert_array_equal(
                        np.asarray(a), np.asarray(b),
                        err_msg=f"trial={trial} enum={enum} chunk={chunk}",
                    )
                total_events += int(e0.count)
    assert total_events > 0   # the corpus must actually exercise the scatter


def test_stacked_ops_overflow_parity(rng):
    """The stacked event write must hit the overflow/dump-slot path the same
    way the plain one does (count saturates, overflow latches)."""
    import dataclasses

    K = DEFAULT_CONFIG.max_tracks
    roi = np.full((64, 96), 255, np.uint8)  # everything is in the ROI
    roi_d = jnp.asarray(roi)
    T = 12                                  # cap = 4*T = 48 event slots
    # alternate full/empty frames: every full->empty edge fires up to K-1
    # linked-track disappearances, overflowing the 48-slot buffer fast
    cys = rng.uniform(0, 64, (T, K)).astype(np.float32)
    cxs = rng.uniform(0, 96, (T, K)).astype(np.float32)
    cys[1:] = np.clip(cys[:-1] + rng.uniform(-3, 3, (T - 1, K)), 0, 63)
    cxs[1:] = np.clip(cxs[:-1] + rng.uniform(-3, 3, (T - 1, K)), 0, 95)
    valids = np.zeros((T, K), bool)
    valids[::3] = True
    valids[1::3] = True                     # 2 linked frames, then a gap
    fns = np.arange(T, dtype=np.int32)

    args = (
        empty_state(K), roi_d,
        jnp.asarray(cys), jnp.asarray(cxs), jnp.asarray(valids),
        jnp.asarray(fns),
    )
    e0 = track_window(*args, DEFAULT_CONFIG)[1]
    e1 = track_window(
        *args, dataclasses.replace(DEFAULT_CONFIG, track_stacked_ops=True)
    )[1]
    for a, b in zip(jax.tree.leaves(e0), jax.tree.leaves(e1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(e0.count) > 0


def test_chunked_scan_matches_per_frame(rng):
    """track_window's chunked scan (empty-sky fast path over whole chunks)
    must be output-identical to the per-frame scan for any mix of empty,
    busy, and inactive frames."""
    import jax.numpy as jnp

    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.pipeline.tracking_jax import empty_state, track_window

    K = DEFAULT_CONFIG.max_tracks
    roi = np.zeros((64, 96), np.uint8)
    roi[0:16, 30:60] = 255
    roi_d = jnp.asarray(roi)

    for trial in range(6):
        T = int(rng.integers(9, 45))            # exercises chunk padding
        cys = rng.uniform(0, 64, (T, K)).astype(np.float32)
        cxs = rng.uniform(0, 96, (T, K)).astype(np.float32)
        valids = np.zeros((T, K), bool)
        # sparse bursts of segments with empty stretches between
        for t in range(T):
            if rng.random() < 0.3:
                valids[t, : int(rng.integers(1, 4))] = True
        active = rng.random(T) > 0.15
        fns = np.arange(T, dtype=np.int32)

        import dataclasses

        for cfg in (
            DEFAULT_CONFIG,
            dataclasses.replace(DEFAULT_CONFIG, track_enum_lap=4),
        ):
            args = (
                empty_state(K), roi_d,
                jnp.asarray(cys), jnp.asarray(cxs), jnp.asarray(valids),
                jnp.asarray(fns), cfg, jnp.asarray(active),
            )
            s1, e1 = track_window(*args, chunk=1)
            s8, e8 = track_window(*args, chunk=8)
            for a, b in zip(jax.tree.leaves((s1, e1)), jax.tree.leaves((s8, e8))):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"trial {trial} enum={cfg.track_enum_lap}",
                )


def test_compact_tables_rank_equals_stable_argsort(rng):
    """compact_tables' valid-first order is a cumsum-rank scatter; it must
    reproduce stable argsort(~valid)'s placement bit-for-bit (same
    sort-removal argument as the scan's event compaction), including the
    all-valid and all-invalid edges."""
    import jax
    import jax.numpy as jnp

    from swiftwatcher_tpu.ops.props import RegionTable
    from swiftwatcher_tpu.pipeline.tracking_jax import compact_tables

    B, T, N, K = 2, 3, 256, 24
    for trial in range(12):
        p = rng.uniform(0, 0.25)
        valid = rng.random((B, T, N)) < p
        if trial == 0:
            valid[:] = False
        if trial == 1:
            valid[:] = True
        mk = lambda: jnp.asarray(rng.integers(0, 99, (B, T, N)).astype(np.int32))
        tb = RegionTable(
            area=jnp.asarray(
                (rng.integers(0, 50, (B, T, N)) * valid).astype(np.int32)
            ),
            sum_y=mk(), sum_x=mk(), min_y=mk(), min_x=mk(), max_y=mk(),
            max_x=mk(), valid=jnp.asarray(valid),
        )
        got = compact_tables(tb, K, with_bbox=True)
        order = jnp.argsort(~tb.valid, axis=-1, stable=True)[..., :K]
        take = lambda a: jnp.take_along_axis(a, order, axis=-1)
        areaf = jnp.maximum(take(tb.area), 1).astype(jnp.float32)
        ref = (
            take(tb.sum_y).astype(jnp.float32) / areaf,
            take(tb.sum_x).astype(jnp.float32) / areaf,
            take(tb.valid),
            jnp.sum(tb.valid, axis=-1) > K,
            tuple(take(a) for a in (tb.min_y, tb.min_x, tb.max_y, tb.max_x)),
        )
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
