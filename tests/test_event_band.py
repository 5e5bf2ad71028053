"""Angle-band labeling robustness at non-reference band widths.

The reference hardcodes the +-30 deg band and clamps the mode into
(-135, -45) (event_classification.py:103-141), so its pd.cut bin edges can
never collide.  Our config exposes angle_band_halfwidth; values >= 45 can
push mode-b to/through the -180 edge, which made pd.cut raise
"Bin edges must be unique".  classify_events now applies the identical
right-closed band test directly whenever the cut edges would collapse.
"""

import dataclasses

import numpy as np
import pandas as pd

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.pipeline.events import (
    classify_events, compute_mode, drop_false_angles, events_to_dataframe,
)
from swiftwatcher_tpu.pipeline.tracking import Event


def _events(angles, start=100):
    """One synthetic event per angle (unit displacement at that angle);
    y is negated in the angle convention (event_classification.py:80)."""
    evs = []
    for i, a in enumerate(angles):
        rad = np.deg2rad(a)
        dy, dx = -np.sin(rad), np.cos(rad)
        evs.append(
            Event(
                first_centroid=(10.0, 10.0),
                last_centroid=(10.0 + 3 * dy, 10.0 + 3 * dx),
                frame_number=start + 40 * i,
                timestamp=pd.Timestamp(0) + pd.Timedelta(seconds=i),
            )
        )
    return evs


ANGLES = [-130, -95, -91, -89, -88, -59, -40, -10, 44, 179, -170]


def _expected_labels(angles_realized, cfg):
    """The band semantics, stated independently: label 1 iff
    mode - b < angle <= mode + b (right-closed middle pd.cut bin)."""
    mode = compute_mode(angles_realized, cfg)
    b = cfg.angle_band_halfwidth
    return ((angles_realized > mode - b) & (angles_realized <= mode + b))


def test_band_labels_match_semantics_at_every_width():
    """Both implementation paths (pd.cut while its bins are valid, direct
    comparison once they collapse) must realize the same right-closed band
    test — including widths that used to crash pd.cut outright."""
    evs = _events(ANGLES)
    for b in (30.0, 40.0, 60.0, 75.0, 120.0, 200.0):
        cfg = dataclasses.replace(DEFAULT_CONFIG, angle_band_halfwidth=b)
        df = classify_events(evs, cfg)   # must not raise at any width
        survivors = drop_false_angles(events_to_dataframe(evs), cfg)
        expect = _expected_labels(survivors["angle"].to_numpy(), cfg)
        np.testing.assert_array_equal(
            df["label"].to_numpy(), expect.astype(np.int64), err_msg=f"b={b}"
        )


def test_default_width_unchanged():
    """The reference default (b=30) must still go through pd.cut and keep
    only the near-mode dives."""
    cfg = DEFAULT_CONFIG
    df = classify_events(_events(ANGLES), cfg)
    by_angle = {int(round(a)): int(l) for a, l in zip(df["angle"], df["label"])}
    assert by_angle[-95] == by_angle[-91] == by_angle[-89] == by_angle[-88] == 1
    assert by_angle[-130] == by_angle[-40] == by_angle[-170] == 0
    assert by_angle[179] == by_angle[-10] == 0


def _disp_events():
    """Two events at exactly -90 deg (a false-angle multiple): one tiny
    2-px hop (grid artifact) and one 40-px dive (real bird); plus a
    non-multiple control that must always survive."""
    return [
        Event(first_centroid=(10.0, 10.0), last_centroid=(12.0, 10.0),
              frame_number=100, timestamp=pd.Timestamp(0)),
        Event(first_centroid=(10.0, 10.0), last_centroid=(50.0, 10.0),
              frame_number=140, timestamp=pd.Timestamp(0) + pd.Timedelta(seconds=1)),
        Event(first_centroid=(10.0, 10.0), last_centroid=(40.0, 25.0),
              frame_number=180, timestamp=pd.Timestamp(0) + pd.Timedelta(seconds=2)),
    ]


def test_false_angle_disp_gate_default_is_reference_exact():
    """false_angle_min_disp=0 (default) drops EVERY multiple-of-15 angle,
    long paths included — the reference's behavior, byte-for-byte."""
    df = classify_events(_disp_events(), DEFAULT_CONFIG)
    assert len(df) == 1
    assert df.reset_index()["framenumber"].tolist() == [180]


def test_false_angle_disp_gate_keeps_long_paths():
    """Opt-in gate: the 40-px dive at -90 deg survives, the 2-px artifact
    still drops, the non-multiple control is untouched."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, false_angle_min_disp=5.0)
    df = classify_events(_disp_events(), cfg)
    assert df.reset_index()["framenumber"].tolist() == [140, 180]


def test_false_angle_disp_gate_duplicate_index_rows_independent():
    """Positional masking: two events sharing (timestamp, framenumber) must
    drop independently — the short artifact goes, its index-twin stays.
    (The reference-exact path drops by index label, which would take both;
    that quirk is preserved only at min_disp=0 where the twin is dropped
    for its own angle anyway.)"""
    ts = pd.Timestamp(0)
    evs = [
        Event(first_centroid=(10.0, 10.0), last_centroid=(12.0, 10.0),
              frame_number=100, timestamp=ts),            # -90, 2 px: drop
        Event(first_centroid=(10.0, 10.0), last_centroid=(50.0, 10.0),
              frame_number=100, timestamp=ts),            # -90, 40 px: keep
    ]
    cfg = dataclasses.replace(DEFAULT_CONFIG, false_angle_min_disp=5.0)
    df = classify_events(evs, cfg)
    assert len(df) == 1
    assert abs(float(df["angle"].iloc[0]) - (-90.0)) < 1e-9
