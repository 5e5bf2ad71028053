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
