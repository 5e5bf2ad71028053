"""Whole-video event classification: flight-angle features -> labels.

Replicates event_classification.py:16-141 over the tracker's Event records.
Only the first/last centroid, last frame number, and last timestamp of each
motion path feed the classification (compute_angle uses centroid_list[0] and
[-1]; the DataFrame index uses the last segment's timestamp/framenumber), so
Event sufficient statistics are enough.

Replicated quirks:
  * angles that are exact multiples of 15 degrees are dropped as grid
    artifacts of tiny opened segments (event_classification.py:86-100)
  * the histogram mode (36 bins over [-180-eps, 180+eps], interpolated) is
    clamped to -90 unless the raw modal bin edge lies strictly inside
    (-135, -45) (event_classification.py:120-141); the interpolation reads
    hist[i_max - 1], which wraps to the LAST bin when i_max == 0, exactly as
    NumPy negative indexing does in the reference
  * labels via right-closed bins: label 1 iff mode-30 < angle <= mode+30
    (pd.cut semantics at event_classification.py:110-115)
"""

from __future__ import annotations

import math
import sys
from typing import Sequence

import numpy as np
import pandas as pd

from ..config import PipelineConfig, DEFAULT_CONFIG
from .tracking import Event

EPSILON = sys.float_info.epsilon


def event_angle(ev: Event) -> float:
    """First->last centroid angle, y negated (event_classification.py:75-83)."""
    del_y = ev.first_centroid[0] - ev.last_centroid[0]
    del_x = -1 * (ev.first_centroid[1] - ev.last_centroid[1])
    return math.degrees(math.atan2(del_y, del_x))


def events_to_dataframe(events: Sequence[Event]) -> pd.DataFrame:
    """Angle-feature DataFrame indexed by (timestamp, framenumber) of each
    event's last segment (event_classification.py:16-44, 63-72)."""
    rows = {
        "timestamp": [ev.timestamp for ev in events],
        "framenumber": [ev.frame_number for ev in events],
        "angle": [event_angle(ev) for ev in events],
    }
    df = pd.DataFrame(rows)
    df.set_index(["timestamp", "framenumber"], inplace=True)
    return df


def drop_false_angles(
    df: pd.DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    disp: Sequence[float] | None = None,
) -> pd.DataFrame:
    """Drop angles that are exact multiples of cfg.false_angle_multiple
    degrees (event_classification.py:86-100).

    With cfg.false_angle_min_disp > 0 (opt-in, off by default) and a
    per-row first->last displacement array, only short paths are dropped:
    the multiple-of-15 heuristic targets grid artifacts of tiny opened
    segments, which barely move — a long straight dive that happens to hit
    -90.0 deg exactly is a real entry (see ACCURACY JSON crowded scenes).
    """
    mask = df["angle"] % cfg.false_angle_multiple == 0
    if cfg.false_angle_min_disp > 0 and disp is not None:
        short = np.asarray(disp, dtype=float) < cfg.false_angle_min_disp
        # positional masking: duplicate (timestamp, framenumber) index
        # labels must not drag sibling rows along
        return df[~(mask.to_numpy() & short)]
    if mask.any():
        # reference-exact path, incl. its label-based drop semantics
        df = df.drop(df[mask].index)
    return df


def compute_mode(angles: np.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG) -> float:
    """Interpolated histogram mode of entry angles, clamped to -90 outside
    (-135, -45) (event_classification.py:120-141)."""
    hist, edges = np.histogram(
        angles, bins=cfg.angle_hist_bins, range=[-180 - EPSILON, 180 + EPSILON]
    )
    i_max = int(np.argmax(hist))
    xl = edges[i_max]
    lo, hi = cfg.mode_valid_range
    # The reference hardcodes (-135, -45), which keeps i_max interior; the
    # config generalization could put i_max in the top bin, so guard the
    # hist[i_max + 1] read (fall back to the default mode, like out-of-range).
    if lo < xl < hi and i_max + 1 < len(hist):
        f0 = hist[i_max]
        f_1 = hist[i_max - 1]          # wraps to last bin when i_max == 0
        f1 = hist[i_max + 1]
        w = abs(edges[1] - edges[0])
        return float(xl + ((f0 - f_1) / (2 * f0 - f1 - f_1)) * w)
    return cfg.default_mode


def classify_events(
    events: Sequence[Event], cfg: PipelineConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Angle features -> filtered -> labeled DataFrame with columns
    [angle, label, events] (event_classification.py:47-60, 103-117)."""
    df = events_to_dataframe(events)
    disp = [
        math.hypot(
            ev.first_centroid[0] - ev.last_centroid[0],
            ev.first_centroid[1] - ev.last_centroid[1],
        )
        for ev in events
    ]
    df = drop_false_angles(df, cfg, disp=disp)
    if len(df) > 0:
        mode = compute_mode(df["angle"].to_numpy(), cfg)
        b = cfg.angle_band_halfwidth
        bins = [-180 - EPSILON, mode - b, mode + b, 180 + EPSILON]
        if bins == sorted(bins) and len(set(bins)) == 4:
            # the reference's exact construction (right-closed pd.cut band,
            # event_classification.py:103-117) — always taken at reference
            # defaults (b=30, mode clamped to (-135,-45))
            df["label"] = np.array([0, 1, 0])[
                pd.cut(df["angle"], bins=bins, labels=False)
            ]
        else:
            # non-reference band widths (--set angle_band_halfwidth=...) can
            # push mode±b outside (-180, 180), collapsing pd.cut's bin
            # edges (ValueError).  The band test itself is still well
            # defined — label 1 iff mode-b < angle <= mode+b, identical to
            # the right-closed middle bin — so apply it directly.
            df["label"] = (
                (df["angle"] > mode - b) & (df["angle"] <= mode + b)
            ).astype(np.int64)
    else:
        df["label"] = np.array([], dtype=np.int64)
    df["events"] = 1
    return df
