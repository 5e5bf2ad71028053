"""End-to-end count parity: the compiled TPU pipeline vs the full
reference-semantics oracle on synthetic videos with known swift counts.

This is the rebuild's analog of the reference's ground-truth-video
evaluation (SURVEY.md §4): PREDICTED/REJECTED totals must match the oracle
exactly, and must equal the constructed ground truth.
"""

import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import ArraySource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video

from oracle_pipeline import reference_pipeline


def _run_ours(video):
    source = ArraySource(video.frames, fps=video.fps)
    return run_video(source, video.corners, DEFAULT_CONFIG)


@pytest.mark.parametrize("seed,n_frames", [(0, 63), (1, 50)])
def test_counts_match_oracle_and_ground_truth(seed, n_frames):
    video = make_video(
        seed=seed, n_frames=n_frames, n_entering=2, n_crossing=1, n_vanishing=1
    )
    result = _run_ours(video)

    events_o, labels_o = reference_pipeline(video.frames, video.corners, video.fps)
    oracle_pred = sum(labels_o)
    oracle_rej = len(labels_o) - oracle_pred

    assert result.total_predicted == oracle_pred
    assert result.total_rejected == oracle_rej
    # ground truth: every entering swift predicted, the vanisher rejected
    assert result.total_predicted == video.n_entering
    assert result.total_rejected == video.n_vanishing

    # event frame numbers agree with the oracle
    ours_fns = sorted(ev.frame_number for ev in result.events)
    oracle_fns = sorted(fn for _, _, fn in events_o)
    assert ours_fns == oracle_fns


def test_no_motion_video_has_no_events():
    video = make_video(seed=3, n_frames=42, n_entering=0, n_crossing=0)
    result = _run_ours(video)
    assert result.events == []
    assert result.df_labels is None


def test_csv_export_roundtrip(tmp_path):
    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1)
    source = ArraySource(video.frames, fps=video.fps)
    result = run_video(
        source, video.corners, DEFAULT_CONFIG, export_dir=tmp_path / "out"
    )
    total = result.total_predicted
    files = sorted(p.name for p in (tmp_path / "out").glob("*.csv"))
    expected = sorted(
        f"{total}-swifts_{name}.csv"
        for name in [
            "full_usec",
            "events-only_usec",
            "full_sec",
            "events-only_sec",
            "full_min",
            "events-only_min",
        ]
    )
    assert files == expected

    import pandas as pd

    full = pd.read_csv(tmp_path / "out" / f"{total}-swifts_full_usec.csv")
    assert list(full.columns) == ["timestamp", "framenumber", "predicted", "rejected"]
    # one row per frame in [start, end] inclusive
    assert len(full) == source.end_frame - source.start_frame + 1
    assert int(full["predicted"].sum()) == total
    assert int(full["rejected"].sum()) == result.total_rejected
    ev_only = pd.read_csv(tmp_path / "out" / f"{total}-swifts_events-only_usec.csv")
    assert (ev_only[["predicted", "rejected"]].sum(axis=1) > 0).all()


@pytest.mark.parametrize("impl", ["host", "device"])
def test_null_tail_window_emits_no_phantom_events(impl):
    """PARITY.md deviation 11: a last window whose tail is null (zero)
    frames must contribute NO segments — the RPCA output there is
    unspecified null-space noise (the svp quirk's 0 - 1/mu term in an
    arbitrary basis), and the reference is observed to never emit
    null-frame segments.  This pinned scene made the pre-fix rebuild emit
    two phantom fn=-1 events (found by tools/parity_fuzz.py scene 0)."""
    video = make_video(
        seed=1923779129, n_frames=45, H=240, W=320, n_entering=0,
        n_crossing=0, n_vanishing=2, noise=3, dot=5, brightness_drift=0.15,
    )
    result = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, tracker_impl=impl,
    )
    fns = sorted(ev.frame_number for ev in result.events)
    assert all(fn >= 0 for fn in fns), f"phantom null-frame events: {fns}"

    events_o, labels_o = reference_pipeline(video.frames, video.corners, video.fps)
    assert fns == sorted(fn for _, _, fn in events_o)
    assert result.total_predicted == sum(labels_o)
    assert result.total_rejected == len(labels_o) - sum(labels_o)
