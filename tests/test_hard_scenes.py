"""Adversarial-scene parity: the pipeline must match the reference oracle
under stress (exposure drift, heavy sensor noise, weak/large birds) — not
just on clean footage."""

import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import ArraySource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video

from oracle_pipeline import reference_pipeline


SCENES = [
    # exposure drift: the low-rank model must absorb a brightening background
    dict(seed=10, n_frames=63, n_entering=2, n_vanishing=1, brightness_drift=0.4),
    # heavy sensor noise + weaker birds
    dict(seed=11, n_frames=63, n_entering=2, n_vanishing=0, noise=7, amp=80),
    # big slow birds
    dict(seed=12, n_frames=63, n_entering=1, n_vanishing=1, dot=7, amp=100),
]


@pytest.mark.parametrize("scene", SCENES, ids=["drift", "noisy", "bigbird"])
def test_hard_scene_matches_oracle(scene):
    video = make_video(n_crossing=1, **scene)
    ours = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, DEFAULT_CONFIG
    )
    events_o, labels_o = reference_pipeline(video.frames, video.corners, video.fps)
    assert ours.total_predicted == sum(labels_o)
    assert ours.total_rejected == len(labels_o) - sum(labels_o)
    assert sorted(e.frame_number for e in ours.events) == sorted(
        fn for _, _, fn in events_o
    )


@pytest.mark.parametrize("seed", [20, 21, 22, 23])
def test_seed_soak_counts_match_oracle(seed):
    """Broader randomized soak: every scene's PREDICTED/REJECTED totals and
    event frames must match the reference oracle exactly."""
    video = make_video(
        seed=seed,
        n_frames=63,
        n_entering=1 + seed % 3,
        n_crossing=seed % 2,
        n_vanishing=(seed + 1) % 2,
        noise=3 + seed % 4,
    )
    ours = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, DEFAULT_CONFIG
    )
    events_o, labels_o = reference_pipeline(video.frames, video.corners, video.fps)
    assert ours.total_predicted == sum(labels_o)
    assert ours.total_rejected == len(labels_o) - sum(labels_o)
    assert sorted(e.frame_number for e in ours.events) == sorted(
        fn for _, _, fn in events_o
    )
