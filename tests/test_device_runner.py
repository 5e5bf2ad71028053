"""run_video with the on-device tracker must match the host tracker."""

import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import ArraySource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video


@pytest.mark.parametrize("seed,n_frames", [(0, 63), (1, 50)])
def test_device_tracker_matches_host(seed, n_frames):
    video = make_video(
        seed=seed, n_frames=n_frames, n_entering=2, n_crossing=1, n_vanishing=1
    )
    host = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, DEFAULT_CONFIG
    )
    dev = run_video(
        ArraySource(video.frames, fps=video.fps),
        video.corners,
        DEFAULT_CONFIG,
        tracker_impl="device",
    )
    assert dev.total_predicted == host.total_predicted
    assert dev.total_rejected == host.total_rejected
    assert sorted(e.frame_number for e in dev.events) == sorted(
        e.frame_number for e in host.events
    )
    # timestamps derived from frame numbers must match too
    assert sorted(str(e.timestamp) for e in dev.events) == sorted(
        str(e.timestamp) for e in host.events
    )
