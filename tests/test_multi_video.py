"""Concurrent multi-video processing equals sequential processing."""

import numpy as np

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import ArraySource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.multi import run_videos
from swiftwatcher_tpu.pipeline.runner import run_video


def test_run_videos_matches_sequential():
    videos = [
        make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1),
        make_video(seed=1, n_frames=50, n_entering=1, n_crossing=1, n_vanishing=1),
    ]
    sequential = [
        run_video(ArraySource(v.frames, fps=v.fps), v.corners, DEFAULT_CONFIG)
        for v in videos
    ]
    concurrent = run_videos(
        [(ArraySource(v.frames, fps=v.fps), v.corners) for v in videos],
        DEFAULT_CONFIG,
        max_concurrent=2,
    )
    for seq, con in zip(sequential, concurrent):
        assert con.total_predicted == seq.total_predicted
        assert con.total_rejected == seq.total_rejected
        assert sorted(e.frame_number for e in con.events) == sorted(
            e.frame_number for e in seq.events
        )
