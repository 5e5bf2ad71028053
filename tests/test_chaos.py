"""Chaos composition: decode failures x wire codec x device tracker x
checkpoint/resume, all at once.

Each subsystem's failure semantics are tested in isolation elsewhere
(test_readers, test_wirecodec, test_aux); this asserts the COMPOSITION is
still deterministic and exact: a seeded pattern of read errors (the
reference's last-good substitution, io_video.py:50-53) produces identical
events through a plain host-tracker run and through the full production
stack interrupted mid-run and resumed from its checkpoint."""

import dataclasses

import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import ArraySource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video


class FaultyArraySource(ArraySource):
    """ArraySource whose read_frame fails (returns None) on a seeded set of
    frame indices — deterministic, so runs are comparable."""

    def __init__(self, frames, fail_indices, fps=30.0):
        super().__init__(frames, fps=fps)
        self._fail = frozenset(int(i) for i in fail_indices)

    def read_frame(self, frame_number, increment=True):
        if frame_number in self._fail:
            if increment:
                self.next_frame_number += 1
            return None  # the caller counts read_errors and substitutes
        return super().read_frame(frame_number, increment=increment)


def _events_key(res):
    return sorted(
        (e.frame_number, e.first_centroid, e.last_centroid) for e in res.events
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_chaos_errors_codec_tracker_resume(tmp_path, seed):
    video = make_video(
        seed=seed, n_frames=84, n_entering=2, n_crossing=1, n_vanishing=1
    )
    rng = np.random.default_rng(100 + seed)
    # ~7% read errors, but never frame 0 (a failed FIRST read has no
    # last-good frame to substitute — separately covered in test_readers)
    fail = [int(i) for i in rng.choice(np.arange(1, 84), size=6, replace=False)]

    # ground truth: plain host-tracker run over the same faulty stream
    plain = run_video(
        FaultyArraySource(video.frames, fail, fps=video.fps),
        video.corners,
        DEFAULT_CONFIG,
    )
    assert plain.metrics.read_errors == len(fail)

    # production stack: delta6 wire + device tracker (enumeration LAP on,
    # so the chaos composition crosses its cond fallback too) + checkpoints...
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, wire_codec="delta6", track_enum_lap=4
    )
    ck = tmp_path / "chaos.ckpt"
    partial = FaultyArraySource(video.frames, fail, fps=video.fps)
    partial.total_frames = 42  # ...interrupted mid-video
    run_video(
        partial, video.corners, cfg,
        checkpoint_path=ck, checkpoint_interval_batches=1,
        tracker_impl="device",
    )
    assert ck.exists()

    resumed = run_video(
        FaultyArraySource(video.frames, fail, fps=video.fps),
        video.corners, cfg,
        checkpoint_path=ck,
        tracker_impl="device",
    )

    assert resumed.total_predicted == plain.total_predicted
    assert resumed.total_rejected == plain.total_rejected
    assert _events_key(resumed) == _events_key(plain)
