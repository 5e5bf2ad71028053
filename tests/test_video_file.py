"""VideoFileSource end-to-end through a real encoded video file."""

import cv2
import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import VideoFileSource, open_source
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video


def _write_video(path, frames, fps=30.0):
    h, w = frames.shape[1:3]
    for fourcc in ("FFV1", "MJPG", "mp4v"):
        wr = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*fourcc), fps, (w, h)
        )
        if wr.isOpened():
            for f in frames:
                wr.write(f)
            wr.release()
            return True
        wr.release()
    return False


def test_video_file_source_end_to_end(tmp_path):
    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1)
    path = tmp_path / "clip.avi"
    if not _write_video(path, video.frames, video.fps):
        pytest.skip("no usable video encoder in this cv2 build")

    src = VideoFileSource(path)
    assert src.total_frames == 63
    assert src.fps == 30.0

    result = run_video(src, video.corners, DEFAULT_CONFIG)
    assert result.frames_processed >= 63
    # Lossy codecs may perturb marginal segments; the two strong entering
    # swifts must survive any codec this cv2 ships.
    assert result.total_predicted == video.n_entering

    # open_source dispatches video suffixes to VideoFileSource
    assert isinstance(open_source(path), VideoFileSource)


def test_video_file_ignores_start(tmp_path):
    # io_video.py:146: VideoReader pins start_frame to 0 (only HDF5 honors
    # --start); our VideoFileSource replicates that.
    video = make_video(seed=1, n_frames=30, n_entering=0, n_crossing=0)
    path = tmp_path / "clip.avi"
    if not _write_video(path, video.frames, video.fps):
        pytest.skip("no usable video encoder in this cv2 build")
    src = VideoFileSource(path, end=0)
    assert src.start_frame == 0
    f, num, _ = src.get_frame()
    assert num == 0
