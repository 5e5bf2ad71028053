"""Frame source semantics: HDF5 round trip, inclusive-end duplication,
null-frame padding — the reference's I/O quirks (io_video.py)."""

import cv2
import h5py
import numpy as np
import pytest

from swiftwatcher_tpu.io.readers import ArraySource, HDF5Source, open_source
from swiftwatcher_tpu.io.synthetic import make_video


def _write_h5(path, frames, fps=30.0):
    enc = [cv2.imencode(".png", f)[1] for f in frames]
    maxlen = max(len(e) for e in enc)
    data = np.zeros((len(enc), maxlen), np.uint8)
    for i, e in enumerate(enc):
        data[i, : len(e)] = e.ravel()
    with h5py.File(path, "w") as fh:
        d = fh.create_dataset("VideoFrames", data=data)
        fh.attrs["CAP_PROP_FPS"] = fps
        fh.attrs["CAP_PROP_FRAME_COUNT"] = len(frames)


def test_hdf5_source_roundtrip(tmp_path, rng):
    video = make_video(seed=1, n_frames=8, H=60, W=80, n_entering=0, n_crossing=0)
    p = tmp_path / "clip.h5"
    _write_h5(p, video.frames)
    src = HDF5Source(p)
    assert src.fps == 30.0
    assert src.total_frames == 8
    f, num, ts = src.get_frame()
    assert num == 0
    np.testing.assert_array_equal(f, video.frames[0])  # PNG is lossless


def test_make_h5_cache_tool(tmp_path):
    """tools/make_h5_cache.py writes the exact container HDF5Source expects;
    the cached frames equal a JPEG encode/decode of the originals, and the
    cache drives the pipeline to the same counts as the decoded frames."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from make_h5_cache import make_cache

    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.pipeline.runner import run_video

    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1)
    npy = tmp_path / "clip.npy"
    np.save(npy, video.frames)
    out = tmp_path / "clip.h5"
    n = make_cache(npy, out, quality=95, status=False)
    assert n == 63

    src = HDF5Source(out)
    assert src.fps == video.fps and src.total_frames == 63
    f, num, _ = src.get_frame()
    ref = cv2.imdecode(
        cv2.imencode(".jpg", video.frames[0], [cv2.IMWRITE_JPEG_QUALITY, 95])[1],
        cv2.IMREAD_COLOR,
    )
    np.testing.assert_array_equal(f, ref)

    # e2e: the cache equals running on the JPEG-decoded frames directly
    decoded = np.stack([
        cv2.imdecode(
            cv2.imencode(".jpg", fr, [cv2.IMWRITE_JPEG_QUALITY, 95])[1],
            cv2.IMREAD_COLOR,
        )
        for fr in video.frames
    ])
    base = run_video(
        ArraySource(decoded, fps=video.fps), video.corners, DEFAULT_CONFIG
    )
    cached = run_video(HDF5Source(out), video.corners, DEFAULT_CONFIG)
    assert cached.total_predicted == base.total_predicted
    assert cached.total_rejected == base.total_rejected


def test_hdf5_empty_slot_falls_back(tmp_path):
    """An unwritten vlen slot (make_h5_cache skips undecodable frames)
    reads back zero-length without raising; the reader must take the
    decode-failure fallback (substitute last good, count the error), not
    crash in cv2.imdecode."""
    import h5py

    video = make_video(seed=2, n_frames=6, H=40, W=56, n_entering=0, n_crossing=0)
    p = tmp_path / "holes.h5"
    dt = h5py.vlen_dtype(np.uint8)
    with h5py.File(p, "w") as fh:
        d = fh.create_dataset("VideoFrames", (6,), dtype=dt)
        fh.attrs["CAP_PROP_FPS"] = 30.0
        fh.attrs["CAP_PROP_FRAME_COUNT"] = 6
        for i, f in enumerate(video.frames):
            if i == 3:
                continue  # hole
            d[i] = np.frombuffer(cv2.imencode(".png", f)[1].tobytes(), np.uint8)

    src = HDF5Source(p)
    frames = [src.get_frame()[0] for _ in range(6)]
    assert src.read_errors == 1
    np.testing.assert_array_equal(frames[3], frames[2])  # last-good substitute

    # encoded-window path: the hole must not poison _last_encoded either
    src2 = HDF5Source(p)
    bufs, numbers, stamps = src2.get_encoded_window(6)
    assert bufs[3] == bufs[2] and bufs[3] is not None
    assert src2.frames_read == 5 and src2.read_errors == 1


def test_video_file_source_unopened_raises(tmp_path):
    from swiftwatcher_tpu.io.readers import VideoFileSource

    with pytest.raises(RuntimeError, match="could not open"):
        VideoFileSource(tmp_path / "nope.mp4", backend="cv2")


def test_inclusive_end_duplicates_last_frame(tmp_path):
    video = make_video(seed=1, n_frames=5, H=40, W=60, n_entering=0, n_crossing=0)
    p = tmp_path / "clip.h5"
    _write_h5(p, video.frames)
    src = HDF5Source(p)
    frames, nums, _ = src.get_window(8)
    # io_video.py:40: bounds check is start <= fn <= end INCLUSIVE, so frame
    # index 5 is requested, fails to decode, and substitutes frame 4.
    assert nums == [0, 1, 2, 3, 4, 5, -1, -1]
    np.testing.assert_array_equal(frames[5], video.frames[4])
    assert src.read_errors == 1
    # null frames are zero images with the null timestamp
    assert frames[6].max() == 0 and frames[7].max() == 0


def test_array_source_start_honored():
    video = make_video(seed=1, n_frames=10, H=40, W=60, n_entering=0, n_crossing=0)
    src = ArraySource(video.frames, fps=30.0, start=4)
    assert src.total_frames == 6
    _, num, _ = src.get_frame()
    assert num == 4


def test_open_source_by_suffix(tmp_path):
    video = make_video(seed=1, n_frames=4, H=40, W=60, n_entering=0, n_crossing=0)
    np.save(tmp_path / "c.npy", video.frames)
    src = open_source(tmp_path / "c.npy")
    assert src.total_frames == 4
    p = tmp_path / "c.h5"
    _write_h5(p, video.frames)
    src = open_source(p)
    assert isinstance(src, HDF5Source)
