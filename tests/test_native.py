"""Native frame pump (C++/libjpeg) vs cv2."""

import cv2
import numpy as np
import pytest

from swiftwatcher_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable"
)


def test_gray_crop_batch_bit_exact(rng):
    frames = rng.integers(0, 256, size=(8, 120, 160, 3), dtype=np.uint8)
    crop = [(20, 10), (140, 100)]
    got = native.gray_crop_batch(frames, crop, n_threads=3)
    for i in range(8):
        expected = cv2.cvtColor(frames[i], cv2.COLOR_BGR2GRAY)[10:100, 20:140]
        np.testing.assert_array_equal(got[i], expected)


def test_decode_jpeg_close_to_cv2(rng):
    img = rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 2)  # compressible content
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 92])
    assert ok
    ours = native.decode_jpeg_bgr(enc.tobytes())
    theirs = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    assert ours is not None and ours.shape == theirs.shape
    # IDCT implementations may differ by a count or two between libjpeg builds
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 2
    assert (diff == 0).mean() > 0.9


def test_decode_jpeg_rejects_garbage():
    assert native.decode_jpeg_bgr(b"not a jpeg") is None


def test_decode_window_gray(rng):
    H, W = 80, 120
    frames = [
        cv2.GaussianBlur(
            rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8), (5, 5), 2
        )
        for _ in range(6)
    ]
    enc = [cv2.imencode(".jpg", f, [cv2.IMWRITE_JPEG_QUALITY, 95])[1].tobytes() for f in frames]
    crop = [(10, 5), (110, 75)]
    gray, ok = native.decode_window_gray(enc, H, W, crop, n_threads=2)
    assert ok.all() and len(ok) == 6
    for i, f in enumerate(frames):
        dec = cv2.imdecode(np.frombuffer(enc[i], np.uint8), cv2.IMREAD_COLOR)
        expected = cv2.cvtColor(dec, cv2.COLOR_BGR2GRAY)[5:75, 10:110]
        diff = np.abs(gray[i].astype(int) - expected.astype(int))
        assert diff.max() <= 3  # decoder IDCT differences propagate into gray


def test_hdf5_native_decode_end_to_end(tmp_path):
    """Opt-in native JPEG decode through the full pipeline: counts must
    match the cv2-decode path on a strong synthetic scene."""
    import dataclasses

    import jax

    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.io.readers import HDF5Source
    from swiftwatcher_tpu.io.synthetic import make_video
    from swiftwatcher_tpu.pipeline.runner import run_video
    import h5py

    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1)
    enc = [cv2.imencode(".jpg", f, [cv2.IMWRITE_JPEG_QUALITY, 95])[1] for f in video.frames]
    maxlen = max(len(e) for e in enc)
    data = np.zeros((len(enc), maxlen), np.uint8)
    for i, e in enumerate(enc):
        data[i, : len(e)] = e.ravel()
    p = tmp_path / "clip.h5"
    with h5py.File(p, "w") as fh:
        fh.create_dataset("VideoFrames", data=data)
        fh.attrs["CAP_PROP_FPS"] = video.fps
        fh.attrs["CAP_PROP_FRAME_COUNT"] = len(enc)

    base = run_video(HDF5Source(p), video.corners, DEFAULT_CONFIG)
    cfg = dataclasses.replace(DEFAULT_CONFIG, native_decode=True)
    nat = run_video(HDF5Source(p), video.corners, cfg)
    assert nat.total_predicted == base.total_predicted == video.n_entering
    assert nat.total_rejected == base.total_rejected
