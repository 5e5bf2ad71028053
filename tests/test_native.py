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
    gray, n_ok = native.decode_window_gray(enc, H, W, crop, n_threads=2)
    assert n_ok == 6
    for i, f in enumerate(frames):
        dec = cv2.imdecode(np.frombuffer(enc[i], np.uint8), cv2.IMREAD_COLOR)
        expected = cv2.cvtColor(dec, cv2.COLOR_BGR2GRAY)[5:75, 10:110]
        diff = np.abs(gray[i].astype(int) - expected.astype(int))
        assert diff.max() <= 3  # decoder IDCT differences propagate into gray
