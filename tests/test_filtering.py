"""Parity tests for bilateral blur, threshold-to-zero, grayscale opening
against the native libraries the reference calls (cv2, scipy.ndimage)."""

import cv2
import numpy as np
from scipy import ndimage

from swiftwatcher_tpu.ops.filtering import (
    bilateral_blur,
    grayscale_opening,
    thresh_to_zero,
)


def test_thresh_to_zero_matches_cv2(rng):
    img = rng.integers(0, 256, size=(40, 64), dtype=np.uint8)
    _, expected = cv2.threshold(img, thresh=15, maxval=255, type=cv2.THRESH_TOZERO)
    got = np.asarray(thresh_to_zero(img, 15))
    np.testing.assert_array_equal(got, expected)


def test_grayscale_opening_matches_ndimage(rng):
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    expected = ndimage.grey_opening(img, size=(3, 3)).astype(np.uint8)
    got = np.asarray(grayscale_opening(img, (3, 3)))
    np.testing.assert_array_equal(got, expected)


def test_grayscale_opening_batched(rng):
    imgs = rng.integers(0, 256, size=(5, 20, 31), dtype=np.uint8)
    expected = np.stack(
        [ndimage.grey_opening(f, size=(3, 3)).astype(np.uint8) for f in imgs]
    )
    got = np.asarray(grayscale_opening(imgs, (3, 3)))
    np.testing.assert_array_equal(got, expected)


def test_bilateral_matches_cv2_smooth(rng):
    # RPCA motion images are mostly near-zero with small bright blobs; test on
    # that regime plus pure noise.
    img = np.zeros((48, 80), np.uint8)
    img[10:14, 20:25] = 180
    img[30:33, 60:62] = 90
    noise = rng.integers(0, 12, size=img.shape, dtype=np.uint8)
    img = np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)

    expected = cv2.bilateralFilter(img, 7, 15, 1)
    got = np.asarray(bilateral_blur(img, 7, 15.0, 1.0))
    diff = np.abs(got.astype(int) - expected.astype(int))
    # Bit-exactness modulo float-summation association; require off-by-one at
    # worst and near-total exactness.
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.995


def test_bilateral_random(rng):
    img = rng.integers(0, 256, size=(32, 45), dtype=np.uint8)
    expected = cv2.bilateralFilter(img, 7, 15, 1)
    got = np.asarray(bilateral_blur(img, 7, 15.0, 1.0))
    diff = np.abs(got.astype(int) - expected.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99
