"""ROI-mask init ops vs OpenCV."""

import cv2
import numpy as np
import pytest

from swiftwatcher_tpu.geometry import (
    crop_region_from_corners,
    roi_crop_region_from_corners,
)
from swiftwatcher_tpu.ops.roi_mask import (
    canny,
    dilate_upwards,
    generate_roi_mask,
    median_blur,
    otsu_binary,
    otsu_threshold_value,
)


def test_median_blur_matches_cv2(rng):
    img = rng.integers(0, 256, size=(40, 55, 3), dtype=np.uint8)
    expected = cv2.medianBlur(img, 9)
    got = np.asarray(median_blur(img, 9))
    np.testing.assert_array_equal(got, expected)


def test_median_blur_single_channel(rng):
    img = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
    expected = cv2.medianBlur(img, 9)
    got = np.asarray(median_blur(img, 9))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("kind", ["random", "bimodal", "sky_chimney"])
def test_otsu_matches_cv2(rng, kind):
    if kind == "random":
        img = rng.integers(0, 256, size=(60, 80), dtype=np.uint8)
    elif kind == "bimodal":
        img = np.where(
            rng.random((60, 80)) > 0.4,
            rng.integers(180, 220, size=(60, 80)),
            rng.integers(30, 70, size=(60, 80)),
        ).astype(np.uint8)
    else:
        img = np.full((60, 80), 200, np.uint8)  # sky
        img[20:, 25:55] = 60  # chimney
        img = np.clip(
            img.astype(np.int32) + rng.integers(-8, 9, size=img.shape), 0, 255
        ).astype(np.uint8)
    t_cv, out_cv = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    assert int(otsu_threshold_value(img)) == int(t_cv)
    np.testing.assert_array_equal(np.asarray(otsu_binary(img)), out_cv)


def test_canny_on_binary_matches_cv2(rng):
    # The actual use: Canny(0, 256) on an Otsu-binarized image.
    img = np.zeros((50, 70), np.uint8)
    img[18:, 20:50] = 255
    img[30:35, 55:65] = 255
    expected = cv2.Canny(img, 0, 256)
    got = np.asarray(canny(img, 0, 256))
    np.testing.assert_array_equal(got, expected)


def test_canny_on_blobs_matches_cv2(rng):
    img = (rng.random((40, 60)) > 0.6).astype(np.uint8) * 255
    expected = cv2.Canny(img, 0, 256)
    got = np.asarray(canny(img, 0, 256))
    np.testing.assert_array_equal(got, expected)


def test_canny_grayscale_matches_cv2(rng):
    img = rng.integers(0, 256, size=(45, 63), dtype=np.uint8)
    img = cv2.medianBlur(img, 5)  # smooth a bit, like real frames
    expected = cv2.Canny(img, 0, 256)
    got = np.asarray(canny(img, 0, 256))
    np.testing.assert_array_equal(got, expected)


def test_dilate_upwards_matches_cv2(rng):
    img = (rng.random((48, 33)) > 0.9).astype(np.uint8) * 255
    expected = cv2.dilate(img, kernel=np.ones((20, 1), np.uint8), anchor=(0, 0))
    got = np.asarray(dilate_upwards(img, 20))
    np.testing.assert_array_equal(got, expected)


def _synthetic_chimney_frame(rng, H=240, W=320):
    """Sky + dark chimney stack, like the surveillance footage."""
    img = np.zeros((H, W, 3), np.int32)
    img[..., 0] = 215  # bright B channel (sky)
    img[..., 1] = 180
    img[..., 2] = 160
    top, left, right = 120, 130, 190
    img[top:, left:right, :] = (55, 50, 48)  # chimney
    img += rng.integers(-6, 7, size=img.shape)
    corners = [(left, top), (right, top)]
    return np.clip(img, 0, 255).astype(np.uint8), corners


def test_generate_roi_mask_matches_cv2_oracle(rng):
    frame, corners = _synthetic_chimney_frame(rng)
    crop_region = crop_region_from_corners(corners)
    roi_region = roi_crop_region_from_corners(corners)

    # cv2-composed oracle of image_filtering.py:99-122
    strip = frame[roi_region[0][1] : roi_region[1][1], roi_region[0][0] : roi_region[1][0]]
    blurred = cv2.medianBlur(cv2.medianBlur(strip, 9), 9)
    b = cv2.split(blurred)[0]
    _, th = cv2.threshold(b, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    edge = cv2.Canny(th, 0, 256)
    dil = cv2.dilate(edge, kernel=np.ones((20, 1), np.uint8), anchor=(0, 0))
    canvas = np.zeros(frame.shape[:2], np.uint8)
    canvas[roi_region[0][1] : roi_region[1][1], roi_region[0][0] : roi_region[1][0]] = dil
    cropped = canvas[
        crop_region[0][1] : crop_region[1][1], crop_region[0][0] : crop_region[1][0]
    ]
    _, expected = cv2.threshold(cropped, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)

    got = np.asarray(generate_roi_mask(frame, roi_region, crop_region))
    np.testing.assert_array_equal(got, expected)
    # sanity: mask is nonempty and sits above the chimney mouth
    assert expected.sum() > 0
