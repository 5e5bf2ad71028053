"""bgr_to_gray must be bit-exact with cv2.cvtColor(BGR2GRAY)."""

import cv2
import numpy as np

from swiftwatcher_tpu.ops.color import bgr_to_gray


def test_gray_exhaustive_channel_values():
    # All (b, g, r) combinations on a coarse lattice plus random samples.
    vals = np.arange(0, 256, 5, dtype=np.uint8)
    b, g, r = np.meshgrid(vals, vals, vals, indexing="ij")
    img = np.stack([b, g, r], axis=-1).reshape(1, -1, 3)
    expected = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    got = np.asarray(bgr_to_gray(img))
    np.testing.assert_array_equal(got, expected)


def test_gray_random_images(rng):
    img = rng.integers(0, 256, size=(4, 33, 57, 3), dtype=np.uint8)
    expected = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2GRAY) for f in img])
    got = np.asarray(bgr_to_gray(img))
    np.testing.assert_array_equal(got, expected)
