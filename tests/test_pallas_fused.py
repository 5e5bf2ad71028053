"""Pallas fused motion filter (interpret mode on CPU) vs the XLA chain and
the native-library oracle."""

import cv2
import numpy as np
from scipy import ndimage

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.ops.filtering import motion_postfilter
from swiftwatcher_tpu.ops.pallas.fused_motion import fused_motion_filter


def _oracle(frame):
    f = cv2.bilateralFilter(frame, 7, 15, 1).astype(np.uint8)
    _, f = cv2.threshold(f, 15, 255, cv2.THRESH_TOZERO)
    return ndimage.grey_opening(f.astype(np.uint8), size=(3, 3)).astype(np.uint8)


def _realistic_motion(rng, N=3, H=48, W=64):
    m = np.zeros((N, H, W), np.uint8)
    for n in range(N):
        for _ in range(3):
            y, x = rng.integers(2, H - 6), rng.integers(2, W - 6)
            m[n, y : y + 4, x : x + 4] = rng.integers(60, 200)
    noise = rng.integers(0, 10, size=m.shape, dtype=np.uint8)
    return np.maximum(m, noise)


def test_fused_matches_xla_chain(rng):
    m = _realistic_motion(rng)
    xla = np.asarray(motion_postfilter(m, DEFAULT_CONFIG))
    fused = np.asarray(fused_motion_filter(m, DEFAULT_CONFIG, interpret=True))
    np.testing.assert_array_equal(fused, xla)


def test_fused_matches_native_oracle(rng):
    m = _realistic_motion(rng, N=2)
    fused = np.asarray(fused_motion_filter(m, DEFAULT_CONFIG, interpret=True))
    for n in range(len(m)):
        expected = _oracle(m[n])
        diff = np.abs(fused[n].astype(int) - expected.astype(int))
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.99


def test_fused_chunk_early_out_boundaries(rng):
    """The per-chunk skip (all-subthreshold extended slice => provably zero
    output) must be exact at its edges: pixels AT the threshold, an
    all-zero frame, and a lone bright pixel on every side of a 36-row
    chunk boundary (it must keep the NEIGHBORING chunk active through the
    bilateral+opening halo, not just its own)."""
    H, W = 144, 64  # four 36-row chunks
    cases = [
        np.zeros((1, H, W), np.uint8),                       # fully empty
        np.full((1, H, W), 15, np.uint8),                    # == thresh: all killed
        np.full((1, H, W), 16, np.uint8),                    # just above: all active
    ]
    for r in (0, 33, 34, 35, 36, 37, 38, 71, 72, 107, 108, 143):
        m = (rng.random((1, H, W)) * 10).astype(np.uint8)    # sub-threshold noise
        m[0, r, 20] = 120
        cases.append(m)
    for m in cases:
        xla = np.asarray(motion_postfilter(m, DEFAULT_CONFIG))
        fused = np.asarray(fused_motion_filter(m, DEFAULT_CONFIG, interpret=True))
        np.testing.assert_array_equal(fused, xla)


def test_rowwise_mask_cumsum(rng):
    """Two-level scan == flat cumsum for awkward lengths and dense masks."""
    import jax.numpy as jnp

    from swiftwatcher_tpu.ops.scan import rowwise_mask_cumsum

    for P in (7, 1024, 1025, 93312, 4096):
        m = rng.random((3, P)) < 0.3
        got = np.asarray(rowwise_mask_cumsum(jnp.asarray(m)))
        ref = np.cumsum(m.astype(np.int32), axis=1)
        np.testing.assert_array_equal(got, ref)
    # all-ones row (max counts) and empty row
    m = np.ones((2, 2050), bool)
    m[1] = False
    got = np.asarray(rowwise_mask_cumsum(jnp.asarray(m)))
    np.testing.assert_array_equal(got, np.cumsum(m.astype(np.int32), axis=1))
