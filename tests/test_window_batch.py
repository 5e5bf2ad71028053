"""Batched window localization must agree with the single-window program."""

import numpy as np

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.pipeline.window import localize_window, localize_windows

from oracles import make_synthetic_window


def test_batched_matches_single(rng):
    wins = []
    for k in range(3):
        g = make_synthetic_window(rng, T=21, H=32, W=40, n_dots=1 + k)
        wins.append(np.repeat(g[..., None], 3, axis=-1))  # gray->BGR triple
    crops = np.stack(wins)

    bt, bi = localize_windows(crops, DEFAULT_CONFIG, with_bbox=True)
    for k in range(3):
        st, _, si = localize_window(crops[k], DEFAULT_CONFIG)
        # batch size changes XLA matmul tiling, which can move the IALM
        # residual by an ulp right at the tolerance boundary: allow +-1
        # iteration; the segment tables must still agree exactly.
        assert abs(int(bi[k]) - int(si)) <= 1
        np.testing.assert_array_equal(np.asarray(bt.valid[k]), np.asarray(st.valid))
        np.testing.assert_array_equal(np.asarray(bt.area[k]), np.asarray(st.area))
        np.testing.assert_array_equal(np.asarray(bt.sum_y[k]), np.asarray(st.sum_y))
        np.testing.assert_array_equal(np.asarray(bt.sum_x[k]), np.asarray(st.sum_x))
        np.testing.assert_array_equal(np.asarray(bt.min_y[k]), np.asarray(st.min_y))
        np.testing.assert_array_equal(np.asarray(bt.max_x[k]), np.asarray(st.max_x))
